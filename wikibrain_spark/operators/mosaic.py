"""Raster<->vector tile aggregation: per-cell image mosaics + stats
(SURVEY.md §7.1 step 7; north star 'raster<->vector tile aggregation').

groupBy(cell).applyInPandas assembles a fixed-size mosaic per hexlite cell:
thumbnails (deterministic box-filter) placed row-major in image_id order.
The group is the unit of work — one Arrow batch per cell — so executor
memory is bounded by (grid*thumb)^2*3 + the cell's encoded payloads, and
skewed cells are exactly the salted-join cells upstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikibrain_spark import codecs
from wikibrain_spark.geo import cells as cell_mod

MOSAIC_SCHEMA = "cell long, n_images long, mosaic binary, mean_luma double"


def cell_mosaics(
    images_with_cells: DataFrame,
    cell_col: str = "cell_r7",
    thumb: int = 16,
    grid: int = 4,
) -> DataFrame:
    """images(image_id, bytes, <cell_col>) -> one mosaic row per cell.

    Takes the first grid*grid images by image_id; mosaic is encoded pngz
    (lossless) with the cell's center as its geotag.
    """

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(key[0])
        pdf = pdf.sort_values("image_id").head(grid * grid)
        canvas = np.zeros((grid * thumb, grid * thumb, 3), dtype=np.uint8)
        for i, payload in enumerate(pdf["bytes"]):
            arr, _ = codecs.decode_image(payload)
            th = codecs.mean_pool_resize(arr, thumb, thumb)
            r, c = divmod(i, grid)
            canvas[r * thumb:(r + 1) * thumb, c * thumb:(c + 1) * thumb] = th
        clat, clon = cell_mod.hexlite_center(np.array([cell]))
        payload = codecs.encode_image(canvas, "pngz", float(clat[0]), float(clon[0]))
        mean_luma = float((canvas.astype(np.float64) @ np.array([0.299, 0.587, 0.114])).mean())
        return pd.DataFrame(
            {"cell": [cell], "n_images": [len(pdf)], "mosaic": [payload], "mean_luma": [mean_luma]}
        )

    return (
        images_with_cells.select(F.col(cell_col).alias("cell"), "image_id", "bytes")
        .groupBy("cell")
        .applyInPandas(build, MOSAIC_SCHEMA)
    )


def cell_stats(points: DataFrame, cell_col: str = "cell_r7") -> DataFrame:
    """Per-cell scalar aggregation (count + centroid) — the cheap tile stat
    companion to the mosaic; pure groupBy, map-side combinable."""
    return points.groupBy(F.col(cell_col).alias("cell")).agg(
        F.count("*").alias("n_points"),
        F.avg("lat").alias("centroid_lat"),
        F.avg("lon").alias("centroid_lon"),
    )
