"""Geotag extraction + cell encoding over the image table (SURVEY.md U3).

Design for 100 TB:
  - The ONLY Python work is parsing the 26-byte payload header (an EXIF
    analogue) inside mapInPandas — pixels are never decoded on this path.
    Column pruning matters: we select just (image_id, bytes) into the UDF,
    so the Parquet scan never materializes captions for this stage.
  - Cell encoding is a native Column expression (wikibrain_spark.geo.cells
    hexlite_cell_col) => whole-stage codegen, no second Python hop.
  - The full pixel decode (PSNR checks, features, mosaics) is a separate
    operator `decode_stats` used only where pixels are genuinely needed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikibrain_spark import codecs
from wikibrain_spark.geo import cells

GEOTAG_RESOLUTIONS = (7, 8, 9, 10, 11)  # H3-style res 7-11 per north_star


def extract_geotags(images: DataFrame, resolutions=GEOTAG_RESOLUTIONS, with_s2: bool = True) -> DataFrame:
    """images(image_id, bytes, ...) -> (image_id, lat, lon, cell_r{R}..., s2_cell).

    Reference parity: replaces the per-row coordinate lookup the reference
    does via network calls (wikimedia_link_issue_reporter.py:1866-1878) with
    a batched header parse + native cell encoding.
    """

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            lat, lon = codecs.extract_geotags_batch(b["hdr"].tolist())
            yield pd.DataFrame({"image_id": b["image_id"], "lat": lat, "lon": lon})

    # slice the fixed-size header JVM-side: the Arrow channel ships 26 bytes
    # per row instead of the full pixel payload (~100x less traffic — the
    # geotag stage is bandwidth-bound, not compute-bound)
    tagged = images.select(
        "image_id", F.substring("bytes", 1, codecs.HEADER_SIZE).alias("hdr")
    ).mapInPandas(parse_batch, schema="image_id string, lat double, lon double")
    out_cols = [F.col("image_id"), F.col("lat"), F.col("lon")]
    for r in resolutions:
        out_cols.append(cells.hexlite_cell_col(F.col("lat"), F.col("lon"), r).alias(f"cell_r{r}"))
    df = tagged.select(*out_cols)
    if with_s2:
        # S2 needs trig + Hilbert bits -> Arrow-batched pandas UDF (still no
        # per-row Python: the kernel is pure vectorized NumPy)
        @F.pandas_udf("long")
        def s2_udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
            return pd.Series(cells.s2_cell_id(lat.to_numpy(), lon.to_numpy(), 16))

        df = df.withColumn("s2_cell", s2_udf("lat", "lon"))
    return df


def decode_stats(images: DataFrame) -> DataFrame:
    """Full pixel decode -> per-image stats (mean RGB, recomputed phash,
    PSNR vs lossless re-encode for lossy rows). Exercises the real decoder
    on the distributed path; used by invariant tests and feature extraction.
    """

    def stats_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n = len(b)
            out = {
                "image_id": b["image_id"],
                "fmt": b["fmt"],
                "mean_r": np.empty(n), "mean_g": np.empty(n), "mean_b": np.empty(n),
                "phash_check": np.empty(n, dtype=np.int64),
                "psnr_db": np.empty(n),
            }
            for i, (payload, fmt) in enumerate(zip(b["bytes"], b["fmt"])):
                arr, _meta = codecs.decode_image(payload)
                out["mean_r"][i], out["mean_g"][i], out["mean_b"][i] = arr.reshape(-1, 3).mean(axis=0)
                out["phash_check"][i] = codecs.phash64(arr)
                if fmt in codecs.LOSSLESS:
                    out["psnr_db"][i] = float("inf")
                else:
                    # lossy: decoded-vs-decoded is identity; PSNR is measured
                    # against a fresh lossless round-trip of the decoded pixels
                    out["psnr_db"][i] = codecs.psnr(arr, codecs.decode_image(
                        codecs.encode_image(arr, "dctq", 0.0, 0.0))[0])
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        stats_batch,
        schema="image_id string, fmt string, mean_r double, mean_g double, "
               "mean_b double, phash_check long, psnr_db double",
    )


def image_features(images: DataFrame, thumb: int = 8) -> DataFrame:
    """Multimodal feature extraction: decode -> box-resize -> flat feature
    vector (training-data-pipeline op; real plumbing, real codec)."""

    def feat_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            for payload in b["bytes"]:
                arr, _ = codecs.decode_image(payload)
                small = codecs.mean_pool_resize(arr, thumb, thumb)
                feats.append((small.astype(np.float32) / 255.0).flatten().tolist())
            yield pd.DataFrame({"image_id": b["image_id"], "feature": feats})

    return images.select("image_id", "bytes").mapInPandas(
        feat_batch, schema="image_id string, feature array<float>"
    )


def sample_frames(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling over the WBVD container (codecs.encode_video):
    every_n-th frame re-emitted as a standalone WBIM image payload, so the
    output rows compose directly with every image operator (decode_stats,
    image_features, extract_geotags). Arrow-batched mapInPandas; the frame
    walk is offset arithmetic, no per-pixel work until a frame is kept."""

    def frame_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            vids, nos, frames = [], [], []
            for vid, payload in zip(b["video_id"], b["bytes"]):
                for no, img in codecs.sample_video_frames(bytes(payload), every_n):
                    vids.append(vid)
                    nos.append(no)
                    frames.append(img)
            yield pd.DataFrame({"video_id": vids, "frame_no": nos, "frame": frames})

    return videos.select("video_id", "bytes").mapInPandas(
        frame_batch, schema="video_id string, frame_no int, frame binary"
    )


def phash_near_pairs(
    images: DataFrame,
    max_hamming: int = 4,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> DataFrame:
    """Perceptual-hash image near-duplicates: ALL image pairs whose 64-bit
    pHash (codecs.phash64 — DCT low-frequency sign signature, recomputable
    from pixels: decode_stats pins stored == recomputed) differs in at most
    max_hamming bits. Returns (image_a, image_b, hamming).

    The signature ALGEBRA is identical to text SimHash — only the
    signature source differs (image DCT vs token hashes) — so this
    delegates to dedup.simhash_pairs_from_signatures: pigeonhole banding
    into max_hamming+1 bit chunks (a pair within the radius shares at
    least one chunk), bucket equi-join, exact popcount verify. Never
    all-pairs; candidate volume is governed by chunk width. This is the
    image-dedup stage of a training-data pipeline (near-identical crops /
    re-encodes share low-frequency structure and land within a few bits).
    """
    from wikibrain_spark.operators.dedup import simhash_pairs_from_signatures

    sigs = images.select(F.col(id_col).alias("doc_id"), F.col(phash_col).alias("simhash"))
    return simhash_pairs_from_signatures(sigs, max_hamming).select(
        F.col("doc_a").alias("image_a"), F.col("doc_b").alias("image_b"), "hamming"
    )
