"""Structured Streaming path: streaming tile counts must equal the batch
aggregation over the same files."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from wikibrain_spark import codecs
from wikibrain_spark.geo import cells
from wikibrain_spark.streaming import pipeline


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    rng = np.random.default_rng(11)
    root = tmp_path_factory.mktemp("stream")
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    for fileno in range(3):
        rows = []
        for i in range(40):
            lat = float(rng.uniform(-60, 60))
            lon = float(rng.uniform(-170, 170))
            rows.append(
                {
                    "image_id": f"img_{fileno}_{i}",
                    "bytes": codecs.encode_image(img, "ppm", lat, lon),
                    "w": 8, "h": 8, "fmt": "ppm",
                    "caption": "c", "phash": 0,
                    "event_time_us": int(
                        (pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=fileno * 7 + i % 5)).value // 1000
                    ),
                }
            )
        pd.DataFrame(rows).to_parquet(root / f"part{fileno}.parquet", index=False)
    return str(root)


def test_streaming_counts_match_batch(spark, stream_dir, tmp_path):
    counts = pipeline.streaming_tile_counts(spark, stream_dir, res=3, window_duration="10 minutes")
    pipeline.run_stream_once(counts, str(tmp_path / "ckpt"), "tile_counts_test")
    got = spark.sql("select * from tile_counts_test").toPandas()

    batch = spark.read.parquet(stream_dir)
    from wikibrain_spark.operators import geotag

    pts = geotag.extract_geotags(batch, resolutions=(3,), with_s2=False)
    joined = batch.select(
        "image_id", F.timestamp_micros("event_time_us").alias("event_time")
    ).join(pts, "image_id")
    want = (
        joined.groupBy(F.window("event_time", "10 minutes").alias("win"), F.col("cell_r3").alias("cell"))
        .agg(F.count("*").alias("n_images"))
        .select(F.col("win.start").alias("window_start"), "cell", "n_images")
        .toPandas()
    )
    key = ["window_start", "cell"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    assert got["n_images"].sum() == 120


@pytest.fixture(scope="module")
def dedup_stream_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("dedup_stream")
    # fingerprints repeat within AND across files; survivor = min image_id
    for fileno, fps in enumerate([["a", "b", "a", "c"], ["b", "d", "a", "d"]]):
        pd.DataFrame({
            "image_id": [f"img_{fileno}_{i}" for i in range(len(fps))],
            "fp": fps,
        }).to_parquet(root / f"part{fileno}.parquet", index=False)
    return str(root)


def test_streaming_dedup_first_occurrence_only(spark, dedup_stream_dir, tmp_path):
    """applyInPandasWithState exact-dedup: one surviving row per fingerprint
    across all micro-batches (state persisted via checkpoint); within a batch
    the deterministic survivor is the minimum image_id."""
    stream = (
        spark.readStream.schema("image_id string, fp string")
        .option("maxFilesPerTrigger", 1)  # force 2 micro-batches -> cross-batch state
        .parquet(dedup_stream_dir)
    )
    deduped = pipeline.streaming_dedup(stream, key_col="fp", id_col="image_id")
    q = (
        deduped.writeStream.outputMode("append").format("memory")
        .queryName("dedup_test").option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r["fp"]: r["image_id"] for r in spark.sql("select * from dedup_test").collect()}
    assert got == {
        "a": "img_0_0",   # first batch, min id among the two 'a's
        "b": "img_0_1",   # first batch beats second-batch 'b'
        "c": "img_0_3",
        "d": "img_1_1",   # min id among the two 'd's in batch 2
    }
