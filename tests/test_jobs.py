"""Resumable partitioned flagship: committed bands are skipped on re-run
and the union of partition outputs equals the single-pass result; the
streaming ingest variant survives a mid-commit kill with exactly-once
output."""

import numpy as np
import pandas as pd
import pytest

from wikibrain_spark import codecs, jobs
from wikibrain_spark.operators import spatial_join
from wikibrain_spark.sources import synthetic
from wikibrain_spark.streaming.checkpoint import PartitionLedger


def test_flagship_partitioned_resumes_and_matches(spark, tmp_path):
    paths = synthetic.materialize(str(tmp_path / "d"), 300)
    images = spark.read.parquet(paths["images"])
    boundaries = spark.read.parquet(paths["boundaries"])
    out = str(tmp_path / "out")

    first = jobs.flagship_partitioned(spark, images, boundaries, out, n_bands=4, input_fingerprint="v1")
    assert set(first) == {"0", "1", "2", "3"}

    second = jobs.flagship_partitioned(spark, images, boundaries, out, n_bands=4, input_fingerprint="v1")
    assert second == {}  # everything already committed

    got = (
        jobs.read_flagship_output(spark, out)
        .toPandas().sort_values(["image_id", "boundary_id"]).reset_index(drop=True)
    )
    want = (
        spatial_join.tile_assignments(images, boundaries, res=9, strategy="fused")
        .toPandas().sort_values(["image_id", "boundary_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)

    ledger = PartitionLedger(out).committed()
    assert sum(m["row_count"] for m in ledger.values()) == len(want)
    assert all(m["input_fingerprint"] == "v1" for m in ledger.values())


def _img_file(path, rows):
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    recs = []
    for image_id, lat, lon, dup_of in rows:
        b = dup_of if dup_of is not None else codecs.encode_image(img, "ppm", lat, lon)
        recs.append({
            "image_id": image_id, "bytes": b, "w": 4, "h": 4, "fmt": "ppm",
            "caption": "c", "phash": 0, "event_time_us": 1_700_000_000_000_000,
        })
    pd.DataFrame(recs).to_parquet(path, index=False)
    return {r["image_id"]: r["bytes"] for r in recs}


def test_streaming_flagship_ingest_exactly_once(spark, tmp_path):
    """Kill-and-resume the end-to-end streaming job (stream -> geotag ->
    stateful dedup -> PIP -> ledger commit): a failure injected BETWEEN the
    parquet write and the ledger commit of batch 1 must, on restart, replay
    that batch (same input, same dedup state), overwrite its staging
    output, and commit it exactly once — final output identical to a
    never-failed run. A later run feeding only already-seen fingerprints
    must commit an empty batch (cross-RESTART dedup state)."""
    src = tmp_path / "src"
    src.mkdir()
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    boundaries = spark.createDataFrame(
        [(7, [0.0, 0.0, 20.0, 20.0], [0.0, 20.0, 20.0, 0.0])],
        "boundary_id long, ring_lat array<double>, ring_lon array<double>",
    )

    a_bytes = codecs.encode_image(np.zeros((4, 4, 3), dtype=np.uint8), "ppm", 10.0, 10.0)
    _img_file(src / "f0.parquet", [
        ("a0", 10.0, 10.0, None),       # inside the rectangle
        ("b0", None, None, a_bytes),    # byte-identical duplicate of a0
        ("c0", -20.0, 30.0, None),      # outside
    ])
    _img_file(src / "f1.parquet", [
        ("d1", None, None, a_bytes),    # cross-batch duplicate of a0
        ("e1", 12.0, 12.0, None),       # inside
    ])

    # run 1: batch 0 (f0) commits; batch 1 (f1) dies before its ledger row
    with pytest.raises(Exception, match="injected failure"):
        jobs.streaming_flagship_ingest(
            spark, str(src), boundaries, out_root, ckpt,
            max_files_per_trigger=1, fail_before_commit={1},
        )
    assert set(PartitionLedger(out_root).committed()) == {"b0"}

    # run 2: replays batch 1 from the checkpoint, commits it, drains
    committed = jobs.streaming_flagship_ingest(
        spark, str(src), boundaries, out_root, ckpt, max_files_per_trigger=1,
    )
    assert set(committed) == {"b0", "b1"}
    got = jobs.read_flagship_output(spark, out_root).toPandas()
    # survivors: fp(a0)=fp(b0)=fp(d1) -> a0 (min id, first batch); c0 is
    # outside; e1 inside -> exactly two output rows, each exactly once
    assert sorted(got["image_id"]) == ["a0", "e1"]
    assert set(got["boundary_id"]) == {7}

    # run 3: a new file with ONLY already-seen fingerprints -> the dedup
    # state (persisted in the checkpoint, across two restarts) drops all
    # rows; the batch commits with row_count 0 and the output is unchanged
    _img_file(src / "f2.parquet", [
        ("z9", None, None, a_bytes),
    ])
    committed = jobs.streaming_flagship_ingest(
        spark, str(src), boundaries, out_root, ckpt, max_files_per_trigger=1,
    )
    assert committed["b2"]["row_count"] == 0
    got2 = jobs.read_flagship_output(spark, out_root).toPandas()
    assert sorted(got2["image_id"]) == ["a0", "e1"]


def test_read_flagship_output_single_scan_at_many_partitions(spark, tmp_path):
    """read_flagship_output must issue ONE multi-path FileScan, not an
    O(n_partitions) unionByName chain (round-4 verdict #3): at 100
    committed partitions the plan has a single parquet relation, and the
    output equals an explicit per-partition union."""
    out = str(tmp_path / "out")
    ledger = PartitionLedger(out)
    n_parts, per = 100, 3
    for i in range(n_parts):
        pdf = pd.DataFrame({
            "image_id": [f"p{i}_{j}" for j in range(per)],
            "cell_r9": np.arange(per, dtype=np.int64) + i,
            "boundary_id": np.arange(per, dtype=np.int64),
        })
        spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{out}/partition=b{i}")
        ledger.commit(f"b{i}", {"row_count": per, "input_fingerprint": "t"})

    df = jobs.read_flagship_output(spark, out)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1 and "Union" not in plan
    assert df.count() == n_parts * per
    manual = None
    for i in range(n_parts):
        p = spark.read.parquet(f"{out}/partition=b{i}")
        manual = p if manual is None else manual.unionByName(p)
    got = df.toPandas().sort_values("image_id").reset_index(drop=True)
    want = manual.toPandas().sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
