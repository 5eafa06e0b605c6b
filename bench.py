#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship is the north-star pipeline (image geotag UDF -> hexlite cells
-> broadcast PIP join -> tile assignment); its throughput is also reported
as flagship_rows_per_sec. Results are materialized with the noop sink so
timings measure execution, not driver-side collection.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def _time_min(fn, runs: int) -> float:
    """min-of-N timing (round-3 verdict #4): single-run timings on short
    queries have a ~2x noise band under machine load; the min over N>=2
    runs makes round-over-round comparison meaningful."""
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = _sf_of(sf_dir)
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

    from wikibrain_spark.session import get_spark

    spark = get_spark("wikibrain-bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em
    from pyspark.sql import functions as F
    from wikibrain_spark.operators import geotag, spatial_join
    from wikibrain_spark.sources import synthetic

    # ---- flagship: image table scaled to the SF (sf0.1 -> 20k images)
    n_images = max(2000, int(200_000 * sf))
    paths = synthetic.materialize(os.path.join(REPO, "data", f"bench_{n_images}"), n_images)
    images = spark.read.parquet(paths["images"])
    boundaries = spark.read.parquet(paths["boundaries"])

    # warm the JVM/Arrow path so query timings aren't startup-dominated
    _materialize(spark.range(1_000_000).select(F.sum("id").alias("s")))
    _materialize(geotag.extract_geotags(images.limit(512), with_s2=False))

    timings: dict[str, float] = {}

    timings["flagship_geotag_pip_tiles"] = _time_min(lambda: _materialize(
        spatial_join.tile_assignments(
            geotag.extract_geotags(images, with_s2=False), boundaries, res=9,
            strategy="broadcast")), runs)

    timings["flagship_fused"] = _time_min(lambda: _materialize(
        spatial_join.tile_assignments(images, boundaries, res=9, strategy="fused")), runs)
    flagship_rows_per_sec = round(n_images / timings["flagship_fused"], 1)

    # zero-Python flagship (the configuration that carries the scaling-gate
    # evidence in BENCH/BASELINE.md — no Arrow channel anywhere in the plan)
    timings["flagship_native"] = _time_min(lambda: _materialize(
        spatial_join.tile_assignments(images, boundaries, res=9, strategy="native")), runs)
    flagship_native_rows_per_sec = round(n_images / timings["flagship_native"], 1)

    timings["flagship_shuffle_salted_pip"] = _time_min(lambda: _materialize(
        spatial_join.shuffle_pip_join(
            geotag.extract_geotags(images, with_s2=False),
            boundaries, hot_cell_threshold=max(1000, n_images // 20), n_salt=8,
        )), runs)

    # ---- headline operator queries on the driver's testdata
    headline = [
        "q_pricing_summary", "q_top_customer_revenue", "q_order_priority_window",
        "q_cells_r7", "q_tile_stats", "q_pip_rectangles", "q_pip_shuffle_salted",
        "q_pip_polar", "q_pip_polar_prefiltered", "q_pip_coastline",
        "q_pip_coastline_native",
        "q_knn", "q_knn_kring", "q_within_distance", "q_within_distance_shuffle",
        "q_closure", "q_closure_doubling", "q_closure_materialized", "q_doc_stats",
        "q_dedup_exact", "q_ann_topk", "q_malformed_check", "q_apply_changes",
        "q_image_neardup",
    ]
    qs = em.queries()
    for name in headline:
        timings[name] = _time_min(lambda: _materialize(qs[name](spark, sf_dir)), runs)

    # ---- 600k-vertex megacoast stress rows (round 7): the full-query
    # rows carry a genuine per-invocation snapshot prepass (600k-vertex
    # nested-parquet scan + Python clip + cover stats on first touch);
    # the *_prepass rows time the clipped-dim build ALONE so the
    # round-over-round scoreboard can tell prepass drift from join/refine
    # drift (once-per-snapshot cost at production; per-invocation here).
    from wikibrain_spark.operators import spatial_join as _sj

    timings["q_pip_megacoast"] = _time_min(
        lambda: _materialize(qs["q_pip_megacoast"](spark, sf_dir)), runs)
    timings["q_pip_megacoast_native"] = _time_min(
        lambda: _materialize(qs["q_pip_megacoast_native"](spark, sf_dir)), runs)
    mega_bnd = spark.read.parquet(
        os.path.join(em.MEGA_STAGE_DIR, "boundaries.parquet"))
    mega_res = _sj._auto_cover_res(mega_bnd)
    timings["megacoast_clip_dim_prepass"] = _time_min(
        lambda: _materialize(_sj.clipped_cell_dim(mega_bnd, mega_res)), runs)

    # near-dup pair benchmarks on a FIXED 1000-doc slice: the synthetic
    # documents table repeats a tiny vocabulary, so pair density approaches
    # quadratic at larger SF — timing the full table would measure the
    # fixture's degeneracy, not operator throughput. (The driver's
    # correctness gate still runs both on the FULL table at sf0.01.)
    from pyspark.sql import functions as _F
    from wikibrain_spark.operators import dedup as _dedup

    docs_slice = spark.read.parquet(f"{sf_dir}/documents.parquet").where(_F.col("doc_id") < 1000)
    timings["q_dedup_jaccard_1k"] = _time_min(lambda: _materialize(
        _dedup.token_jaccard_pairs(docs_slice, threshold=0.60)), runs)
    # guard-tax tracker (round-4 verdict #7): same slice with the hot-block
    # guard OFF — the delta vs q_dedup_jaccard_1k is the block-size count
    # pre-pass cost, kept visible round-over-round so it stays bounded.
    # (Safe here only because the 1k slice is known-bounded; the guard
    # stays ON by default everywhere else.)
    timings["q_dedup_jaccard_1k_noguard"] = _time_min(lambda: _materialize(
        _dedup.token_jaccard_pairs(docs_slice, threshold=0.60, max_block_docs=None)), runs)
    timings["q_dedup_minhash_1k"] = _time_min(lambda: _materialize(
        _dedup.minhash_lsh_pairs(docs_slice, n_perms=16, n_bands=4, threshold=0.60)), runs)
    timings["q_dedup_simhash_1k"] = _time_min(lambda: _materialize(
        _dedup.simhash_near_pairs(docs_slice, max_hamming=8)), runs)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "runs_per_query": runs,
        "flagship_rows_per_sec": flagship_rows_per_sec,
        "flagship_native_rows_per_sec": flagship_native_rows_per_sec,
        "flagship_images": n_images,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
