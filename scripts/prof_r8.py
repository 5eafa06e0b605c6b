#!/usr/bin/env python3
"""Round-8 optimization profiler: noop-sink decomposition of the hot bench
rows (guide §1.4). NOT part of the frozen bench contract — cites into
OPTIMIZATION_r08.md. Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/prof_r8.py [probe ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    which = set(sys.argv[1:])

    from wikibrain_spark.session import get_spark

    spark = get_spark("wikibrain-prof-r8", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em
    from pyspark.sql import functions as F
    from wikibrain_spark.operators import spatial_join as sj

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, list[float]] = {}

    def t(name: str, fn, runs: int = 2):
        for _ in range(runs):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn()
            out.setdefault(name, []).append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(name, out[name], flush=True)

    # warm the JVM/Arrow path
    noop(spark.range(1_000_000).select(F.sum("id").alias("s")))

    qs = em.queries()

    if not which or "mega" in which:
        pts, bnd = None, None
        # stage (idempotent) and open inputs the way the query does
        def _open():
            nonlocal pts, bnd
            import importlib
            pts_bnd = None
            # reuse the query's own staging helper by calling the query once lazily
            bnd_ = spark.read.parquet(os.path.join(em.MEGA_STAGE_DIR, "boundaries.parquet"))
            pts_ = (
                spark.read.parquet(f"{sf_dir}/events.parquet")
                .where(F.col("event_id") % 11 == 0)
                .select(
                    F.col("event_id").cast("string").alias("image_id"),
                    F.expr(em.MEGA_LAT_EXPR).alias("lat"),
                    F.expr(em.MEGA_LON_EXPR).alias("lon"),
                )
            )
            return pts_, bnd_

        # make sure staging exists by touching the query path once (untimed)
        qs["q_pip_megacoast_native"](spark, sf_dir).limit(1).collect()
        pts, bnd = _open()

        t("mega/scan_boundaries_noop", lambda: noop(bnd))
        t("mega/scan_points_noop", lambda: noop(pts))
        sj.clear_cover_stats_cache()
        t("mega/cover_stats_cold", lambda: sj._cover_stats(bnd), runs=1)
        t("mega/cover_stats_warm", lambda: sj._cover_stats(bnd), runs=1)
        res = sj._auto_cover_res(bnd)
        print("mega res =", res, flush=True)
        t("mega/polygon_cover_noop", lambda: noop(sj.polygon_cover(bnd, res)))
        t("mega/clipped_cover_frame_noop", lambda: noop(sj.clipped_cover_frame(bnd, res)))
        t("mega/clipped_cell_dim_noop", lambda: noop(sj.clipped_cell_dim(bnd, res)))
        t("mega/q_pip_megacoast", lambda: noop(qs["q_pip_megacoast"](spark, sf_dir)))
        t("mega/q_pip_megacoast_native", lambda: noop(qs["q_pip_megacoast_native"](spark, sf_dir)))

    if not which or "polar" in which:
        t("polar/q_pip_polar", lambda: noop(qs["q_pip_polar"](spark, sf_dir)))
        t("polar/q_pip_polar_prefiltered", lambda: noop(qs["q_pip_polar_prefiltered"](spark, sf_dir)))

    if not which or "closure" in which:
        t("closure/q_closure", lambda: noop(qs["q_closure"](spark, sf_dir)))
        t("closure/q_closure_doubling", lambda: noop(qs["q_closure_doubling"](spark, sf_dir)))
        t("closure/q_closure_materialized", lambda: noop(qs["q_closure_materialized"](spark, sf_dir)))

    if not which or "dedup" in which:
        from wikibrain_spark.operators import dedup
        docs_slice = spark.read.parquet(f"{sf_dir}/documents.parquet").where(F.col("doc_id") < 1000)
        t("dedup/minhash_banded_noop", lambda: noop(
            dedup.minhash_banded(docs_slice, n_perms=16, n_bands=4)))
        t("dedup/minhash_pairs_1k", lambda: noop(
            dedup.minhash_lsh_pairs(docs_slice, n_perms=16, n_bands=4, threshold=0.60)))
        t("dedup/simhash_sigs_noop", lambda: noop(dedup.simhash64(docs_slice)))
        t("dedup/simhash_pairs_1k", lambda: noop(dedup.simhash_near_pairs(docs_slice, max_hamming=8)))
        t("dedup/jaccard_1k", lambda: noop(dedup.token_jaccard_pairs(docs_slice, threshold=0.60)))

    if not which or "salted" in which:
        t("salted/q_pip_shuffle_salted", lambda: noop(qs["q_pip_shuffle_salted"](spark, sf_dir)))
        t("salted/q_pip_coastline", lambda: noop(qs["q_pip_coastline"](spark, sf_dir)))
        t("salted/q_pip_coastline_native", lambda: noop(qs["q_pip_coastline_native"](spark, sf_dir)))

    if not which or "flagship" in which:
        from wikibrain_spark.operators import geotag
        from wikibrain_spark.sources import synthetic
        n_images = max(2000, int(200_000 * 0.1))
        paths = synthetic.materialize(os.path.join(REPO, "data", f"bench_{n_images}"), n_images)
        images = spark.read.parquet(paths["images"])
        boundaries = spark.read.parquet(paths["boundaries"])
        t("flagship/native", lambda: noop(
            sj.tile_assignments(images, boundaries, res=9, strategy="native")))
        t("flagship/fused", lambda: noop(
            sj.tile_assignments(images, boundaries, res=9, strategy="fused")))
        t("flagship/broadcast", lambda: noop(
            sj.tile_assignments(geotag.extract_geotags(images, with_s2=False), boundaries,
                                res=9, strategy="broadcast")))

    if not which or "misc" in which:
        t("misc/q_top_customer_revenue", lambda: noop(qs["q_top_customer_revenue"](spark, sf_dir)))
        t("misc/q_doc_stats", lambda: noop(qs["q_doc_stats"](spark, sf_dir)))
        t("misc/q_within_distance_shuffle", lambda: noop(qs["q_within_distance_shuffle"](spark, sf_dir)))

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
