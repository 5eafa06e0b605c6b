#!/usr/bin/env python3
"""One scaling-bench measurement at a fixed parallelism level.

Usage: python scripts/scaling_worker.py <cpus> [n_images] [sf_dir]
Prints one JSON line with per-job seconds and rows/sec. Run in a fresh
process per level so each JVM sizes itself to its core count.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    cpus = int(sys.argv[1])
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from wikibrain_spark.operators import geotag, spatial_join
    from wikibrain_spark.session import get_spark
    from wikibrain_spark.sources import synthetic

    paths = synthetic.materialize(os.path.join(REPO, "data", f"bench_{n_images}"), n_images)
    spark = get_spark("scaling", master=f"local[{cpus}]", shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")

    # repartition the input so every core has work regardless of file count
    images = spark.read.parquet(paths["images"]).repartition(cpus * 4).cache()
    n = images.count()  # materialize cache before timing
    boundaries = spark.read.parquet(paths["boundaries"])

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up: JVM codegen AND one full-width pass through every Python
    # worker (spawning 32 workers + importing numpy/pandas costs seconds of
    # wall clock and is not steady-state throughput — on a real cluster the
    # executors are long-lived)
    noop(spark.range(1_000_000).select(F.sum("id")))
    noop(geotag.extract_geotags(images, with_s2=False))

    def timed(job):
        t0 = time.time()
        noop(job())
        return round(time.time() - t0, 3)

    res = {"cpus": cpus, "n_images": n}

    res["flagship_tiles_sec"] = timed(
        lambda: spatial_join.tile_assignments(
            geotag.extract_geotags(images, with_s2=False), boundaries, res=9, strategy="broadcast")
    )
    res["flagship_rows_per_sec"] = round(n / res["flagship_tiles_sec"], 1)

    res["decode_stats_sec"] = timed(lambda: geotag.decode_stats(images))
    res["decode_rows_per_sec"] = round(n / res["decode_stats_sec"], 1)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(cpus * 4).cache()
    li.count()
    # replicate 16x so the agg has enough work to amortize scheduling
    li20 = li
    for _ in range(4):
        li20 = li20.union(li20)
    res["lineitem_agg_sec"] = timed(
        lambda: li20.groupBy("l_returnflag", "l_linestatus", F.year("l_shipdate").alias("y"))
        .agg(F.sum("l_quantity").alias("sq"), F.avg("l_extendedprice").alias("ap"),
             F.count("*").alias("n"))
    )

    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
