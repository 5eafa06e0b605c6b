"""Bucketed co-located joins: two tables bucketed by the same cell key must
join without an Exchange (shuffle) in the plan — the 100 TB cell-keyed
join strategy."""

import pytest
from pyspark.sql import functions as F

from wikibrain_spark.geo import cells
from wikibrain_spark.sources import catalog


@pytest.fixture(scope="module")
def bucketed(spark):
    import shutil

    for t in ("pts_bucketed", "stats_bucketed"):
        if spark.catalog.tableExists(t):
            spark.sql(f"DROP TABLE {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    pts = spark.range(20_000).select(
        F.col("id").alias("point_id"),
        ((F.col("id") * 37 % 1700) / 10.0 - 85.0).alias("lat"),
        ((F.col("id") * 91 % 3600) / 10.0 - 180.0).alias("lon"),
    )
    pts = pts.withColumn("cell", cells.hexlite_cell_col(F.col("lat"), F.col("lon"), 4))
    stats = pts.groupBy("cell").agg(F.count("*").alias("n"), F.avg("lat").alias("clat"))
    catalog.save_table(pts, "pts_bucketed", bucket_by=(8, ["cell"]))
    catalog.save_table(stats, "stats_bucketed", bucket_by=(8, ["cell"]))
    return spark


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    a = catalog.load_table(spark, "pts_bucketed")
    b = catalog.load_table(spark, "stats_bucketed")
    # force SortMergeJoin (at test scale the planner would broadcast; at
    # 100 TB neither side is broadcastable and SMJ-over-buckets is the point)
    joined = a.join(b.hint("merge"), "cell")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan  # co-located buckets
    assert "SortMergeJoin" in plan
    assert joined.count() == 20_000


def test_unbucketed_join_does_shuffle(bucketed):
    spark = bucketed
    a = catalog.load_table(spark, "pts_bucketed")
    plain = a.select("cell", "point_id").withColumnRenamed("point_id", "pid2").repartition(5)
    joined = a.join(plain.hint("merge"), "cell")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan  # sanity: no co-location -> shuffle
