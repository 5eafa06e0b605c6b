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


def test_save_table_rejects_qualified_or_pathlike_names(spark):
    """Round-5 ADVICE: the orphan-cleanup path maps name -> <warehouse>/
    <name.lower()>, which is wrong for db.tbl and dangerous for separators
    — such names must be rejected before any filesystem action."""
    df = spark.range(1)
    for bad in ("db.tbl", "../escape", "a/b", "name with space"):
        with pytest.raises(ValueError, match="bare"):
            catalog.save_table(df, bad)


def test_save_table_refuses_to_delete_non_table_dir(spark, tmp_path):
    """An unrelated directory squatting on the table's warehouse location
    must raise, not be rmtree'd."""
    import os

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    name = "wb_guard_probe_tbl"
    if spark.catalog.tableExists(name):
        spark.sql(f"DROP TABLE {name}")
    loc = os.path.join(wh, name)
    os.makedirs(loc, exist_ok=True)
    user_file = os.path.join(loc, "precious_user_data.txt")
    with open(user_file, "w") as f:
        f.write("do not delete")
    try:
        with pytest.raises(ValueError, match="refusing"):
            catalog.save_table(spark.range(1), name)
        assert os.path.exists(user_file)
    finally:
        import shutil
        shutil.rmtree(loc, ignore_errors=True)


def test_unbucketed_join_does_shuffle(bucketed):
    spark = bucketed
    a = catalog.load_table(spark, "pts_bucketed")
    plain = a.select("cell", "point_id").withColumnRenamed("point_id", "pid2").repartition(5)
    joined = a.join(plain.hint("merge"), "cell")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan  # sanity: no co-location -> shuffle
