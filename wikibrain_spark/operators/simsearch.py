"""Similarity search over embedding columns (array<float>).

Two paths (SURVEY.md 'training-data pipeline ops'):
  - brute-force cosine top-k: the exactness baseline. Norms precomputed,
    dot products as native F.zip_with/F.aggregate expressions, top-k via a
    window. Cross-join cost is bounded by the (small) query set — the big
    side streams; at scale the queries side is broadcast.
  - LSH (random hyperplanes): deterministic seeded projections computed in
    an Arrow-batched pandas UDF, bucket equi-join, rank within bucket. The
    scale path: candidates per query ~ bucket size, not n.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank) — exact cosine top-k for each query id.
    The query side is broadcast (small by contract)."""
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    queries = base.where(F.col("neighbor_id").isin(query_ids)).select(
        F.col("neighbor_id").alias("query_id"), F.col("vec").alias("qvec"), F.col("nrm").alias("qnrm")
    )
    scored = base.crossJoin(F.broadcast(queries)).where(F.col("neighbor_id") != F.col("query_id"))
    sim = _dot(F.col("vec"), F.col("qvec")) / (F.col("nrm") * F.col("qnrm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hyperplane_signatures(
    embeddings: DataFrame, n_planes: int = 4, n_tables: int = 8,
    seed: int = 42, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, table_id, bucket) — sign patterns under seeded random
    hyperplanes, n_tables independent tables of n_planes each (standard
    OR-amplification: recall 1-(1-p^planes)^tables). Deterministic across
    runs/workers (seed fixes the planes)."""

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for b in batches:
            mat = np.array(b[vec_col].tolist(), dtype=np.float64)
            if planes is None:
                rng = np.random.default_rng(seed)
                planes = rng.standard_normal((mat.shape[1], n_tables * n_planes))
            bits = (mat @ planes) > 0  # (n, tables*planes)
            weights = 1 << np.arange(n_planes, dtype=np.int64)
            out_id, out_t, out_b = [], [], []
            for t in range(n_tables):
                bucket = bits[:, t * n_planes:(t + 1) * n_planes] @ weights
                out_id.extend(b[id_col].tolist())
                out_t.extend([t] * len(b))
                out_b.extend(bucket.astype(np.int64).tolist())
            yield pd.DataFrame({id_col: out_id, "table_id": out_t, "bucket": out_b})

    return embeddings.select(id_col, vec_col).mapInPandas(
        batch, f"{id_col} long, table_id int, bucket long"
    )


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket with the query in
    any table. Recall is tested against the brute-force baseline; at scale
    the bucket join replaces the cross join."""
    sig = hyperplane_signatures(
        embeddings, n_planes=n_planes, n_tables=n_tables, id_col=id_col, vec_col=vec_col
    )
    base = embeddings.join(sig, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"), "table_id", "bucket",
    )
    queries = base.where(F.col("neighbor_id").isin(query_ids)).select(
        F.col("neighbor_id").alias("query_id"), F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"), F.col("table_id").alias("qtable"), F.col("bucket").alias("qbucket"),
    )
    cand = (
        base.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("qbucket")) & (F.col("table_id") == F.col("qtable")),
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = _dot(F.col("vec"), F.col("qvec")) / (F.col("nrm") * F.col("qnrm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
