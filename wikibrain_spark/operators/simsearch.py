"""Similarity search over embedding columns (array<float>).

Three paths (SURVEY.md 'training-data pipeline ops'):
  - brute-force cosine top-k: the exactness baseline. Norms precomputed,
    dot products as native F.zip_with/F.aggregate expressions, top-k via a
    window. Cross-join cost is bounded by the (small) query set — the big
    side streams; at scale the queries side is broadcast.
  - LSH (random hyperplanes): deterministic seeded projections computed in
    an Arrow-batched pandas UDF, bucket equi-join, rank within bucket. The
    scale path: candidates per query ~ bucket size, not n.
  - IVF (inverted file / coarse quantizer): spherical k-means centroids
    trained on a DETERMINISTIC bounded sample on the driver (the standard
    FAISS practice — quantizer training wants a sample, not the corpus),
    then assignment and search are fully distributed: each vector gets its
    nearest-centroid cell via a native HOF argmin over a one-row broadcast
    centroid dim (row data, not plan literals — same Janino lesson as the
    native PIP), and each query probes its n_probe nearest cells through a
    cell equi-join. Candidates per query ~ n/n_centroids * n_probe.
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
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket with the query in
    any table. Recall is tested against the brute-force baseline; at scale
    the bucket join replaces the cross join. Pass ``signatures`` (a staged
    (id, table_id, bucket) table from hyperplane_signatures) to pin the
    exact candidate set — the exact-oracle seam."""
    sig = signatures if signatures is not None else hyperplane_signatures(
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


# ------------------------------------------------------------------- IVF

def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 10,
    seed: int = 42,
    max_train: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means coarse quantizer, trained on a deterministic
    sample (the max_train smallest xxhash64(id) values — partitioning-
    independent, unlike DataFrame.sample) pulled to the driver. Returns
    (n_centroids, dim) L2-normalized float64 centroids. FAISS trains IVF
    quantizers on a bounded sample the same way.

    The sample is selected EXECUTOR-SIDE: a hash-threshold filter sized
    from a count keeps only ~max_train survivor rows per the uniform
    xxhash64 distribution, and the driver sorts just those survivors to
    the exact max_train smallest. A global `.orderBy(h).limit(max_train)`
    would ship every partition's local top-max_train through one
    driver-side merge — ~10^10 rows at 100 TB for a 10^5-row sample. The
    threshold filter reads the same scan once and collects only the
    survivors; the chosen sample set is bit-identical to the global sort's
    (smallest-h rows), so centroids are unchanged."""
    base = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("h", F.xxhash64(F.col("id")))
    total = base.count()
    if total == 0:
        raise ValueError("train_ivf_centroids: embedding table is empty — nothing to train on")
    if total <= max_train:
        pdf = base.toPandas()
    else:
        # xxhash64 is uniform over signed int64; a cutoff at quantile
        # q = margin * max_train/total keeps ~margin*max_train survivors.
        # margin=1.25 makes undershoot (< max_train survivors) essentially
        # impossible at max_train >= 10^4; the widening loop makes it
        # impossible, deterministically (cutoff depends only on total and
        # max_train, never on partitioning or sampled randomness).
        margin = 1.25
        while True:
            q = min(1.0, margin * max_train / total)
            cutoff = int(-(2**63) + q * 2**64)
            pdf = base.where(F.col("h") <= F.lit(min(cutoff, 2**63 - 1))).toPandas()
            if len(pdf) >= max_train or q >= 1.0:
                break
            margin *= 2.0
        # exact top-max_train smallest h (id tiebreak for full determinism)
        pdf = pdf.sort_values(["h", "id"]).head(max_train)
    mat = np.array(pdf.sort_values("id")["v"].tolist(), dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    # small corpora: a quantizer can't have more cells than training vectors
    n_centroids = min(n_centroids, len(mat))
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(len(mat), size=n_centroids, replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    return cents


def _centroid_dim(spark, centroids: np.ndarray) -> DataFrame:
    """One-row (cents: array<struct<cid int, cvec array<double>>>) dim —
    centroids as ROW DATA so the assignment lambda is fixed-size
    regardless of n_centroids."""
    cents = [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)]
    # built as ONE driver-side row (no collect_list aggregation): the
    # broadcast dim adds zero exchanges to the plan
    return spark.createDataFrame(
        [(cents,)], "cents array<struct<cid: int, cvec: array<double>>>"
    )


def _cell_rank_structs(vec: Column, nrm: Column) -> Column:
    """array<struct<negsim double, cid int>> over the broadcast `cents`
    column — lexicographic struct order makes array_min/sort_array an
    argmin by cosine distance."""
    return F.transform(
        F.col("cents"),
        lambda c: F.struct(
            (-_dot(vec, c["cvec"]) / nrm).alias("negsim"), c["cid"].alias("cid")
        ),
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, nrm, ivf_cell) — nearest-centroid assignment, fully native
    (HOF argmin over the broadcast one-row dim; zero shuffle, zero Python)."""
    dim = _centroid_dim(embeddings.sparkSession, centroids)
    nrm = F.greatest(_norm(F.col(vec_col)), F.lit(1e-12))
    return (
        embeddings.crossJoin(F.broadcast(dim))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("vec"),
            _norm(F.col(vec_col)).alias("nrm"),
            F.array_min(_cell_rank_structs(F.col(vec_col), nrm))["cid"].alias("ivf_cell"),
        )
    )


def ivf_probes(
    embeddings: DataFrame,
    centroids: np.ndarray,
    query_ids: list[int],
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, ivf_cell) — each query's n_probe nearest centroid cells
    (native HOF sort over the broadcast one-row centroid dim). Exposed
    separately (like ivf_assign) so the probe table can be STAGED for the
    exact-oracle seam: given staged assignments + probes, the candidate set
    is a plain cell equi-join any engine can reproduce."""
    dim = _centroid_dim(embeddings.sparkSession, centroids)
    nrm = F.greatest(_norm(F.col(vec_col)), F.lit(1e-12))
    return (
        embeddings.where(F.col(id_col).isin(query_ids))
        .crossJoin(F.broadcast(dim))
        .select(
            F.col(id_col).alias("query_id"),
            F.explode(
                F.transform(
                    F.slice(F.sort_array(_cell_rank_structs(F.col(vec_col), nrm)), 1, n_probe),
                    lambda s: s["cid"],
                )
            ).alias("ivf_cell"),
        )
    )


def cosine_topk_from_cells(
    embeddings: DataFrame,
    assigned_cells: DataFrame,
    probe_cells: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k restricted to the IVF candidate set: base vectors
    whose (neighbor_id, ivf_cell) assignment matches any probed
    (query_id, ivf_cell) row. Pure DataFrame ops over the two cell tables +
    the embeddings table — the deterministic tail of the IVF pipeline, and
    exactly SQL-specifiable from staged cell tables."""
    base = embeddings.select(
        F.col(id_col).alias("_bid"), F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    qvecs = embeddings.select(
        F.col(id_col).alias("_qid"), F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnrm"),
    )
    cand = (
        assigned_cells.join(F.broadcast(probe_cells), "ivf_cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .join(base, F.col("neighbor_id") == F.col("_bid"))
        .join(F.broadcast(qvecs), F.col("query_id") == F.col("_qid"))
    )
    sim = _dot(F.col("vec"), F.col("qvec")) / (F.col("nrm") * F.col("qnrm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: each query probes its n_probe nearest
    centroid cells; candidates come from a cell equi-join (never a cross
    join of the base side). n_probe == n_centroids degenerates to exact
    brute force — pinned in tests. Pass `centroids` to reuse a trained
    quantizer across queries."""
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_centroids, n_iters, seed, id_col=id_col, vec_col=vec_col
        )
    assigned = ivf_assign(embeddings, centroids, id_col=id_col, vec_col=vec_col).select(
        "neighbor_id", "ivf_cell"
    )
    probes = ivf_probes(
        embeddings, centroids, query_ids, n_probe, id_col=id_col, vec_col=vec_col
    )
    return cosine_topk_from_cells(embeddings, assigned, probes, k, id_col, vec_col)
