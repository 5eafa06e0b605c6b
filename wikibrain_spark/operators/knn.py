"""kNN caption-to-place matching via hexlite k-ring candidate generation
(SURVEY.md J14 generalized; the north star's 'kNN caption-to-place').

Scale path: each query point explodes to its k-ring cells at a chosen
resolution; places are bucketed by the same cells; the equi-join on cell
replaces the cross join. The ring radius must cover the true neighbors —
`knn_kring` widens adaptively in tests; `knn_bruteforce` is the exactness
baseline (and the DuckDB-oracle-comparable form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wikibrain_spark.geo import cells
from wikibrain_spark.geo.geodesic import haversine_km_col


def knn_bruteforce(queries: DataFrame, places: DataFrame, k: int = 3) -> DataFrame:
    """(query_id, place_id, rank) exact haversine top-k. The places side is
    broadcast (a dimension); rank ties broken by place_id."""
    q = queries.select(F.col("query_id"), F.col("lat").alias("qlat"), F.col("lon").alias("qlon"))
    p = places.select(F.col("place_id"), F.col("lat").alias("plat"), F.col("lon").alias("plon"))
    dist = haversine_km_col(F.col("qlat"), F.col("qlon"), F.col("plat"), F.col("plon"))
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("place_id"))
    return (
        q.crossJoin(F.broadcast(p))
        .select("query_id", "place_id", dist.alias("dist"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "place_id", "rank")
    )


def _ring_offsets(kr: int) -> list[tuple[int, int]]:
    return [(di, dj) for di in range(-kr, kr + 1) for dj in range(-kr, kr + 1)]


def knn_kring(
    queries: DataFrame, places: DataFrame, k: int = 3, res: int = 2, ring: int = 1
) -> DataFrame:
    """k-ring candidate kNN: join on cell neighborhoods instead of a cross
    join. Exact when the true top-k lie within `ring` cells at `res` — the
    caller picks (res, ring) from place density (tested vs brute force)."""
    n_lat, n_lon = cells.hexlite_dims(res)
    header = (cells.HEXLITE_MODE << 60) | (res << 56)

    p = places.select(
        "place_id", F.col("lat").alias("plat"), F.col("lon").alias("plon"),
        cells.hexlite_cell_col(F.col("lat"), F.col("lon"), res).alias("cell"),
    )
    q = queries.select(
        "query_id", F.col("lat").alias("qlat"), F.col("lon").alias("qlon"),
        cells.hexlite_cell_col(F.col("lat"), F.col("lon"), res).alias("qcell"),
    )
    lat_idx = F.shiftright("qcell", 28).bitwiseAND(F.lit((1 << 28) - 1))
    lon_idx = F.col("qcell").bitwiseAND(F.lit((1 << 28) - 1))
    ring_cells = F.array(
        *[
            F.when(
                (lat_idx + di >= 0) & (lat_idx + di < n_lat),
                F.lit(header)
                + F.shiftleft(lat_idx + di, 28)
                + F.pmod(lon_idx + dj, F.lit(n_lon)),
            )
            for di, dj in _ring_offsets(ring)
        ]
    )
    q = q.select(
        "query_id", "qlat", "qlon",
        F.explode(F.array_distinct(F.filter(ring_cells, lambda c: c.isNotNull()))).alias("cell"),
    )
    dist = haversine_km_col(F.col("qlat"), F.col("qlon"), F.col("plat"), F.col("plon"))
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("place_id"))
    return (
        q.join(p, "cell")
        .select("query_id", "place_id", dist.alias("dist"))
        .dropDuplicates(["query_id", "place_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "place_id", "rank")
    )


def within_distance_join(
    left: DataFrame,
    right: DataFrame,
    km: float,
    res: int | None = None,
    max_abs_lat: float = 80.0,
) -> DataFrame:
    """Distance-band range join: ALL (left_id, right_id) pairs within `km`,
    as a cell equi-join instead of a cross join (the geospatial range-join
    Spark lacks natively).

    left(left_id, lat, lon) x right(right_id, lat, lon) ->
    (left_id, right_id, dist_km_e3).

    Completeness: the left side explodes to every cell whose rectangle can
    contain a point within `km` — ±ceil(km/(111*step)) lat cells and
    ±ceil(km/(111*cos(max_abs_lat)*step)) lon cells (equal-angle grid: lon
    ground distance shrinks with |lat|, so the lon ring is sized for the
    worst latitude the data may contain). An exact haversine verifies, so
    precision is exact and recall is total for |lat| <= max_abs_lat.
    """
    import math

    if res is None:
        # coarsest-useful cells: edge >= km/2 keeps the ring rectangle small
        # (a fine grid at a large radius explodes the per-point cell count)
        res = 0
        while res < 10 and cells.hexlite_step(res + 1) * 111.0 >= km / 2.0:
            res += 1
    step = cells.hexlite_step(res)
    n_lat, n_lon = cells.hexlite_dims(res)
    header = (cells.HEXLITE_MODE << 60) | (res << 56)
    lat_ring = math.ceil(km / (111.0 * step)) + 1
    # lon ground distance shrinks with |lat|; clamp to the full circle
    lon_ring = min(
        math.ceil(km / (111.0 * math.cos(math.radians(max_abs_lat)) * step)) + 1,
        n_lon // 2,
    )

    r = right.select(
        "right_id", F.col("lat").alias("rlat"), F.col("lon").alias("rlon"),
        cells.hexlite_cell_col(F.col("lat"), F.col("lon"), res).alias("cell"),
    )
    l = left.select(
        "left_id", F.col("lat").alias("llat"), F.col("lon").alias("llon"),
        cells.hexlite_cell_col(F.col("lat"), F.col("lon"), res).alias("lcell"),
    )
    lat_idx = F.shiftright("lcell", 28).bitwiseAND(F.lit((1 << 28) - 1))
    lon_idx = F.col("lcell").bitwiseAND(F.lit((1 << 28) - 1))
    ring_cells = F.array(
        *[
            F.when(
                (lat_idx + di >= 0) & (lat_idx + di < n_lat),
                F.lit(header) + F.shiftleft(lat_idx + di, 28) + F.pmod(lon_idx + dj, F.lit(n_lon)),
            )
            for di in range(-lat_ring, lat_ring + 1)
            for dj in range(-lon_ring, lon_ring + 1)
        ]
    )
    l = l.select(
        "left_id", "llat", "llon",
        F.explode(F.array_distinct(F.filter(ring_cells, lambda c: c.isNotNull()))).alias("cell"),
    )
    dist = haversine_km_col(F.col("llat"), F.col("llon"), F.col("rlat"), F.col("rlon"))
    return (
        l.join(r, "cell")
        .dropDuplicates(["left_id", "right_id"])
        .where(dist <= km)
        .select("left_id", "right_id", F.floor(dist * 1000).cast("long").alias("dist_km_e3"))
    )
