"""kNN caption-to-place matching via hexlite k-ring candidate generation
(SURVEY.md J14 generalized; the north star's 'kNN caption-to-place').

Scale path: each query point explodes to its k-ring cells at a chosen
resolution; places are bucketed by the same cells; the equi-join on cell
replaces the cross join. The ring radius must cover the true neighbors —
`knn_kring` widens adaptively in tests; `knn_bruteforce` is the exactness
baseline (and the DuckDB-oracle-comparable form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from wikibrain_spark.geo import cells
from wikibrain_spark.geo.geodesic import EARTH_RADIUS_KM, haversine_km_col


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


def knn_kring(
    queries: DataFrame, places: DataFrame, k: int = 3, res: int = 2, ring: int = 1
) -> DataFrame:
    """k-ring candidate kNN: join on cell neighborhoods instead of a cross
    join. Exact when the true top-k lie within `ring` cells at `res` — the
    caller picks (res, ring) from place density (tested vs brute force)."""
    n_lat, n_lon = cells.hexlite_dims(res)
    header = (cells.HEXLITE_MODE << 60) | (res << 56)
    step = cells.hexlite_step(res)
    # non-divisible grids have one narrower seam cell at the antimeridian;
    # widen the lon ring by 1 there so a neighborhood spanning the seam
    # still covers the same ground distance (same margin as
    # with_within_distance_candidate_cells)
    lon_ring = ring if abs(n_lon * step - 360.0) < 1e-9 else ring + 1

    p = places.select(
        "place_id", F.col("lat").alias("plat"), F.col("lon").alias("plon"),
        cells.hexlite_cell_col(F.col("lat"), F.col("lon"), res).alias("cell"),
    )
    q = queries.select(
        "query_id", F.col("lat").alias("qlat"), F.col("lon").alias("qlon"),
        cells.hexlite_cell_col(F.col("lat"), F.col("lon"), res).alias("qcell"),
    )
    # the (2*ring+1) x (2*lon_ring+1) ring array is built as ONE SQL string
    # parsed JVM-side: the same expression assembled from F.when/F.array
    # objects costs ~1000 Py4J round-trips (~3.5 s of driver time at
    # ring=4) for an identical plan
    lat_terms = ", ".join(
        f"CASE WHEN _lat_idx + ({di}) >= 0 AND _lat_idx + ({di}) < {n_lat} "
        f"THEN {header} + shiftleft(_lat_idx + ({di}), 28) + pmod(_lon_idx + ({dj}), {n_lon}) END"
        for di in range(-ring, ring + 1)
        for dj in range(-lon_ring, lon_ring + 1)
    )
    ring_cells = F.expr(f"array_distinct(filter(array({lat_terms}), c -> c IS NOT NULL))")
    # explode_outer + post-filter (not explode): a non-outer Generate makes
    # InferFiltersFromGenerate push a size() > 0 filter below this
    # projection, re-substituting the whole ring array into one giant
    # filter condition (same pathology as within_distance_join)
    q = (
        q.withColumns({
            "_lat_idx": F.shiftright("qcell", 28).bitwiseAND(F.lit((1 << 28) - 1)),
            "_lon_idx": F.col("qcell").bitwiseAND(F.lit((1 << 28) - 1)),
        })
        .select(
            "query_id", "qlat", "qlon",
            F.explode_outer(ring_cells).alias("cell"),
        )
        .where(F.col("cell").isNotNull())
    )
    dist = haversine_km_col(F.col("qlat"), F.col("qlon"), F.col("plat"), F.col("plon"))
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("place_id"))
    # no pair dedup: the ring is array_distinct and a place joins on its
    # SINGLE cell, so (query_id, place_id) appears at most once
    return (
        q.join(p, "cell")
        .select("query_id", "place_id", dist.alias("dist"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "place_id", "rank")
    )


def with_within_distance_candidate_cells(
    df: DataFrame, km: float, res: int, out: str = "cells"
) -> DataFrame:
    """Adds `out`: array<long> of hexlite cells that can contain a point
    within `km` of the row's (lat, lon) — the candidate-generation kernel
    of :func:`within_distance_join`, exposed so tests can measure per-row
    explode factor with ``F.size``.

    Per-row / per-latitude-band sizing (all native expressions):

    * Latitude ring: any point within angular distance theta = km/R has
      |dlat| <= theta, so bands are a static ±(floor(theta_deg/step)+1)
      unroll, with a per-row reachability guard that drops bands outside
      [lat - theta, lat + theta].
    * Longitude ring, per band: the points within `km` of the row form a
      spherical cap of angular radius theta. At latitude phi2 the cap spans
      dlon(phi2) = acos((cos theta - sin phi1 sin phi2)/(cos phi1 cos phi2))
      (clamped to [-1, 1]; denominator epsilon-guarded so the pole limit
      resolves to 0 or pi by sign). Over a band [lo, hi] the span is
      unimodal with its maximum at sin phi2* = sin phi1 / cos theta, so the
      band maximum is the value at clamp(phi2*, lo, hi). When the cap
      contains a pole the formula yields pi — a full-circle longitude ring —
      which is exactly the over-the-pole reachability an along-parallel
      formula misses.

    The per-band cell list is built WITHOUT higher-order-function lambdas
    (HOF lambdas are interpreted per element, not codegen'd — measured 4x
    the whole kernel cost at sf0.1): within one band the candidate cell ids
    are CONSECUTIVE integers (header | band<<28 | lon_index), so a plain
    ``sequence(first_cell, last_cell)`` enumerates them natively; a window
    wrapping the antimeridian becomes a concat of two sequences, and a
    window covering the full circle becomes the exact one-sequence
    circle — which also makes the old ``array_distinct`` unnecessary.
    Recall is total for ALL latitudes (poles included); an exact haversine
    filter after the equi-join keeps precision exact.

    Shaped as a DataFrame transform (not a Column) deliberately: the
    per-band trig half-width ``dj`` is referenced ~7x by the sequence
    bounds, so it is STAGED as a real column in a first projection and the
    arrays are built in a second — inline, the duplicated subtrees push
    whole-stage codegen past Janino's 64 KB method ceiling and the whole
    projection silently falls back to interpreted eval (measured ~2x
    slower than even the HOF formulation). CollapseProject keeps the two
    projections separate because the staged aliases are non-cheap and
    multiply referenced.
    """
    import math

    step = cells.hexlite_step(res)
    n_lat, n_lon = cells.hexlite_dims(res)
    header = (cells.HEXLITE_MODE << 60) | (res << 56)
    theta = km / EARTH_RADIUS_KM  # angular radius, radians
    theta_deg = math.degrees(theta)
    cos_theta = math.cos(theta)
    lat_ring = int(math.floor(theta_deg / step)) + 1
    # 2*dj+1 consecutive lon indexes wrap to the full circle at this width
    dj_cap = (n_lon + 1) // 2
    # non-divisible grids (n_lon*step > 360) have one narrower seam cell at
    # the antimeridian; a span crossing it covers one more index than the
    # uniform-width count, so widen the margin by 1 there
    dj_margin = 1 if abs(n_lon * step - 360.0) < 1e-9 else 2

    lat, lon = F.col("lat"), F.col("lon")
    lat_idx = F.least(F.floor((lat + F.lit(90.0)) / F.lit(step)), F.lit(n_lat - 1)).cast("long")
    lon_idx = F.least(
        F.floor(F.pmod(lon + F.lit(180.0), F.lit(360.0)) / F.lit(step)), F.lit(n_lon - 1)
    ).cast("long")
    phi1 = F.radians(lat)
    sin1, cos1 = F.sin(phi1), F.cos(phi1)

    def _clamp(x, lo, hi):
        return F.greatest(lo, F.least(hi, x))

    # ---- projection 1: stage lat/lon indexes + per-band half-widths
    # (_dj_i is null when the band is out of range or unreachable)
    staged: dict[str, Column] = {"_lat_idx": lat_idx, "_lon_idx": lon_idx}
    band_ids = list(range(-lat_ring, lat_ring + 1))
    for i, di in enumerate(band_ids):
        band = lat_idx + F.lit(di)
        band_lo = band.cast("double") * F.lit(step) - F.lit(90.0)
        band_hi = F.least(band_lo + F.lit(step), F.lit(90.0))
        guard = (
            (band >= 0)
            & (band < n_lat)
            & (band_lo <= lat + F.lit(theta_deg))
            & (band_hi >= lat - F.lit(theta_deg))
        )
        if cos_theta <= 0.0:
            # radius >= quarter circumference: the cap covers every
            # longitude at every reachable band
            dj = F.lit(dj_cap)
        else:
            phi2 = _clamp(
                F.asin(_clamp(sin1 / F.lit(cos_theta), F.lit(-1.0), F.lit(1.0))),
                F.radians(band_lo),
                F.radians(band_hi),
            )
            f = (F.lit(cos_theta) - sin1 * F.sin(phi2)) / F.greatest(
                cos1 * F.cos(phi2), F.lit(1e-12)
            )
            dlon_deg = F.degrees(F.acos(_clamp(f, F.lit(-1.0), F.lit(1.0))))
            dj = F.least(
                F.floor(dlon_deg / F.lit(step)).cast("long") + F.lit(dj_margin),
                F.lit(dj_cap),
            )
        staged[f"_dj_{i}"] = F.when(guard, dj)
    st = df.withColumns(staged)

    # ---- projection 2: enumerate each band's consecutive-id runs
    per_band = []
    for i, di in enumerate(band_ids):
        dj = F.col(f"_dj_{i}")
        band = F.col("_lat_idx") + F.lit(di)
        base = F.lit(header) + F.shiftleft(band, 28)
        lo, hi = F.col("_lon_idx") - dj, F.col("_lon_idx") + dj
        cells_in_band = (
            F.when(dj.isNull(), F.array().cast("array<long>"))
            .when(
                F.lit(2) * dj + 1 >= n_lon,  # full circle, exactly once
                F.sequence(base, base + F.lit(n_lon - 1)),
            )
            .when((lo >= 0) & (hi <= n_lon - 1), F.sequence(base + lo, base + hi))
            .otherwise(  # antimeridian wrap: two runs of consecutive ids
                F.concat(
                    F.sequence(base + F.pmod(lo, F.lit(n_lon)), base + F.lit(n_lon - 1)),
                    F.sequence(base, base + F.pmod(hi, F.lit(n_lon))),
                )
            )
        )
        per_band.append(cells_in_band)
    return st.withColumn(out, F.flatten(F.array(*per_band))).drop(
        *[c for c in staged]
    )


def within_distance_join(
    left: DataFrame,
    right: DataFrame,
    km: float,
    res: int | None = None,
    max_abs_lat: float | None = None,
    explode_side: str = "right",
) -> DataFrame:
    """Distance-band range join: ALL (left_id, right_id) pairs within `km`,
    as a cell equi-join instead of a cross join (the geospatial range-join
    Spark lacks natively).

    left(left_id, lat, lon) x right(right_id, lat, lon) ->
    (left_id, right_id, dist_km_e3).

    Candidate generation is :func:`with_within_distance_candidate_cells` —
    per-row spherical-cap ring sizing, so recall is total at every latitude
    (over-the-pole pairs included) and equatorial rows pay only the handful
    of cells their own latitude requires instead of a global worst case.
    ``max_abs_lat`` is accepted for API compatibility and ignored: per-row
    sizing needs no data-extent hint.

    explode_side: which side pays the ring expansion — point pairs are
    within range iff one point's ring contains the other point's single
    cell, so the roles are symmetric and the ring should go on the SMALLER
    side (default "right", the dimension side by convention): the big side
    then does one cell encode per row and stays a narrow probe of the
    (ring-exploded, typically broadcast) small side, with zero shuffles
    and a small codegen footprint on the hot path.

    No pair dedup is needed in either orientation: a point joins on its
    SINGLE cell, and that cell appears at most once in any ring (bands are
    distinct, the runs within a band are disjoint, and the full-circle
    branch enumerates the circle exactly once), so (left_id, right_id)
    pairs are unique by construction — the old pair-dedup hash aggregate
    was also the stage that pushed whole-stage codegen past Janino's 64 KB
    ceiling.

    When NEITHER side is broadcastable (fact x fact radius query), use
    :func:`within_distance_join_shuffle` — same candidates, shuffled join
    with hot-cell salting.
    """
    res = _range_res(km, res)
    probe, ring = _range_probe_ring(left, right, km, res, explode_side)
    dist = haversine_km_col(F.col("llat"), F.col("llon"), F.col("rlat"), F.col("rlon"))
    return (
        probe.join(ring, "cell")
        .where(dist <= km)
        .select("left_id", "right_id", F.floor(dist * 1000).cast("long").alias("dist_km_e3"))
    )


def _sampled_hot_cells(
    probe: DataFrame,
    cell_col: str,
    hot_cell_threshold: int,
    n_salt: int,
    fraction: float,
) -> DataFrame:
    """Broadcast-small (cell, n_salt) list of hot join keys, estimated from
    a seeded sample (fraction=1.0 -> exact count). The cutoff is halved in
    sample space so sampling variance errs toward salting borderline cells
    (harmless: salting any cell is correct; missing a truly hot one is the
    only costly mistake, and at the default sizes that probability is ~0).
    localCheckpoint (eager) materializes the metadata-scale list ONCE — it
    is joined to BOTH sides, and without materialization each join re-runs
    the pre-pass scan."""
    if fraction >= 1.0:
        # exact mode: no sampling, no variance margin — a cell is hot iff
        # its TRUE count exceeds the threshold, bit-identical to a plain
        # `count > threshold` pre-pass
        src, cutoff = probe, float(hot_cell_threshold)
    else:
        src = probe.sample(fraction=fraction, seed=7)
        cutoff = max(1.0, hot_cell_threshold * fraction / 2.0)
    return (
        src.groupBy(cell_col).count()
        .where(F.col("count") > cutoff)
        .select(cell_col, F.lit(n_salt).alias("n_salt"))
        .localCheckpoint()
    )


def _range_res(km: float, res: int | None) -> int:
    if res is None:
        # coarsest-useful cells: edge >= km/2 keeps the ring rectangle small
        # (a fine grid at a large radius explodes the per-point cell count)
        res = 0
        while res < 10 and cells.hexlite_step(res + 1) * 111.0 >= km / 2.0:
            res += 1
    return res


def _range_probe_ring(
    left: DataFrame, right: DataFrame, km: float, res: int, explode_side: str
) -> tuple[DataFrame, DataFrame]:
    """Shared candidate construction of the two range-join strategies:
    the probe side carries its SINGLE cell, the other side explodes its
    per-row spherical-cap candidate ring. Together the two frames carry
    (left_id, llat, llon) and (right_id, rlat, rlon)."""
    if explode_side == "right":
        probe = left.select(
            "left_id", F.col("lat").alias("llat"), F.col("lon").alias("llon"),
            cells.hexlite_cell_col(F.col("lat"), F.col("lon"), res).alias("cell"),
        )
        ring = (
            with_within_distance_candidate_cells(
                right.select("right_id", "lat", "lon"), km, res
            )
            .select(
                "right_id", F.col("lat").alias("rlat"), F.col("lon").alias("rlon"),
                # explode_outer + post-filter, NOT explode: the non-outer
                # Generate makes InferFiltersFromGenerate push a
                # size(cells) > 0 filter below the staged projections,
                # re-substituting the whole candidate tree into one giant
                # (uncompilable, 25k-line) filter condition
                F.explode_outer("cells").alias("cell"),
            )
            .where(F.col("cell").isNotNull())
        )
    else:
        probe = right.select(
            "right_id", F.col("lat").alias("rlat"), F.col("lon").alias("rlon"),
            cells.hexlite_cell_col(F.col("lat"), F.col("lon"), res).alias("cell"),
        )
        ring = (
            with_within_distance_candidate_cells(
                left.select("left_id", "lat", "lon"), km, res
            )
            .select(
                "left_id", F.col("lat").alias("llat"), F.col("lon").alias("llon"),
                F.explode_outer("cells").alias("cell"),  # see note above
            )
            .where(F.col("cell").isNotNull())
        )
    return probe, ring


def within_distance_join_shuffle(
    left: DataFrame,
    right: DataFrame,
    km: float,
    res: int | None = None,
    hot_cell_threshold: int = 1_000_000,
    n_salt: int = 8,
    explode_side: str = "right",
    hotness_sample_fraction: float = 0.01,
) -> DataFrame:
    """BIG-BIG distance-band range join: identical semantics and output to
    :func:`within_distance_join`, but neither side need be broadcastable —
    the cell equi-join runs as a SHUFFLED join with explicit hot-cell
    salting (the same skew treatment as spatial_join.shuffle_pip_join).

    Strategy, mirroring the broadcast variant's candidate construction:

    * probe side encodes its single cell; the other side explodes its
      per-row spherical-cap candidate ring (shared `_range_probe_ring`
      kernel, so recall/precision are identical by construction);
    * a SAMPLED hotness pre-pass estimates probe rows per cell: salting is
      a performance decision, not a correctness one (any subset of cells
      may be salted and the join output is identical), so a 1% seeded
      sample detects every genuinely hot cell — a cell at the 1M default
      threshold yields ~10k sampled rows against a cutoff of 5k, missed
      with probability ~0 — at 1% of the full-scan cost. A full 100 TB
      count pre-pass would pay an O(distinct-cells) aggregation (measured
      ~38% of the whole join on unskewed inputs) to learn nothing;
    * probe rows in a hot cell scatter over `n_salt` sub-keys by id hash;
      ring rows for a hot cell replicate across all `n_salt` sub-keys —
      bounding any single task's probe volume at ~threshold/n_salt rows;
    * the (cell, salt) join is hinted shuffle_hash (no sort needed; the
      caller chose this variant precisely because the build side is too
      big to broadcast).

    hotness_sample_fraction=1.0 recovers the exact count pre-pass.

    PROBE-SIDE-ONLY salting invariant: the hotness pre-pass measures only
    the probe (single-cell) side, never the exploded ring side, and that is
    deliberate. Per-cell join work is probe_rows x ring_rows; salting the
    probe side splits that product across n_salt tasks regardless of which
    factor is large. A cell that is ring-hot but probe-cold contributes
    little total work (small probe factor), so measuring the ring side
    would add a pre-pass over the EXPLODED frame (x ring-size rows) to
    detect cells that never bottleneck a task. Do not "fix" this by
    sampling both sides — see test_pipeline_ops' pathological
    build-hot/probe-cold fixture pinning runtime sanity.

    Use :func:`within_distance_join` when one side is a broadcastable
    dimension (zero-shuffle narrow plan); use this when both sides are
    fact-scale (e.g. a 100 TB points x points radius query)."""
    res = _range_res(km, res)
    probe, ring = _range_probe_ring(left, right, km, res, explode_side)
    probe_id = "left_id" if explode_side == "right" else "right_id"

    hot = _sampled_hot_cells(
        probe, "cell", hot_cell_threshold, n_salt, hotness_sample_fraction
    )
    ring_salted = (
        ring.join(F.broadcast(hot), "cell", "left")
        .withColumn(
            "salt",
            F.explode(F.sequence(F.lit(0), F.coalesce(F.col("n_salt"), F.lit(1)) - 1)),
        )
        .drop("n_salt")
    )
    probe_salted = (
        probe.join(F.broadcast(hot), "cell", "left")
        .withColumn(
            "salt",
            F.when(F.col("n_salt").isNull(), F.lit(0)).otherwise(
                F.pmod(F.xxhash64(probe_id), F.col("n_salt")).cast("int")
            ),
        )
        .drop("n_salt")
    )
    dist = haversine_km_col(F.col("llat"), F.col("llon"), F.col("rlat"), F.col("rlon"))
    return (
        probe_salted.join(ring_salted.hint("shuffle_hash"), ["cell", "salt"])
        .where(dist <= km)
        .select("left_id", "right_id", F.floor(dist * 1000).cast("long").alias("dist_km_e3"))
    )
