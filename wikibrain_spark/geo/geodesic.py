"""Vectorized great-circle distance kernels + matching Spark/SQL expressions.

The reference computes element<->wikidata distances with geopy's Karney
geodesic (wikimedia_link_issue_reporter.py:1368-1376). We use spherical
haversine (WGS-84 mean radius), vectorized; the <=0.5% difference vs Karney
only matters at classification thresholds, and our fixtures are generated
with THIS kernel as ground truth, so the engine/oracle/test trio is exact.

Three co-equal implementations (NumPy / Spark Column / SQL string) must
agree to float64 round-off; tests cover it.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean radius, same constant everywhere


def haversine_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.minimum(1.0, np.sqrt(h)))


def haversine_km_col(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Native Column expression — JVM-side, whole-stage codegen."""
    rlat1, rlon1, rlat2, rlon2 = (F.radians(c) for c in (lat1, lon1, lat2, lon2))
    h = (
        F.pow(F.sin((rlat2 - rlat1) / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin((rlon2 - rlon1) / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.least(F.lit(1.0), F.sqrt(h)))


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Equivalent ANSI SQL (DuckDB oracle)."""
    return (
        f"(2.0 * {EARTH_RADIUS_KM!r} * asin(least(1.0, sqrt("
        f"pow(sin((radians({lat2}) - radians({lat1})) / 2), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin((radians({lon2}) - radians({lon1})) / 2), 2)))))"
    )


def distance_human_string_col(dist_km: Column) -> Column:
    """Reference's km/m cutoff formatting (wikimedia_link_issue_reporter.py:1362-1366):
    > 3 km -> '<int> km', else '<int> m'."""
    return F.when(
        dist_km > 3, F.concat(dist_km.cast("int").cast("string"), F.lit(" km"))
    ).otherwise(F.concat((dist_km * 1000).cast("int").cast("string"), F.lit(" m")))
