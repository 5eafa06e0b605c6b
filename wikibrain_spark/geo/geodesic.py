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


# --------------------------------------------------------------- ellipsoidal
#
# The reference measures distances with geopy's Karney geodesic on WGS-84
# (wikimedia_link_issue_reporter.py:1368-1376). geographiclib is not in this
# container, so the ellipsoidal kernel is a vectorized NumPy implementation
# of the Vincenty inverse (T. Vincenty 1975, "Direct and inverse solutions of
# geodesics on the ellipsoid" — public domain algorithm). Where Vincenty
# converges it agrees with Karney/geographiclib to < 0.5 mm; it fails to
# converge only for nearly-antipodal pairs (within ~0.5 deg of the antipode,
# i.e. separations ~19,900+ km), where this implementation falls back to
# spherical haversine and flags the row. Every reference distance check
# operates at <= tens of km (the 20 km J13 threshold), five orders of
# magnitude away from the fallback regime, so the kernel is Karney-exact
# wherever the reference consults it. Measured haversine-vs-ellipsoid delta
# at the 20 km threshold: see tests/test_geodesic_kernels.py (documented
# max ~0.11 km = ~0.56%, the meridional-flattening bound).

WGS84_A_KM = 6378.137
WGS84_F = 1.0 / 298.257223563
WGS84_B_KM = WGS84_A_KM * (1.0 - WGS84_F)


def vincenty_km(
    lat1, lon1, lat2, lon2, max_iter: int = 200, tol: float = 1e-12
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized WGS-84 Vincenty inverse -> (distance_km, converged_mask).

    Non-converged rows (nearly antipodal) carry the haversine fallback
    distance and converged_mask=False so callers can decide.
    """
    f = WGS84_F
    lat1, lon1, lat2, lon2 = (np.asarray(a, dtype=np.float64) for a in (lat1, lon1, lat2, lon2))
    phi1, phi2 = np.radians(lat1), np.radians(lat2)
    L = np.radians(lon2 - lon1)
    U1 = np.arctan((1.0 - f) * np.tan(phi1))
    U2 = np.arctan((1.0 - f) * np.tan(phi2))
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = L.copy()
    sin_sigma = np.zeros_like(lam)
    cos_sigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    cos_sq_alpha = np.ones_like(lam)
    cos2sm = np.zeros_like(lam)
    converged = np.zeros(lam.shape, dtype=bool)

    for _ in range(max_iter):
        sin_lam, cos_lam = np.sin(lam), np.cos(lam)
        sin_sigma = np.sqrt(
            (cosU2 * sin_lam) ** 2 + (cosU1 * sinU2 - sinU1 * cosU2 * cos_lam) ** 2
        )
        cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cos_lam
        sigma = np.arctan2(sin_sigma, cos_sigma)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(sin_sigma > 0, cosU1 * cosU2 * sin_lam / sin_sigma, 0.0)
        cos_sq_alpha = 1.0 - sin_alpha**2
        with np.errstate(divide="ignore", invalid="ignore"):
            cos2sm = np.where(
                cos_sq_alpha > 0, cos_sigma - 2.0 * sinU1 * sinU2 / cos_sq_alpha, 0.0
            )
        C = f / 16.0 * cos_sq_alpha * (4.0 + f * (4.0 - 3.0 * cos_sq_alpha))
        lam_new = L + (1.0 - C) * f * sin_alpha * (
            sigma + C * sin_sigma * (cos2sm + C * cos_sigma * (-1.0 + 2.0 * cos2sm**2))
        )
        step_converged = np.abs(lam_new - lam) < tol
        lam = np.where(converged, lam, lam_new)
        converged = converged | step_converged
        if converged.all():
            break

    u_sq = cos_sq_alpha * (WGS84_A_KM**2 - WGS84_B_KM**2) / WGS84_B_KM**2
    A = 1.0 + u_sq / 16384.0 * (4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
    B = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    delta_sigma = B * sin_sigma * (
        cos2sm
        + B / 4.0 * (
            cos_sigma * (-1.0 + 2.0 * cos2sm**2)
            - B / 6.0 * cos2sm * (-3.0 + 4.0 * sin_sigma**2) * (-3.0 + 4.0 * cos2sm**2)
        )
    )
    dist = WGS84_B_KM * A * (sigma - delta_sigma)
    # coincident (or numerically coincident) points: distance 0, converged
    coincident = sin_sigma == 0.0
    converged = converged | coincident
    dist = np.where(coincident, 0.0, dist)
    if not converged.all():
        dist = np.where(converged, dist, haversine_km(lat1, lon1, lat2, lon2))
    return dist, converged


def ellipsoidal_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    """WGS-84 ellipsoidal distance (Vincenty, haversine fallback on the
    nearly-antipodal non-convergence set). The `karney`-parity kernel."""
    return vincenty_km(lat1, lon1, lat2, lon2)[0]


GEODESIC_KERNELS = {"haversine": haversine_km, "ellipsoidal": ellipsoidal_km}


def distance_human_string_col(dist_km: Column) -> Column:
    """Reference's km/m cutoff formatting (wikimedia_link_issue_reporter.py:1362-1366):
    > 3 km -> '<int> km', else '<int> m'."""
    return F.when(
        dist_km > 3, F.concat(dist_km.cast("int").cast("string"), F.lit(" km"))
    ).otherwise(F.concat((dist_km * 1000).cast("int").cast("string"), F.lit(" m")))
