"""Point-in-polygon kernels + a grid-bucketed polygon index (STRtree-lite).

Vectorized even-odd (crossing-number) test in NumPy. Edge rule: a point
exactly on a horizontal edge, or on the right/top boundary, is OUTSIDE;
points on the left/bottom crossing are INSIDE — the standard half-open
rule, so every point lands in at most one of two polygons sharing an edge.
Deterministic; the synthetic-fixture generator uses this same kernel as
the ground-truth oracle (FIXTURES.md §3 tie rule).

The index buckets polygon bboxes into hexlite cells at a chosen resolution;
lookup is O(1) per point + exact tests against only the bucket's polygons.
This is the worker-side structure the broadcast spatial join ships: it is
built once per Python worker from broadcast arrays (SURVEY.md U4).
"""

from __future__ import annotations

import numpy as np

from wikibrain_spark.geo import cells


def points_in_ring(lat: np.ndarray, lon: np.ndarray, ring_lat: np.ndarray, ring_lon: np.ndarray) -> np.ndarray:
    """Even-odd test of N points against one closed ring (M vertices).

    Vectorized over points x edges; memory O(N*M) per call — callers chunk
    points (the mapInPandas batch is the chunk).
    """
    y0, x0 = ring_lat, ring_lon
    y1, x1 = np.roll(ring_lat, -1), np.roll(ring_lon, -1)
    y = lat[:, None]
    x = lon[:, None]
    crosses = (y0[None, :] > y) != (y1[None, :] > y)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        x_at_y = (x1 - x0)[None, :] * (y - y0[None, :]) / (y1 - y0)[None, :] + x0[None, :]
    hits = crosses & (x < x_at_y)
    return hits.sum(axis=1) % 2 == 1


class PolygonIndex:
    """Grid-bucketed polygon set for batched point lookups.

    Construct from parallel arrays (pickles cheaply for Spark broadcast):
      poly_ids  : int64[P]
      ring_lats : list of float64[M_p]
      ring_lons : list of float64[M_p]
    """

    def __init__(self, poly_ids, ring_lats, ring_lons, res: int = 4):
        self.poly_ids = np.asarray(poly_ids, dtype=np.int64)
        self.ring_lats = [np.asarray(r, dtype=np.float64) for r in ring_lats]
        self.ring_lons = [np.asarray(r, dtype=np.float64) for r in ring_lons]
        self.res = res
        self.bbox = np.array(
            [
                (la.min(), la.max(), lo.min(), lo.max())
                for la, lo in zip(self.ring_lats, self.ring_lons)
            ],
            dtype=np.float64,
        ).reshape(len(self.poly_ids), 4)
        self.buckets: dict[int, list[int]] = {}
        for p, (lat_min, lat_max, lon_min, lon_max) in enumerate(self.bbox):
            for c in cells.hexlite_cover_bbox(lat_min, lat_max, lon_min, lon_max, res):
                self.buckets.setdefault(int(c), []).append(p)

    def candidate_polys(self, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
        """Distinct polygon positions whose bucket any point touches."""
        point_cells = cells.hexlite_cell(lat, lon, self.res)
        cand: set[int] = set()
        for c in np.unique(point_cells):
            cand.update(self.buckets.get(int(c), ()))
        return np.fromiter(cand, dtype=np.int64) if cand else np.empty(0, dtype=np.int64)

    def query_batch(self, lat: np.ndarray, lon: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All (point_idx, poly_id) containment pairs for a batch of points.

        bbox prefilter then exact ring test, polygon-at-a-time (vectorized
        over the batch's points — the batch is the Arrow batch).
        """
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        out_pt: list[np.ndarray] = []
        out_poly: list[np.ndarray] = []
        for p in self.candidate_polys(lat, lon):
            lat_min, lat_max, lon_min, lon_max = self.bbox[p]
            m = (lat >= lat_min) & (lat <= lat_max) & (lon >= lon_min) & (lon <= lon_max)
            if not m.any():
                continue
            idx = np.nonzero(m)[0]
            inside = points_in_ring(lat[idx], lon[idx], self.ring_lats[p], self.ring_lons[p])
            hit = idx[inside]
            if hit.size:
                out_pt.append(hit)
                out_poly.append(np.full(hit.size, self.poly_ids[p], dtype=np.int64))
        if not out_pt:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(out_pt), np.concatenate(out_poly)
