"""Douglas-Peucker ring simplification: tolerance-bounded vertex
reduction for high-vertex boundary snapshots.

A 100 TB pipeline rarely needs every one of an OSM coastline's 10^6
vertices for coarse containment/QA queries; simplifying the DIM side
once per snapshot shrinks every downstream term that is linear in
vertices — clip prepass, transported clipped edges, per-cell refine
folds — by the reduction factor. This is the engine-side analogue of
the zoom-level generalization tile servers apply before rendering.

The kernel is the SEGMENT-distance Douglas-Peucker variant (distance to
the clamped chord, not the infinite line), which carries the strong
guarantee the tests pin: every DROPPED vertex lies within `tolerance`
of the simplified chain, so the simplified ring's boundary is a
Hausdorff-(<= tolerance) approximation of the original. Closed rings
are split at vertex 0 and the vertex farthest from it (the standard
ring adaptation — two open chains whose anchors cannot coincide), and
dateline-crossing rings are simplified in their unwrapped frame (the
same frame every other geometry kernel tests in; geo/pip.py docstring)
then mapped back to [-180, 180).

APPROXIMATE BY DESIGN: containment within `tolerance` of a boundary can
flip, and Douglas-Peucker is not topology-safe in pathological cases
(a simplified ring can self-intersect; a hole simplified outward can
graze its shell). Callers choose `tolerance` against their cell size —
the driver query uses it only as a PIP input whose oracle re-derives
parity from the STAGED simplified edges, the same staged-signature seam
the MinHash/ANN oracles use.

Reference context: the reference engine has no polygon pipeline at all
(wikimedia_link_issue_reporter.py works on point distances), so this is
north-rule surface for the geospatial tier, like the clip transport.
"""

from __future__ import annotations

import numpy as np

from wikibrain_spark.geo import pip


def dp_chain(ys: np.ndarray, xs: np.ndarray, idx: np.ndarray,
             keep: np.ndarray, tol: float) -> None:
    """Mark kept vertices of one OPEN chain (ys[idx], xs[idx]) in-place.

    idx's endpoints must already be marked. Iterative stack (no Python
    recursion limit at 10^6 vertices); each split computes the clamped
    segment distance of every interior vertex vectorized."""
    tol2 = tol * tol
    stack = [(0, len(idx) - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ia, ib = idx[a], idx[b]
        y0, x0, y1, x1 = ys[ia], xs[ia], ys[ib], xs[ib]
        mid = idx[a + 1:b]
        dy, dx = y1 - y0, x1 - x0
        l2 = dy * dy + dx * dx
        my, mx = ys[mid] - y0, xs[mid] - x0
        if l2 > 0.0:
            t = np.clip((my * dy + mx * dx) / l2, 0.0, 1.0)
            d2 = (my - t * dy) ** 2 + (mx - t * dx) ** 2
        else:
            d2 = my * my + mx * mx
        j = int(np.argmax(d2))
        if d2[j] > tol2:
            keep[mid[j]] = True
            stack.append((a, a + 1 + j))
            stack.append((a + 1 + j, b))


def dp_simplify_ring(ys: np.ndarray, xs: np.ndarray, tol: float
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Simplify one closed ring (implicit last->first edge). Returns the
    kept vertices in original order; never fewer than 3 (a ring that
    collapses below a triangle keeps its two anchors plus the farthest
    remaining vertex so downstream parity folds stay well-formed)."""
    n = ys.size
    if n <= 4:
        return ys, xs
    d2_from0 = (ys - ys[0]) ** 2 + (xs - xs[0]) ** 2
    k = int(np.argmax(d2_from0))
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[k] = True
    dp_chain(ys, xs, np.arange(0, k + 1), keep, tol)
    dp_chain(ys, xs, np.concatenate([np.arange(k, n), [0]]), keep, tol)
    if int(keep.sum()) < 3:
        # anchors only: re-admit the vertex farthest from the 0-k chord
        dy, dx = ys[k] - ys[0], xs[k] - xs[0]
        l2 = dy * dy + dx * dx
        my, mx = ys - ys[0], xs - xs[0]
        t = np.clip((my * dy + mx * dx) / l2, 0.0, 1.0) if l2 > 0 else 0.0
        d2 = (my - t * dy) ** 2 + (mx - t * dx) ** 2
        d2[keep] = -1.0
        keep[int(np.argmax(d2))] = True
    # round-7 ADVICE: a fully degenerate ring (all vertices coincident)
    # yields k == 0, so the anchors are ONE vertex and the re-admit adds
    # exactly one more — keep admitting (in original order) until the
    # documented never-fewer-than-3 guarantee holds
    while int(keep.sum()) < 3:
        keep[int(np.argmax(~keep))] = True
    return ys[keep], xs[keep]


def simplify_rings_pd(rings: list, tol: float) -> list:
    """Simplify one boundary's ring records (the mapInPandas body).
    Wrapped rings simplify in the unwrapped frame, then map back."""
    out = []
    for r in rings:
        la = np.asarray(r["ring_lat"], dtype=np.float64)
        lo = np.asarray(r["ring_lon"], dtype=np.float64)
        wraps = pip.ring_wraps(lo)
        xs = pip.unwrap_lon(lo) if wraps else lo
        sy, sx = dp_simplify_ring(la, xs, tol)
        if wraps:
            sx = ((sx + 180.0) % 360.0) - 180.0
        out.append({
            "ring_lat": sy.tolist(),
            "ring_lon": sx.tolist(),
            "is_hole": bool(r["is_hole"]),
        })
    return out
