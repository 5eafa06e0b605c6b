"""Clip-to-cell polygon covers: bounded geometry transport for the
shuffle PIP strategy (round-5 verdict #1, fix option (a)).

A 10^4-vertex boundary covering 10^5 grid cells must NOT ship its full
ring set once per covered cell — that is O(cells x vertices) shuffle
volume (~10 GB for one continental coastline at res 4). Instead each
covering cell carries only the polygon's geometry CLIPPED to that cell's
window: total transported edges are O(vertices + cells) (every original
edge appears in the few cells it crosses; interior cells degenerate to
the 4-edge window rectangle).

Correctness: Sutherland-Hodgman clipping of a simple ring against a
(slightly margined) cell window produces a closed polygon whose region
equals ring-region ∩ window, so for any probe point INSIDE the cell the
even-odd crossing parity of the clipped piece equals the original ring's
parity — the window's bridge edges supply exactly the crossings the
removed far geometry used to. Parity XORs across rings (holes,
multipolygon components) exactly as with full geometry. The margin keeps
probes that sit exactly ON a cell boundary (the float lattice does hit
j*step-180 at some resolutions) strictly interior to their cell's
window, away from the introduced bridge edges.

Cell windows are derived from the PROBE-side cell formula
(cells.hexlite_cell: lat_idx = min(floor((lat+90)/step), n_lat-1),
lon_idx = min(floor(mod(lon+180,360)/step), n_lon-1)) rather than from
any cover enumeration, so membership is exact at EVERY resolution —
including those where 360/step is non-integral and the +180-seam cell is
over-wide. A dateline-crossing ring (wide raw, narrow unwrapped —
geo/pip.py ring_wraps) is clipped in its unwrapped frame against BOTH
images of each raw cell's window (the window itself and the window
shifted +360); its pieces carry an explicit unwrap-probe flag, because a
clipped fragment no longer looks wrapping-shaped to the heuristic.

This runs once per polygon-snapshot on the DIM side (mapInPandas over
boundaries — embarrassingly parallel per polygon, tiny next to the
points table), which is also why Python is acceptable here: it is the
same once-per-snapshot prepass position as the PolygonIndex build.
"""

from __future__ import annotations

import numpy as np

from wikibrain_spark.geo import cells, pip

# window margin as a fraction of the cell step: large enough that no
# float-lattice probe coordinate can coincide with a bridge edge, small
# enough that margin-zone area is negligible (the clipped region may
# exceed the cell by the margin strip; that never changes parity for
# probes inside the cell)
MARGIN_FRAC = 1e-6


def clip_ring(ys: np.ndarray, xs: np.ndarray, y_lo: float, y_hi: float,
              x_lo: float, x_hi: float) -> tuple[np.ndarray, np.ndarray] | None:
    """Sutherland-Hodgman clip of one simple ring to an axis-aligned box.

    Returns (ys, xs) of the clipped closed ring, or None when the
    intersection is empty / degenerate (< 3 vertices). Vectorized per
    clip plane (4 planes); self-intersecting input is NOT supported
    (every generator in this repo emits simple rings)."""
    for vals_sel, bound, keep_ge in (
        (0, y_lo, True), (0, y_hi, False), (1, x_lo, True), (1, x_hi, False),
    ):
        a = ys if vals_sel == 0 else xs
        inside = (a >= bound) if keep_ge else (a <= bound)
        if inside.all():
            continue
        if not inside.any():
            return None
        nxt = np.roll(inside, -1)
        by, bx = np.roll(ys, -1), np.roll(xs, -1)
        bn = np.roll(a, -1)
        cross = inside != nxt
        # t is inf/nan on plane-parallel edges — they are never selected
        # by `cross`, but the arithmetic runs on the full arrays, so the
        # whole interpolation sits under errstate (np.where-style trap)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (bound - a) / (bn - a)
            cy = ys + t * (by - ys)
            cx = xs + t * (bx - xs)
        # per edge (v_i -> v_{i+1}): emit the crossing point when the edge
        # crosses the plane, then v_{i+1} when it is inside
        cnt = cross.astype(np.int64) + nxt.astype(np.int64)
        off = np.concatenate(([0], np.cumsum(cnt)))
        oy = np.empty(off[-1])
        ox = np.empty(off[-1])
        ci = off[:-1][cross]
        oy[ci], ox[ci] = cy[cross], cx[cross]
        vi = (off[:-1] + cross)[nxt]
        oy[vi], ox[vi] = by[nxt], bx[nxt]
        ys, xs = oy, ox
        if ys.size < 3:
            return None
    return ys, xs


def clipped_cell_cover(
    rings: list, res: int, strip_lo: int | None = None, strip_hi: int | None = None
) -> dict[int, list]:
    """Per-cell clipped geometry for one boundary's ring list.

    rings: [(ring_lat, ring_lon), ...] arrays (is_hole irrelevant —
    parity needs no roles). Returns {cell_id: [(ys, xs, unwrap_probe),
    ...]} where piece coords are in the ring's test frame and
    unwrap_probe says whether probe lons must shift +360 when < 0.

    Decomposition is strip-then-column: each ring is clipped once per
    latitude strip (O(vertices) per strip), then each small strip ring is
    clipped per longitude cell — total work O(vertices x strips +
    occupied cells), not O(vertices x cells).

    strip_lo/strip_hi (round 8): restrict the walk to latitude strips in
    [strip_lo, strip_hi] — the parallel-prepass seam. Every cell belongs
    to exactly one strip, so a partition of the strip range across
    workers yields each (cell) entry exactly once, with pieces in the
    same ring/strip/column order as the unrestricted call."""
    step = cells.hexlite_step(res)
    n_lat, n_lon = cells.hexlite_dims(res)
    hdr = (cells.HEXLITE_MODE << 60) | (res << 56)
    m = step * MARGIN_FRAC
    out: dict[int, list] = {}

    for ring in rings:
        la = np.asarray(ring[0], dtype=np.float64)
        lo = np.asarray(ring[1], dtype=np.float64)
        wraps = pip.ring_wraps(lo)
        xs_ring = pip.unwrap_lon(lo) if wraps else lo
        i0 = max(0, int(np.floor((la.min() + 90.0) / step)))
        i1 = min(n_lat - 1, int(np.floor((la.max() + 90.0) / step)))
        if strip_lo is not None:
            i0 = max(i0, int(strip_lo))
        if strip_hi is not None:
            i1 = min(i1, int(strip_hi))
        # candidate RAW lon cells: project the ring's x-range back through
        # the probe-side cell formula, mirroring hexlite_cover_bbox's two
        # branches EXACTLY so the clipped cover is a provable subset of the
        # bbox cover the semi-filter broadcasts (round-6 ADVICE: the old
        # non-wrapped branch skipped branch B when lon_max == +180, silently
        # relying on the half-open edge rule to keep a lon=+180 probe
        # outside). Branch A columns clip against the window itself; branch
        # B columns (unwrapped x >= 180, where raw probes arrive at x-360,
        # i.e. probe lons shift +360) clip against the window's +360 image.
        u_lo, u_hi = float(xs_ring.min()), float(xs_ring.max())
        cs: set[int] = set()
        shifted: set[int] = set()
        if u_lo < 180.0:  # branch A: probes keep their raw longitude
            c_a = int(np.floor((u_lo + 180.0) / step))
            c_b = int(np.floor((min(u_hi, np.nextafter(180.0, 0.0)) + 180.0) / step))
            cs.update(range(max(0, c_a), min(n_lon - 1, c_b) + 1))
        if u_hi >= 180.0:  # branch B: probes arrive at x - 360
            c_a = int(np.floor((max(u_lo, 180.0) - 180.0) / step))
            c_b = int(np.floor((u_hi - 180.0) / step))
            shifted.update(range(max(0, c_a), min(n_lon - 1, c_b) + 1))
        cols = sorted(cs | shifted)

        for i in range(i0, i1 + 1):
            y_lo = i * step - 90.0
            strip = clip_ring(la, xs_ring, y_lo - m, y_lo + step + m,
                              -1e30, 1e30)
            if strip is None:
                continue
            sy, sx = strip
            sx_min, sx_max = float(sx.min()), float(sx.max())
            for c in cols:
                x_lo = c * step - 180.0
                # each branch clips against ITS image of the raw cell
                # window in the ring's test frame: branch A the window
                # itself (probes keep their lon), branch B the +360 image
                # (raw < 0 probes arrive shifted +360 — and so does a raw
                # +180 probe, which encodes into the seam column j=0 and
                # keeps its lon, landing inside the +360 image directly)
                windows = []
                if c in cs:
                    windows.append((x_lo, x_lo + step, wraps))
                if c in shifted:
                    windows.append((x_lo + 360.0, x_lo + 360.0 + step, True))
                for w_lo, w_hi, unwrap_probe in windows:
                    if sx_max < w_lo - m or sx_min > w_hi + m:
                        continue
                    piece = clip_ring(sy, sx, -1e30, 1e30, w_lo - m, w_hi + m)
                    if piece is None:
                        continue
                    cell_id = hdr | (i << 28) | c
                    out.setdefault(cell_id, []).append((piece[0], piece[1], unwrap_probe))
    return out


def pack_pieces(pieces: list) -> np.ndarray:
    """Flat array<double> wire format, rings concatenated, each as
    [n_pts, unwrap_probe, lats..., lons...] — the shape
    spatial_join.unpack_rings reads (coords already in test frame)."""
    parts = []
    for ys, xs, wraps in pieces:
        parts.append(np.array([float(ys.size), 1.0 if wraps else 0.0]))
        parts.append(np.asarray(ys, dtype=np.float64))
        parts.append(np.asarray(xs, dtype=np.float64))
    return np.concatenate(parts) if parts else np.empty(0)
