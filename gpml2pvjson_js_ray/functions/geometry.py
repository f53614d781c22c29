"""Edge geometry: sides, orientations, polyline path position.

Re-expresses the reference geom-utils.ts:53-85,213-301,587-594 plus the
SmartPath position logic (geom-utils.ts:139-182). SVG coordinate system:
origin top-left, +x right, +y down, positive angle clockwise from +x.
"""

from __future__ import annotations

import math

from .angle import from_slope, normalize

# side → unit orientation vector (geom-utils.ts:53-58)
START_SIDE_TO_ORIENTATION_MAP = {
    "right": (1, 0),
    "bottom": (0, 1),
    "left": (-1, 0),
    "top": (0, -1),
}

# [{sideAttachedTo, orientation, angle}] in insertion order
# (geom-utils.ts:76-85)
START_SEGMENT_DETAILS_MAPS = [
    {
        "sideAttachedTo": side,
        "orientation": orientation,
        "angle": normalize(math.atan2(orientation[1], orientation[0])),
    }
    for side, orientation in START_SIDE_TO_ORIENTATION_MAP.items()
]


def cross_product(u, v) -> float:
    return u[0] * v[1] - v[0] * u[1]


def flip_orientation(orientation):
    return [-1 * s for s in orientation]


def get_start_side_by_orientation(orientation) -> str:
    ox, oy = orientation[0], orientation[1]
    if abs(ox) > abs(oy):
        return "right" if ox > 0 else "left"
    return "bottom" if oy > 0 else "top"


def _sign(x: float) -> int:
    return (x > 0) - (x < 0)


def same_side(p1, p2, a, b) -> bool:
    """Whether the referenced edge's endpoints p1,p2 are on the same side of
    segment a→b (geom-utils.ts:587-594)."""
    b_minus_a = (b["x"] - a["x"], b["y"] - a["y"])
    p1_minus_a = (p1["x"] - a["x"], p1["y"] - a["y"])
    p2_minus_a = (p2["x"] - a["x"], p2["y"] - a["y"])
    return _sign(cross_product(b_minus_a, p1_minus_a)) == \
        _sign(cross_product(b_minus_a, p2_minus_a))


def validate_orientation(orientation) -> bool:
    """orientation is a 2-vector of finite numbers (edge/orientation.ts:191-193)."""
    if not orientation or len(orientation) < 2:
        return False
    try:
        return math.isfinite(orientation[0]) and math.isfinite(orientation[1])
    except TypeError:
        return False


def _curved_samples(pts, samples_per_seg: int = 32):
    """Sample a smoothed curve through `pts`: quadratic Bézier chain with
    the original points as control points and segment midpoints as knots
    (the classic polyline smoothing scheme kaavio-style curved edge
    drawers use). Returns a list of (x, y) samples."""
    n = len(pts)
    if n < 3:
        return pts
    mids = [((pts[i][0] + pts[i + 1][0]) / 2,
             (pts[i][1] + pts[i + 1][1]) / 2) for i in range(n - 1)]
    out = [pts[0], mids[0]]
    for i in range(1, n - 1):
        p0, c, p1 = mids[i - 1], pts[i], mids[i]
        for k in range(1, samples_per_seg + 1):
            t = k / samples_per_seg
            x = (1 - t) ** 2 * p0[0] + 2 * (1 - t) * t * c[0] + t ** 2 * p1[0]
            y = (1 - t) ** 2 * p0[1] + 2 * (1 - t) * t * c[1] + t ** 2 * p1[1]
            out.append((x, y))
    out.append(pts[-1])
    return out


def path_position(points, fraction: float, draw_as: str | None = None):
    """(x, y, tangent angle) at arc-length `fraction` ∈ [0,1] along the
    polyline through `points` (list of {"x","y"} dicts).

    Stands in for the reference's SmartPath.position (geom-utils.ts:157-182),
    which delegates to kaavio edge drawers; with all implicit points made
    explicit, Straight/Segmented/Elbow paths are exactly this polyline.
    CurvedLine paths are smoothed with a midpoint quadratic-Bézier chain
    before sampling (matches the kaavio curved drawer's shape closely
    enough for the tangent-based orientation scoring)."""
    pts = [(p["x"], p["y"]) for p in points]
    if draw_as == "CurvedLine" and len(pts) >= 3:
        pts = _curved_samples(pts)
    if len(pts) < 2:
        x, y = pts[0] if pts else (0.0, 0.0)
        return x, y, 0.0
    seg_lengths = []
    total = 0.0
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        d = math.hypot(x1 - x0, y1 - y0)
        seg_lengths.append(d)
        total += d
    if total == 0:
        x, y = pts[0]
        return x, y, 0.0
    target = max(0.0, min(1.0, fraction)) * total
    acc = 0.0
    for (x0, y0), (x1, y1), d in zip(pts, pts[1:], seg_lengths):
        if acc + d >= target or (x1, y1) == pts[-1]:
            t = 0.0 if d == 0 else (target - acc) / d
            x = x0 + t * (x1 - x0)
            y = y0 + t * (y1 - y0)
            angle = normalize(math.atan2(y1 - y0, x1 - x0))
            return x, y, angle
        acc += d
    x, y = pts[-1]
    return x, y, 0.0


def vector_sum_angle(p0, p1) -> float:
    """Angle of the straight vector p0→p1 (SmartVector, geom-utils.ts:125-137)."""
    return from_slope((p0["x"], p0["y"]), (p1["x"], p1["y"]))
