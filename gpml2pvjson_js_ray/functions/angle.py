"""Angle algebra (radians), matching the reference spinoffs/Angle.ts
(itself based on the public Angles.js) — normalize to [0, 2π), minimal
angular distance, angle of a slope."""

from __future__ import annotations

import math

TAU = 2 * math.pi
SCALE = TAU


def _mod(x: float, m: float) -> float:
    return ((x % m) + m) % m


def radians_to_degrees(radians: float) -> float:
    return (180.0 / math.pi) * radians


def degrees_to_radians(degrees: float) -> float:
    return (math.pi / 180.0) * degrees


def normalize_half(n: float) -> float:
    """Normalize to [-π, π)."""
    h = SCALE / 2
    return _mod(n + h, SCALE) - h


def normalize(n: float) -> float:
    """Normalize to [0, 2π)."""
    return _mod(n, SCALE)


def distance(a: float, b: float) -> float:
    """Minimal angular distance between two angles (Angle.ts:122-133)."""
    h = SCALE / 2
    diff = normalize_half(a - b)
    if diff > h:
        diff = diff - SCALE
    return abs(diff)


def from_slope(p1, p2) -> float:
    """Angle of the line p1→p2, in [0, 2π) (Angle.ts:191-195)."""
    angle = (TAU + math.atan2(p2[1] - p1[1], p2[0] - p1[0])) % TAU
    return angle
