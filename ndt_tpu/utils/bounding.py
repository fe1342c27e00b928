"""Bounding spheres (bounding.{h,c} rebuild, host side).

The device-side cull test (the vectorized version of
vect_bounding_sphere_intersect, bounding.c:34-85) lives in render/trace.py;
this module computes the spheres at scene-prep time: centroid seed +
Nelder-Mead refinement of the minimal enclosing sphere with fallback to the
centroid fit when NM fails to improve (bounds_list_optimal,
bounding.c:177-240).  A larger-than-minimal sphere only costs cull
efficiency, never correctness, so host float64 here is plenty.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ndt_tpu.constants import EPSILON
from ndt_tpu.utils.nelder_mead import NelderMead

Bound = Tuple[np.ndarray, float]  # (center, radius); radius may be 0


def centroid(points: Sequence[Bound]) -> np.ndarray:
    """bounds_list_centroid (bounding.c:143-159)."""
    return np.mean([c for c, _ in points], axis=0)


def radius_about(points: Sequence[Bound], center: np.ndarray) -> float:
    """bounds_list_radius (bounding.c:161-175): max over points of
    |center - p| (+ p's own radius when positive)."""
    cs = np.stack([c for c, _ in points])
    rs = np.asarray([r for _, r in points])
    d = np.linalg.norm(center[None, :] - cs, axis=1)
    d = np.where(rs > 0.0, d + rs, d)
    best = float(d.max())
    return max(best, -1.0)


def optimal_bounding_sphere(points: Sequence[Bound]) -> Tuple[np.ndarray, float]:
    """bounds_list_optimal (bounding.c:177-240): NM-minimize the enclosing
    radius over the center, <=1000 iterations, reverting to the centroid
    seed if the result regressed by more than EPSILON."""
    points = [(np.asarray(c, dtype=np.float64), float(r)) for c, r in points]
    if len(points) == 1:
        return points[0][0].copy(), points[0][1]

    from ndt_tpu import native

    nat = native.optimal_sphere(
        np.stack([c for c, _ in points]),
        np.asarray([r for _, r in points]), EPSILON)
    if nat is not None:
        return nat

    seed = centroid(points)
    seed_radius = radius_about(points, seed)

    nm = NelderMead(len(seed)).set_seed(seed)
    while not nm.done(EPSILON, 1000):
        x = nm.next_point()
        nm.add_result(x, radius_about(points, x))
    best = nm.best_point()
    best_radius = radius_about(points, best)
    if best_radius - seed_radius > EPSILON:
        return seed, seed_radius
    return best, best_radius
