"""Lloyd's k-means over N-D points + cluster-hierarchy builder.

Rebuild of kmeans.{h,c} (host-side Lloyd iteration, converging when the
total centroid movement falls to ~k, kmeans.c:117-129) and the ``cluster``
object's recursive grouping of children by bounding-sphere center
(objects/cluster.c:82-190).  Runs once at scene-prep; the resulting tree is
a culling hierarchy the compiler can exploit (grouped bounding spheres), and
is exercised by the 5-D cluster benchmark config (BASELINE.md #4).
"""

from __future__ import annotations

from typing import List

import numpy as np


def kmeans(points: np.ndarray, k: int, max_iters: int = 100,
           seed: int = 0) -> np.ndarray:
    """Cluster ``[n, D]`` points into k groups; returns ``[n]`` labels.

    Follows kmeans.c: centroids seeded from the points themselves, Lloyd
    updates until total centroid movement <= k (kmeans.c:123) or the
    iteration cap."""
    points = np.asarray(points, dtype=np.float64)
    n = len(points)
    k = min(k, n)
    rng = np.random.RandomState(seed)
    centers = points[rng.choice(n, size=k, replace=False)].copy()
    labels = np.zeros(n, dtype=np.int64)
    for _ in range(max_iters):
        d2 = ((points[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        labels = d2.argmin(axis=1)
        moved = 0.0
        for j in range(k):
            mask = labels == j
            if mask.any():
                new_c = points[mask].mean(axis=0)
                moved += float(np.linalg.norm(new_c - centers[j]))
                centers[j] = new_c
        if moved <= k:
            break
    return labels


def build_cluster_tree(dim: int, objects: List, k: int, _depth: int = 0):
    """cluster.c:82-190: recursively k-means the children's bounding-sphere
    centers into <=k sub-clusters, stopping when lists are small or a split
    fails to separate.  Returns a 'cluster' Object wrapping ``objects``."""
    from ndt_tpu.scene.model import Object

    root = Object(dim, "cluster", f"cluster_d{_depth}")
    root.add_flag(k)
    if len(objects) <= k or _depth > 16:
        for o in objects:
            root.add_obj(o)
        return root

    centers = []
    for o in objects:
        if o.bounds_radius is None:
            o.get_bounds()
        centers.append(o.bounds_center)
    labels = kmeans(np.stack(centers), k)
    groups = [[o for o, l in zip(objects, labels) if l == j] for j in range(k)]
    groups = [g for g in groups if g]
    if len(groups) <= 1:  # split failed to separate anything
        for o in objects:
            root.add_obj(o)
        return root
    for g in groups:
        if len(g) == 1:
            root.add_obj(g[0])
        else:
            root.add_obj(build_cluster_tree(dim, g, k, _depth + 1))
    return root
