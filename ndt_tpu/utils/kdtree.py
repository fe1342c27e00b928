"""N-D AABB kd-tree (kd-tree.{h,c} rebuild, host side).

The reference's default culling structure: every object contributes an AABB
(from its bounding points +- radius, object.c:633-681); the build evaluates
candidate split planes at each item's lower-2eps / upper+2eps in every
dimension and keeps the best score ``n - (|left - right| + 2*straddling)``
(kdtree_split_score, kd-tree.c:294-313), recursing until no useful split.
Infinite objects are segregated and checked linearly (kd-tree.c:433-464).

On the TPU the brute-force megakernel with per-tile interval culling
(render/pallas_trace.py) plays the traversal's role -- this module provides
the same spatial index for host-side queries, scene statistics, and as the
planned second level of culling for scenes with thousands of objects: the
tree flattens to arrays (nodes/bounds/item lists) that a future kernel can
walk with a fixed-depth stack.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ndt_tpu.constants import EPSILON


@dataclasses.dataclass
class AABB:
    lower: np.ndarray
    upper: np.ndarray

    @classmethod
    def empty(cls, dim):
        return cls(np.full(dim, np.inf), np.full(dim, -np.inf))

    def add_point(self, p):
        self.lower = np.minimum(self.lower, p)
        self.upper = np.maximum(self.upper, p)

    def add(self, other: "AABB"):
        self.lower = np.minimum(self.lower, other.lower)
        self.upper = np.maximum(self.upper, other.upper)

    def intersect(self, o, v):
        """Slab test (aabb_intersect, kd-tree.c:84-127): returns
        (hit, t_low, t_high)."""
        tl, tu = -np.inf, np.inf
        for i in range(len(o)):
            if abs(v[i]) < EPSILON * EPSILON:
                if o[i] < self.lower[i] or o[i] > self.upper[i]:
                    return False, 0.0, 0.0
                continue
            t1 = (self.lower[i] - o[i]) / v[i]
            t2 = (self.upper[i] - o[i]) / v[i]
            if t1 > t2:
                t1, t2 = t2, t1
            tl = max(tl, t1)
            tu = min(tu, t2)
        return tu >= tl, tl, tu


@dataclasses.dataclass
class KdItem:
    bb: AABB
    obj_id: int


@dataclasses.dataclass
class KdNode:
    items: List[KdItem]
    dim: int = -1            # -1 => leaf
    boundary: float = 0.0
    left: Optional["KdNode"] = None
    right: Optional["KdNode"] = None


def item_from_bounds(bounds, obj_id) -> KdItem:
    """object_kdlist_add (object.c:633-681): AABB over the object's
    bounding points inflated by their radii."""
    dim = len(bounds[0][0])
    bb = AABB.empty(dim)
    for center, radius in bounds:
        r = abs(radius)
        bb.add_point(np.asarray(center) + r)
        bb.add_point(np.asarray(center) - r)
    return KdItem(bb, obj_id)


def _split_score(items, dim, pos):
    """kdtree_split_score (kd-tree.c:294-313)."""
    left = right = straddle = 0
    for it in items:
        if it.bb.upper[dim] < pos - EPSILON:
            left += 1
        elif it.bb.lower[dim] > pos + EPSILON:
            right += 1
        else:
            straddle += 1
    return len(items) - (abs(left - right) + 2 * straddle)


def build(items: List[KdItem], max_depth: int = 32,
          min_items: int = 4) -> KdNode:
    """kd_tree_split_node (kd-tree.c:315-419): exhaustive candidate splits
    at item bounds +-2eps, recurse while the best score improves."""
    node = KdNode(items=list(items))
    if len(items) <= min_items or max_depth <= 0:
        return node
    dim = len(items[0].bb.lower)
    best = (0, -1, 0.0)
    for d in range(dim):
        for it in items:
            for cand in (it.bb.lower[d] - 2 * EPSILON,
                         it.bb.upper[d] + 2 * EPSILON):
                score = _split_score(items, d, cand)
                if score > best[0]:
                    best = (score, d, cand)
    if best[1] < 0:
        return node
    _, d, pos = best
    left_items = [it for it in items if it.bb.lower[d] <= pos + EPSILON]
    right_items = [it for it in items if it.bb.upper[d] >= pos - EPSILON]
    if len(left_items) == len(items) and len(right_items) == len(items):
        return node  # no separation: leaf
    node.dim = d
    node.boundary = pos
    node.items = [it for it in items
                  if it.bb.lower[d] <= pos + EPSILON
                  and it.bb.upper[d] >= pos - EPSILON]  # straddlers
    node.left = build([it for it in left_items if it not in node.items],
                      max_depth - 1, min_items)
    node.right = build([it for it in right_items if it not in node.items],
                       max_depth - 1, min_items)
    return node


def query_ray(node: KdNode, o, v, out=None) -> List[int]:
    """Candidate object ids along a ray, near-to-far-ish (kd_node_intersect
    traversal shape, kd-tree.c:482-568); duplicates removed like the
    obj_mask dedup (object.c:706-713)."""
    if out is None:
        out = []
    if node is None:
        return out
    for it in node.items:
        hit, tl, tu = it.bb.intersect(o, v)
        if hit and tu >= 0:
            if it.obj_id not in out:
                out.append(it.obj_id)
    if node.dim >= 0:
        near, far = node.left, node.right
        if v[node.dim] < 0:
            near, far = far, near
        query_ray(near, o, v, out)
        query_ray(far, o, v, out)
    return out


def flatten(node: KdNode):
    """Linearize to arrays for a future in-kernel traversal: returns
    (node_dims, boundaries, child_indices [n,2], item_offsets, item_ids)."""
    dims, bounds, children, offsets, ids = [], [], [], [], []

    def walk(n):
        idx = len(dims)
        dims.append(n.dim)
        bounds.append(n.boundary)
        children.append([-1, -1])
        offsets.append((len(ids), len(n.items)))
        ids.extend(it.obj_id for it in n.items)
        if n.dim >= 0:
            children[idx][0] = walk(n.left)
            children[idx][1] = walk(n.right)
        return idx

    walk(node)
    return (np.array(dims, np.int32), np.array(bounds, np.float64),
            np.array(children, np.int32), np.array(offsets, np.int32),
            np.array(ids, np.int32))


# --------------------------------------------------------------------------
# C-exact build: replicates kd_tree_split_node (kd-tree.c:315-419) literally
# -- straddlers duplicated into BOTH children, unlimited recursion
# (ndt.c builds with levels_remaining = min_per_node = -1), candidate order
# (dim-major, item order, lower then upper), strict score improvement -- so
# the leaf CELL geometry matches the reference binary.  Used by the scene
# compiler to gate orthotope EPSILON-shell hits exactly like the C's
# traversal does (an object is only tested by rays that visit a leaf cell
# containing it).


def build_c_exact(lowers: np.ndarray, uppers: np.ndarray):
    """lowers/uppers: [n, D] item AABBs (inverted rows = the reference's
    never-bounded infinite cluster children, kd-tree.c:16-21).  Returns
    cells: list over items of [k, D, 2] leaf-cell clip boxes (+-inf where
    unbounded).

    Runs the native builder (ndt_tpu/native/kdsplit.cc, identical f64
    arithmetic, ~100x faster at hundreds of objects) when available; the
    Python recursion below is the reference implementation and fallback."""
    n, dim = lowers.shape
    cells = [[] for _ in range(n)]
    if n == 0:
        return cells

    from ndt_tpu import native

    nat = native.kd_cells(lowers, uppers, EPSILON)
    if nat is not None:
        boxes, items = nat
        for b, i in zip(boxes, items):
            cells[int(i)].append(b)
        return cells

    def split(idx, cell_lo, cell_hi):
        lo = lowers[idx]
        hi = uppers[idx]
        best_score = -np.inf
        found = None
        for d in range(dim):
            cands = np.concatenate([lo[:, d] - 2 * EPSILON,
                                    hi[:, d] + 2 * EPSILON])
            # evaluate in the C's scan order: item-major, lower before upper
            order = np.empty(2 * len(idx), np.intp)
            order[0::2] = np.arange(len(idx))
            order[1::2] = np.arange(len(idx)) + len(idx)
            for ci in order:
                pos = cands[ci]
                left = int((hi[:, d] < pos - EPSILON).sum())
                right = int((lo[:, d] > pos + EPSILON).sum())
                if left == 0 or right == 0:
                    continue
                straddle = len(idx) - left - right
                score = len(idx) - (abs(left - right) + 2 * straddle)
                if score > best_score:
                    best_score = score
                    found = (d, pos)
        if found is None:
            box = np.stack([cell_lo, cell_hi], axis=-1)
            for i in idx:
                cells[i].append(box)
            return
        d, pos = found
        left_m = lo[:, d] <= pos + EPSILON     # iu < pos-e OR straddle
        right_m = hi[:, d] >= pos - EPSILON    # il > pos+e OR straddle
        l_hi = cell_hi.copy()
        l_hi[d] = min(l_hi[d], pos + EPSILON)
        r_lo = cell_lo.copy()
        r_lo[d] = max(r_lo[d], pos - EPSILON)
        split(idx[left_m], cell_lo, l_hi)
        split(idx[right_m], r_lo, cell_hi)

    split(np.arange(n),
          np.full(dim, -np.inf), np.full(dim, np.inf))
    return cells


def format_tree(node: KdNode, depth: int = 0) -> str:
    """kd_tree_print equivalent (kd-tree.c:227-292): indented dump of
    split planes and leaf item ids."""
    pad = "  " * depth
    if node is None:
        return pad + "(empty)"
    ids = [it.obj_id for it in node.items]
    if node.dim < 0:
        return f"{pad}leaf: {len(ids)} items {ids}"
    out = [f"{pad}split dim {node.dim} at {node.boundary:g}"
           + (f", straddlers {ids}" if ids else "")]
    out.append(format_tree(node.left, depth + 1))
    out.append(format_tree(node.right, depth + 1))
    return "\n".join(out)
