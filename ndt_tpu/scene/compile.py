"""Scene compiler: host ``Scene`` -> device ``SceneData`` SoA pytree.

This replaces the reference's dlopen plugin dispatch (object.c:51-158) and
per-object lazy ``prepare()`` functions with a single ahead-of-time pass that
groups objects into vectorized *blocks*, one per intersection kernel family:

  SphereBlock   - sphere                                    (sphere.c)
  PlaneBlock    - hplane + hdisk (radius2=inf for planes)   (hplane.c, hdisk.c)
  QuadricBlock  - cylinder, hcylinder, orthotope: the shared
                  "project out K axes, solve a quadratic in the orthogonal
                  complement, slab-test the axis projections" family
                  (cylinder.c:104-210, hcylinder.c:132-244,
                  orthotope.c:150-302); orthotope additionally enables the
                  closest-approach 'slab' fallback
  FacetBlock    - triangles via plane closest-approach + vertex-angle
                  inside test                               (facet.c:166-269)
  HFacetBlock   - triangles via the ones-vector linear solve + barycentric
                  inside test                               (hfacet.c:211-310)

Composite objects are flattened at compile time:
  hcube   -> one orthotope leaf per m-face, m=2..D-1 (hcube.c:33-152), all
             reporting the hcube's material id (hcube.c:244-247 sets
             *ptr = hcube)
  cluster -> its children (cluster.c:246-256 reports the child)
  hdisk   -> a plane leaf with a finite radius (hdisk.c:61-85)

Every leaf also gets the Nelder-Mead bounding sphere the C computes lazily
(object.c:582-603), used by the vectorized cull mask in render/trace.py.

Axis-based precomputation ("prepped" data in C) is stored so that the device
kernels need only matmuls ([R,D]@[D,N] -> MXU) and [R,N] elementwise VPU ops;
no [R,N,D] intermediates exist anywhere.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np
from flax import struct

from ndt_tpu import mathnd
from ndt_tpu.constants import BIG, EPSILON
from ndt_tpu.scene.model import LightType, Object, Scene, get_type_info


@struct.dataclass
class SphereBlock:
    center: object      # [n, D]
    radius2: object     # [n]
    mat_id: object      # [n] int32
    b_center: object    # [n, D] bounding sphere (cull)
    b_radius: object    # [n]
    shadow_rank: object # [n] int32 infinite-scan position (see _Leaf)


@struct.dataclass
class PlaneBlock:
    point: object       # [n, D]
    normal: object      # [n, D]  (raw, as authored -- hplane.c:49)
    radius2: object     # [n]  BIG*BIG for hplane, r^2 for hdisk
    mat_id: object
    b_center: object
    b_radius: object
    shadow_rank: object


@struct.dataclass
class QuadricBlock:
    base: object        # [n, D]  pos[0]
    axes: object        # [n, A, D] unit axes, zero-padded
    gram: object        # [n, A, A] axis Gram matrix (0 rows/cols for pads)
    lo: object          # [n, A] axis-projection lower bound
    hi: object          # [n, A] upper bound (padded/infinite: +/-BIG)
    qc_off: object      # [n] subtracted from Q.Q: r^2, or EPSILON for slabs
    is_slab: object     # [n] 1.0 where the orthotope fallback path applies
    # kd leaf-cell gate (see _kd_cell_gates): a slab's EPSILON-shell hit is
    # only reachable when the ray pierces a kd leaf cell containing the
    # item, exactly as the reference's traversal works.  gate_tlo/thi are
    # the cell boxes clipped by the tree AABB (used in the t-slab test);
    # gate_plo/phi are the raw split-derived cell bounds (used as position
    # checks in near-parallel dims, where aabb_intersect skips the dim but
    # the traversal still picks children by position, kd-tree.c:545-560).
    gate_tlo: object    # [n, B, D]
    gate_thi: object    # [n, B, D]
    gate_plo: object    # [n, B, D]
    gate_phi: object    # [n, B, D]
    mat_id: object
    b_center: object
    b_radius: object
    shadow_rank: object


@struct.dataclass
class FacetBlock:
    verts: object       # [n, 3, D]
    edges: object       # [n, 3, D]  edge[i] = v[(i+1)%3] - v[i]
    basis: object       # [n, 2, D]  orthonormal plane basis
    cos_angles: object  # [n, 3]  cos of interior vertex angles
    normal: object      # [n, D]  dir[0], used uniformly (facet.c:257)
    # kd leaf-cell gate (see _kd_cell_gates): the facet's EPSILON surface
    # shell (facet.c:239-246) is only reachable where the reference's
    # traversal tests the item.  Same layout/semantics as QuadricBlock's.
    gate_tlo: object    # [n, B, D]
    gate_thi: object    # [n, B, D]
    gate_plo: object    # [n, B, D]
    gate_phi: object    # [n, B, D]
    mat_id: object
    b_center: object
    b_radius: object
    shadow_rank: object


@struct.dataclass
class HFacetBlock:
    verts: object       # [n, 3, D]
    ue0: object         # [n, D] unit edge0
    ep: object          # [n, D] unit edge_perp
    sum_ue0: object     # [n]  ones . ue0
    sum_ep: object      # [n]  ones . ep
    bary_x2: object     # [n]  ue0 . edge0
    bary_y2: object     # [n]  ep  . edge0
    bary_x3: object     # [n]  ue0 . edge2r   (edge2r = v2 - v0)
    bary_y3: object     # [n]  ep  . edge2r
    use_normals: object # [n]  flag[0]
    vnormals: object    # [n, 3, D]
    # kd leaf-cell gate (see _kd_cell_gates): for D > 3 the hfacet's
    # ones-contraction solve returns phantom hits on a whole hypersurface;
    # the C renders exactly the part whose rays reach a leaf cell holding
    # the item, so the gate IS the object's visible extent.  Same
    # layout/semantics as QuadricBlock's.
    gate_tlo: object    # [n, B, D]
    gate_thi: object    # [n, B, D]
    gate_plo: object    # [n, B, D]
    gate_phi: object    # [n, B, D]
    mat_id: object
    b_center: object
    b_radius: object
    shadow_rank: object


@struct.dataclass
class LightData:
    """One compiled light; ``kind`` is static so the shading loop
    specializes per light type (scene.h:16-22, ndt.c:103-314)."""

    kind: int = struct.field(pytree_node=False)
    pos: object = None
    dir: object = None       # unit for DIRECTIONAL? no: raw, as authored
    color: object = None     # [3]
    angle_deg: object = None
    radius: object = None
    u1: object = None
    v1: object = None


@struct.dataclass
class SceneData:
    """The full device scene. Block fields are None when the scene has no
    object of that family."""

    dim: int = struct.field(pytree_node=False)
    n_materials: int = struct.field(pytree_node=False)
    has_transparent: bool = struct.field(pytree_node=False)

    spheres: Optional[SphereBlock] = None
    planes: Optional[PlaneBlock] = None
    quadrics: Optional[QuadricBlock] = None
    facets: Optional[FacetBlock] = None
    hfacets: Optional[HFacetBlock] = None

    # materials, indexed by mat_id
    color: object = None        # [M, 3]
    reflect: object = None      # [M, 3]
    transparent: object = None  # [M] 0/1
    refract_index: object = None  # [M]

    ambient: object = None      # [3]
    bg: object = None           # [3]
    bg_alpha: object = None     # scalar

    lights: tuple = ()          # tuple of LightData

    # Pallas megakernel specialization (f32 scenes only): static layout
    # meta + packed SMEM parameter tables (render/pallas_trace.py)
    pmeta: object = struct.field(pytree_node=False, default=None)
    ptables: tuple = ()
    # chunk GROUPS for the single-launch multi-chunk kernel
    # (pallas_trace_grouped): consecutive chunks sharing one PallasMeta,
    # their tables stacked along a leading chunk axis.  pgroups_meta is
    # ((meta, m), ...) static; pgroups the matching stacked-table tuples.
    pgroups_meta: object = struct.field(pytree_node=False, default=None)
    pgroups: tuple = ()

    @property
    def blocks(self):
        out = []
        for b in (self.spheres, self.planes, self.quadrics,
                  self.facets, self.hfacets):
            if b is not None:
                out.append(b)
        return out

    @property
    def n_leaves(self):
        return sum(int(b.mat_id.shape[0]) for b in self.blocks)


# --------------------------------------------------------------------------
# leaf extraction


@dataclasses.dataclass
class _Leaf:
    kind: str
    obj: Object
    mat_id: int
    # index of this leaf's kd ITEM (the reference's kd-tree granularity:
    # top-level objects with clusters flattened, object_kdlist_add
    # object.c:633-681).  hcube faces share the CUBE's item (faces live
    # inside its intersect, hcube.c:236-249); -1 = the object is in the
    # trace-always infinite list, not the tree (kd-tree.c:446-460)
    kd_item: int = -1
    # scan position among INFINITE leaves, in scene insertion order; finite
    # leaves get NOT_INFINITE.  Replicates the reference's shadow-trace
    # quirk: trace() with dist_limit > 0 breaks at the FIRST object hit
    # within the limit in scan order (object.c:736-738), and the kd path
    # scans infinite objects first in insertion order (kd-tree.c:592-594) --
    # so an infinite occluder listed AFTER the shadow-target never blocks a
    # point light.  See render/trace.py shadow_trace.
    shadow_rank: int = 1 << 30


NOT_INFINITE = 1 << 30


def _hcube_faces(cube: Object) -> List[Object]:
    """Expand an hcube into orthotope m-faces for m = 2..D-1, replicating
    add_faces (hcube.c:33-152): each m-subset of the cube's D basis
    directions spans 2^(D-m) faces placed at every corner combination of the
    remaining directions."""
    import itertools

    d = cube.dim
    center = cube.pos[0]
    faces = []
    for m in range(2, d):
        for dirs in itertools.combinations(range(d), m):
            dirs_set = set(dirs)
            others = [i for i in range(d) if i not in dirs_set]
            for bits in range(1 << (d - m)):
                pos = center.copy()
                for bi, i in enumerate(others):
                    value = (bits >> bi) & 1
                    pos = pos + cube.dir[i] * (cube.size[i] * (value - 0.5))
                for i in dirs:
                    pos = pos + cube.dir[i] * (-0.5 * cube.size[i])
                face = Object(d, "orthotope", f"{cube.name}:{m}d-face")
                face.add_flag(m)
                for i in dirs:
                    face.add_dir(cube.dir[i] * cube.size[i])
                face.add_pos(pos)
                faces.append(face)
    return faces


def _item_aabb(obj: Object, dim):
    """object_kdlist_add (object.c:646-672): AABB over the object's
    bounding points inflated by |radius|, with aabb_add_point's +-EPSILON
    pad (kd-tree.c:63-81).  Empty bounding points => the inverted "empty"
    box of aabb_init (kd-tree.c:16-21) -- the reference's never-bounded
    infinite cluster children keep this and sort leftward forever."""
    pts = obj.bounding_points()
    if not pts:
        return np.full(dim, np.inf), np.full(dim, -np.inf)
    corners = np.stack([np.asarray(c, np.float64) for c, _ in pts])
    radii = np.asarray([abs(r) for _, r in pts])[:, None]
    return ((corners - radii).min(0) - EPSILON,
            (corners + radii).max(0) + EPSILON)


def _flatten(objects: List[Object], dim: int):
    """Walk the object forest, registering one material per user-visible
    object and yielding intersectable leaves plus the kd ITEM list (in the
    reference's object_kdlist_add order) for leaf-cell gating."""
    leaves: List[_Leaf] = []
    materials: List[Object] = []
    kd_items: List[tuple] = []      # (lo, hi) per item, C scan order

    def new_mat(obj) -> int:
        materials.append(obj)
        return len(materials) - 1

    def new_item(obj) -> int:
        kd_items.append(_item_aabb(obj, dim))
        return len(kd_items) - 1

    def walk(obj: Object, mat_id: Optional[int], in_cluster=False):
        t = obj.type_name
        if t == "cluster":
            # culling container; children keep their own materials
            for c in obj.children:
                walk(c, None, in_cluster=True)
            return
        if obj.bounds_radius is None:
            obj.get_bounds()
        infinite = obj.bounds_radius is not None and obj.bounds_radius < 0
        if in_cluster:
            # kd-parity quirk: the reference flattens clusters into the
            # kd-tree (object_kdlist_add, object.c:633-646) but computes
            # bounds only for TOP-LEVEL objects (ndt.c:1897-1907), so an
            # infinite child (empty bounding_points, e.g. hypercube.c's
            # flag=2 'edge' hcylinders) is counted as FINITE
            # (kd-tree.c:423-431 reads the unset radius 0), gets the
            # inverted empty AABB, always sorts into the leftmost leaf
            # (kd-tree.c:394-401), and is never reached by camera rays.
            # It still participates in split scoring, so it must stay in
            # the item list even though it yields no renderable leaf.
            item = new_item(obj)
            if infinite:
                return
        else:
            # top-level infinite objects go to the trace-always inf list
            # (kd-tree.c:446-460), not the tree
            item = -1 if infinite else new_item(obj)
        mid = new_mat(obj) if mat_id is None else mat_id
        emit(obj, mid, item)

    def emit(obj: Object, mid: int, item: int):
        t = obj.type_name
        if t == "hcube":
            for face in _hcube_faces(obj):
                leaves.append(_Leaf("quadric", face, mid, kd_item=item))
        elif t == "hdisk":
            leaves.append(_Leaf("plane", obj, mid, kd_item=item))
        elif t == "sphere":
            leaves.append(_Leaf("sphere", obj, mid, kd_item=item))
        elif t == "hplane":
            leaves.append(_Leaf("plane", obj, mid, kd_item=item))
        elif t in ("cylinder", "hcylinder", "orthotope"):
            leaves.append(_Leaf("quadric", obj, mid, kd_item=item))
        elif t == "facet":
            leaves.append(_Leaf("facet", obj, mid, kd_item=item))
        elif t == "hfacet":
            leaves.append(_Leaf("hfacet", obj, mid, kd_item=item))
        else:
            info = get_type_info(t)
            if info is not None and info.expand is not None:
                # custom composite type (the plugin ABI replacement):
                # expansion leaves report the parent's material, like
                # hcube faces (hcube.c:244-247)
                for sub in info.expand(obj):
                    emit(sub, mid, item)
            else:
                raise ValueError(f"cannot compile object type {t!r}")

    for o in objects:
        walk(o, None)
    return leaves, materials, kd_items


def _batch_bounds(leaves):
    """Fit every unfit leaf's bounding sphere in ONE threaded native call
    (native/bounding.cc:ndt_optimal_spheres) instead of one serial NM solve
    per leaf — at thousands of leaves the per-leaf fits dominate scene
    prep.  Results are bit-identical to Object.get_bounds (same native NM
    per point set, same +EPSILON pad, object.c:582-603); without the native
    library this is a no-op and the per-leaf lazy path applies."""
    from ndt_tpu import native
    if native.get_lib() is None:
        return
    todo, seen = [], set()
    for l in leaves:
        o = l.obj
        if o.bounds_radius is None and id(o) not in seen:
            seen.add(id(o))
            todo.append(o)
    pts_all, rad_all, offs, fit_objs = [], [], [0], []
    for o in todo:
        pts = o.bounding_points()
        if not pts:
            o.bounds_center = np.zeros(o.dim)
            o.bounds_radius = -1.0
            continue
        pts_all.extend(np.asarray(c, np.float64) for c, _ in pts)
        rad_all.extend(float(r) for _, r in pts)
        offs.append(offs[-1] + len(pts))
        fit_objs.append(o)
    if not fit_objs:
        return
    res = native.optimal_spheres(
        np.stack(pts_all), np.asarray(rad_all),
        np.asarray(offs, np.int64), EPSILON)
    if res is None:
        return
    centers, radii = res
    for o, c, r in zip(fit_objs, centers, radii):
        o.bounds_center = c
        o.bounds_radius = float(r) + (EPSILON if r > 0.0 else 0.0)


def _leaf_bounds(leaf: _Leaf, dim):
    obj = leaf.obj
    if obj.bounds_radius is None:
        obj.get_bounds()
    return obj.bounds_center, obj.bounds_radius


# --------------------------------------------------------------------------
# per-family block builders (the vectorized "prepare" pass)


def _build_spheres(leaves, dim, dt):
    n = len(leaves)
    center = np.stack([l.obj.pos[0] for l in leaves])
    radius2 = np.array([l.obj.size[0] ** 2 for l in leaves])
    return SphereBlock(
        center=center.astype(dt), radius2=radius2.astype(dt),
        mat_id=np.array([l.mat_id for l in leaves], np.int32),
        **_bounds_arrays(leaves, dim, dt))


def _build_planes(leaves, dim, dt):
    point = np.stack([l.obj.pos[0] for l in leaves])
    normal = np.stack([l.obj.dir[0] for l in leaves])
    radius2 = np.array([
        (l.obj.size[0] ** 2) if l.obj.type_name == "hdisk" else np.inf
        for l in leaves])
    return PlaneBlock(
        point=point.astype(dt), normal=normal.astype(dt),
        radius2=radius2.astype(dt),
        mat_id=np.array([l.mat_id for l in leaves], np.int32),
        **_bounds_arrays(leaves, dim, dt))


def _quadric_params(obj: Object):
    """Per-object (base, unit axes, lo, hi, qc_off, is_slab) replicating the
    three prepare() functions."""
    t = obj.type_name
    if t == "cylinder":
        base = obj.pos[0]
        axis = mathnd.unitize(obj.pos[1] - obj.pos[0])
        length = float(mathnd.dist(obj.pos[1], obj.pos[0]))
        infinite = len(obj.flag) > 1 and obj.flag[1] != 0
        lo = [-BIG] if infinite else [0.0]           # cylinder.c:85-102
        hi = [BIG] if infinite else [length]
        return base, [axis], lo, hi, obj.size[0] ** 2, False
    if t == "hcylinder":
        base = obj.pos[0]
        axes, lo, hi = [], [], []
        infinite = len(obj.flag) > 0 and obj.flag[0] != 0
        for i in range(1, len(obj.pos)):             # hcylinder.c:38-45
            axes.append(mathnd.unitize(obj.pos[i] - obj.pos[0]))
            length = float(mathnd.dist(obj.pos[i], obj.pos[0]))
            lo.append(-BIG if infinite else -EPSILON)  # hcylinder.c:118-126
            hi.append(BIG if infinite else length + EPSILON)
        return base, axes, lo, hi, obj.size[0] ** 2, False
    if t == "orthotope":
        base = obj.pos[0]
        m = obj.flag[0]
        axes, lo, hi = [], [], []
        for i in range(m):                           # orthotope.c:35-45
            axes.append(mathnd.unitize(obj.dir[i]))
            length = float(mathnd.l2norm(obj.dir[i]))
            lo.append(-EPSILON)                      # orthotope.c:135-144
            hi.append(length + EPSILON)
        # qc -= EPSILON makes the quadratic a thin slab (orthotope.c:203)
        return base, axes, lo, hi, EPSILON, True
    raise ValueError(t)


def _leaf_gated(leaf) -> bool:
    """Leaves whose ACCEPTANCE depends on the reference's traversal
    reachability (beyond plain geometry), so they need kd leaf-cell gates:

    * orthotope slabs -- the EPSILON-shell (qc -= EPSILON, orthotope.c:203,
      closest-approach fallback orthotope.c:233-275) lights a 0.01-thick
      halo only where traversal actually tests the item;
    * facets -- the same EPSILON surface-distance acceptance
      (facet.c:239-246), a +-0.01 shell around the triangle plane;
    * hfacets -- the ones-contraction solve t = -(Q.1)/(R.1)
      (hfacet.c:238-264) enforces ONE of the D-2 plane constraints, so for
      D > 3 it returns "phantom" hits on a whole hypersurface far off the
      real triangle.  The C renders exactly the part of that hypersurface
      whose rays reach a leaf cell containing the item; the visible extent
      IS the cull geometry, so it must be replicated.
    """
    if leaf.kind in ("facet", "hfacet"):
        return True
    # is_slab is a static property of the type (orthotope only) -- don't
    # recompute the full prepare() per leaf just to read it
    return leaf.kind == "quadric" and leaf.obj.type_name == "orthotope"


def _kd_cell_gates(leaves, kd_items, dim):
    """Leaf-cell gate boxes for gate-dependent leaves (see _leaf_gated).

    The reference only calls an object's intersect when kd traversal visits
    a leaf cell containing the item, so its shell/phantom hits are
    reachable only for rays piercing such a cell.  We rebuild the C's kd
    tree exactly (utils/kdtree.build_c_exact) and gate on the union of the
    item's leaf cells, clipped by the tree's root AABB for the t-test
    (kd_tree_intersect enters through aabb_intersect(&tree->bb),
    kd-tree.c:598).  Position bounds stay unclipped: in near-parallel dims
    aabb_intersect SKIPS the dim (kd-tree.c:97-99) but traversal still
    picks children by position (kd-tree.c:556-566)."""
    from ndt_tpu.utils.kdtree import build_c_exact

    gated_items = sorted({l.kd_item for l in leaves
                          if l.kd_item >= 0 and _leaf_gated(l)})
    if not gated_items or not kd_items:
        return None
    lowers = np.stack([lo for lo, _ in kd_items])
    uppers = np.stack([hi for _, hi in kd_items])
    if len(kd_items) > _KD_EXACT_MAX:
        # the C-exact build duplicates straddling items into both children,
        # which explodes combinatorially on dense scenes (measured >400k
        # split nodes without saturating at 600 overlapping random objects
        # -- the reference's own builder pays the same blowup, once, in
        # its 20-minute frames).  Past the threshold, run the SAME exact
        # recursion under a node budget with largest-node-first refinement
        # (native kdsplit.cc): unsplit regions become cells and each
        # item's cells merge into <= _GATE_MAX boxes -- both conservative
        # SUPERSETS of the item's true leaf-cell union, so the gate still
        # admits every shell/phantom hit the C's traversal reaches and
        # may only show extra ones in merged gaps (the old per-item-AABB
        # fallback was one-sided the other way: it CLIPPED hits the C
        # renders, VERDICT r4 missing 1).
        import warnings

        from ndt_tpu import native

        # clip pad mirrors pallas_trace's aabb_pad (0.02 + 1e-4|coord|):
        # the family evals' shell acceptance lies inside it, so clipped
        # cells still admit every C-visible hit
        res = native.kd_cells_budget(lowers, uppers, EPSILON,
                                     _GATE_DENSE_MAX,
                                     _KD_BUDGET, _KD_DEPTH_MAX,
                                     clip_pad=0.02 + EPSILON,
                                     clip_rel=1e-4)
        if res is not None:
            warnings.warn(
                f"scene has {len(kd_items)} kd items > {_KD_EXACT_MAX}: "
                "shell/phantom gating (orthotope EPSILON shells, facet "
                "surface shells, D>3 hfacet phantom hypersurfaces) uses "
                "BUDGETED kd leaf cells: a conservative superset of the "
                "C-exact cells (everything the C shows is admitted; "
                "merged-gap regions may show extra shell/phantom hits)",
                RuntimeWarning, stacklevel=2)
            boxes, items_arr, _trunc = res
            cells = [[] for _ in range(len(kd_items))]
            for b, i in zip(boxes, items_arr):
                cells[int(i)].append(b)
            # items that never reached a leaf (can't happen, but stay
            # safe) gate on their own AABB
            for i, c in enumerate(cells):
                if not c:
                    cells[i] = [np.stack([lowers[i], uppers[i]], axis=-1)]
        else:
            warnings.warn(
                f"scene has {len(kd_items)} kd items > {_KD_EXACT_MAX} "
                "and no native library: shell/phantom gating falls back "
                "to per-item AABBs.  One-sided vs the C: an item's cell "
                "union always CONTAINS its AABB, so every hit shown here "
                "the C also shows, but the C can show shell/phantom hits "
                "beyond the AABB that this build clips",
                RuntimeWarning, stacklevel=2)
            cells = [[np.stack([lowers[i], uppers[i]], axis=-1)]
                     for i in range(len(kd_items))]
    else:
        cells = build_c_exact(lowers, uppers)
    finite = ~np.isinf(lowers).any(1)
    bb_lo = lowers[finite].min(0) if finite.any() else np.full(dim, -BIG)
    bb_hi = uppers[finite].max(0) if finite.any() else np.full(dim, BIG)
    return cells, bb_lo, bb_hi


_GATE_MAX = 24      # max kd leaf cells per item before union fallback
_KD_EXACT_MAX = 256  # max kd items for the C-exact leaf-cell build
# budgeted-build knobs for scenes past _KD_EXACT_MAX (see _kd_cell_gates):
# split-node budget (largest-node-first; ~0.25 ms/node at 600 items),
# recursion depth cap, and the per-item merged-box cap.  The box cap is
# deliberately smaller than _GATE_MAX: gate tables cost 4*B*D SMEM floats
# per (gated-family) row in the megakernel, so B=24 at hundreds of rows
# blows the SMEM chunk budget (and Mosaic compile time) -- 8 merged boxes
# keep the kernel viable while still subdividing each item's clipped
# AABB region ~8-fold vs the old single-AABB fallback
_KD_BUDGET = int(os.environ.get("NDT_KD_BUDGET", 20000))
_KD_DEPTH_MAX = 64
_GATE_DENSE_MAX = int(os.environ.get("NDT_GATE_DENSE", 8))


def _pack_gate_tables(leaves, dim, gates):
    """[n, B, D] leaf-cell gate boxes for one block's leaves; rows whose
    leaf is not gated (or when ``gates`` is None) stay +-BIG = trivially
    pierced, and B == 0 when NOTHING in the block is gated, statically
    skipping the gate in both kernels.  Returns (tlo, thi, plo, phi)."""
    n = len(leaves)
    boxes = [None] * n
    b_max = 0
    if gates is not None:
        cells, bb_lo, bb_hi = gates
        for k, l in enumerate(leaves):
            if not _leaf_gated(l) or l.kd_item < 0:
                continue
            bx = cells[l.kd_item]
            # kd straddler duplication can give one item thousands of leaf
            # cells in dense scenes (the gate tables are [n, B, D] and the
            # kernel unrolls B box tests per candidate).  Beyond GATE_MAX
            # cells, fall back to their union: conservative -- it can admit
            # shell/phantom grazes in inter-cell gaps that the C's exact
            # traversal rejects -- but bounded, and exactness is preserved
            # for every scene whose items stay under the cap (all goldens).
            if len(bx) > _GATE_MAX:
                import warnings

                # stable message (no per-item counts), so the default
                # warning filter emits it ONCE per process instead of once
                # per affected item (dense scenes have hundreds)
                warnings.warn(
                    f"some leaf-cell gates exceed {_GATE_MAX} kd cells: "
                    "falling back to their union box (conservative vs "
                    "the C's exact traversal)",
                    RuntimeWarning, stacklevel=2)
                arr = np.stack(bx)                        # [B_k, D, 2]
                union = np.stack([arr[:, :, 0].min(0),
                                  arr[:, :, 1].max(0)], axis=-1)
                bx = [union]
            boxes[k] = bx
            b_max = max(b_max, len(bx))
    gate_tlo = np.full((n, b_max, dim), -BIG)
    gate_thi = np.full((n, b_max, dim), BIG)
    gate_plo = np.full((n, b_max, dim), -BIG)
    gate_phi = np.full((n, b_max, dim), BIG)
    if gates is not None and b_max:
        _, bb_lo, bb_hi = gates
        for k, bx in enumerate(boxes):
            if bx is None:
                continue
            cl = np.stack([c[:, 0] for c in bx])          # [B_k, D]
            ch = np.stack([c[:, 1] for c in bx])
            nb = len(bx)
            gate_plo[k, :nb] = np.clip(cl, -BIG, BIG)
            gate_phi[k, :nb] = np.clip(ch, -BIG, BIG)
            gate_tlo[k, :nb] = np.clip(np.maximum(cl, bb_lo), -BIG, BIG)
            gate_thi[k, :nb] = np.clip(np.minimum(ch, bb_hi), -BIG, BIG)
            # padding rows must NOT pierce: empty-inverted t boxes
            gate_tlo[k, nb:] = BIG
            gate_thi[k, nb:] = -BIG
    return gate_tlo, gate_thi, gate_plo, gate_phi


def _build_quadrics(leaves, dim, dt, gates=None):
    n = len(leaves)
    params = [_quadric_params(l.obj) for l in leaves]
    a_max = max(len(p[1]) for p in params)
    base = np.zeros((n, dim))
    axes = np.zeros((n, a_max, dim))
    gram = np.zeros((n, a_max, a_max))
    lo = np.full((n, a_max), -BIG)
    hi = np.full((n, a_max), BIG)
    qc_off = np.zeros(n)
    is_slab = np.zeros(n)
    for k, (b, ax, l, h, q, slab) in enumerate(params):
        base[k] = b
        a = len(ax)
        axes[k, :a] = np.stack(ax)
        gram[k, :a, :a] = axes[k, :a] @ axes[k, :a].T
        lo[k, :a] = l
        hi[k, :a] = h
        qc_off[k] = q
        is_slab[k] = 1.0 if slab else 0.0
    gate_tlo, gate_thi, gate_plo, gate_phi = _pack_gate_tables(
        leaves, dim, gates)
    return QuadricBlock(
        base=base.astype(dt), axes=axes.astype(dt), gram=gram.astype(dt),
        lo=lo.astype(dt), hi=hi.astype(dt), qc_off=qc_off.astype(dt),
        is_slab=is_slab.astype(dt),
        gate_tlo=gate_tlo.astype(dt), gate_thi=gate_thi.astype(dt),
        gate_plo=gate_plo.astype(dt), gate_phi=gate_phi.astype(dt),
        mat_id=np.array([l.mat_id for l in leaves], np.int32),
        **_bounds_arrays(leaves, dim, dt))


def _build_facets(leaves, dim, dt, gates=None):
    n = len(leaves)
    verts = np.stack([np.stack(l.obj.pos[:3]) for l in leaves])  # [n,3,D]
    edges = np.stack([verts[:, (i + 1) % 3] - verts[:, i]
                      for i in range(3)], axis=1)                # [n,3,D]
    basis = np.zeros((n, 2, dim))
    cos_angles = np.zeros((n, 3))
    for k in range(n):
        b0, b1 = mathnd.orthogonalize(edges[k, 0], edges[k, 1])  # facet.c:66-70
        basis[k, 0], basis[k, 1] = b0, b1
        for i in range(3):
            j, kk = (i + 1) % 3, (i + 2) % 3
            ang = mathnd.angle3(verts[k, kk], verts[k, i], verts[k, j])
            cos_angles[k, i] = np.cos(ang)
    normal = np.stack([l.obj.dir[0] for l in leaves])
    gate_tlo, gate_thi, gate_plo, gate_phi = _pack_gate_tables(
        leaves, dim, gates)
    return FacetBlock(
        verts=verts.astype(dt), edges=edges.astype(dt),
        basis=basis.astype(dt), cos_angles=cos_angles.astype(dt),
        normal=normal.astype(dt),
        gate_tlo=gate_tlo.astype(dt), gate_thi=gate_thi.astype(dt),
        gate_plo=gate_plo.astype(dt), gate_phi=gate_phi.astype(dt),
        mat_id=np.array([l.mat_id for l in leaves], np.int32),
        **_bounds_arrays(leaves, dim, dt))


def _build_hfacets(leaves, dim, dt, gates=None):
    n = len(leaves)
    verts = np.stack([np.stack(l.obj.pos[:3]) for l in leaves])
    edge0 = verts[:, 1] - verts[:, 0]
    edge2r = verts[:, 2] - verts[:, 0]   # reversed edge[2] (hfacet.c:73-75)
    ue0 = np.stack([mathnd.unitize(e) for e in edge0])
    ep = np.zeros((n, dim))
    for k in range(n):                   # hfacet.c:77-84
        e2e0 = mathnd.proj(edge2r[k], edge0[k])
        ep[k] = mathnd.unitize(edge2r[k] - e2e0)
    vnormals = np.zeros((n, 3, dim))
    use_normals = np.zeros(n)
    for k, l in enumerate(leaves):
        use_normals[k] = float(l.obj.flag[0]) if l.obj.flag else 0.0
        for i in range(min(3, len(l.obj.dir))):
            vnormals[k, i] = l.obj.dir[i]
    gate_tlo, gate_thi, gate_plo, gate_phi = _pack_gate_tables(
        leaves, dim, gates)
    return HFacetBlock(
        verts=verts.astype(dt), ue0=ue0.astype(dt), ep=ep.astype(dt),
        gate_tlo=gate_tlo.astype(dt), gate_thi=gate_thi.astype(dt),
        gate_plo=gate_plo.astype(dt), gate_phi=gate_phi.astype(dt),
        sum_ue0=ue0.sum(-1).astype(dt), sum_ep=ep.sum(-1).astype(dt),
        bary_x2=(ue0 * edge0).sum(-1).astype(dt),
        bary_y2=(ep * edge0).sum(-1).astype(dt),
        bary_x3=(ue0 * edge2r).sum(-1).astype(dt),
        bary_y3=(ep * edge2r).sum(-1).astype(dt),
        use_normals=use_normals.astype(dt), vnormals=vnormals.astype(dt),
        mat_id=np.array([l.mat_id for l in leaves], np.int32),
        **_bounds_arrays(leaves, dim, dt))


def _bounds_arrays(leaves, dim, dt):
    centers, radii = [], []
    for l in leaves:
        c, r = _leaf_bounds(l, dim)
        centers.append(c)
        radii.append(r)
    return dict(b_center=np.stack(centers).astype(dt),
                b_radius=np.asarray(radii).astype(dt),
                shadow_rank=np.asarray([l.shadow_rank for l in leaves],
                                       np.int32))


_BUILDERS = {
    "sphere": ("spheres", _build_spheres),
    "plane": ("planes", _build_planes),
    "quadric": ("quadrics", _build_quadrics),
    "facet": ("facets", _build_facets),
    "hfacet": ("hfacets", _build_hfacets),
}


def compile_lights(scene: Scene, dt):
    out = []
    for l in scene.lights:
        if l.type in (LightType.DISK, LightType.RECT) and not l.prepared:
            l.prepare()
        out.append(LightData(
            kind=int(l.type),
            pos=l.pos.astype(dt),
            dir=l.dir.astype(dt),
            color=l.color.astype(dt),
            angle_deg=dt(l.angle),
            radius=dt(l.radius),
            u1=l.u1.astype(dt),
            v1=l.v1.astype(dt)))
    return tuple(out)


def compile_scene(scene: Scene, dtype=np.float32) -> SceneData:
    """Compile a host Scene into the SoA device pytree."""
    dt = np.dtype(dtype).type
    scene.validate()
    leaves, materials, kd_items = _flatten(scene.objects, scene.dim)
    if not leaves:
        raise ValueError("scene has no intersectable objects")
    _batch_bounds(leaves)

    # assign shadow scan ranks to infinite leaves (insertion order)
    rank = 0
    for l in leaves:
        _, r = _leaf_bounds(l, scene.dim)
        if r < 0:
            l.shadow_rank = rank
            rank += 1

    kwargs = {}
    gates = _kd_cell_gates(leaves, kd_items, scene.dim)
    for kind, (field, builder) in _BUILDERS.items():
        ls = [l for l in leaves if l.kind == kind]
        if not ls:
            continue
        if kind in ("quadric", "facet", "hfacet"):
            kwargs[field] = builder(ls, scene.dim, dt, gates)
        else:
            kwargs[field] = builder(ls, scene.dim, dt)

    color = np.stack([m.color for m in materials])
    reflect = np.stack([m.reflect for m in materials])
    transparent = np.array([1.0 if m.transparent else 0.0 for m in materials])
    refract = np.array([m.refract_index for m in materials])

    sd = SceneData(
        dim=scene.dim,
        n_materials=len(materials),
        has_transparent=bool(transparent.any()),
        color=color.astype(dt), reflect=reflect.astype(dt),
        transparent=transparent.astype(dt),
        refract_index=refract.astype(dt),
        ambient=scene.ambient.astype(dt),
        bg=scene.bg.astype(dt), bg_alpha=dt(scene.bg_alpha),
        lights=compile_lights(scene, dt),
        **kwargs)

    if dt == np.float32:
        pmeta, ptables = _pack_chunked(sd)
        gmeta, gtables = _group_chunks(pmeta, ptables)
        sd = sd.replace(pmeta=pmeta, ptables=ptables,
                        pgroups_meta=gmeta, pgroups=gtables)
    return sd


def _group_chunks(pmeta, ptables):
    """Group consecutive chunks with EQUAL metas and stack their tables
    along a leading chunk axis, so the tracer dispatches one
    pallas_trace_grouped launch per group instead of one pallas_trace per
    chunk (launch latency dominates narrow stack-phase batches).  By
    construction (_pack_chunked pads per-family row counts equal) a
    multi-chunk scene groups as [chunk 0] + [finite chunks] when it has
    infinite leaves (inf_gids differ), else as one group."""
    gmeta, gtables = [], []
    i = 0
    while i < len(pmeta):
        j = i
        while j + 1 < len(pmeta) and pmeta[j + 1] == pmeta[i]:
            j += 1
        gmeta.append((pmeta[i], j - i + 1))
        # [m, 1, L]: the singleton axis lets the grouped kernel's SMEM
        # BlockSpec squeeze to a 1-D per-chunk ref while its last-two
        # block dims (1, L) equal the array's (Mosaic's SMEM block rule)
        gtables.append(tuple(
            np.stack([ptables[c][t] for c in range(i, j + 1)])[:, None, :]
            for t in range(len(ptables[i]))))
        i = j + 1
    return tuple(gmeta), tuple(gtables)


_SMEM_BUDGET = 480 * 1024   # bytes of per-object SMEM tables per kernel call


def _spatial_order(centers: np.ndarray) -> np.ndarray:
    """Index permutation of ``centers`` [n, D] by recursive median split
    along the widest axis: contiguous spans of the result are spatially
    compact blobs, so greedy budget packing yields localized chunks."""
    def rec(idx):
        if len(idx) <= 8:
            return idx
        c = centers[idx]
        spans = c.max(0) - c.min(0)
        d = int(np.argmax(spans))
        if spans[d] <= 0:
            return idx
        part = np.argsort(c[:, d], kind="stable")
        m = len(idx) // 2
        return np.concatenate([rec(idx[part[:m]]), rec(idx[part[m:]])])

    return rec(np.arange(len(centers)))


def _pack_chunked(sd: "SceneData"):
    """Pack the megakernel SMEM tables, splitting large scenes into
    SMEM-sized sub-scene chunks (the kernel runs once per chunk and the
    tracer min-merges the winners).  Every INFINITE leaf lands in chunk 0,
    so the shadow-mode scan-rank truncation (object.c:736-738) stays
    correct: later chunks are finite-only and merge as plain closest hits.
    Scenes that fit in one chunk keep their exact original row order."""
    from ndt_tpu.render.pallas_trace import N_PROPS, pack_params

    D = sd.dim
    A = 0 if sd.quadrics is None else sd.quadrics.axes.shape[1]
    B = 0 if sd.quadrics is None else sd.quadrics.gate_tlo.shape[1]
    B_f = 0 if sd.facets is None else sd.facets.gate_tlo.shape[1]
    B_h = 0 if sd.hfacets is None else sd.hfacets.gate_tlo.shape[1]
    # quadric gate boxes are DEDUPED per kd item at pack time
    # (pack_params): rows carry a 4-byte slot index (qgi) and each UNIQUE
    # box set costs 4*B*D*4 bytes once per chunk that references it
    cost = {"spheres": 4 * ((D + 1) + 2 + (D + 1)),
            "planes": 4 * ((2 * D + 1) + 2 + (D + 1)),
            "quadrics": 4 * ((D + A * D + 2 * A + 2) + 1 + 2 + (D + 1)),
            # widths: pallas_trace _facet_width/_hfacet_width + mat/rank
            # + bounds
            "facets": 4 * ((10 * D + 11 + 4 * B_f * D) + 2 + (D + 1)),
            "hfacets": 4 * ((7 * D + 12 + 4 * B_h * D) + 2 + (D + 1))}
    # every object row additionally costs one per-tile cull-list slot
    # (int32) and one reach slot (f32) of SMEM in the kernel call
    cost = {f: c + 8 for f, c in cost.items()}
    n_slots = 0
    if B:
        q = sd.quadrics
        both = np.concatenate(
            [np.asarray(q.gate_tlo, np.float32).reshape(len(q.mat_id), -1),
             np.asarray(q.gate_thi, np.float32).reshape(len(q.mat_id), -1),
             np.asarray(q.gate_plo, np.float32).reshape(len(q.mat_id), -1),
             np.asarray(q.gate_phi, np.float32).reshape(len(q.mat_id), -1)],
            axis=1)
        n_slots = len(np.unique(both, axis=0))
    slot_cost = 4 * 4 * B * D              # one deduped box set (t+p boxes)
    budget = _SMEM_BUDGET - 4 * N_PROPS * sd.n_materials - 4096
    if budget < 4 * max(cost.values()):
        raise ValueError(
            f"SMEM budget too small for the material table "
            f"({sd.n_materials} materials); raise _SMEM_BUDGET")

    total = (sum(cost[f] * getattr(sd, f).mat_id.shape[0]
                 for f in cost if getattr(sd, f) is not None)
             + n_slots * slot_cost)
    if total <= budget:
        meta, tables = pack_params(sd)
        return (meta,), (tables,)

    # chunking in SPATIAL order: infinite rows of every family land in
    # chunk 0; each family's finite rows are ordered by a recursive median
    # split of their bounding centers (restricted to that family, the
    # global spatial order stays spatially sorted) and sliced into k
    # near-equal contiguous groups, so each chunk holds one compact blob
    # per family -- per-tile interval culls then reject entire far-away
    # chunks (count 0 -> the kernel's family loops zero-trip) and the
    # cross-chunk winner threading (trace._pallas_closest init=) lets the
    # in-kernel early exit prune chunks behind an already-found hit.  The C
    # gets the same effect from kd locality (kd-tree.c:294-419).  k is the
    # smallest chunk count whose PADDED per-chunk cost (every chunk carries
    # ceil(n_f/k) rows of family f so chunks share kernel specializations)
    # plus chunk 0's infinite rows fits the SMEM budget.
    fams = [f for f in ("spheres", "planes", "quadrics", "facets",
                        "hfacets")
            if getattr(sd, f) is not None]
    inf_rows: dict = {}
    inf_cost = 0
    for fam in fams:
        ranks = np.asarray(getattr(sd, fam).shadow_rank)
        inf_idx = np.nonzero(ranks < NOT_INFINITE)[0]
        if len(inf_idx):
            inf_rows[fam] = inf_idx.astype(np.int64)
            inf_cost += cost[fam] * len(inf_idx)
    if inf_cost > budget:
        raise ValueError("too many infinite objects for one kernel chunk")

    fin_rows: dict = {}
    for fam in fams:
        blk = getattr(sd, fam)
        idx = np.nonzero(np.asarray(blk.shadow_rank) >= NOT_INFINITE)[0]
        order = _spatial_order(np.asarray(blk.b_center, np.float64)[idx])
        fin_rows[fam] = idx[order].astype(np.int64)

    n_chunks = 1
    while True:
        n_chunks += 1
        padded = sum(cost[f] * -(-len(fin_rows[f]) // n_chunks)
                     for f in fams)
        # deduped gate table per chunk: spatial chunking keeps one item's
        # rows together, so a chunk references ~n_slots/n_chunks unique
        # box sets (x2 straddle slack); chunks pad to the group max, and
        # the post-pack size check below catches any underestimate
        padded += slot_cost * min(n_slots, 2 * -(-n_slots // n_chunks))
        if padded + inf_cost <= budget:
            break
        if n_chunks > sum(len(i) for i in fin_rows.values()):
            raise ValueError("SMEM budget too small for one object row")

    return _pack_chunk_split(sd, fams, inf_rows, fin_rows, n_chunks)


def _pack_chunk_split(sd, fams, inf_rows, fin_rows, n_chunks):
    """Split rows into ``n_chunks`` spatial chunks and pack each.  The
    deduped quadric gate tables (pack_params) make per-chunk SMEM size
    depend on how many unique box sets a chunk references, which the cost
    model only estimates -- so measure the PACKED tables and retry one
    chunk larger until every chunk fits the budget."""
    from ndt_tpu.render.pallas_trace import pack_params

    idxs = {fam: [np.concatenate([inf_rows[fam], s])
                  if ci == 0 and fam in inf_rows else s
                  for ci, s in enumerate(
                      np.array_split(fin_rows[fam], n_chunks))]
            for fam in fams}
    # pad every chunk to the same per-family row counts so chunks share
    # kernel specializations (PallasMeta carries static inf_gids, which
    # differ between chunk 0 -- holder of all infinite leaves -- and
    # finite-only chunks, so scenes with infinite objects compile up to two
    # Mosaic kernels per mode rather than one per chunk); dummy rows sit at
    # +BIG with tiny bounds and can never win a trace
    pad_to = {fam: max(len(i) for i in idxs[fam]) for fam in fams}

    def pad_block(blk, idx, n_pad):
        if n_pad == 0:
            return None
        sub = {f.name: np.asarray(getattr(blk, f.name))[idx]
               for f in dataclasses.fields(blk)}
        extra = n_pad - len(idx)
        if extra:
            for name, a in sub.items():
                pad_row = np.zeros((extra,) + a.shape[1:], a.dtype)
                if name == "b_center":
                    pad_row[:, 0] = BIG
                elif name == "b_radius":
                    pad_row[:] = 1e-6
                elif name in ("base", "center", "point"):
                    pad_row[:, 0] = BIG
                elif name == "shadow_rank":
                    pad_row[:] = NOT_INFINITE
                sub[name] = np.concatenate([a, pad_row])
        return type(blk)(**sub)

    metas, tables = [], []
    for ci in range(n_chunks):
        sub = sd.replace(
            spheres=(pad_block(sd.spheres, idxs["spheres"][ci],
                               pad_to["spheres"])
                     if "spheres" in fams else None),
            planes=(pad_block(sd.planes, idxs["planes"][ci],
                              pad_to["planes"])
                    if "planes" in fams else None),
            quadrics=(pad_block(sd.quadrics, idxs["quadrics"][ci],
                                pad_to["quadrics"])
                      if "quadrics" in fams else None),
            # facet families chunk like every other family; padded dummy
            # rows are degenerate (all-zero) triangles whose evals yield
            # NaN/BIG t and whose BIG-centered bounds always cull
            facets=(pad_block(sd.facets, idxs["facets"][ci],
                              pad_to["facets"])
                    if "facets" in fams else None),
            hfacets=(pad_block(sd.hfacets, idxs["hfacets"][ci],
                               pad_to["hfacets"])
                     if "hfacets" in fams else None))
        m, t = pack_params(sub)
        metas.append(m)
        tables.append(list(t))

    # chunks in a group stack their tables (_group_chunks), so the deduped
    # gate tables (tuple indices 9 = qgt, 10 = qgp) must pad to the max
    # slot count; zero padding is safe -- qgi never points past a chunk's
    # real slots
    for ti in (9, 10):
        mx = max(len(t[ti]) for t in tables)
        for t in tables:
            if len(t[ti]) < mx:
                t[ti] = np.concatenate(
                    [t[ti], np.zeros(mx - len(t[ti]), t[ti].dtype)])

    # measured SMEM per chunk: the object tables (0..15 -- everything the
    # cost model's row costs cover; the material prop table and slack are
    # subtracted from the budget, exactly as in the model) + one cull-list
    # slot (int32) and one reach slot (f32) per padded row
    n_rows = max(m.n_sph + m.n_pln + m.n_quad + m.n_fct + m.n_hf
                 for m in metas)
    worst = max(sum(tab.nbytes for tab in t[:16]) for t in tables)
    meas_budget = _SMEM_BUDGET - tables[0][16].nbytes - 4096
    if worst + 8 * n_rows > meas_budget:
        if n_chunks > sum(len(i) for i in fin_rows.values()):
            raise ValueError("SMEM budget too small for one object row")
        return _pack_chunk_split(sd, fams, inf_rows, fin_rows,
                                 n_chunks + 1)
    return tuple(metas), tuple(tuple(t) for t in tables)
