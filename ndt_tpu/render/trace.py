"""Closest-hit trace over all compiled blocks.

The TPU-native replacement for the reference's trace() object loop
(object.c:692-747) and kd-tree traversal (kd-tree.c:482-607): instead of
walking pointers per ray, each block kernel produces a dense ``[R, n_block]``
distance matrix and a single argmin over the concatenated object axis picks
the winner.  Hits must be farther than EPSILON (object.c:727) -- the kernels
already enforce that -- and the winner's normal is reconstructed only for
the [R] winning (ray, object) pairs.

Object identity for the shadow test (ndt.c:217-228 compares the hit object
pointer) is the material id: compiled leaves report the id of the
user-visible object that owns them, so hcube faces report the hcube
(hcube.c:244-247) and cluster children report themselves (cluster.c:246-256),
exactly like the C.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ndt_tpu import mathnd
from ndt_tpu.constants import BIG
from ndt_tpu.render import intersect
from ndt_tpu.scene.compile import NOT_INFINITE, SceneData

_BLOCK_FIELDS = ["spheres", "planes", "quadrics", "facets", "hfacets"]


def _refine_winner(blocks, idx, o, v, t_min, hit):
    """Hit-local re-solve of the winning object's root for curved families
    (see intersect.REFINERS); planar winners pass through unchanged.
    Returns (t_refined, valid): margin-band candidates the refine pass
    reveals as true misses come back invalid."""
    valid = jnp.ones_like(hit)
    off = 0
    for name, blk, _ in blocks:
        n_b = blk.mat_id.shape[0]
        refiner = intersect.REFINERS.get(name)
        if refiner is not None:
            in_block = hit & (idx >= off) & (idx < off + n_b)
            rows = jnp.clip(idx - off, 0, n_b - 1)
            t_new, ok = refiner(blk, rows, o, v, t_min)
            t_min = jnp.where(in_block, t_new, t_min)
            valid = jnp.where(in_block, ok, valid)
        off += n_b
    return t_min, valid


def _closest_with_refine(blocks, t_all, mat_all, o, v, rounds: int = 2):
    """argmin + hit-local refinement, re-running the argmin once when the
    refine pass rejects a margin-band false positive (so the object BEHIND
    a rejected silhouette candidate wins, instead of a hole)."""
    R, N = t_all.shape
    col = jnp.arange(N)[None, :]
    idx = t_min = hit = None
    for k in range(rounds):
        idx = jnp.argmin(t_all, axis=1)
        t_min = jnp.take_along_axis(t_all, idx[:, None], axis=1)[:, 0]
        hit = t_min < BIG * 0.5
        t_ref, valid = _refine_winner(blocks, idx, o, v, t_min, hit)
        if k < rounds - 1:
            reject = hit & ~valid
            t_all = jnp.where((col == idx[:, None]) & reject[:, None],
                              BIG, t_all)
        t_min = t_ref
    hit = hit & (t_min < BIG * 0.5)
    mat_id = jnp.where(hit, mat_all[idx], -1)
    return idx, t_min, hit, mat_id


class TraceResult(NamedTuple):
    t: jnp.ndarray        # [R] hit distance, >= BIG when no hit
    hit: jnp.ndarray      # [R] bool
    mat_id: jnp.ndarray   # [R] int32, -1 when no hit
    point: jnp.ndarray    # [R, D]
    normal: Optional[jnp.ndarray]  # [R, D] (un-normalized, like the C)


def trace(scene: SceneData, o, v, need_normal: bool = True) -> TraceResult:
    """Closest hit of rays (o, v) against the whole scene.

    o, v: [R, D].  v need not be exactly unit (the engine unitizes, matching
    the C which traces unitized look/shadow/bounce vectors)."""
    pre = intersect.ray_precompute(o, v)

    ts, mats = [], []
    blocks = []
    for name in _BLOCK_FIELDS:
        blk = getattr(scene, name)
        if blk is None:
            continue
        dist_fn, norm_fn = intersect.KERNELS[name]
        ts.append(dist_fn(blk, o, v, pre))
        mats.append(blk.mat_id)
        blocks.append((name, blk, norm_fn))

    t_all = jnp.concatenate(ts, axis=1)               # [R, N]
    mat_all = jnp.concatenate([jnp.asarray(m) for m in mats])  # [N]

    idx, t_min, hit, mat_id = _closest_with_refine(blocks, t_all, mat_all,
                                                   o, v)
    point = o + v * t_min[:, None]

    normal = None
    if need_normal:
        normal = jnp.zeros_like(o)
        off = 0
        for name, blk, norm_fn in blocks:
            n_b = blk.mat_id.shape[0]
            in_block = (idx >= off) & (idx < off + n_b)
            rows = jnp.clip(idx - off, 0, n_b - 1)
            nb = norm_fn(blk, rows, point, o, v, t_min)
            normal = jnp.where(in_block[:, None], nb, normal)
            off += n_b
    return TraceResult(t=t_min, hit=hit, mat_id=mat_id, point=point,
                       normal=normal)


def occlusion_trace(scene: SceneData, o, v, exclude_mat=None) -> TraceResult:
    """Any-hit variant (directional-light shadows, dist_limit == 0
    semantics): no normal reconstruction.

    ``exclude_mat`` ([R] int32) removes one object from consideration per
    ray: directional shadow rays start EPSILON off their own surface
    pointing AWAY from it (the wrong-side test ndt.c:160-168 already
    guarantees the light is on the normal's side), and every compiled leaf
    is convex, so the originating object can never legitimately re-occlude
    -- but at f32 the re-entry decision sits below machine precision, so we
    exclude it outright instead of resolving it numerically (the f64 C gets
    the same answer by brute precision)."""
    pre = intersect.ray_precompute(o, v)
    ts, mats = [], []
    for name in _BLOCK_FIELDS:
        blk = getattr(scene, name)
        if blk is None:
            continue
        dist_fn, _ = intersect.KERNELS[name]
        t = dist_fn(blk, o, v, pre)
        if exclude_mat is not None:
            t = jnp.where(blk.mat_id[None, :] == exclude_mat[:, None], BIG, t)
        ts.append(t)
        mats.append(jnp.asarray(blk.mat_id))
    t_all = jnp.concatenate(ts, axis=1)
    mat_all = jnp.concatenate(mats)
    idx = jnp.argmin(t_all, axis=1)
    t_min = jnp.take_along_axis(t_all, idx[:, None], axis=1)[:, 0]
    hit = t_min < BIG * 0.5
    mat_id = jnp.where(hit, mat_all[idx], -1)
    point = o + v * t_min[:, None]
    return TraceResult(t=t_min, hit=hit, mat_id=mat_id, point=point,
                       normal=None)


def shadow_trace(scene: SceneData, o, v, limit) -> TraceResult:
    """Point/spot-light shadow trace with the reference's dist_limit > 0
    scan-order semantics (object.c:736-738 + kd-tree.c:592-594):

    The C scans INFINITE objects first, in scene insertion order, and breaks
    at the first one hit within ``limit`` -- so infinite occluders listed
    after the break point never participate.  Finite objects then traverse
    the kd-tree near-to-far (closest hit).  The final result is the closer
    of the truncated infinite scan and the finite closest hit.

    Vectorized: ``shadow_rank`` orders infinite leaves; the first rank hit
    within the limit truncates which infinite leaves may win.
    """
    pre = intersect.ray_precompute(o, v)

    ts, mats, ranks, blocks = [], [], [], []
    for name in _BLOCK_FIELDS:
        blk = getattr(scene, name)
        if blk is None:
            continue
        dist_fn, norm_fn = intersect.KERNELS[name]
        ts.append(dist_fn(blk, o, v, pre))
        mats.append(jnp.asarray(blk.mat_id))
        ranks.append(jnp.asarray(blk.shadow_rank))
        blocks.append((name, blk, norm_fn))

    t_all = jnp.concatenate(ts, axis=1)                  # [R, N]
    mat_all = jnp.concatenate(mats)                      # [N]
    rank_all = jnp.concatenate(ranks)                    # [N]
    is_inf = rank_all < NOT_INFINITE                     # [N]

    hit_all = t_all < BIG * 0.5
    within = hit_all & (t_all < limit[:, None]) & is_inf[None, :]
    first_rank = jnp.min(
        jnp.where(within, rank_all[None, :], NOT_INFINITE), axis=1)  # [R]

    # infinite candidates: scan prefix up to and including the break object
    inf_elig = is_inf[None, :] & (rank_all[None, :] <= first_rank[:, None])
    t_inf = jnp.where(inf_elig, t_all, BIG)
    # finite candidates: plain closest hit
    t_fin = jnp.where(~is_inf[None, :], t_all, BIG)

    t_cand = jnp.minimum(t_inf, t_fin)
    idx, t_min, hit, mat_id = _closest_with_refine(blocks, t_cand, mat_all,
                                                   o, v)
    point = o + v * t_min[:, None]
    return TraceResult(t=t_min, hit=hit, mat_id=mat_id, point=point,
                       normal=None)
