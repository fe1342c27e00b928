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
from ndt_tpu.constants import BIG, EPSILON
from ndt_tpu.render import intersect
from ndt_tpu.scene.compile import NOT_INFINITE, SceneData

_BLOCK_FIELDS = ["spheres", "planes", "quadrics", "facets", "hfacets"]

# trace implementation: 'auto' picks the Pallas megakernel on TPU for f32
# scenes (falling back per-call for f64/CPU), 'jnp' forces the pure-XLA
# kernels (golden-parity tests), 'pallas-interpret' runs the megakernel in
# interpreter mode (CPU correctness tests of the kernel itself).
_IMPL = "auto"


def set_trace_impl(impl: str):
    global _IMPL
    assert impl in ("auto", "jnp", "pallas", "pallas-interpret"), impl
    _IMPL = impl


def _pallas_mode(scene, o):
    if _IMPL == "jnp" or scene.pmeta is None or o.dtype != jnp.float32:
        return None
    if _IMPL == "pallas-interpret":
        return "interpret"
    if _IMPL == "pallas":
        return "compiled"
    import jax

    return "compiled" if jax.default_backend() == "tpu" else None


def _scene_blocks(scene):
    out = []
    for name in _BLOCK_FIELDS:
        blk = getattr(scene, name)
        if blk is None:
            continue
        dist_fn, norm_fn = intersect.KERNELS[name]
        out.append((name, blk, norm_fn))
    return out


def _mat_table(scene):
    return jnp.concatenate([jnp.asarray(b.mat_id)
                            for _, b, _ in _scene_blocks(scene)])


def _pad_rays(o, v, rt):
    R = o.shape[0]
    pad = (-R) % rt
    if pad:
        o = jnp.concatenate([o, jnp.ones((pad, o.shape[1]), o.dtype)])
        v = jnp.concatenate([v, jnp.ones((pad, v.shape[1]), v.dtype)])
    return o, v, R


def fused_light_info(scene):
    """(kind_chars, light_table) for scenes whose whole apply_lights pass
    (shadow traces + diffuse + specular, ndt.c:71-326) can run inside the
    closest-hit megakernel, else None.

    Fusable: single SMEM chunk (the in-kernel shadow pass must see every
    object; facet/hfacet families are in-kernel for single-chunk scenes).
    All six light types qualify: point/spot/directional read their
    geometry from SMEM constants, and DISK/RECT area lights ('a') ship
    their per-ray sampled surface point (ndt.c:116-147: one random point
    per shading event, then treated as a point light) to the kernel as a
    VMEM ray-shaped array -- see trace_fused/_step's area_positions.

    Table layout (flat f32): [ambient_total(3), background(3)] then per
    light [color(3), spec_color(3), kind-specific: pos(D) for 'p';
    pos(D), unit_dir(D), cos_cutoff(1) for 's'; unit_dir(D) for 'd';
    nothing for 'a' (position is per-ray)]."""
    if scene.pmeta is None or len(scene.pmeta) != 1:
        return None
    f32 = jnp.float32
    amb = jnp.asarray(scene.ambient, f32)
    for light in scene.lights:
        if light.kind == 0:
            amb = amb + jnp.asarray(light.color, f32)   # ndt.c:106-111
    kinds, parts = [], [amb, jnp.asarray(scene.bg, f32)]
    for light in scene.lights:
        if light.kind == 0:
            continue
        lcol = jnp.asarray(light.color, f32)
        # the C divides by max_light unguarded (ndt.c:302-305); guard so a
        # degenerate zero-color light contributes 0 instead of NaN
        lmax = jnp.max(lcol)
        spec3 = lcol / jnp.where(lmax > 0, lmax, f32(1.0))
        parts += [lcol, spec3]
        if light.kind == 2:                       # directional
            kinds.append("d")
            parts.append(mathnd.unitize(light.dir).astype(f32))
        elif light.kind == 3:                     # spot
            kinds.append("s")
            udir = mathnd.unitize(light.dir).astype(f32)
            # cone test as a cosine cutoff; degenerate axis or >=180deg
            # cone always passes (mathnd.angle returns -1, ndt.c:201-207)
            deg = jnp.asarray(light.angle_deg, f32)
            cut = jnp.where(
                (mathnd.l2norm(light.dir.astype(f32)) <= jnp.float32(
                    1e-4)) | (deg >= 180.0),
                jnp.float32(-2.0), jnp.cos(deg * jnp.float32(np.pi / 180)))
            parts += [light.pos.astype(f32), udir, cut[None]]
        elif light.kind in (4, 5):                # disk/rect area lights
            kinds.append("a")                     # position is per-ray
        else:                                     # point
            kinds.append("p")
            parts.append(light.pos.astype(f32))
    if not kinds:
        return None
    return tuple(kinds), jnp.concatenate(
        [jnp.ravel(p).astype(f32) for p in parts])


def _area_positions(scene, kinds, key, R):
    """Per-ray sampled surface points for each fused 'a' (DISK/RECT) light
    (ndt.c:116-141: one random point per shading event), keyed exactly like
    the jnp path (shade.apply_lights folds the light's index in
    scene.lights into the key).  Returns {fused_index: [R, D]}."""
    import jax

    from ndt_tpu.render.shade import _sample_area_light

    out = {}
    fi = 0
    for li, light in enumerate(scene.lights):
        if light.kind == 0:
            continue
        if kinds[fi] == "a":
            lkey = (jax.random.fold_in(key, li) if key is not None
                    else jax.random.PRNGKey(li))
            out[fi] = _sample_area_light(light, lkey, (R,))
        fi += 1
    return out


def _pad_area(area, R_pad, R):
    if R_pad == R:
        return area
    return {fi: jnp.concatenate(
        [a, jnp.ones((R_pad - R, a.shape[1]), a.dtype)])
        for fi, a in area.items()}


def _shadow_culls(kinds, lvec, tables, meta, o_p, v_p, t, live_p,
                  area=None):
    """Per-light shadow-ray cull lists (vectorized XLA interval arithmetic,
    the exact pass the trace kernel's lists come from): each light's shadow
    ray set is derived from the closest-hit distances, culled per tile, and
    the compact lists feed the fused shade kernel's SMEM."""
    from ndt_tpu.render.pallas_trace import cull_lists

    hitm = t < BIG * 0.5
    cull_live = hitm if live_p is None else (hitm & live_p)
    p = o_p + v_p * t[:, None]
    D = o_p.shape[1]
    culls = []
    off = 6                                   # ambient(3) + background(3)
    for fi, kind in enumerate(kinds):
        off += 6                              # lcolor + spec color
        if kind == "d":
            u = lvec[off:off + D]
            off += D
            o_s = p - u[None, :] * EPSILON
            v_s = jnp.broadcast_to(-u[None, :], p.shape)
            lim = None                        # any-hit, unbounded
        elif kind == "a":
            lp = area[fi]                     # [R, D] sampled positions
            sd = p - lp
            dist = jnp.sqrt((sd * sd).sum(-1))
            inv = 1.0 / jnp.maximum(dist, 1e-20)[:, None]
            o_s = lp
            v_s = sd * inv
            lim = dist
        else:
            lp = lvec[off:off + D]
            off += D + (D + 1 if kind == "s" else 0)
            sd = p - lp[None, :]
            dist = jnp.sqrt((sd * sd).sum(-1))
            inv = 1.0 / jnp.maximum(dist, 1e-20)[:, None]
            o_s = jnp.broadcast_to(lp[None, :], p.shape)
            v_s = sd * inv
            lim = dist
        culls.append(cull_lists(tables, o_s, v_s, meta, live=cull_live,
                                limit=lim))
    return tuple(culls)


def trace_fused_step(scene: SceneData, o, v, w, frac, color, live=None,
                     specular=True, key=None, escalate=False):
    """One whole chain-mode bounce iteration in two kernel launches: the
    closest-hit megakernel, then the shade kernel in CARRY mode, which --
    beyond the fused apply_lights -- also folds in the engine's bounce-loop
    arithmetic (get_ray_color's accumulation and reflection spawn,
    ndt.c:329-419): node color accumulation into ``color``, the mirror
    bounce direction, and the weight/importance updates, all in-registers.
    The ~25 elementwise XLA passes over the ray batch that used to follow
    every bounce collapse into kernel I/O.

    Returns (t, o', v', w', frac', color', nxt) -- ``nxt`` excludes the
    max-depth condition (the caller ANDs it; a stale carry behind a false
    ``nxt`` is never read).  With ``escalate`` (stack-mode escalation,
    engine._chain_loop) the return gains a trailing ``taint`` [R] bool:
    lanes whose winner is TRANSPARENT, frozen for a stack-mode re-run
    (their nxt is False)."""
    from ndt_tpu.render.pallas_trace import RT, pallas_shade, pallas_trace

    mode = _pallas_mode(scene, o)
    assert mode is not None
    kinds, lvec = fused_light_info(scene)
    interpret = mode == "interpret"
    meta, tables = scene.pmeta[0], scene.ptables[0]

    R = o.shape[0]
    o_p, v_p, _ = _pad_rays(o, v, RT)
    pad = o_p.shape[0] - R
    if pad:
        w = jnp.concatenate([w, jnp.zeros((pad, 3), w.dtype)])
        frac = jnp.concatenate([frac, jnp.zeros((pad,), frac.dtype)])
        color = jnp.concatenate([color, jnp.zeros((pad, 3), color.dtype)])
    aux = jnp.full((o_p.shape[0],), -1, jnp.int32)
    live_p = _pad_live(live, o_p.shape[0], R)
    t, mat, nrm, props = pallas_trace(tables, o_p, v_p, aux, meta,
                                      "closest", interpret=interpret,
                                      live=live_p)
    area = _pad_area(_area_positions(scene, kinds, key, R),
                     o_p.shape[0], R)
    culls = _shadow_culls(kinds, lvec, tables, meta, o_p, v_p, t, live_p,
                          area)
    live_in = (jnp.ones_like(t, dtype=bool) if live_p is None else live_p)
    o2, v2, w2, f2, c2, nxt = pallas_shade(
        tables, o_p, v_p, t, mat, nrm, props, lvec, culls, meta, kinds,
        fused_spec=specular, interpret=interpret,
        carry=(w, frac, color, live_in),
        area=tuple(area[fi] for fi in sorted(area)), escalate=escalate)
    out = (t[:R], o2[:R], v2[:R], w2[:R], f2[:R], c2[:R], nxt[:R] > 0.5)
    if escalate:
        out += (nxt[:R] < -0.5,)
    return out


def trace_fused(scene: SceneData, o, v, live=None, specular=True,
                key=None):
    """Closest hit + the complete local shading in TWO kernel launches
    (pallas path only; caller must have checked fused_light_info): the
    closest-hit megakernel, then the fused shading kernel, whose per-light
    shadow rays are culled by the same vectorized XLA interval pass the
    trace uses (an in-kernel per-object cull would serialize ~100 interval
    tests per tile onto the scalar core -- measured slower than not fusing
    at all).  Only the per-tile CULL runs in XLA; every per-ray shading
    term runs in-registers in the kernel.

    Returns (TraceResult, local [R, 3]) -- ``local`` is apply_lights'
    result computed in-registers (garbage on miss/dead lanes; callers mask
    with tr.hit as they already do for the XLA path)."""
    from ndt_tpu.render.pallas_trace import (RT, cull_lists, pallas_shade,
                                             pallas_trace)

    mode = _pallas_mode(scene, o)
    assert mode is not None
    kinds, lvec = fused_light_info(scene)
    interpret = mode == "interpret"
    meta, tables = scene.pmeta[0], scene.ptables[0]

    o_p, v_p, R = _pad_rays(o, v, RT)
    aux = jnp.full((o_p.shape[0],), -1, jnp.int32)
    live_p = _pad_live(live, o_p.shape[0], R)
    t, mat, nrm, props = pallas_trace(tables, o_p, v_p, aux, meta,
                                      "closest", interpret=interpret,
                                      live=live_p)

    area = _pad_area(_area_positions(scene, kinds, key, R),
                     o_p.shape[0], R)
    culls = _shadow_culls(kinds, lvec, tables, meta, o_p, v_p, t, live_p,
                          area)
    local = pallas_shade(tables, o_p, v_p, t, mat, nrm, props, lvec,
                         culls, meta, kinds, fused_spec=specular,
                         interpret=interpret,
                         area=tuple(area[fi] for fi in sorted(area)))

    t, mat, nrm = t[:R], mat[:R], nrm[:R]
    local = local[:R]
    hit = t < BIG * 0.5
    mat = jnp.where(hit, mat, -1)
    props = props[:R]
    props = {"color": props[:, 0:3], "reflect": props[:, 3:6],
             "transparent": props[:, 6], "ior": props[:, 7]}
    point = o + v * t[:, None]
    tr = TraceResult(t=t, hit=hit, mat_id=mat, point=point,
                     normal=nrm, **props)
    return tr, local


def _pallas_closest(scene, o, v, mode, exclude_mat=None,
                    need_normal=True, live=None):
    """Closest hit via the megakernel (in-kernel local re-solve, normals,
    and material resolution)."""
    from ndt_tpu.render.pallas_trace import RT, pallas_trace

    o_p, v_p, R = _pad_rays(o, v, RT)
    if exclude_mat is None:
        aux = jnp.full((o_p.shape[0],), -1, jnp.int32)
    else:
        aux = exclude_mat.astype(jnp.int32)
        if o_p.shape[0] != R:
            aux = jnp.concatenate(
                [aux, jnp.full((o_p.shape[0] - R,), -1, jnp.int32)])
    live_p = _pad_live(live, o_p.shape[0], R)
    kmode = "closest" if need_normal else "any"
    # large scenes are packed as several SMEM-sized chunks; each chunk's
    # kernel SEEDS its running winner from the previous chunk's (init=),
    # so the in-kernel front-to-back early exit prunes across chunk
    # boundaries instead of each chunk re-scanning from BIG (the TPU
    # analogue of the C threading *t_ptr through kd traversal,
    # kd-tree.c:541-556); see compile._pack_chunked for the spatial
    # chunk partition that makes the per-tile chunk culls fire
    from ndt_tpu.render.pallas_trace import pallas_trace_grouped

    groups = _chunk_groups(scene)
    t = mat = nrm = props = None
    for (meta_g, m_g), tables_g in groups:
        if t is None:
            init = None
        elif kmode == "closest":
            init = (t, mat, nrm, props)
        else:
            init = (t, mat)
        if m_g == 1:
            t, mat, nrm, props = pallas_trace(
                tuple(tb[0, 0] for tb in tables_g), o_p, v_p, aux, meta_g,
                kmode, interpret=(mode == "interpret"), live=live_p,
                init=init)
        else:
            # all same-meta chunks in ONE launch, chunk axis on the grid
            t, mat, nrm, props = pallas_trace_grouped(
                tables_g, m_g, o_p, v_p, aux, meta_g, kmode,
                interpret=(mode == "interpret"), live=live_p, init=init)
    t, mat = t[:R], mat[:R]
    nrm = nrm[:R] if nrm is not None else None
    if props is not None:
        props = props[:R]
        props = {"color": props[:, 0:3], "reflect": props[:, 3:6],
                 "transparent": props[:, 6], "ior": props[:, 7]}
    hit = t < BIG * 0.5
    mat = jnp.where(hit, mat, -1)
    return t, hit, mat, nrm, props


def _chunk_groups(scene):
    """((meta, m), stacked_tables) chunk groups for the grouped kernel.

    compile_scene always packs pgroups alongside pmeta (f32), so a missing
    pgroups_meta means a stale or hand-built SceneData whose table layout
    (e.g. a pre-AABB-cull 16-entry ptable) the kernels can no longer read;
    fail loudly instead of guessing."""
    if scene.pgroups_meta is None:
        raise ValueError(
            "SceneData lacks chunk groups: rebuild it with compile_scene")
    return tuple(zip(scene.pgroups_meta, scene.pgroups))


def _pad_live(live, R_pad, R):
    if live is None:
        return None
    if R_pad != R:
        live = jnp.concatenate([live, jnp.zeros((R_pad - R,), bool)])
    return live


def _pallas_shadow(scene, o, v, limit, mode, live=None):
    from ndt_tpu.render.pallas_trace import RT, pallas_trace

    o_p, v_p, R = _pad_rays(o, v, RT)
    aux = limit.astype(jnp.float32)
    if o_p.shape[0] != R:
        aux = jnp.concatenate(
            [aux, jnp.zeros((o_p.shape[0] - R,), jnp.float32)])
    live_p = _pad_live(live, o_p.shape[0], R)
    # chunk 0 carries every infinite leaf (compile._pack_chunked), so its
    # shadow-mode rank truncation is complete; finite-only chunks k>0 seed
    # their running winner from chunk k-1's (init=) and merge as plain
    # closest hits with cross-chunk early-exit pruning
    from ndt_tpu.render.pallas_trace import pallas_trace_grouped

    groups = _chunk_groups(scene)
    t = mat = None
    for (meta_g, m_g), tables_g in groups:
        init = None if t is None else (t, mat)
        if m_g == 1:
            t, mat, _, _ = pallas_trace(
                tuple(tb[0, 0] for tb in tables_g), o_p, v_p, aux, meta_g,
                "shadow", interpret=(mode == "interpret"), live=live_p,
                init=init)
        else:
            t, mat, _, _ = pallas_trace_grouped(
                tables_g, m_g, o_p, v_p, aux, meta_g, "shadow",
                interpret=(mode == "interpret"), live=live_p, init=init)
    t, mat = t[:R], mat[:R]
    hit = t < BIG * 0.5
    mat = jnp.where(hit, mat, -1)
    point = o + v * t[:, None]
    return TraceResult(t=t, hit=hit, mat_id=mat, point=point, normal=None)


class TraceResult(NamedTuple):
    t: jnp.ndarray        # [R] hit distance, >= BIG when no hit
    hit: jnp.ndarray      # [R] bool
    mat_id: jnp.ndarray   # [R] int32, -1 when no hit
    point: jnp.ndarray    # [R, D]
    normal: Optional[jnp.ndarray]  # [R, D] (un-normalized, like the C)
    # winner material, resolved in-kernel on the pallas path so the engine
    # never does per-ray gathers (zeros on miss)
    color: Optional[jnp.ndarray] = None        # [R, 3]
    reflect: Optional[jnp.ndarray] = None      # [R, 3]
    transparent: Optional[jnp.ndarray] = None  # [R]
    ior: Optional[jnp.ndarray] = None          # [R]


def _gather_props(scene, mat_id, hit):
    """Material lookup for the jnp path (gathers are cheap on CPU)."""
    safe = jnp.maximum(mat_id, 0)
    m = hit[:, None]
    return dict(
        color=jnp.where(m, scene.color[safe], 0.0),
        reflect=jnp.where(m, scene.reflect[safe], 0.0),
        transparent=jnp.where(hit, scene.transparent[safe], 0.0),
        ior=jnp.where(hit, scene.refract_index[safe], 1.0))


def _refine_winner(blocks, idx, o, v, t_min, hit):
    """Hit-local re-solve of the winning object's root for curved families
    (see intersect.REFINERS); planar winners pass through unchanged.
    Returns (t_refined, valid): margin-band candidates the refine pass
    reveals as true misses come back invalid.  (jnp path only -- the pallas
    kernel refines in-kernel.)"""
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


def trace(scene: SceneData, o, v, need_normal: bool = True,
          live=None) -> TraceResult:
    """Closest hit of rays (o, v) against the whole scene.

    o, v: [R, D].  v need not be exactly unit (the engine unitizes, matching
    the C which traces unitized look/shadow/bounce vectors).  ``live``
    ([R] bool) marks lanes whose result the caller will use: bounce loops
    re-trace stale rays on dead lanes, and the megakernel skips fully-dead
    tiles (results on dead lanes are garbage -- callers mask)."""
    mode = _pallas_mode(scene, o)
    if mode is not None:
        t_min, hit, mat_id, nrm, props = _pallas_closest(
            scene, o, v, mode, need_normal=need_normal, live=live)
        point = o + v * t_min[:, None]
        if props is None:
            props = _gather_props(scene, mat_id, hit)
        return TraceResult(t=t_min, hit=hit, mat_id=mat_id, point=point,
                           normal=(nrm if need_normal else None), **props)
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

    idx, t_min, hit, mat_id = _closest_with_refine(blocks, t_all,
                                                   mat_all, o, v)
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
                       normal=normal, **_gather_props(scene, mat_id, hit))


def occlusion_trace(scene: SceneData, o, v, exclude_mat=None,
                    live=None) -> TraceResult:
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
    mode = _pallas_mode(scene, o)
    if mode is not None:
        t_min, hit, mat_id, _, _ = _pallas_closest(
            scene, o, v, mode, exclude_mat=exclude_mat, need_normal=False,
            live=live)
        point = o + v * t_min[:, None]
        return TraceResult(t=t_min, hit=hit, mat_id=mat_id, point=point,
                           normal=None)
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


def shadow_trace(scene: SceneData, o, v, limit, live=None) -> TraceResult:
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
    mode = _pallas_mode(scene, o)
    if mode is not None:
        return _pallas_shadow(scene, o, v, limit, mode, live=live)
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
