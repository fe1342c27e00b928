"""The wavefront render engine: ray generation, bounce loop, frame assembly.

This is the TPU rebuild of ndt.c's render pipeline (render_image ->
render_line -> render_pixel -> get_pixel_color -> get_ray_color).  Instead of
per-pixel recursion on CPU threads, a whole tile of rays advances in lockstep
through a *bounce stack*:

  * Each ray slot carries a small fixed stack of pending path nodes
    (origin, direction, per-channel weight W, scalar importance frac,
    remaining depth).  One node is popped per iteration, traced, shaded, its
    weighted local color accumulated, and its reflection/refraction children
    pushed.  This flattens get_ray_color's recursion (ndt.c:329-450) --
    including the importance cutoff frac < 1/512 (ndt.c:336) and max depth --
    into a data-parallel loop with static shapes.
  * Scenes without transparent objects compile with stack capacity 1 (a pure
    reflection chain), so the common case pays no stack overhead; the choice
    is static at trace time.
  * Weights follow the specular blend (ndt.c:405-417):
      color(node) = (1-r) o local + r o color(reflect) + (1-r) o color(refract)
    or the additive blend when specular is disabled.  A cut-off child is
    exactly equivalent to adding black, which is what the C recursion
    returns (ndt.c:334-341).

Pixels map to camera rays per ndt.c:578-653 (stereo layouts) and
get_pixel_color (jitter, depth-of-field aperture sampling, VR/PANO eye
rotation).  The adaptive sample loop (ndt.c:488) re-evaluates identical
deterministic rays when samples==1; we render one.  For samples>1 the jitter
uses jax.random: statistically, not bitwise, equivalent to drand48.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ndt_tpu import camera as cam_mod
from ndt_tpu import mathnd
from ndt_tpu.camera import CameraData, CameraType, target_point
from ndt_tpu.constants import BIG, EPSILON, MIN_PIXEL_FRAC
from ndt_tpu.render.shade import apply_lights
from ndt_tpu.render.trace import trace
from ndt_tpu.scene.compile import SceneData, compile_scene


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    """Static knobs (the CLI flags that shape compilation)."""

    width: int = 1920
    height: int = 1080
    samples: int = 1                 # -n
    max_optic_depth: int = 128       # -l
    stereo: str = "mono"             # -m: mono|side|over|anaglyph|hidef
    specular: bool = True            # -p disables
    record_depth: bool = False       # -z
    whitted: bool = False            # -w recursive anti-aliasing
    aa_diff: int = 20                # -a diff,depth
    aa_depth: int = 4
    adaptive: bool = True            # per-pixel convergence sampling (C
                                     # always adapts; only kicks in with
                                     # jittered samples > 1)
    dtype: str = "float32"
    tile: int = 1 << 20              # rays per device dispatch (a 1080p
                                     # frame fits in 2 dispatches; smaller
                                     # tiles multiply host-dispatch latency)
    stack_size: int = 16             # pending refraction branches per ray
    chunk_iters: int = 16            # bounce iterations per device dispatch
    compact: int = 4                 # bounce-survivor compaction divisor:
                                     # 256-lane blocks containing live rays
                                     # descend a geometric width ladder
                                     # (R, R/c, R/c^2, ...) as activity
                                     # decays (_run_adaptive); 0/1 disables
    seed: int = 0
    devices: Optional[object] = None  # jax mesh for tile sharding


# --------------------------------------------------------------------------
# bounce loop

# fused in-kernel shadow tests (one megakernel launch per bounce instead of
# closest + shadow + occlusion); NDT_FUSED_SHADOW=0 to fall back
_FUSED_SHADOW = os.environ.get("NDT_FUSED_SHADOW", "1") != "0"
# re-sort of compacted bounce survivors by (origin cell, direction octant)
# to restore the tile cull for divergent reflected rays.  Measured a NET
# LOSS on every workload tried (TPU v5e, same-session A/B -- balls@1080p
# 499->470, hypercube-walls@720p 413->328 Mrays/s): the lane-level
# sort+gather machinery costs ~2.5 ms at 1080p and the tightened direction
# bounds don't pay it back (walls' reflected origins span the whole box,
# so origin bounds loosen as direction bounds tighten).  OFF by default;
# NDT_DIR_SORT=1 re-enables for experiments.  The shipped answer to
# divergent-ray culling is the in-kernel front-to-back early exit over
# reach-sorted candidate lists (pallas_trace._EARLY_EXIT).
_DIR_SORT = os.environ.get("NDT_DIR_SORT", "0") != "0"
# sort key: "cell" = (origin cell, direction octant) joint clustering,
# "octant" = direction octant only, "noop" = permutation machinery with a
# constant key (isolates the sort's fixed cost for A/B)
_DIR_SORT_KEY = os.environ.get("NDT_DIR_SORT_KEY", "cell")


def _trace_with_lights(scene, o, v, live, specular, key=None):
    """Closest hit plus, when the scene supports it, the complete local
    shading computed INSIDE the same megakernel launch (render/pallas_trace
    fused mode).  ``key`` feeds the per-ray area-light surface sampling
    (ndt.c:116-147).  Returns (TraceResult, local [R, 3] | None)."""
    from ndt_tpu.render.trace import (_pallas_mode, fused_light_info,
                                      trace_fused)

    if (_FUSED_SHADOW and _pallas_mode(scene, o) is not None
            and fused_light_info(scene) is not None):
        return trace_fused(scene, o, v, live=live, specular=specular,
                           key=key)
    return trace(scene, o, v, need_normal=True, live=live), None


def _node_budget(opts: RenderOptions, has_transparent: bool) -> int:
    if not has_transparent:
        return opts.max_optic_depth
    # a fully-branching path tree has at most 2^10-1 nodes above the 1/512
    # importance cutoff (children spawn while frac >= 1/512 and both branch
    # weights are <= 1/2 of the parent when contrib = 0.5); the while_loop
    # exits as soon as every ray's stack drains, so this bound only matters
    # for pathological tiles
    return min(1 << min(opts.max_optic_depth, 10), 1024)


# stack-mode nodes popped (and traced/shaded as one batch) per loop
# iteration -- see _stack_loop; 1 = the sequential reference behavior and
# the measured default: K > 1 only compresses iterations when lane stacks
# are DEEP (>= K pending nodes), but the refraction tail is dominated by
# sp <= 2 lanes, so K = 4 padded ~3 dummy sub-lanes into every trace for
# no iteration win (TPU A/B, anim6d 640x480 all-stack: K=1 0.030 s/frame
# vs K=4 0.152 -- r4's measured "win" was an artifact of the einsum
# divergence documented in _stack_loop).
_STACK_POP = int(os.environ.get("NDT_STACK_POP", 1))

# when K > 1 is requested, batched pops engage only at loop widths <=
# this (f32): at full frame width the K-1 dummy sub-lanes of shallow
# stacks multiply real compute; at narrow (launch-latency-bound) widths
# the padding is cheaper
_STACK_POP_WMAX = int(os.environ.get("NDT_STACK_POP_WMAX", 1 << 15))

# stack-mode (refractive) rays carry a [stack_size, D] pending-node stack
# each (~1.4 KB/ray at S=16, D<=8 with XLA temps on top): a full 1080p
# batch at once exceeds a v5e's 16 GB HBM.  Batches above this cap run as
# a lax.map over sub-batches -- still one XLA program, memory bounded.
_STACK_TILE = int(os.environ.get("NDT_STACK_TILE", 1 << 19))


def _compact_quantum(opts: RenderOptions) -> int:
    """Batch-width multiple required by the block compaction (R must
    divide into RT-ray kernel tiles at the first compaction level)."""
    from ndt_tpu.render.pallas_trace import RT

    return RT * opts.compact * opts.compact


_BLK = 256  # block-mode compaction granularity (NDT_COMPACT_GRAIN=block)
# descend granularity: "lane" packs live LANES tightly via a cumsum stable
# partition (handles spatially-uniform liveness -- e.g. random's
# transparent objects scattered across the whole screen, where 256-lane
# blocks almost all stay live and block descent stalls at full width);
# "block" moves whole 256-lane blocks (contiguous DMA, preserves screen-
# blocked tile coherence exactly).  Lane is the default: the stable
# partition keeps live lanes in screen order, so tile coherence degrades
# only as much as the survivor set itself is scattered.
_COMPACT_GRAIN = os.environ.get("NDT_COMPACT_GRAIN", "lane")


def _level_widths(R: int, c: int) -> list:
    """Static widths of the adaptive compaction ladder: R, R/c, R/c^2, ...
    while the next width still holds whole compaction grains and at least
    one RT-ray kernel tile's worth of work."""
    from ndt_tpu.render.pallas_trace import RT

    grain = _BLK if _COMPACT_GRAIN == "block" else 128
    widths = [R]
    while widths[-1] % (grain * c) == 0 and widths[-1] // c >= RT:
        widths.append(widths[-1] // c)
    return widths


def _compact_descend(carry, live_mask, divisor, scatter_back=()):
    """Gather every live lane (or 256-lane block) of ``carry`` into a
    width/divisor child carry.  The caller's loop condition guarantees the
    live count fits, so -- unlike the old fixed two-level scheme -- there
    is no overflow remainder to finish at the parent width.

    Carry layout contract (shared by chain and stack mode): element 0 is
    the iteration counter, elements [1:-4] are per-lane state (gathered),
    and the tail is (color, depth, nrays, key).  The child accumulates
    color/nrays from zero; ``merge(parent, child)`` scatter-adds them back
    (gather indices are unique, so no sort-based scatter).  Depth travels
    WITH the gathered lanes (gather down, scatter-set back up): it is
    written only by the primary iteration (``it == 0``), and when the
    initial live set is sparse (a mostly-dead tail sub-batch via
    ``live0``) the ladder legitimately descends before the primary
    iteration has run, so the child's depth writes must survive the
    merge.

    ``scatter_back``: carry indices of per-lane state that must ALSO
    survive the merge (scatter-set like depth) -- e.g. the escalation
    taint mask, which narrow levels keep setting and the caller reads at
    the end."""
    it = carry[0]
    per_lane = carry[1:-4]
    color, depth, nrays, key = carry[-4:]
    R = live_mask.shape[0]
    R2 = R // divisor

    if _COMPACT_GRAIN == "block":
        nb = R // _BLK
        cap = nb // divisor
        blk_live = live_mask.reshape(nb, _BLK).any(1)
        # stable partition of block ids: live blocks first, original order
        _, order = jax.lax.sort_key_val(
            (~blk_live).astype(jnp.int32), jnp.arange(nb, dtype=jnp.int32),
            is_stable=True)
        src = ((order[:cap, None] * _BLK
                + jnp.arange(_BLK, dtype=jnp.int32)[None, :])
               .reshape(R2))
    else:
        # stable live-first partition of LANES without a sort: two cumsums
        # assign each lane its destination slot, a unique scatter inverts
        live32 = live_mask.astype(jnp.int32)
        c_live = jnp.cumsum(live32)                 # 1-based rank among live
        nlive = c_live[-1]
        iota = jnp.arange(R, dtype=jnp.int32)
        c_dead = iota + 1 - c_live                  # 1-based rank among dead
        dst = jnp.where(live_mask, c_live - 1, nlive + c_dead - 1)
        src = jnp.zeros((R,), jnp.int32).at[dst].set(
            iota, unique_indices=True)[:R2]

    def lgather(a):
        return a[src]

    child = ((it,) + tuple(lgather(a) for a in per_lane)
             + (jnp.zeros((R2, 3), color.dtype), lgather(depth),
                jnp.zeros((), nrays.dtype), jax.random.fold_in(key, 1)))

    def merge(parent, kid):
        pcolor = parent[-4].at[src].add(kid[-4], unique_indices=True)
        pdepth = parent[-3].at[src].set(kid[-3], unique_indices=True)
        head = list(parent[:-4])
        for j in scatter_back:
            head[j] = parent[j].at[src].set(kid[j], unique_indices=True)
        return tuple(head) + (pcolor, pdepth, parent[-2] + kid[-2],
                              parent[-1])

    return child, merge


def _run_adaptive(carry, opts: RenderOptions, loop_factory, live_of,
                  chain_mode=False, scatter_back=()):
    """Adaptive multi-level bounce loop: at each width, iterate while the
    live 256-lane block count exceeds the next level's capacity, then
    gather ALL live blocks one level down and continue there.  The ladder
    narrows exactly as fast as the workload's own activity decay allows --
    scenes whose activity collapses after the primary bounce descend
    immediately (the old fixed schedule), while scenes with a reflective
    floor (every primary ray spawns a child) or deep refraction tails
    (anim6d: ~245 stack iterations, <4% of blocks live past iteration 10)
    run each phase at the narrowest width that holds it.  Replaces the
    fixed two-level schedule whose overflow loops ran such tails at FULL
    width (measured 59.6 s/frame for anim6d@480p on a v5e; the reference's
    per-ray recursion never faces this because each C ray pays only for
    its own path tree, ndt.c:329-450)."""
    c = opts.compact
    R = live_of(carry).shape[0]
    widths = _level_widths(R, c)

    def run(k, carry):
        cond_base, body = loop_factory(widths[k])
        if k + 1 == len(widths):
            return jax.lax.while_loop(cond_base, body, carry)
        if _COMPACT_GRAIN == "block":
            cap = (widths[k] // _BLK) // c
            count = lambda cc: live_of(cc).reshape(-1, _BLK).any(1).sum()
        else:
            cap = widths[k + 1]
            count = lambda cc: live_of(cc).sum()

        def cond(cc):
            return cond_base(cc) & (count(cc) > cap)

        carry = jax.lax.while_loop(cond, body, carry)
        # descend: either every live block fits in the child width, or the
        # base condition is exhausted and the child loops are zero-trip
        child, merge = _compact_descend(carry, live_of(carry), c,
                                        scatter_back=scatter_back)
        if chain_mode and k == 0 and _DIR_SORT:
            child, unsort = _dir_sort_chain(child)
            child = unsort(run(k + 1, child))
        else:
            child = run(k + 1, child)
        return merge(carry, child)

    return run(0, carry)


def _pad_dead(o, v, quantum):
    """Pad a ray batch to a multiple of ``quantum`` with dead lanes (finite
    dummy geometry at the tail; callers mark the pad lanes inactive so they
    trace nothing and count nothing, then slice outputs back to the
    original length)."""
    R0, D = o.shape
    pad = (-R0) % quantum
    if pad == 0:
        return o, v, R0
    o = jnp.concatenate([o, jnp.zeros((pad, D), o.dtype)])
    vp = jnp.zeros((pad, D), v.dtype).at[:, 0].set(1.0)
    v = jnp.concatenate([v, vp])
    return o, v, R0


# stack-mode escalation (VERDICT r2 item 3): scenes WITH transparent
# objects first run the cheap chain loop; lanes that actually hit glass
# taint and re-run from their primary ray in stack mode (typically a small
# minority -- scenes pay for the per-ray pending-node stack only where
# glass is hit; ref: the refraction recursion being flattened,
# ndt.c:421-430).  NDT_STACK_ESCALATE=0 restores all-stack for A/B.
_ESCALATE = os.environ.get("NDT_STACK_ESCALATE", "1") != "0"

# taint-adaptive gating (VERDICT r4 weak 1: glass-heavy scenes taint most
# lanes, so unconditional escalation paid BOTH a full-width chain phase
# and a near-full-width stack re-run -- anim6d regressed 8.6x/frame).  A
# cheap probe estimates the taint fraction first: a strided lane subsample
# runs the escalate chain loop for a few bounces and counts glass hits.
# Above _ESC_TAINT_MAX the batch skips phase A entirely (its initial live
# set is zeroed, so every chain while_loop zero-trips) and runs all-stack.
# f32 only: f64 is the bit-exact parity surface and keeps the documented
# escalate-always behavior.
_ESC_TAINT_MAX = float(os.environ.get("NDT_ESC_TAINT_MAX", "0.25"))
_ESC_PROBE_STRIDE = int(os.environ.get("NDT_ESC_PROBE_STRIDE", "16"))
_ESC_PROBE_ITERS = int(os.environ.get("NDT_ESC_PROBE_ITERS", "4"))


def _probe_taint_frac(scene: SceneData, o, v, key, opts: RenderOptions):
    """Estimated fraction of lanes that would taint (reach a transparent
    hit) within the first _ESC_PROBE_ITERS bounces: the escalate chain
    loop on an every-Nth-lane subsample.  Returns (frac f32 scalar,
    rays_traced i32).  Traced code -- usable inside jit/shard_map."""
    R = o.shape[0]
    stride = _ESC_PROBE_STRIDE
    while stride > 1 and R // stride < 256:
        stride //= 2
    op, vp = o[::stride], v[::stride]
    carry = _chain_init(scene, op, vp, key, opts, escalate=True)
    cond, body = _chain_loop(scene, op.shape[0], op.dtype, opts,
                             escalate=True)
    probe_iters = jnp.int32(_ESC_PROBE_ITERS)

    def cond2(c):
        return cond(c) & (c[0] < probe_iters)

    carry = jax.lax.while_loop(cond2, body, carry)
    taint = carry[2]
    return taint.astype(jnp.float32).mean(), carry[-2]


_probe_taint_jit = jax.jit(_probe_taint_frac, static_argnames=("opts",))


def _stack_subbatches(scene: SceneData, o, v, key, opts: RenderOptions,
                      live0=None):
    """Stack-mode render with the HBM sub-batch cap: batches above
    _STACK_TILE run as a lax.map over sub-batches (still one XLA program,
    memory bounded).  ``live0``: lanes to actually trace (the escalation
    taint set); dead lanes return zeros."""
    R0 = o.shape[0]
    # sub-batch width: the HBM cap, rounded up so each sub-batch satisfies
    # the compaction quantum (caps below the quantum stay as-is -- those
    # sub-batches run the while_loop path, still memory-bounded)
    q = _compact_quantum(opts)
    tile = _STACK_TILE
    if opts.compact > 1 and tile >= q:
        tile += (-tile) % q
    if R0 <= tile:
        return _render_rays_stack(scene, o, v, key, opts, live0=live0)
    o, v, _ = _pad_dead(o, v, tile)
    R = o.shape[0]
    n_sub = R // tile
    live = jnp.arange(R) < R0
    if live0 is not None:
        live = live & jnp.concatenate(
            [live0, jnp.zeros((R - R0,), bool)])
    live = live.reshape(n_sub, tile)

    def one(args):
        i, oc, vc, lv = args
        return _render_rays_stack(scene, oc, vc,
                                  jax.random.fold_in(key, i), opts,
                                  live0=lv)

    c, d, n = jax.lax.map(
        one, (jnp.arange(n_sub, dtype=jnp.int32),
              o.reshape(n_sub, tile, -1),
              v.reshape(n_sub, tile, -1), live))
    return c.reshape(R, 3)[:R0], d.reshape(R)[:R0], n.sum()


def render_rays(scene: SceneData, o, v, key, opts: RenderOptions):
    """Trace a batch of primary rays to completion IN ONE XLA PROGRAM
    (used inside outer jits: sharding dry-runs, tests).  The host path
    (render_tile) uses render_rays_chunked instead: very deep bounce loops
    in a single device program can outrun execution watchdogs."""
    if not scene.has_transparent:
        return _render_rays_chain(scene, o, v, key, opts)
    if _ESCALATE:
        # phase A: chain loop with taint; phase B: stack re-run of exactly
        # the tainted lanes (live0 sparsity makes the compaction ladder
        # descend immediately to the width that holds them).  Bit-identical
        # to all-stack except area-light sample keys (the node visit order
        # per lane is the same).
        #
        # Taint-adaptive (f32): when the probe predicts a glass-heavy
        # batch, phase A is skipped (its live set zeroes, every chain
        # while_loop zero-trips) and phase B runs ALL lanes -- the same
        # one traced program either way, no lax.cond branch duplication.
        live_in = None
        all_mode = None
        prays = 0
        if o.dtype == jnp.float32:
            ptf, prays = _probe_taint_frac(scene, o, v, key, opts)
            all_mode = ptf > _ESC_TAINT_MAX
            live_in = jnp.broadcast_to(~all_mode, (o.shape[0],))
        color, depth, nrays, taint = _render_rays_chain(
            scene, o, v, key, opts, escalate=True, live_in=live_in)
        live0 = taint if all_mode is None else (taint | all_mode)
        cb, db, nb = _stack_subbatches(scene, o, v, key, opts,
                                       live0=live0)
        color = jnp.where(live0[:, None], cb, color)
        if all_mode is not None:
            # phase A never ran in all-stack mode: take the stack depth
            depth = jnp.where(all_mode, db, depth)
        return color, depth, (nrays + nb + prays).astype(nrays.dtype)
    return _stack_subbatches(scene, o, v, key, opts)


@functools.partial(jax.jit, static_argnames=("opts", "mode"))
def _chunk_step(scene, carry, opts: RenderOptions, mode: str):
    """Run up to opts.chunk_iters bounce iterations; returns (carry, done).
    mode: 'chain' | 'chain_esc' (escalation phase A) | 'stack'."""
    if mode == "chain":
        cond0, body = _chain_loop(scene, carry[2].shape[0],
                                  carry[2].dtype, opts)
    elif mode == "chain_esc":
        cond0, body = _chain_loop(scene, carry[3].shape[0],
                                  carry[3].dtype, opts, escalate=True)
    else:
        cond0, body = _stack_loop(scene, carry[2].shape[0],
                                  carry[2].dtype, opts)
    it0 = carry[0]

    def cond(c):
        return cond0(c) & (c[0] < it0 + opts.chunk_iters)

    carry = jax.lax.while_loop(cond, body, carry)
    return carry, ~cond0(carry)


def _run_chunked(scene, carry, opts, mode, budget):
    while True:
        carry, done = _chunk_step(scene, carry, opts, mode)
        if bool(done) or int(carry[0]) >= budget:
            break
    return carry


def render_rays_chunked(scene, o, v, key, opts: RenderOptions):
    """Host-driven bounce loop: dispatches opts.chunk_iters iterations per
    device program and transfers one 'done' scalar per chunk, so no single
    execution runs unboundedly long."""
    if not scene.has_transparent:
        carry = _run_chunked(scene, _chain_init(scene, o, v, key, opts),
                             opts, "chain", opts.max_optic_depth)
        return carry[-4], carry[-3], carry[-2]
    probe_rays = 0
    if _ESCALATE and o.dtype == jnp.float32:
        # taint-adaptive gating, host flavor: the probe's verdict is a
        # real Python bool here, so a glass-heavy batch skips phase A by
        # simply not dispatching it
        ptf, pn = _probe_taint_jit(scene, o, v, key, opts)
        probe_rays = int(pn)
        if float(ptf) > _ESC_TAINT_MAX:
            carry = _run_chunked(scene,
                                 _stack_init(scene, o, v, key, opts),
                                 opts, "stack", _node_budget(opts, True))
            return (carry[-4], carry[-3], carry[-2] + probe_rays)
    if _ESCALATE:
        # escalation (see render_rays): chain phase A at full width, then
        # -- the host path's luxury -- a DYNAMIC gather of exactly the
        # tainted lanes into a compact stack-mode batch (no dead-lane
        # padding beyond the kernel tile quantum)
        carry = _run_chunked(
            scene, _chain_init(scene, o, v, key, opts, escalate=True),
            opts, "chain_esc", opts.max_optic_depth)
        color, depth, nrays = (np.asarray(carry[-4]).copy(),
                               carry[-3], carry[-2])
        ti = np.nonzero(np.asarray(carry[2]))[0]
        if ti.size:
            oe = jnp.asarray(np.asarray(o)[ti])
            ve = jnp.asarray(np.asarray(v)[ti])
            cb = _run_chunked(scene, _stack_init(scene, oe, ve, key, opts),
                              opts, "stack", _node_budget(opts, True))
            color[ti] = np.asarray(cb[-4])
            nrays = nrays + cb[-2]
        return jnp.asarray(color), depth, nrays + probe_rays
    carry = _run_chunked(scene, _stack_init(scene, o, v, key, opts),
                         opts, "stack", _node_budget(opts, True))
    return carry[-4], carry[-3], carry[-2]


def _chain_init(scene, o, v, key, opts, escalate=False):
    R, D = o.shape
    dt = o.dtype
    taint = (jnp.zeros((R,), bool),) if escalate else ()
    return (jnp.int32(0), jnp.ones((R,), bool)) + taint + (o, v,
            jnp.ones((R, 3), dt), jnp.ones((R,), dt),
            jnp.zeros((R, 3), dt), jnp.zeros((R,), dt),
            jnp.zeros((), jnp.int32), key)


def _chain_loop(scene, R, dt, opts, escalate=False):
    """(cond, body) for the chain-mode bounce loop.

    ``escalate`` (stack-mode escalation, VERDICT r2 item 3): the loop runs
    on a scene WITH transparent objects; a live lane whose winner is
    transparent sets its sticky ``taint`` flag (carry slot 2) and freezes
    -- its partial chain accumulation is discarded by the caller, which
    re-runs exactly the tainted lanes from their primary rays in stack
    mode (the lanes that never touch glass, typically almost all, pay the
    cheap chain loop only; ref: the refraction recursion ndt.c:421-430)."""
    max_depth = opts.max_optic_depth
    n_shadow_lights = sum(1 for l in scene.lights if l.kind != 0)

    def cond(carry):
        it, active, *_ = carry
        return (it < max_depth) & active.any()

    def body(carry):
        if escalate:
            (it, active, taint, o, v, w, frac, color, depth, nrays,
             key) = carry
        else:
            (it, active, o, v, w, frac, color, depth, nrays, key) = carry
            taint = None
        # dead lanes re-trace their stale (spatially coherent) ray; the
        # megakernel skips fully-dead tiles via the live mask and bounds
        # live tiles' culls over surviving lanes only
        from ndt_tpu.render.trace import (_pallas_mode, fused_light_info,
                                          trace_fused_step)

        if (_FUSED_SHADOW and _pallas_mode(scene, o) is not None
                and fused_light_info(scene) is not None):
            # the whole bounce iteration (closest hit + apply_lights +
            # node accumulation + mirror spawn) runs in two kernel
            # launches; only the depth map, ray accounting and the
            # max-depth gate stay in XLA (they involve loop scalars)
            key, skey = jax.random.split(key)
            out = trace_fused_step(
                scene, o, v, w, frac, color, live=active,
                specular=opts.specular, key=skey, escalate=escalate)
            t, o2, v2, w2, f2, c2, nxt = out[:7]
            hit_raw = t < BIG * 0.5
            hit = hit_raw & active
            nrays = (nrays + active.sum()
                     + hit.sum() * n_shadow_lights).astype(nrays.dtype)
            prim_depth = jnp.where(hit_raw & (t > EPSILON), 1.0 / t, 0.0)
            depth = jnp.where(it == 0, prim_depth.astype(dt), depth)
            nxt = nxt & (it + 2 <= max_depth)
            if escalate:
                taint = taint | (out[7] & active)
                return (it + 1, nxt, taint, o2, v2, w2, f2, c2, depth,
                        nrays, key)
            return (it + 1, nxt, o2, v2, w2, f2, c2, depth, nrays, key)

        key, skey = jax.random.split(key)
        tr, fused_local = _trace_with_lights(scene, o, v, active,
                                             opts.specular, key=skey)
        hit = tr.hit & active
        nrays = (nrays + active.sum()
                 + hit.sum() * n_shadow_lights).astype(nrays.dtype)

        if fused_local is None:
            local = apply_lights(scene, o, v, tr, hit, key=skey,
                                 specular=opts.specular)
        else:
            local = fused_local

        refl = tr.reflect
        contrib = refl.max(axis=-1)
        local_w = (1.0 - refl) if opts.specular else jnp.ones_like(refl)
        node_color = jnp.where(hit[:, None], local_w * local,
                               jnp.where(active[:, None],
                                         scene.bg[None, :], 0.0))
        color = color + w * node_color
        prim_depth = jnp.where(tr.hit & (tr.t > EPSILON), 1.0 / tr.t, 0.0)
        depth = jnp.where(it == 0, prim_depth.astype(dt), depth)

        refl_any = (refl != 0).any(axis=-1)
        nxt = (hit & (contrib > 0) & refl_any
               & (frac * contrib >= MIN_PIXEL_FRAC) & (it + 2 <= max_depth))
        if escalate:
            taint_new = hit & (tr.transparent > 0)
            taint = taint | taint_new
            nxt = nxt & ~taint_new
        v_new = mathnd.unitize(mathnd.reflect(v, tr.normal, 1.0))
        o = jnp.where(nxt[:, None], tr.point, o)
        v = jnp.where(nxt[:, None], v_new, v)
        w = jnp.where(nxt[:, None], w * refl, w)
        frac = jnp.where(nxt, frac * contrib, frac)
        if escalate:
            return (it + 1, nxt, taint, o, v, w, frac, color, depth,
                    nrays, key)
        return (it + 1, nxt, o, v, w, frac, color, depth, nrays, key)

    return cond, body


def _render_rays_chain(scene: SceneData, o, v, key, opts: RenderOptions,
                       escalate: bool = False, live_in=None):
    """Reflection-only scenes: each ray is a single chain, so the bounce
    loop carries the continuation ray directly -- no per-ray stack, no
    gather/scatter traffic.

    When the batch is large, the adaptive compaction ladder (_run_adaptive)
    gathers the 256-lane BLOCKS that still contain live rays down a
    geometric width ladder as activity decays (typically <10% of primary
    rays reflect onward, and a full-width iteration costs the same whether
    5% or 100% of lanes are alive).  Block granularity keeps every data
    movement contiguous -- a big per-lane scatter lowers to an XLA sort
    that costs more than it saves -- and the stable block order preserves
    screen-blocked coherence for the megakernel's per-tile cull.  No ray
    is ever dropped: a level only descends when every live block fits.

    With ``escalate`` (see _chain_loop) the return gains a trailing taint
    mask [R0]: lanes frozen at a transparent hit for a stack-mode re-run
    (their returned color is the discarded partial chain accumulation).

    ``live_in`` [R0] bool: lanes to actually run (the taint-adaptive
    escalation zeroes it to skip phase A -- every while_loop then
    zero-trips)."""
    R0 = o.shape[0]
    esc = 1 if escalate else 0
    q = _compact_quantum(opts)
    compactable = opts.compact > 1 and R0 >= q
    if compactable and R0 % q != 0:
        # non-divisible widths (e.g. per-shard slices of a mesh-sharded
        # frame) pad with dead lanes rather than losing compaction
        o, v, _ = _pad_dead(o, v, q)
    R = o.shape[0]
    carry = _chain_init(scene, o, v, key, opts, escalate=escalate)
    live = None if R == R0 else (jnp.arange(R) < R0)
    if live_in is not None:
        li = live_in if R == R0 else jnp.concatenate(
            [live_in, jnp.zeros((R - R0,), bool)])
        live = li if live is None else (live & li)
    if live is not None:
        carry = carry[:1] + (carry[1] & live,) + carry[2:]

    if not compactable:
        cond, body = _chain_loop(scene, R, o.dtype, opts,
                                 escalate=escalate)
        carry = jax.lax.while_loop(cond, body, carry)
    else:
        carry = _run_adaptive(
            carry, opts,
            lambda w: _chain_loop(scene, w, o.dtype, opts,
                                  escalate=escalate),
            live_of=lambda c: c[1], chain_mode=not escalate,
            scatter_back=(2,) if escalate else ())
    out = (carry[6 + esc][:R0], carry[7 + esc][:R0], carry[8 + esc])
    if escalate:
        out += (carry[2][:R0],)
    return out


def _dir_sort_perm(o, v, active, blk=256):
    """Permutation restoring direction coherence for compacted bounce rays.

    The megakernel's per-tile interval cull (pallas_trace.cull_lists) needs
    tight per-tile direction bounds; after a bounce off curved surfaces the
    rays in a tile point every which way and the cull collapses to the full
    object list -- the reference never faces this because its kd traversal
    culls per ray (kd-tree.c:482-607).  Sorting the compacted survivors by
    (direction octant, source block) re-groups rays so each RT tile spans
    few octants (tight v intervals) with origins still clustered by screen
    block (tight o intervals).  Dead lanes sort to the back, which also
    concentrates liveness into fewer tiles.

    Key modes (_DIR_SORT_KEY): "cell" groups by (coarse origin cell,
    direction octant) so each tile gets tight bounds on BOTH o and v --
    octant alone proved direction-tight but origin-loose, which loses on
    box-interior scenes whose reflected origins span the whole scene.  The
    sort is stable, so within equal keys the original screen-block order
    (and its origin coherence) is preserved for free.

    Returns (perm, inv): sorted = a[perm], original = sorted[inv]."""
    R, D = v.shape
    octant = sum(((v[:, d] >= 0).astype(jnp.int32) << d) for d in range(D))
    if _DIR_SORT_KEY == "noop":
        key = jnp.where(active, jnp.int32(0), jnp.int32(1) << 30)
    elif _DIR_SORT_KEY == "octant":
        blk_id = jnp.arange(R, dtype=jnp.int32) // blk
        nb = R // blk
        key = jnp.where(active, octant * nb + blk_id, jnp.int32(1) << 30)
    else:  # "cell": origin-cell major, octant minor
        ncell = 4
        lo = jnp.where(active[:, None], o, BIG).min(0)        # [D]
        hi = jnp.where(active[:, None], o, -BIG).max(0)
        span = jnp.maximum(hi - lo, 1e-6)
        ci = jnp.clip((o - lo[None, :]) / span[None, :] * ncell,
                      0, ncell - 1).astype(jnp.int32)          # [R, D]
        cell = jnp.zeros((R,), jnp.int32)
        for d in range(D):
            cell = cell * ncell + ci[:, d]
        key = jnp.where(active, (cell << D) | octant, jnp.int32(1) << 30)
    iota = jnp.arange(R, dtype=jnp.int32)
    _, perm = jax.lax.sort_key_val(key, iota, is_stable=True)
    _, inv = jax.lax.sort_key_val(perm, iota, is_stable=True)
    return perm, inv


def _dir_sort_chain(carry):
    """Apply _dir_sort_perm to a chain-loop carry; returns
    (sorted_carry, unsort) where unsort(child_carry) restores the original
    lane order of the per-lane outputs (color) so block-structured merges
    stay valid."""
    (it, active, o, v, w, frac, color, depth, nrays, key) = carry
    perm, inv = _dir_sort_perm(o, v, active)
    g = lambda a: a[perm]
    sorted_carry = (it, g(active), g(o), g(v), g(w), g(frac), g(color),
                    g(depth), nrays, key)

    def unsort(child):
        (it2, a2, o2, v2, w2, f2, c2, d2, n2, k2) = child
        return (it2, a2[inv], o2[inv], v2[inv], w2[inv], f2[inv], c2[inv],
                d2[inv], n2, k2)

    return sorted_carry, unsort


def _stack_init(scene, o, v, key, opts):
    R, D = o.shape
    dt = o.dtype
    S = opts.stack_size
    max_depth = opts.max_optic_depth
    # ONE packed stack array [R, S, 2D+5], per node [o(D) v(D) w(3) f d]:
    # every pop/push touches a single tensor instead of five, and at the
    # narrow widths the escalation gathers glass lanes into, each op's
    # FIXED launch cost dominates its bytes -- packing measured the stack
    # machinery from 3.9 to (see ARCHITECTURE.md perf journal) ms/iter.
    # Depth travels as f32 (exact for any sane max_optic_depth).
    node0 = jnp.concatenate([
        o, v, jnp.ones((R, 3), dt),
        jnp.ones((R, 1), dt),
        jnp.full((R, 1), max_depth, dt)], axis=1)
    st = jnp.zeros((R, S, 2 * D + 5), dt).at[:, 0].set(node0)
    sp = jnp.ones((R,), jnp.int32)
    color = jnp.zeros((R, 3), dt)
    depth = jnp.zeros((R,), dt)
    nrays = jnp.zeros((), jnp.int64 if dt == jnp.float64 else jnp.int32)
    return (jnp.int32(0), sp, st, color, depth, nrays, key)


def _stack_loop(scene, R, dt, opts):
    """(cond, body) for the stack-mode bounce loop, processing the top
    min(K, sp) stack nodes of every lane PER ITERATION (K =
    NDT_STACK_POP, default 4).

    The one-node-per-iteration loop is fixed-cost-bound at escalation
    widths: each iteration's ~15 fused XLA kernels cost ~0.3 ms of launch
    latency each on the bench harness regardless of lane count, so a
    34-node path tree paid 34 x ~7 ms while the lanes' actual math was
    microseconds.  Popping K nodes at once batches the trace+shade over
    R*K rays (one kernel chain per iteration, K x the work per kernel)
    and cuts iterations toward ceil(nodes/K).

    Node VALUES are frozen at push time, so batched processing computes
    exactly the per-node colors of the sequential loop; only the
    ACCUMULATION ORDER changes (interleaved siblings instead of
    depth-first subtrees).  That reordering is harmless at f32 tolerances
    but can flip single bytes against the f64 bit-exact C goldens, so
    batching engages only for f32 (the perf path); f64 -- the parity
    surface -- keeps K=1, which reproduces the sequential loop
    bit-for-bit.  Batching also only engages at widths <= _STACK_POP_WMAX
    (see its comment: at full frame width the K-1 dummy sub-lanes of
    single-node stacks multiply real trace work).

    Child-drop semantics at the S cap match the sequential loop EXACTLY
    for any sp: each lane pops k = min(sp, K, max(1, (S - sp) // 2))
    nodes, so whenever k > 1 the <=2k children all fit (sp - k + 2k <= S
    by construction), and when the clamp has collapsed to k = 1 the push
    placement is the sequential loop's own (children at sp-1, sp; a
    refraction child at slot S drops -- the same child the C's 'fits'
    test drops, ndt.c:394-430 flattened).

    Per-row dynamic gather/scatter (st[rows, j]) lowers to TPU scatter,
    which serializes (measured 243 ms/iter at R=327k); the pop/push here
    are one-hot where/sum selects over the small S axis, unrolled over
    the K popped (2K pushed) slots so XLA fuses each into a single VPU
    pass over the stack.  NOT einsums: a one-hot einsum lowers to a
    batched MXU matmul that (a) pads the tiny [S, W] per-lane matrices
    up to the 128x128 systolic tile and (b) truncates the contracted
    operands to bf16 -- every pop then rounded the stored ray
    origins/directions, bounce rays drifted off their true geometry,
    and refraction chains self-intersected chaotically (BENCH_r04's
    anim6d regression: 2.9x the nodes AND a diverged image, TPU-only)."""
    S = opts.stack_size
    K = (min(_STACK_POP, S)
         if jnp.dtype(dt) == jnp.float32 and R <= _STACK_POP_WMAX else 1)
    sidx = jnp.arange(S)
    n_shadow_lights = sum(1 for l in scene.lights if l.kind != 0)
    budget = _node_budget(opts, scene.has_transparent)

    def cond(carry):
        it, sp, *_ = carry
        return (it < budget) & (sp > 0).any()

    def body(carry):
        (it, sp, st, color, depth, nrays, key) = carry
        W = st.shape[2]
        D = (W - 5) // 2
        # pop the top k_eff = min(sp, K, max(1, (S - sp)//2)) nodes:
        # kk = 0 is the TOP of the stack (the node the sequential loop
        # would pop this iteration).  The (S - sp)//2 clamp keeps batched
        # pops from outrunning the stack cap: deep stacks pop fewer nodes
        # per iteration so every child still fits (see docstring).
        kks = jnp.arange(K)
        k_allow = jnp.minimum(
            jnp.minimum(sp, K),
            jnp.maximum(1, (S - sp) // 2)) if K > 1 else jnp.minimum(sp, 1)
        pslot = sp[:, None] - 1 - kks[None, :]           # [R, K]
        pvalid = kks[None, :] < k_allow[:, None]         # [R, K]
        # one-hot select per popped slot, K unrolled reduces over S (see
        # docstring for why this must not be an einsum); all K fuse into
        # one VPU pass over st
        cur = jnp.stack(
            [jnp.where(((sidx[None, :] == pslot[:, kk:kk + 1])
                        & pvalid[:, kk:kk + 1])[:, :, None],
                       st, 0).sum(axis=1)
             for kk in range(K)], axis=1)                # [R, K, W]
        co = cur[..., :D].reshape(R * K, D)
        cv = cur[..., D:2 * D].reshape(R * K, D)
        cw = cur[..., 2 * D:2 * D + 3].reshape(R * K, 3)
        cf = cur[..., 2 * D + 3].reshape(R * K)
        cd = cur[..., 2 * D + 4].reshape(R * K)
        valid = pvalid.reshape(R * K)
        # invalid sub-lanes popped all-zero nodes; a v = 0 ray turns into
        # NaN t inside the trace kernel, and NaN * live_f poisons the
        # early-exit's cross-lane max (every candidate then looks
        # unreachable for the WHOLE tile).  Give them the dead-lane dummy
        # ray instead (finite geometry, results discarded), as _pad_dead
        # and the sequential loop's stale-node re-trace do.
        cv = jnp.where(valid[:, None], cv,
                       jnp.zeros_like(cv).at[:, 0].set(1.0))

        # one skey per iteration, like the sequential loop's per-pop split.
        # K > 1 does NOT correlate area-light samples across a lane's K
        # nodes: sampling draws per POSITION of the flattened [R*K] batch
        # (shade._sample_area_light samples with shape=r_shape), and the K
        # nodes of a lane occupy K distinct positions.
        key, skey = jax.random.split(key)
        tr, fused_local = _trace_with_lights(scene, co, cv, valid,
                                             opts.specular, key=skey)
        hit = tr.hit & valid
        # rays-traced accounting (the Mrays/s benchmark metric): one trace
        # per live path node + one shadow trace per non-ambient light per hit
        nrays = (nrays + valid.sum()
                 + hit.sum() * n_shadow_lights).astype(nrays.dtype)

        if fused_local is None:
            local = apply_lights(scene, co, cv, tr, hit, key=skey,
                                 specular=opts.specular)
        else:
            local = fused_local

        refl = tr.reflect                           # [R*K, 3]
        transp = tr.transparent
        contrib = refl.max(axis=-1)                 # ndt.c:393

        if opts.specular:
            local_w = 1.0 - refl                    # ndt.c:405-408
        else:
            local_w = jnp.ones_like(refl)           # ndt.c:411-414
        node_color = jnp.where(hit[:, None], local_w * local,
                               jnp.where(valid[:, None],
                                         scene.bg[None, :], 0.0))
        # accumulate per node IN POP ORDER with an unrolled add chain:
        # ((color + c0) + c1) + ... reproduces the sequential loop's f32/f64
        # summation grouping bit-for-bit (a .sum(axis=1) regrouped the adds
        # and flipped single bytes on the f64 bit-exact goldens)
        contribs = (cw * node_color).reshape(R, K, 3)
        for kk in range(K):
            color = color + contribs[:, kk]

        # depth map from the primary node (ndt.c:362-373): at it == 0
        # every lane's stack holds only the primary ray, popped as kk = 0
        t0 = tr.t.reshape(R, K)[:, 0]
        hit0 = tr.hit.reshape(R, K)[:, 0]
        prim_depth = jnp.where(hit0 & (t0 > EPSILON), 1.0 / t0, 0.0)
        depth = jnp.where(it == 0, prim_depth.astype(dt), depth)

        # children (ndt.c:394-430), in the sequential loop's candidate
        # order: parents bottom-to-top (kk = K-1 .. 0), reflection before
        # refraction; prefix-summed into slots base, base+1, ...; a child
        # whose slot reaches S is dropped (the sequential 'fits' test)
        refl_any = (refl > 0).any(axis=-1) | (refl < 0).any(axis=-1)
        ok_refl = (hit & (contrib > 0) & refl_any
                   & (cf * contrib >= MIN_PIXEL_FRAC) & (cd - 1 > 0))
        rdir = mathnd.unitize(mathnd.reflect(cv, tr.normal, 1.0))

        def nodes(point, vdir, w, f, d):
            return jnp.concatenate(
                [point, vdir, w, f[:, None], d[:, None]],
                axis=1).reshape(R, K, W)

        n_refl = nodes(tr.point, rdir, cw * refl, cf * contrib, cd - 1)
        if scene.has_transparent:
            ior = tr.ior
            ok_refr = (hit & (transp > 0)
                       & ((1.0 - contrib) * cf >= MIN_PIXEL_FRAC)
                       & (cd - 1 > 0))
            tdir = mathnd.unitize(mathnd.refract(cv, tr.normal, ior))
            n_refr = nodes(tr.point, tdir, cw * (1.0 - refl),
                           (1.0 - contrib) * cf, cd - 1)
            # candidate axis: [refl_{K-1}, refr_{K-1}, ..., refl_0, refr_0]
            cand = jnp.stack([n_refl[:, ::-1], n_refr[:, ::-1]],
                             axis=2).reshape(R, 2 * K, W)
            okc = jnp.stack([ok_refl.reshape(R, K)[:, ::-1],
                             ok_refr.reshape(R, K)[:, ::-1]],
                            axis=2).reshape(R, 2 * K)
        else:
            cand = n_refl[:, ::-1]
            okc = ok_refl.reshape(R, K)[:, ::-1]

        base = sp - k_allow                              # [R]
        pos = jnp.cumsum(okc.astype(jnp.int32), axis=1) - 1
        slot = base[:, None] + pos                       # [R, C]
        placed = okc & (slot < S)
        # one-hot placement per candidate, C unrolled select-adds (fused
        # into one VPU pass; see docstring for why not an einsum).
        # Rejected candidates can hold NaNs (refract of an opaque hit,
        # bounce math of a dead lane's zero ray) -- the where never
        # selects them, exactly like the sequential push's jnp.where.
        st = jnp.where(sidx[None, :, None] < base[:, None, None], st, 0)
        for c in range(cand.shape[1]):
            ohc_c = ((sidx[None, :] == slot[:, c:c + 1])
                     & placed[:, c:c + 1])               # [R, S]
            st = st + jnp.where(ohc_c[:, :, None],
                                cand[:, c, None, :], 0)
        sp2 = jnp.minimum(base + okc.sum(axis=1, dtype=jnp.int32), S)

        return (it + 1, sp2, st, color, depth, nrays, key)

    return cond, body


def _render_rays_stack(scene: SceneData, o, v, key, opts: RenderOptions,
                       live0=None):
    """General scenes (reflection + refraction): per-ray bounce stack.

    Same adaptive compaction ladder as the chain loop (_run_adaptive):
    256-lane blocks whose stacks are non-empty descend a geometric width
    ladder as activity decays (stack state travels with them -- the
    gathers move S x more bytes than chain mode, but the hundreds of
    full-width trace+shade iterations a deep refraction tail would
    otherwise pay dominate by far)."""
    R0 = o.shape[0]
    q = _compact_quantum(opts)
    compactable = opts.compact > 1 and R0 >= q
    if compactable and R0 % q != 0:
        o, v, _ = _pad_dead(o, v, q)
    R = o.shape[0]
    carry = _stack_init(scene, o, v, key, opts)
    dead = None
    if R != R0:
        dead = jnp.arange(R) >= R0
    if live0 is not None:
        if live0.shape[0] != R:           # pad lanes are dead by definition
            live0 = jnp.concatenate(
                [live0, jnp.zeros((R - live0.shape[0],), bool)])
        lv = live0 if dead is None else (live0 & ~dead)
        dead = ~lv
    if dead is not None:
        # dead lanes start with an empty stack: they trace nothing and
        # count nothing
        carry = carry[:1] + (jnp.where(dead, 0, carry[1]),) + carry[2:]

    if not compactable:
        cond, body = _stack_loop(scene, R, o.dtype, opts)
        carry = jax.lax.while_loop(cond, body, carry)
        return carry[3][:R0], carry[4][:R0], carry[5]

    carry = _run_adaptive(
        carry, opts, lambda w: _stack_loop(scene, w, o.dtype, opts),
        live_of=lambda c: c[1] > 0)
    return carry[3][:R0], carry[4][:R0], carry[5]


# --------------------------------------------------------------------------
# primary ray generation (get_pixel_color, ndt.c:456-576)


def gen_rays(cam: CameraData, x, y, key, opts: RenderOptions, eye: str,
             jitter: bool, aperture: bool):
    """x, y: [R] normalized screen coords.  Returns (o, v) with v unit."""
    dt = x.dtype
    if eye == "left":
        virt = jnp.broadcast_to(cam.left_eye, x.shape + cam.pos.shape)
    elif eye == "right":
        virt = jnp.broadcast_to(cam.right_eye, x.shape + cam.pos.shape)
    else:
        virt = jnp.broadcast_to(cam.pos, x.shape + cam.pos.shape)

    if jitter:  # sub-pixel anti-alias jitter (ndt.c:505-514)
        key, kx, ky = jax.random.split(key, 3)
        x = x + jax.random.uniform(kx, x.shape, dt) / opts.width
        y = y + jax.random.uniform(ky, y.shape, dt) / opts.height

    pixel = target_point(cam, x, y, cam.focal_distance)

    if cam.cam_type in (int(CameraType.VR), int(CameraType.PANO)) \
            and eye != "center":
        azi = x * cam.h_fov                        # ndt.c:519-525
        virt = mathnd.rotate2(virt, cam.pos[None, :],
                              cam.local_x[None, :], cam.local_z[None, :], azi)

    if aperture:  # depth-of-field disk sampling (ndt.c:527-542)
        key, kr, kt = jax.random.split(key, 3)
        r = jnp.sqrt(jax.random.uniform(kr, x.shape, dt))
        th = jax.random.uniform(kt, x.shape, dt) * (2.0 * np.pi)
        ax, ay = r * jnp.cos(th), r * jnp.sin(th)
        virt = (virt + cam.local_x[None, :] * (ax * cam.aperture_radius)[:, None]
                + cam.local_y[None, :] * (ay * cam.aperture_radius)[:, None])

    look = mathnd.unitize(pixel - virt)
    return virt, look


# --------------------------------------------------------------------------
# tile renderer (jitted once per (shapes, opts))


@functools.partial(jax.jit, static_argnames=("opts", "eye"))
def render_tile_fused(scene: SceneData, cam: CameraData, x, y, key,
                      opts: RenderOptions, eye: str = "center"):
    """Fully-jitted tile render (one XLA program): used by the mesh-sharded
    path and compile checks.  Deep refractive scenes should prefer the
    host-chunked render_tile."""
    jitter = opts.samples > 1
    aperture = opts.samples > 1

    if opts.samples == 1:
        o, v = gen_rays(cam, x, y, key, opts, eye, False, False)
        return render_rays(scene, o, v, key, opts)

    def sample(i, acc):
        csum, dsum, nsum = acc
        skey = jax.random.fold_in(key, i)
        o, v = gen_rays(cam, x, y, skey, opts, eye, jitter, aperture)
        c, d, n = render_rays(scene, o, v, skey, opts)
        return (csum + c, dsum + d, nsum + n)

    csum, dsum, nsum = jax.lax.fori_loop(
        0, opts.samples, sample,
        (jnp.zeros(x.shape + (3,), x.dtype), jnp.zeros(x.shape, x.dtype),
         jnp.zeros((), jnp.int32)))
    return csum / opts.samples, dsum / opts.samples, nsum


_gen_rays_jit = jax.jit(gen_rays,
                        static_argnames=("opts", "eye", "jitter", "aperture"))


def render_tile(scene: SceneData, cam: CameraData, x, y, key,
                opts: RenderOptions, eye: str = "center"):
    """Render one tile of pixels with host-chunked bounce dispatches:
    returns (color [R,3], depth [R], rays)."""
    jitter = opts.samples > 1
    aperture = opts.samples > 1
    csum = dsum = nsum = None
    for i in range(opts.samples):
        skey = jax.random.fold_in(key, i) if opts.samples > 1 else key
        o, v = _gen_rays_jit(cam, x, y, skey, opts, eye, jitter, aperture)
        c, d, n = render_rays_chunked(scene, o, v, skey, opts)
        csum = c if csum is None else csum + c
        dsum = d if dsum is None else dsum + d
        nsum = n if nsum is None else nsum + n
    return csum / opts.samples, dsum / opts.samples, nsum


# --------------------------------------------------------------------------
# frame assembly (render_pixel stereo layouts, ndt.c:578-653)


def _pixel_grid(width, height, dtype):
    i = np.arange(width, dtype=dtype)
    j = np.arange(height, dtype=dtype)
    x = i / width - 0.5                      # ndt.c:629-633
    y = -(j / height - 0.5)
    xx, yy = np.meshgrid(x, y)               # [H, W]
    return xx, yy


@functools.lru_cache(maxsize=8)
def _blocked_perm(width, height, bw=64, bh=32):
    """Permutation listing pixels in compact (bw x bh) screen blocks, so
    each kernel ray-tile covers a small screen rectangle -- that's what
    makes the megakernel's per-tile object cull fire (a linear-order tile
    is a full-width strip that overlaps everything)."""
    ys, xs = np.mgrid[0:height, 0:width]
    key = np.lexsort((xs.ravel() % bw, ys.ravel() % bh,
                      xs.ravel() // bw, ys.ravel() // bh))
    inv = np.empty_like(key)
    inv[key] = np.arange(key.size)
    return key, inv


def _render_grid(scene_data, cam_data, xx, yy, opts, eye, key):
    """Tile-sharded render of a flat pixel grid; returns (color [P,3],
    depth [P]) as numpy."""
    P = xx.size
    h, w = xx.shape
    perm, inv = _blocked_perm(w, h)
    if opts.adaptive and opts.samples > 1:
        # adaptive convergence sampling; mesh-sharded internally when
        # opts.devices is set (-b r composes with -n samples)
        from ndt_tpu.render.adaptive import render_adaptive_samples

        c, d, n = render_adaptive_samples(
            scene_data, cam_data, xx.ravel()[perm], yy.ravel()[perm], key,
            opts, eye)
        return c[inv], d[inv], n
    if opts.devices is not None:
        # -b r/p: shard the whole grid over the device mesh (MPI row mode)
        from ndt_tpu.parallel.mesh import render_grid_sharded

        mesh = opts.devices
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        pad = (-P) % n_dev
        xf = np.concatenate([xx.ravel()[perm], np.zeros(pad, xx.dtype)])
        yf = np.concatenate([yy.ravel()[perm], np.zeros(pad, yy.dtype)])
        c, d, n = render_grid_sharded(scene_data, cam_data, xf, yf, key,
                                      opts, mesh, eye)
        return np.asarray(c)[:P][inv], np.asarray(d)[:P][inv], int(n)
    tile = min(opts.tile, max(1, P))
    if scene_data.has_transparent:
        # stack-mode rays carry ~1.4 KB of pending-node state each; cap
        # the dispatch width so a 1080p refractive frame fits in HBM
        tile = min(tile, _STACK_TILE)
    pad = (-P) % tile
    xf = np.concatenate([xx.ravel()[perm], np.zeros(pad, xx.dtype)])
    yf = np.concatenate([yy.ravel()[perm], np.zeros(pad, yy.dtype)])
    pending = []
    for t0 in range(0, P + pad, tile):
        tkey = jax.random.fold_in(key, t0)
        c, d, n = render_tile(scene_data, cam_data,
                              jnp.asarray(xf[t0:t0 + tile]),
                              jnp.asarray(yf[t0:t0 + tile]), tkey, opts, eye)
        # start the device->host copies now so tile t's download overlaps
        # tile t+1's dispatch/compute (the copy is the dominant cost when
        # the device link is slow; it's free to start early regardless)
        for a in (c, d):
            if hasattr(a, "copy_to_host_async"):
                a.copy_to_host_async()
        pending.append((c, d, n))
    colors = [np.asarray(c) for c, _, _ in pending]
    depths = [np.asarray(d) for _, d, _ in pending]
    nrays = sum(int(n) for _, _, n in pending)
    color = np.concatenate(colors)[:P][inv]
    depth = np.concatenate(depths)[:P][inv]
    return color, depth, nrays


def render_frame(scene_host, opts: RenderOptions):
    """Render a full frame from a host Scene.  Returns (img [H, W, 3] linear
    float, depth [H, W] or None, rays_traced)."""
    dt = np.dtype(opts.dtype)
    if not scene_host.cam.prepared:
        scene_host.cam.aim()
    scene_data = compile_scene(scene_host, dtype=dt)
    cam_data = scene_host.cam.data(dtype=dt.type)
    # render_image aspect-corrects the screen's X direction every frame
    # (ndt.c:926-930); HIDEF uses the left-image height 1080
    aspect = opts.width / (1080.0 if opts.stereo == "hidef" else opts.height)
    cam_data = dataclasses.replace(
        cam_data, dir_x=cam_data.dir_x * dt.type(aspect))
    key = jax.random.PRNGKey(opts.seed)

    W, H = opts.width, opts.height
    img = np.zeros((H, W, 3), dt)
    dep = np.zeros((H, W), dt)
    rays = 0

    def grid_for(w, h):
        return _pixel_grid(w, h, dt)

    def whitted_panel(eye, w_s, h_s, amap):
        """Whitted corner-grid AA for one eye panel (ndt.c:900-1103):
        pass 1 on the (w_s+1) x (h_s+1) corner grid under the panel's
        affine screen mapping, pass 2 refines noisy pixels.  Applies to
        every stereo layout, like the C's -w (which resamples the frame
        regardless of stereo mode, ndt.c:1039-1103)."""
        from ndt_tpu.render.adaptive import whitted_refine

        ax, bx, ay, by = amap
        gx = np.arange(w_s + 1, dtype=dt)
        gy = np.arange(h_s + 1, dtype=dt)
        xg, yg = np.meshgrid((ax * gx + bx).astype(dt),
                             (ay * gy + by).astype(dt))
        c, d, n = _render_grid(scene_data, cam_data, xg, yg, opts, eye, key)
        corners = c.reshape(h_s + 1, w_s + 1, 3)
        pimg, _n_res, extra = whitted_refine(
            scene_data, cam_data, corners, opts, opts.aa_diff,
            opts.aa_depth, key, eye=eye, amap=amap, size=(w_s, h_s))
        return pimg, d.reshape(h_s + 1, w_s + 1)[:h_s, :w_s], n + extra

    mono_amap = (1.0 / (W + 1), -0.5, -1.0 / (H + 1), 0.5)
    if opts.stereo == "mono":
        if opts.whitted:
            img[:], dep[:], n = whitted_panel("center", W, H, mono_amap)
            rays += n
        else:
            xx, yy = grid_for(W, H)
            c, d, n = _render_grid(scene_data, cam_data, xx, yy, opts,
                                   "center", key)
            img[:] = c.reshape(H, W, 3)
            dep[:] = d.reshape(H, W)
            rays += n
    elif opts.stereo == "side":
        # left/right halves, x rescaled by x_scale=0.5 (ndt.c:590-600)
        half = W // 2
        for cols, eye in ((slice(0, half), "left"),
                          (slice(half, W), "right")):
            if opts.whitted:
                amap = (2.0 / (W + 1), -0.5, -1.0 / (H + 1), 0.5)
                c, d, n = whitted_panel(eye, half, H, amap)
            else:
                ip = np.arange(half, dtype=dt) / 0.5
                xs = ip / W - 0.5
                xg, yg = np.meshgrid(xs.astype(dt),
                                     -(np.arange(H, dtype=dt) / H - 0.5))
                c, d, n = _render_grid(scene_data, cam_data, xg, yg, opts,
                                       eye, key)
                c = c.reshape(H, half, 3)
                d = d.reshape(H, half)
            img[:, cols] = c
            dep[:, cols] = d
            rays += n
    elif opts.stereo == "over":
        half = H // 2
        for rws, eye in ((slice(0, half), "left"),
                         (slice(half, H), "right")):
            if opts.whitted:
                amap = (1.0 / (W + 1), -0.5, -2.0 / (H + 1), 0.5)
                c, d, n = whitted_panel(eye, W, half, amap)
            else:
                jp = np.arange(half, dtype=dt) / 0.5
                ys = -(jp / H - 0.5)
                xg, yg = np.meshgrid(np.arange(W, dtype=dt) / W - 0.5,
                                     ys.astype(dt))
                c, d, n = _render_grid(scene_data, cam_data, xg, yg, opts,
                                       eye, key)
                c = c.reshape(half, W, 3)
                d = d.reshape(half, W)
            img[rws] = c
            dep[rws] = d
            rays += n
    elif opts.stereo == "anaglyph":
        eyes = {}
        for eye in ("left", "right"):
            if opts.whitted:
                c, d, n = whitted_panel(eye, W, H, mono_amap)
            else:
                xx, yy = grid_for(W, H)
                c, d, n = _render_grid(scene_data, cam_data, xx, yy, opts,
                                       eye, key)
                c = c.reshape(H, W, 3)
                d = d.reshape(H, W)
            eyes[eye] = (c, d)
            rays += n
        luma = np.array([0.299, 0.587, 0.114], dt)
        img[..., 0] = (eyes["left"][0] * luma).sum(-1)   # ndt.c:643-647
        img[..., 1] = 0
        img[..., 2] = (eyes["right"][0] * luma).sum(-1)
        dep[:] = eyes["left"][1]
    elif opts.stereo == "hidef":
        # 1920x2205: rows 0..1079 left, 45 blank rows, rows 1125..2204 right
        # (ndt.c:613-630)
        for j0, j1, eye in ((0, 1080, "left"), (1125, 2205, "right")):
            if opts.whitted:
                amap = (1.0 / (W + 1), -0.5, -1.0 / 1081.0, 0.5)
                c, d, n = whitted_panel(eye, W, j1 - j0, amap)
            else:
                jp = np.arange(j0, j1, dtype=dt) \
                    - (0 if eye == "left" else 1125)
                ys = -(jp / 1080.0 - 0.5)
                xg, yg = np.meshgrid(np.arange(W, dtype=dt) / W - 0.5,
                                     ys.astype(dt))
                c, d, n = _render_grid(scene_data, cam_data, xg, yg, opts,
                                       eye, key)
                c = c.reshape(j1 - j0, W, 3)
                d = d.reshape(j1 - j0, W)
            img[j0:j1] = c
            dep[j0:j1] = d
            rays += n
    else:
        raise ValueError(f"unknown stereo mode {opts.stereo!r}")

    return img, (dep if opts.record_depth else None), rays
