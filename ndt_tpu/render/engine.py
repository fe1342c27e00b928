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
    dtype: str = "float32"
    tile: int = 1 << 16              # rays per device dispatch
    stack_size: int = 16             # pending refraction branches per ray
    seed: int = 0
    devices: Optional[object] = None  # jax mesh for tile sharding


# --------------------------------------------------------------------------
# bounce loop


def _node_budget(opts: RenderOptions, has_transparent: bool) -> int:
    if not has_transparent:
        return opts.max_optic_depth
    # a fully-branching path tree has at most 2^10-1 nodes above the 1/512
    # importance cutoff (children spawn while frac >= 1/512 and both branch
    # weights are <= 1/2 of the parent when contrib = 0.5); the while_loop
    # exits as soon as every ray's stack drains, so this bound only matters
    # for pathological tiles
    return min(1 << min(opts.max_optic_depth, 10), 1024)


def render_rays(scene: SceneData, o, v, key, opts: RenderOptions):
    """Trace a batch of primary rays to completion.

    Returns (color [R, 3] linear, depth [R] -- 1/dist of the primary hit,
    ndt.c:362-373)."""
    R, D = o.shape
    dt = o.dtype
    S = opts.stack_size if scene.has_transparent else 1
    max_depth = opts.max_optic_depth

    # stack slot 0 holds the primary ray
    st_o = jnp.zeros((R, S, D), dt).at[:, 0].set(o)
    st_v = jnp.zeros((R, S, D), dt).at[:, 0].set(v)
    st_w = jnp.zeros((R, S, 3), dt).at[:, 0].set(1.0)
    st_f = jnp.zeros((R, S), dt).at[:, 0].set(1.0)
    st_d = jnp.zeros((R, S), jnp.int32).at[:, 0].set(max_depth)
    sp = jnp.ones((R,), jnp.int32)

    color = jnp.zeros((R, 3), dt)
    depth = jnp.zeros((R,), dt)
    nrays = jnp.zeros((), jnp.int64 if dt == jnp.float64 else jnp.int32)
    rows = jnp.arange(R)
    n_shadow_lights = sum(1 for l in scene.lights if l.kind != 0)

    def pop(st, j):
        return st[rows, j]

    def push(st, slot, val, mask):
        cur = st[rows, slot]
        val = jnp.where(mask[(...,) + (None,) * (val.ndim - 1)], val, cur)
        return st.at[rows, slot].set(val)

    budget = _node_budget(opts, scene.has_transparent)

    def cond(carry):
        it, sp, *_ = carry
        return (it < budget) & (sp > 0).any()

    def body(carry):
        (it, sp, st_o, st_v, st_w, st_f, st_d, color, depth, nrays,
         key) = carry
        valid = sp > 0
        j = jnp.maximum(sp - 1, 0)
        co, cv = pop(st_o, j), pop(st_v, j)
        cw, cf, cd = pop(st_w, j), pop(st_f, j), pop(st_d, j)

        tr = trace(scene, co, cv, need_normal=True)
        hit = tr.hit & valid
        # rays-traced accounting (the Mrays/s benchmark metric): one trace
        # per live path node + one shadow trace per non-ambient light per hit
        nrays = (nrays + valid.sum()
                 + hit.sum() * n_shadow_lights).astype(nrays.dtype)

        key, skey = jax.random.split(key)
        local = apply_lights(scene, co, cv, tr.point, tr.normal,
                             tr.mat_id, hit, key=skey,
                             specular=opts.specular)

        refl = scene.reflect[tr.mat_id]             # [R, 3]
        transp = scene.transparent[tr.mat_id]
        contrib = refl.max(axis=-1)                 # ndt.c:393

        if opts.specular:
            local_w = 1.0 - refl                    # ndt.c:405-408
        else:
            local_w = jnp.ones_like(refl)           # ndt.c:411-414
        node_color = jnp.where(hit[:, None], local_w * local,
                               jnp.where(valid[:, None],
                                         scene.bg[None, :], 0.0))
        color = color + cw * node_color

        # depth map from the primary node (ndt.c:362-373)
        prim_depth = jnp.where(tr.hit & (tr.t > EPSILON), 1.0 / tr.t, 0.0)
        depth = jnp.where(it == 0, prim_depth.astype(dt), depth)

        sp1 = sp - valid.astype(jnp.int32)

        # reflection child (ndt.c:394-419)
        refl_any = (refl > 0).any(axis=-1) | (refl < 0).any(axis=-1)
        ok_refl = (hit & (contrib > 0) & refl_any
                   & (cf * contrib >= MIN_PIXEL_FRAC) & (cd - 1 > 0))
        fits = sp1 < S
        ok_refl &= fits
        rdir = mathnd.unitize(mathnd.reflect(cv, tr.normal, 1.0))
        st_o = push(st_o, sp1, tr.point, ok_refl)
        st_v = push(st_v, sp1, rdir, ok_refl)
        st_w = push(st_w, sp1, cw * refl, ok_refl)
        st_f = push(st_f, sp1, cf * contrib, ok_refl)
        st_d = push(st_d, sp1, cd - 1, ok_refl)
        sp2 = sp1 + ok_refl.astype(jnp.int32)

        if scene.has_transparent:
            # refraction child (ndt.c:421-430)
            ior = scene.refract_index[tr.mat_id]
            ok_refr = (hit & (transp > 0)
                       & ((1.0 - contrib) * cf >= MIN_PIXEL_FRAC)
                       & (cd - 1 > 0) & (sp2 < S))
            tdir = mathnd.unitize(mathnd.refract(cv, tr.normal, ior))
            st_o = push(st_o, sp2, tr.point, ok_refr)
            st_v = push(st_v, sp2, tdir, ok_refr)
            st_w = push(st_w, sp2, cw * (1.0 - refl), ok_refr)
            st_f = push(st_f, sp2, (1.0 - contrib) * cf, ok_refr)
            st_d = push(st_d, sp2, cd - 1, ok_refr)
            sp2 = sp2 + ok_refr.astype(jnp.int32)

        return (it + 1, sp2, st_o, st_v, st_w, st_f, st_d, color, depth,
                nrays, key)

    carry = (jnp.int32(0), sp, st_o, st_v, st_w, st_f, st_d, color, depth,
             nrays, key)
    carry = jax.lax.while_loop(cond, body, carry)
    return carry[7], carry[8], carry[9]


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
def render_tile(scene: SceneData, cam: CameraData, x, y, key,
                opts: RenderOptions, eye: str = "center"):
    """Render one tile of pixels: returns (color [R,3], depth [R])."""
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


# --------------------------------------------------------------------------
# frame assembly (render_pixel stereo layouts, ndt.c:578-653)


def _pixel_grid(width, height, dtype):
    i = np.arange(width, dtype=dtype)
    j = np.arange(height, dtype=dtype)
    x = i / width - 0.5                      # ndt.c:629-633
    y = -(j / height - 0.5)
    xx, yy = np.meshgrid(x, y)               # [H, W]
    return xx, yy


def _render_grid(scene_data, cam_data, xx, yy, opts, eye, key):
    """Tile-sharded render of a flat pixel grid; returns (color [P,3],
    depth [P]) as numpy."""
    P = xx.size
    tile = min(opts.tile, max(1, P))
    pad = (-P) % tile
    xf = np.concatenate([xx.ravel(), np.zeros(pad, xx.dtype)])
    yf = np.concatenate([yy.ravel(), np.zeros(pad, yy.dtype)])
    colors, depths = [], []
    nrays = 0
    for t0 in range(0, P + pad, tile):
        tkey = jax.random.fold_in(key, t0)
        c, d, n = render_tile(scene_data, cam_data,
                              jnp.asarray(xf[t0:t0 + tile]),
                              jnp.asarray(yf[t0:t0 + tile]), tkey, opts, eye)
        colors.append(np.asarray(c))
        depths.append(np.asarray(d))
        nrays += int(n)
    color = np.concatenate(colors)[:P]
    depth = np.concatenate(depths)[:P]
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

    if opts.stereo == "mono":
        xx, yy = grid_for(W, H)
        c, d, n = _render_grid(scene_data, cam_data, xx, yy, opts, "center", key)
        img[:] = c.reshape(H, W, 3)
        dep[:] = d.reshape(H, W)
        rays += n
    elif opts.stereo == "side":
        # left/right halves, x rescaled by x_scale=0.5 (ndt.c:590-600)
        xx, yy = grid_for(W, H)
        half = W // 2
        ip = np.arange(W, dtype=dt)
        ipl = ip[:half] / 0.5
        ipr = (ip[half:] - half) / 0.5
        for cols, ips, eye in ((slice(0, half), ipl, "left"),
                               (slice(half, W), ipr, "right")):
            xs = ips / W - 0.5
            xg, yg = np.meshgrid(xs.astype(dt), -(np.arange(H, dtype=dt) / H - 0.5))
            c, d, n = _render_grid(scene_data, cam_data, xg, yg, opts, eye, key)
            img[:, cols] = c.reshape(H, half, 3)
            dep[:, cols] = d.reshape(H, half)
            rays += n
    elif opts.stereo == "over":
        half = H // 2
        jp = np.arange(H, dtype=dt)
        jpt = jp[:half] / 0.5
        jpb = (jp[half:] - half) / 0.5
        for rws, jps, eye in ((slice(0, half), jpt, "left"),
                              (slice(half, H), jpb, "right")):
            ys = -(jps / H - 0.5)
            xg, yg = np.meshgrid(np.arange(W, dtype=dt) / W - 0.5, ys.astype(dt))
            c, d, n = _render_grid(scene_data, cam_data, xg, yg, opts, eye, key)
            img[rws] = c.reshape(half, W, 3)
            dep[rws] = d.reshape(half, W)
            rays += n
    elif opts.stereo == "anaglyph":
        xx, yy = grid_for(W, H)
        cl, d, n = _render_grid(scene_data, cam_data, xx, yy, opts, "left", key)
        cr, _d2, n2 = _render_grid(scene_data, cam_data, xx, yy, opts, "right", key)
        luma = np.array([0.299, 0.587, 0.114], dt)
        img[..., 0] = (cl.reshape(H, W, 3) * luma).sum(-1)   # ndt.c:643-647
        img[..., 1] = 0
        img[..., 2] = (cr.reshape(H, W, 3) * luma).sum(-1)
        dep[:] = d.reshape(H, W)
        rays += n + n2
    elif opts.stereo == "hidef":
        # 1920x2205: rows 0..1079 left, 45 blank rows, rows 1125..2204 right
        # (ndt.c:613-630)
        for j0, j1, eye in ((0, 1080, "left"), (1125, 2205, "right")):
            jp = np.arange(j0, j1, dtype=dt) - (0 if eye == "left" else 1125)
            ys = -(jp / 1080.0 - 0.5)
            xg, yg = np.meshgrid(np.arange(W, dtype=dt) / W - 0.5, ys.astype(dt))
            c, d, n = _render_grid(scene_data, cam_data, xg, yg, opts, eye, key)
            img[j0:j1] = c.reshape(j1 - j0, W, 3)
            dep[j0:j1] = d.reshape(j1 - j0, W)
            rays += n
    else:
        raise ValueError(f"unknown stereo mode {opts.stereo!r}")

    return img, (dep if opts.record_depth else None), rays
