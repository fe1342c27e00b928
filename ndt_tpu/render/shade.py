"""Phong lighting with traced shadows: vectorized apply_lights (ndt.c:71-326).

Given a batch of shaded hits, accumulates per-light: ambient, two-sided
diffuse cos(angle)/dist^2 (skipped for transparent surfaces, ndt.c:269),
and the reference's idiosyncratic Blinn-ish specular (a mag=0.5 reflection
of the light direction, dotted with the reverse view, ^50, light color
normalized by its max channel -- ndt.c:276-310).

Shadow semantics replicate the C exactly:
  * point/spot lights trace FROM THE LIGHT toward the surface and require
    hitting the SAME OBJECT within EPSILON of the shaded point
    (ndt.c:209-228);
  * directional lights trace from the surface (offset EPSILON against the
    light direction) and require hitting nothing at all (ndt.c:230-249);
  * area lights (disk/rect) sample one point on the light per shading event
    and then behave like point lights (ndt.c:116-147); sampling uses
    jax.random instead of drand48, so statistically -- not bitwise --
    equivalent.

All shadow rays of all lights are STACKED into a single trace call per
category, so one render step instantiates exactly one shadow kernel and one
occlusion kernel regardless of light count (kernel instances dominate
Mosaic compile time, and bigger ray batches use the chip better).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ndt_tpu import mathnd
from ndt_tpu.constants import EPSILON, SPECULAR_POWER
from ndt_tpu.render.trace import occlusion_trace, shadow_trace
from ndt_tpu.scene.compile import LightData, SceneData

AMBIENT, POINT, DIRECTIONAL, SPOT, DISK, RECT = range(6)


def _sample_area_light(light: LightData, key, shape):
    """Uniform point on the light surface (ndt.c:130-141): disk via polar
    mapping (equivalent in distribution to the C's rejection sampling),
    rect via two uniforms in [-1, 1]."""
    kx, ky = jax.random.split(key)
    dt = light.pos.dtype
    if light.kind == DISK:
        r = jnp.sqrt(jax.random.uniform(kx, shape, dt))
        th = jax.random.uniform(ky, shape, dt) * dt.type(2.0 * np.pi)
        x, y = r * jnp.cos(th), r * jnp.sin(th)
    else:
        x = jax.random.uniform(kx, shape, dt) * 2.0 - 1.0
        y = jax.random.uniform(ky, shape, dt) * 2.0 - 1.0
    return (light.pos[None, :]
            + light.u1[None, :] * (x * light.radius)[:, None]
            + light.v1[None, :] * (y * light.radius)[:, None])


def apply_lights(scene: SceneData, src, look, tr, active,
                 key=None, specular: bool = True):
    """Return the local (pre-reflection) color [R, 3] for rays with a valid
    hit.  ``src`` is the ray origin, ``look`` the unit ray direction,
    ``tr`` the TraceResult (hit point, normal, winner material).
    ``specular=False`` replicates the -p flag (ndt.c:41, 280).

    Scenes whose lights are all point/spot/directional normally bypass
    this function entirely on the TPU path: the megakernel computes the
    local color in-registers (render/pallas_trace.py fused mode), and this
    XLA implementation remains the reference (and the area-light and
    f64-golden path)."""
    hit_pt, normal, mat_id = tr.point, tr.normal, tr.mat_id
    color = tr.color
    reflect_c = tr.reflect
    transparent = tr.transparent

    out = color * scene.ambient[None, :]   # ndt.c:89-91
    R = src.shape[0]
    r_shape = (R,)

    # ---- per-light geometry + classification -----------------------------
    pointish = []      # (index, light, lgt_pos, light_vec, ldist2, mask)
    directional = []   # (index, light, rev_light)
    for li, light in enumerate(scene.lights):
        if light.kind == AMBIENT:
            out = out + color * light.color[None, :]   # ndt.c:106-111
            continue
        kind = light.kind
        if kind in (DISK, RECT):
            lkey = jax.random.fold_in(key, li) if key is not None else \
                jax.random.PRNGKey(li)
            lgt_pos = _sample_area_light(light, lkey, r_shape)
            kind = POINT                                # ndt.c:143-144
        else:
            lgt_pos = jnp.broadcast_to(light.pos[None, :], src.shape)

        if kind in (POINT, SPOT):
            rev_light = mathnd.unitize(lgt_pos - hit_pt)
        else:
            rev_light = jnp.broadcast_to(
                mathnd.unitize(-light.dir)[None, :], src.shape)
        rev_view = src - hit_pt
        side_ok = (mathnd.dot(rev_light, normal)
                   * mathnd.dot(rev_view, normal)) > 0   # ndt.c:160-168

        if kind in (POINT, SPOT):
            to_hit = hit_pt - lgt_pos
            ldist2 = mathnd.dot(to_hit, to_hit)
            light_vec = mathnd.unitize(to_hit)
            mask = side_ok & active
            if kind == SPOT:
                cone = mathnd.angle(
                    jnp.broadcast_to(light.dir[None, :], src.shape),
                    light_vec)
                mask &= (cone * (180.0 / jnp.pi)) <= light.angle_deg
            pointish.append((li, light, lgt_pos, light_vec, ldist2, mask))
        else:
            directional.append((li, light, rev_light, side_ok))

    # ---- batched shadow traces (one kernel instance per category) --------
    lit = {}
    if pointish:
        o_b = jnp.concatenate([p[2] for p in pointish])  # from light
        v_b = jnp.concatenate([p[3] for p in pointish])
        lim_b = jnp.concatenate(
            [jnp.sqrt(p[4]) + EPSILON for p in pointish])
        # lanes whose result is discarded (no hit / wrong side / outside
        # the spot cone) are dead: the trace kernel skips fully-dead tiles
        live_b = jnp.concatenate([p[5] for p in pointish])
        sh = shadow_trace(scene, o_b, v_b, lim_b,
                          live=live_b)                       # ndt.c:209-228
        for k, (li, light, lgt_pos, light_vec, ldist2, mask) in \
                enumerate(pointish):
            s_mat = sh.mat_id[k * R:(k + 1) * R]
            s_pt = sh.point[k * R:(k + 1) * R]
            s_hit = sh.hit[k * R:(k + 1) * R]
            same_obj = s_mat == mat_id
            same_pt = mathnd.dist(s_pt, hit_pt) <= EPSILON
            lit[li] = mask & s_hit & same_obj & same_pt
    if directional:
        o_b = jnp.concatenate(
            [hit_pt - mathnd.unitize(l.dir)[None, :] * EPSILON
             for _, l, _, _ in directional])
        v_b = jnp.concatenate([d[2] for d in directional])
        live_b = jnp.concatenate([d[3] & active for d in directional])
        # NO self-exclusion: the C blocks on ANY hit with dist > EPSILON
        # (ndt.c:230-249 + object.c:727), and an orthotope EPSILON-shell
        # interior hit (0.01 under the surface) legitimately self-shadows --
        # excluding the source material made those pixels lit where the
        # reference shows ambient only.  Genuine surface re-hits compute
        # t <= EPSILON and are rejected by every kernel's t > EPSILON rule.
        sh = occlusion_trace(scene, o_b, v_b, live=live_b)
        for k, (li, light, rev_light, side_ok) in \
                enumerate(directional):
            s_hit = sh.hit[k * R:(k + 1) * R]
            lit[li] = side_ok & active & (~s_hit)            # ndt.c:230-249

    # ---- diffuse + specular ----------------------------------------------
    def add_light_terms(out, li, light, light_vec, ldist2):
        l = lit[li]
        div = mathnd.l2norm(normal) * mathnd.l2norm(light_vec)
        cos_a = jnp.abs(mathnd.dot(normal, light_vec)) / jnp.where(
            div > EPSILON, div, 1.0)
        scale = (cos_a / ldist2)[:, None]
        diff_w = (l & (transparent <= 0))[:, None]
        out = out + jnp.where(diff_w,
                              color * light.color[None, :] * scale, 0.0)
        if specular:
            light_ref = mathnd.unitize(mathnd.reflect(light_vec, normal, 0.5))
            rv = jnp.maximum(0.0, mathnd.dot(light_ref,
                                             mathnd.unitize(-look)))
            rvn = (rv ** SPECULAR_POWER)[:, None]
            # the C divides by max_light unguarded (ndt.c:302-305); a
            # zero-color light would 0/0 there -- guard so degenerate
            # lights contribute 0 instead of NaN
            max_light = jnp.max(light.color)
            safe_max = jnp.where(max_light > 0, max_light, 1.0)
            spec = reflect_c * (light.color / safe_max)[None, :] * rvn
            out = out + jnp.where(l[:, None], spec, 0.0)
        return out

    for li, light, lgt_pos, light_vec, ldist2, mask in pointish:
        out = add_light_terms(out, li, light, light_vec, ldist2)
    for li, light, rev_light, side_ok in directional:
        light_vec = jnp.broadcast_to(light.dir[None, :], src.shape)
        ldist2 = jnp.ones(r_shape, src.dtype)
        out = add_light_terms(out, li, light, light_vec, ldist2)

    return out
