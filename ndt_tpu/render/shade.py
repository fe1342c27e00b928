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
    jax.random instead of drand48, so stochastic features are statistically
    -- not bitwise -- equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

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
    if light.kind == DISK:
        r = jnp.sqrt(jax.random.uniform(kx, shape))
        th = jax.random.uniform(ky, shape) * (2.0 * jnp.pi)
        x, y = r * jnp.cos(th), r * jnp.sin(th)
    else:
        x = jax.random.uniform(kx, shape) * 2.0 - 1.0
        y = jax.random.uniform(ky, shape) * 2.0 - 1.0
    return (light.pos[None, :]
            + light.u1[None, :] * (x * light.radius)[:, None]
            + light.v1[None, :] * (y * light.radius)[:, None])


def apply_lights(scene: SceneData, src, look, hit_pt, normal, mat_id, active,
                 key=None, specular: bool = True):
    """Return the local (pre-reflection) color [R, 3] for rays with a valid
    hit.  ``src`` is the ray origin, ``look`` the unit ray direction.
    ``specular=False`` replicates the -p flag (ndt.c:41, 280)."""
    color = scene.color[mat_id]        # [R, 3]
    reflect_c = scene.reflect[mat_id]
    transparent = scene.transparent[mat_id]

    out = color * scene.ambient[None, :]   # ndt.c:89-91
    r_shape = (src.shape[0],)

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
        else:  # DIRECTIONAL
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
                    jnp.broadcast_to(light.dir[None, :], src.shape), light_vec)
                mask &= (cone * (180.0 / jnp.pi)) <= light.angle_deg
            # shadow: light -> object, must hit the same object at the same
            # point (ndt.c:209-228); dist_limit = dist + EPSILON scan-order
            # semantics via shadow_trace
            limit = jnp.sqrt(ldist2) + EPSILON
            sh = shadow_trace(scene, lgt_pos, light_vec, limit)
            same_obj = sh.mat_id == mat_id
            same_pt = mathnd.dist(sh.point, hit_pt) <= EPSILON
            lit = mask & sh.hit & same_obj & same_pt
        else:
            light_vec = jnp.broadcast_to(light.dir[None, :], src.shape)
            ldist2 = jnp.ones(r_shape, src.dtype)
            near = hit_pt - mathnd.unitize(light.dir)[None, :] * EPSILON
            # self excluded: convex leaves can't re-occlude a lit-side point
            sh = occlusion_trace(scene, near, rev_light,
                                 exclude_mat=mat_id)    # ndt.c:230-243
            lit = side_ok & active & (~sh.hit)

        # two-sided diffuse |cos|/d^2 (ndt.c:261-273)
        div = mathnd.l2norm(normal) * mathnd.l2norm(light_vec)
        cos_a = jnp.abs(mathnd.dot(normal, light_vec)) / jnp.where(
            div > EPSILON, div, 1.0)
        scale = (cos_a / ldist2)[:, None]
        diff_w = (lit & (transparent <= 0))[:, None]
        out = out + jnp.where(diff_w, color * light.color[None, :] * scale, 0.0)

        if not specular:
            continue
        # specular (ndt.c:276-310)
        light_ref = mathnd.unitize(mathnd.reflect(light_vec, normal, 0.5))
        rv = jnp.maximum(0.0, mathnd.dot(light_ref, mathnd.unitize(-look)))
        rvn = (rv ** SPECULAR_POWER)[:, None]
        max_light = jnp.max(light.color)
        spec = reflect_c * (light.color / max_light)[None, :] * rvn
        out = out + jnp.where(lit[:, None], spec, 0.0)

    return out
