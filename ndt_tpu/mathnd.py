"""N-dimensional vector math over batched ``[..., D]`` arrays.

The TPU-native equivalent of the reference's vectNd library (vectNd.h:81-363,
vectNd.c): every operation is a pure function over arrays whose trailing axis
is the spatial dimension D, so a single call covers what the C code does one
vector at a time (SSE lanes become VPU lanes for free under XLA).

All functions work under BOTH numpy (host-side scene preparation, float64,
matching the C's double math exactly) and jax.numpy (device-side tracing):
they dispatch on the input type.  Semantics, including the EPSILON guards and
the post-rotation epsilon-zeroing quirk, follow the reference and are cited
per function.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ndt_tpu.constants import EPSILON


def _xp(*arrays):
    """Pick the array namespace: jnp if any arg is traced/jax, else numpy."""
    for a in arrays:
        if isinstance(a, jax.core.Tracer) or isinstance(a, jax.Array):
            return jnp
    return np


def dot(a, b):
    """Inner product over the trailing dimension axis (vectNd.h vectNd_dot)."""
    return (a * b).sum(axis=-1)


def l2norm(v):
    """Euclidean length (vectNd.h:315 vectNd_l2norm)."""
    xp = _xp(v)
    return xp.sqrt(dot(v, v))


def dist(a, b):
    """Distance between points (vectNd.h:331 vectNd_dist)."""
    return l2norm(a - b)


def unitize(v):
    """Normalize; vectors shorter than EPSILON are left unchanged
    (vectNd.h:323-328: scaling only happens when |len| > EPSILON)."""
    xp = _xp(v)
    n = l2norm(v)[..., None]
    return xp.where(n > EPSILON, v / xp.where(n > EPSILON, n, 1.0), v)


def proj(v, onto):
    """Project v onto a vector of unknown length (vectNd.h:353-361).
    Guarded against a zero 'onto' (the C divides by zero there)."""
    xp = _xp(v, onto)
    bb = dot(onto, onto)
    ab = dot(v, onto)
    safe = xp.where(bb > 0, bb, 1.0)
    return onto * xp.where(bb > 0, ab / safe, 0.0)[..., None]


def proj_unit(v, onto):
    """Project v onto a known-unit vector (vectNd.h:345-351)."""
    return onto * dot(v, onto)[..., None]


def angle(v1, v2):
    """Angle between vectors; returns -1 where degenerate (vectNd.c:64-81)."""
    xp = _xp(v1, v2)
    div = l2norm(v1) * l2norm(v2)
    ok = xp.abs(div) > EPSILON
    cosv = xp.clip(dot(v1, v2) / xp.where(ok, div, 1.0), -1.0, 1.0)
    return xp.where(ok, xp.arccos(cosv), -1.0)


def angle3(p1, p2, p3):
    """Angle at vertex p2 of the triangle p1-p2-p3 (vectNd.c:83-99)."""
    return angle(p1 - p2, p3 - p2)


def reflect(u, n, mag=1.0):
    """Reflect u about hyperplane with normal n (vectNd.c:101-117):
    ``u - (1+mag) * (n.u)/(n.n) * n``; mag=1 is a mirror reflection, the
    shading code also uses mag=0.5 for its specular half-vector
    (ndt.c:289)."""
    nu = dot(n, u)
    nn = dot(n, n)
    return u - n * ((1.0 + mag) * nu / nn)[..., None]


def refract(u, n, index):
    """Snell-law refraction with total-internal-reflection fallback
    (vectNd.c:119-188).  ``index`` may be scalar or batched ``[...]``.

    Follows the reference exactly: the incidence angle is computed with
    vectNd_angle (acos of normalized dot), the refraction angle via
    asin(sin(theta_in)/index), TIR maps theta_out = pi - theta_in, and the
    output is cos(theta_out) * (+/-unit n) + sin(theta_out) * unit
    perpendicular component of u.
    """
    xp = _xp(u, n)
    rev_u = -u
    rev_n = -n
    un_dot = dot(rev_u, n)
    inside = un_dot < 0  # ray exits: invert index (vectNd.c:136-142)
    index = xp.asarray(index)
    eff_index = xp.where(inside, 1.0 / index, index)
    theta_in = xp.where(inside, angle(rev_u, rev_n), angle(rev_u, n))

    sin_out = xp.sin(theta_in) / eff_index
    tir = sin_out > 1.0
    theta_out = xp.where(
        tir, np.pi - theta_in, xp.arcsin(xp.clip(sin_out, -1.0, 1.0))
    )

    un_hat = unitize(n)
    # perpendicular (to normal) component of u, unitized (vectNd.c:153-162)
    un_comp = proj_unit(u, -un_hat)
    np_vec = unitize(u - un_comp)

    rn = xp.cos(theta_out)[..., None]
    rp = xp.sin(theta_out)[..., None]
    ref_n = xp.where(inside[..., None], un_hat * rn, -un_hat * rn)
    return ref_n + np_vec * rp


def interpolate(s, e, t):
    """Linear interpolation s + t*(e-s) (vectNd.c:190-200)."""
    return s + (e - s) * t


def orthogonalize(in1, in2):
    """Gram-Schmidt: returns (unit component of in1 orthogonal to in2,
    unit in2) (vectNd.c:35-58)."""
    out1 = unitize(in1 - proj(in1, in2))
    out2 = unitize(in2)
    return out1, out2


def rotate(v, center, i, j, ang):
    """Rotate about the (i, j) coordinate plane, centered at ``center``
    (vectNd.c:202-269).  ``i``/``j`` are static ints.

    Quirk preserved: after rotation the reference zeroes EVERY component
    whose magnitude falls below EPSILON (vectNd.c:251-255) -- not just the
    rotated pair.  Camera aiming depends on this, so we replicate it.
    """
    xp = _xp(v)
    if i == j:
        raise ValueError("rotation plane requires distinct axes")
    if xp is np and not isinstance(ang, (jax.core.Tracer, jax.Array)) \
            and float(ang) == 0.0:
        return v  # vectNd.c:208-209: zero rotation is a strict no-op
    tmp = v - center if center is not None else v
    c, s = np.cos(ang), np.sin(ang)
    if xp is jnp or isinstance(ang, (jax.core.Tracer, jax.Array)):
        c, s = jnp.cos(ang), jnp.sin(ang)
    vi = tmp[..., i]
    vj = tmp[..., j]
    ri = c * vi - s * vj
    rj = s * vi + c * vj
    if xp is np:
        tmp = np.array(tmp, dtype=np.float64, copy=True)
        tmp[..., i] = ri
        tmp[..., j] = rj
    else:
        tmp = tmp.at[..., i].set(ri).at[..., j].set(rj)
    tmp = xp.where(xp.abs(tmp) < EPSILON, 0.0, tmp)
    if center is not None:
        tmp = tmp + center
    return tmp


def rotate2(v, center, v1, v2, ang):
    """Rotate in the plane spanned by arbitrary vectors v1, v2
    (vectNd.c:271-324): orthogonalize (v1, v2) into a basis, project out the
    in-plane component of v-center, rotate it, and reassemble.  No epsilon
    zeroing here (the reference's rotate2 does none)."""
    xp = _xp(v, v1, v2)
    basis_x, basis_y = orthogonalize(v1, v2)
    local = v - center if center is not None else v
    proj_x = proj(local, basis_x)
    proj_y = proj(local, basis_y)
    virt_x = dot(proj_x, basis_x)
    virt_y = dot(proj_y, basis_y)
    c = xp.cos(ang) if xp is jnp else np.cos(ang)
    s = xp.sin(ang) if xp is jnp else np.sin(ang)
    rot_x = basis_x * (virt_x * c - virt_y * s)[..., None]
    rot_y = basis_y * (virt_y * c + virt_x * s)[..., None]
    return v - proj_x - proj_y + rot_x + rot_y
