"""Vectorized ray-object intersection kernels.

Each kernel answers "at what distance does ray r hit object n" for ALL
``[R]`` rays x ``[N]`` objects of one block family at once, returning a
``[R, N]`` distance matrix with BIG where there is no hit.  The math is a
re-derivation of the per-object C routines (cited per function).

Numerical design: quantities that cancel (e.g. the quadratic's qc =
|perpendicular offset|^2 - r^2, where the offset is the difference of two
~|camera-to-object| vectors) are computed VECTORIALLY on [R, N, D]
difference tensors, never as differences of large scalar dot products.  A
scalar expansion (oo - 2 o@c + |c|^2) carries an absolute error of
~|o-c|^2 * eps, which at f32 and camera distances of ~100 units is larger
than a thin cylinder's r^2 -- the vectorial form's error scales with the
LOCAL offset instead, keeping f32 rendering faithful to the f64 C
reference.  Ray-direction dot products (all O(1)) stay as [R, D] @ [D, N]
matmuls (MXU).  D is tiny (3-6) and static, so [R, N, D] elementwise chains
fuse into VPU loops under XLA; the planned Pallas kernel keeps them in VMEM
entirely.

Normals are only needed for the winning object of each ray, so each family
also provides a ``*_normal`` routine over gathered per-ray parameters
([R, D]-sized work, off the [R, N] hot path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ndt_tpu import mathnd
from ndt_tpu.constants import BIG, EPSILON

MISS = jnp.asarray(BIG)

# TPU MXU f32 matmuls default to split-bfloat16 passes; the quadric
# coefficients cancel ~|o-B|^2-magnitude terms, so every contraction here
# demands true f32 accumulation (Precision.HIGHEST = 6-pass on MXU).
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def ray_precompute(o, v):
    """Shared per-ray dot products."""
    return {
        "oo": mathnd.dot(o, o),   # [R]
        "vo": mathnd.dot(v, o),   # [R]
        "vv": mathnd.dot(v, v),   # [R] (1.0 for unit rays, kept general)
        "so": o.sum(-1),          # [R] (ones . o, for hfacet)
        "sv": v.sum(-1),          # [R]
    }


def _mm(a, b):
    """[R, D] x [N, D] -> [R, N] with true f32 accumulation on MXU."""
    return jnp.matmul(a, b.T, preferred_element_type=a.dtype,
                      precision=jax.lax.Precision.HIGHEST)


def _pair_diff(o, pts):
    """[R, D] origins minus [N, D] points -> [R, N, D]."""
    return o[:, None, :] - pts[None, :, :]


def _gram2(a, b):
    """|a|^2 |b|^2 - (a.b)^2 as the sum of squared 2x2 minors (Lagrange's
    identity) over the trailing D axis: cancellation-free where the naive
    scalar difference loses everything.  a, b: [R, N, D] -> [R, N]."""
    d = a.shape[-1]
    out = 0.0
    for i in range(d):
        for j in range(i + 1, d):
            m = a[..., i] * b[..., j] - a[..., j] * b[..., i]
            out = out + m * m
    return out


# --------------------------------------------------------------------------
# sphere (sphere.c:57-112)


def sphere_distances(blk, o, v, pre):
    oc = _pair_diff(o, blk.center)                    # [R, N, D]
    voc = _einsum("rd,rnd->rn", v, oc)
    # oc2 - voc^2 = |oc_perp|^2 via Lagrange's identity (v is unit): exact
    # where the scalar difference cancels catastrophically at distance
    oc_perp2 = _gram2(jnp.broadcast_to(v[:, None, :], oc.shape), oc)
    desc = blk.radius2[None, :] - oc_perp2
    # conservative silhouette margin: candidates within the coarse pass's
    # own rounding error survive to the hit-local refine pass, which makes
    # the real hit/miss call (see sphere_refine).  The Lagrange minors carry
    # an absolute error of ~|oc| * eps each, so the error in oc_perp2 scales
    # with sqrt(oc_perp2) * |oc|.
    oc2 = _einsum("rnd,rnd->rn", oc, oc)
    margin = 64.0 * jnp.finfo(o.dtype).eps * jnp.sqrt(
        jnp.maximum(oc_perp2, blk.radius2[None, :]) * oc2)
    droot = jnp.sqrt(jnp.maximum(desc, 0.0))
    near = -(voc + droot)
    far = droot - voc  # far side, in case the origin is inside (sphere.c:87-97)
    t = jnp.where(near >= EPSILON, near, jnp.where(far >= EPSILON, far, MISS))
    return jnp.where(desc >= -margin, t, MISS)


def sphere_normal(blk, rows, hit, o, v, t):
    return hit - blk.center[rows]  # sphere.c:105


# --------------------------------------------------------------------------
# hplane + hdisk (hplane.c:39-75, hdisk.c:61-85)


def plane_distances(blk, o, v, pre):
    p, nrm = blk.point, blk.normal
    po = _pair_diff(o, p)                              # o - p, [R, N, D]
    ln = _mm(v, nrm)
    pln = -_einsum("rnd,nd->rn", po, nrm)           # (p - o) . n
    d = pln / jnp.where(jnp.abs(ln) > EPSILON, ln, 1.0)
    ok = (jnp.abs(ln) > EPSILON) & (d >= EPSILON)
    # radial bound (hdisk); hplanes carry radius2 = inf
    hit_off = po + d[..., None] * v[:, None, :]        # hit - p
    hit_dist2 = _einsum("rnd,rnd->rn", hit_off, hit_off)
    ok &= hit_dist2 <= blk.radius2[None, :]
    return jnp.where(ok, d, MISS)


def plane_normal(blk, rows, hit, o, v, t):
    return blk.normal[rows]  # hplane.c:49: the authored direction, unflipped


# --------------------------------------------------------------------------
# axis-projection quadrics: cylinder / hcylinder / orthotope
#
# P = sum_i a_i (v.a_i) - v ; Q = sum_i a_i b_i - (o-B), b_i = (o-B).a_i
# qa t^2 + qb t + qc = 0 with qa = P.P, qb = 2 P.Q, qc = Q.Q - r^2
# (cylinder.c:104-210, hcylinder.c:132-244, orthotope.c:150-302)


def quadric_distances(blk, o, v, pre):
    n, A, D = blk.axes.shape
    X = _pair_diff(o, blk.base)                        # o - B, [R, N, D]
    alphas = [_mm(v, blk.axes[:, i, :]) for i in range(A)]       # v . a_i
    betas = [_einsum("rnd,nd->rn", X, blk.axes[:, i, :])      # (o-B) . a_i
             for i in range(A)]

    P = -v[:, None, :]
    Q = -X
    for i in range(A):
        ax = blk.axes[:, i, :][None, :, :]
        P = P + alphas[i][..., None] * ax
        Q = Q + betas[i][..., None] * ax
    qa = _einsum("rnd,rnd->rn", P, P)
    qb = 2.0 * _einsum("rnd,rnd->rn", P, Q)
    qc = _einsum("rnd,rnd->rn", Q, Q) - blk.qc_off[None, :]

    def ends_ok(t):
        """Axis-projection slab test: s_i = b_i + t a_i within [lo, hi]
        (between_ends / within_orthotope)."""
        ok = jnp.ones(t.shape, bool)
        for i in range(A):
            s = betas[i] + t * alphas[i]
            ok &= (s >= blk.lo[:, i][None, :]) & (s <= blk.hi[:, i][None, :])
        return ok

    # det = qb^2 - 4 qa qc rewritten through Lagrange's identity:
    # (2 P.Q)^2 - 4|P|^2(|Q|^2 - off) = 4(qa*off - gram(P, Q)) -- the naive
    # form cancels ~|o-B|^2-magnitude terms down to ~r^2 and is garbage at
    # f32 for thin objects far from the ray origin
    gram = _gram2(P, Q)
    det = 4.0 * (qa * blk.qc_off[None, :] - gram)
    # conservative silhouette margin (see sphere_distances): |Q| can be as
    # large as the origin's distance to the object, and the gram minors'
    # absolute error scales with |P||Q| * eps
    qq = _einsum("rnd,rnd->rn", Q, Q)
    margin = 256.0 * jnp.finfo(o.dtype).eps * (
        qa * blk.qc_off[None, :] + jnp.sqrt(
            jnp.maximum(gram, qa * blk.qc_off[None, :]) * qa * qq))
    droot = jnp.sqrt(jnp.maximum(det, 0.0))
    safe_qa = jnp.where(jnp.abs(qa) > 1e-20, qa, 1.0)
    t2 = (-qb - droot) / (2.0 * safe_qa)   # near root first
    t1 = (-qb + droot) / (2.0 * safe_qa)
    # orthotope requires |qa| > EPSILON on the quadratic path
    # (orthotope.c:207); cylinders have qa > 0 whenever v is not inside the
    # axis span, and the C divides unconditionally.
    quad_valid = (det >= -margin) & jnp.where(
        blk.is_slab[None, :] > 0, jnp.abs(qa) > EPSILON, jnp.abs(qa) > 1e-20)
    ok2 = quad_valid & (t2 > EPSILON) & ends_ok(t2)
    ok1 = quad_valid & (t1 > EPSILON) & ends_ok(t1)
    t_quad = jnp.where(ok2, t2, jnp.where(ok1, t1, MISS))

    # orthotope closest-approach fallback (orthotope.c:233-275), replicated
    # literally including the reference's inverted small-qb branch
    # (orthotope.c:236-241: |qa|<eps AND |qb|<eps  =>  t = -qc/qb, else miss)
    small_qa = jnp.abs(qa) < EPSILON
    small_qb = jnp.abs(qb) < EPSILON
    t_lin = -qc / jnp.where(small_qb & (qb != 0.0), qb, 1.0)
    t_min = -qb / (2.0 * safe_qa)
    t_f = jnp.where(small_qa, jnp.where(small_qb & (qb != 0.0), t_lin, -1.0),
                    t_min)
    # surface distance at the closest-approach t is qc - qb^2/(4 qa)
    # = gram(P, Q)/qa - qc_off -- the gram form is cancellation-free
    surf_min = gram / jnp.where(small_qa, 1.0, qa) - blk.qc_off[None, :]
    surf = jnp.where(small_qa, qa * t_f * t_f + qb * t_f + qc, surf_min)
    ok_f = ((blk.is_slab[None, :] > 0) & (t_f >= EPSILON)
            & (jnp.abs(surf) <= EPSILON) & ends_ok(t_f))
    t_slab = jnp.where(ok_f, t_f, MISS)

    return jnp.where(ok2 | ok1, t_quad, t_slab)


def quadric_normal(blk, rows, hit, o, v, t):
    """Radial component of (hit - base) after removing all axis projections
    (cylinder.c:192-199, hcylinder.c:219-236, orthotope.c:277-294)."""
    base = blk.base[rows]          # [R, D]
    axes = blk.axes[rows]          # [R, A, D]
    x = hit - base
    coeff = _einsum("rd,rad->ra", x, axes)
    ada = _einsum("rad,rad->ra", axes, axes)
    coeff = jnp.where(ada > 0, coeff / jnp.where(ada > 0, ada, 1.0), 0.0)
    return x - _einsum("ra,rad->rd", coeff, axes)


# --------------------------------------------------------------------------
# facet: triangle via plane closest-approach + vertex-angle inside test


def facet_distances(blk, o, v, pre):
    """facet.c:166-269.  Plane coefficients use the orthonormal 2-basis with
    base point verts[1] (facet.c:179); the 'quadratic' is degenerate so the
    C goes straight to the closest-approach solve with an EPSILON
    surface-distance acceptance, then tests interior angles at each vertex
    (facet.c:149-164).  qa/qc are |v_perp|^2 / |X_perp|^2, computed on the
    perpendicular component vectors to stay cancellation-free."""
    b0 = blk.basis[:, 0, :]
    b1 = blk.basis[:, 1, :]
    X = _pair_diff(o, blk.verts[:, 1, :])              # o - base
    a0, a1 = _mm(v, b0), _mm(v, b1)
    c0 = _einsum("rnd,nd->rn", X, b0)
    c1 = _einsum("rnd,nd->rn", X, b1)
    v_perp = (-v[:, None, :] + a0[..., None] * b0[None, :, :]
              + a1[..., None] * b1[None, :, :])
    x_perp = (-X + c0[..., None] * b0[None, :, :]
              + c1[..., None] * b1[None, :, :])
    qa = _einsum("rnd,rnd->rn", v_perp, v_perp)
    qb = 2.0 * _einsum("rnd,rnd->rn", v_perp, x_perp)
    qc = _einsum("rnd,rnd->rn", x_perp, x_perp)

    small_qa = jnp.abs(qa) < EPSILON
    small_qb = jnp.abs(qb) < EPSILON
    t_lin = -qc / jnp.where(small_qb & (qb != 0.0), qb, 1.0)
    t_min = -qb / (2.0 * jnp.where(small_qa, 1.0, qa))
    t = jnp.where(small_qa, jnp.where(small_qb & (qb != 0.0), t_lin, -1.0),
                  t_min)
    # |surf| at the minimum = gram(v_perp, X_perp)/qa (Lagrange identity);
    # evaluating the quadratic directly cancels catastrophically in f32
    gram = _gram2(v_perp, x_perp)
    surf = jnp.where(small_qa, qa * t * t + qb * t + qc,
                     gram / jnp.where(small_qa, 1.0, qa))
    ok = (t >= EPSILON) & (jnp.abs(surf) <= EPSILON)

    # inside test: angle at v_i between (hit - v_i) and edge_i must not
    # exceed the interior angle (compare cosines; acos is monotone)
    for i in range(3):
        vi = blk.verts[:, i, :]
        ei = blk.edges[:, i, :]
        u = _pair_diff(o, vi) + t[..., None] * v[:, None, :]   # hit - v_i
        u_dot_e = _einsum("rnd,nd->rn", u, ei)
        u2 = _einsum("rnd,rnd->rn", u, u)
        div = jnp.sqrt(jnp.maximum(u2, 0.0) * mathnd.dot(ei, ei)[None, :])
        cos_q = u_dot_e / jnp.where(div > EPSILON, div, 1.0)
        # degenerate div: vectNd_angle returns -1, which passes the > test
        ok &= (div <= EPSILON) | (cos_q >= blk.cos_angles[:, i][None, :])
    return jnp.where(ok, t, MISS)


def facet_normal(blk, rows, hit, o, v, t):
    return blk.normal[rows]  # facet.c:257: dir[0] everywhere


# --------------------------------------------------------------------------
# hfacet: ones-vector linear solve + barycentric inside test


def hfacet_distances(blk, o, v, pre):
    """hfacet.c:211-310: t = -(Q.1)/(R.1) where R/Q are the differences
    between a vector and its projection into the plane basis; both contract
    against the all-ones vector."""
    X = _pair_diff(o, blk.verts[:, 0, :])              # o - v0
    v_ue0 = _mm(v, blk.ue0)
    v_ep = _mm(v, blk.ep)
    rv = (v_ue0 * blk.sum_ue0[None, :] + v_ep * blk.sum_ep[None, :]
          - pre["sv"][:, None])
    x_ue0 = _einsum("rnd,nd->rn", X, blk.ue0)
    x_ep = _einsum("rnd,nd->rn", X, blk.ep)
    qv = (x_ue0 * blk.sum_ue0[None, :] + x_ep * blk.sum_ep[None, :]
          - X.sum(-1))
    ok = jnp.abs(rv) >= EPSILON
    t = -qv / jnp.where(ok, rv, 1.0)
    ok &= t > EPSILON

    xp = x_ue0 + t * v_ue0                             # (hit - v0) . ue0
    yp = x_ep + t * v_ep
    l1, l2, l3 = _hfacet_bary(blk.bary_x2[None, :], blk.bary_y2[None, :],
                              blk.bary_x3[None, :], blk.bary_y3[None, :],
                              xp, yp)
    for l in (l1, l2, l3):
        ok &= (l >= -EPSILON) & (l <= 1.0 + EPSILON)
    return jnp.where(ok, t, MISS)


def _hfacet_bary(x2, y2, x3, y3, xp, yp):
    """Barycentric coordinates in the (ue0, ep) plane with vertex0 at the
    origin (hfacet.c:147-191; x1 = y1 = 0)."""
    den = (y2 - y3) * (0.0 - x3) + (x3 - x2) * (0.0 - y3)
    den = jnp.where(jnp.abs(den) > 0, den, 1.0)
    l1 = ((y2 - y3) * (xp - x3) + (x3 - x2) * (yp - y3)) / den
    l2 = (y3 * (xp - x3) + (0.0 - x3) * (yp - y3)) / den
    return l1, l2, 1.0 - l1 - l2


def hfacet_normal(blk, rows, hit, o, v, t):
    """flag[0]: barycentric-weighted vertex normals; else the direction of
    shortest distance from the plane to the OBSERVER (hfacet.c:279-297)."""
    v0 = blk.verts[rows, 0, :]
    ue0 = blk.ue0[rows]
    ep = blk.ep[rows]
    xp = mathnd.dot(hit - v0, ue0)
    yp = mathnd.dot(hit - v0, ep)
    l1, l2, l3 = _hfacet_bary(blk.bary_x2[rows], blk.bary_y2[rows],
                              blk.bary_x3[rows], blk.bary_y3[rows], xp, yp)
    vn = blk.vnormals[rows]  # [R, 3, D]
    n_interp = (vn[:, 0] * l1[:, None] + vn[:, 1] * l2[:, None]
                + vn[:, 2] * l3[:, None])
    # observer-side plane normal
    d0 = o - v0
    on = v0 + ue0 * mathnd.dot(d0, ue0)[:, None] + ep * mathnd.dot(d0, ep)[:, None]
    n_obs = mathnd.unitize(o - on)
    return jnp.where(blk.use_normals[rows][:, None] > 0, n_interp, n_obs)


# --------------------------------------------------------------------------
# winner refinement: one closed-form re-solve in a hit-local frame
#
# The [R, N] coarse pass resolves t to ~sqrt(det_err)/qa, which near curved
# silhouettes is ~1e-3 at f32 -- enough to pick the right object but too
# coarse for normals and the shadow same-point test (EPSILON = 1e-4).
# Translating the ray origin to the approximate hit collapses every
# magnitude to O(object size), after which the same closed form is good to
# ~1e-6.  Only curved families need it; planar hits are already exact.


def _gram2_single(a, b):
    d = a.shape[-1]
    out = 0.0
    for i in range(d):
        for j in range(i + 1, d):
            m = a[..., i] * b[..., j] - a[..., j] * b[..., i]
            out = out + m * m
    return out


def sphere_refine(blk, rows, o, v, t_hat):
    """Returns (t_refined, still_a_hit).  A margin-band candidate whose
    hit-local discriminant is negative is a true miss and gets rejected."""
    p = o + t_hat[:, None] * v
    oc = p - blk.center[rows]
    voc = mathnd.dot(v, oc)
    desc = blk.radius2[rows] - _gram2_single(v, oc)
    droot = jnp.sqrt(jnp.maximum(desc, 0.0))
    d1, d2 = -voc - droot, -voc + droot
    delta = jnp.where(jnp.abs(d1) <= jnp.abs(d2), d1, d2)
    ok = desc >= 0.0
    return jnp.where(ok, t_hat + delta, t_hat), ok


def quadric_refine(blk, rows, o, v, t_hat):
    p = o + t_hat[:, None] * v
    base = blk.base[rows]
    axes = blk.axes[rows]                      # [R, A, D]
    x = p - base
    alpha = _einsum("rd,rad->ra", v, axes)
    beta = _einsum("rd,rad->ra", x, axes)
    pv = _einsum("ra,rad->rd", alpha, axes) - v
    q = _einsum("ra,rad->rd", beta, axes) - x
    qa = mathnd.dot(pv, pv)
    qb = 2.0 * mathnd.dot(pv, q)
    det = 4.0 * (qa * blk.qc_off[rows] - _gram2_single(pv, q))
    droot = jnp.sqrt(jnp.maximum(det, 0.0))
    safe_qa = jnp.where(jnp.abs(qa) > 1e-20, qa, 1.0)
    d1 = (-qb - droot) / (2.0 * safe_qa)
    d2 = (-qb + droot) / (2.0 * safe_qa)
    delta = jnp.where(jnp.abs(d1) <= jnp.abs(d2), d1, d2)
    usable = jnp.abs(qa) > 1e-20
    # slabs (orthotopes) also accept via the closest-approach fallback:
    # |surface distance| = |det/(4 qa)| <= EPSILON (orthotope.c:258-266)
    surf = -det / (4.0 * safe_qa)
    ok = jnp.where(blk.is_slab[rows] > 0,
                   (det >= 0.0) | (jnp.abs(surf) <= EPSILON),
                   det >= 0.0)
    t_new = jnp.where((det >= 0.0) & usable, t_hat + delta, t_hat)
    return t_new, ok & usable


REFINERS = {
    "spheres": sphere_refine,
    "quadrics": quadric_refine,
}

KERNELS = {
    "spheres": (sphere_distances, sphere_normal),
    "planes": (plane_distances, plane_normal),
    "quadrics": (quadric_distances, quadric_normal),
    "facets": (facet_distances, facet_normal),
    "hfacets": (hfacet_distances, hfacet_normal),
}
