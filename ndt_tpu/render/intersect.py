"""Vectorized ray-object intersection kernels.

Each kernel answers "at what distance does ray r hit object n" for ALL
``[R]`` rays x ``[N]`` objects of one block family at once, returning a
``[R, N]`` distance matrix with BIG where there is no hit.  The math is a
re-derivation of the per-object C routines (cited per function).

Performance shape: every ray-object contraction is either a
``[R, D] @ [D, N]`` matmul (MXU) or a *per-component unrolled* [R, N]
elementwise expression (VPU) built from [R] and [N] broadcasts -- there are
NO [R, N, D] tensors, so XLA fuses each kernel into a single pass over
[R, N] and HBM traffic stays at a few [R, N] arrays per block.  D is static
and tiny (3-6), so the unrolled Python loops cost nothing.

Numerical design: the discriminants cancel catastrophically if expanded as
differences of large scalar dot products (|o-B|^2-magnitude terms down to
~r^2 -- garbage at f32 for thin objects ~100 units from the camera).  They
are instead computed through Lagrange's identity as sums of squared 2x2
minors, with each minor's terms built at [R, N] from outer products; the
residual f32 error is absorbed by a conservative margin plus a hit-local
winner refinement (REFINERS) that re-solves the root with all magnitudes
collapsed to object scale.  See trace._closest_with_refine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ndt_tpu import mathnd
from ndt_tpu.constants import BIG, EPSILON

MISS = jnp.asarray(BIG)

# TPU MXU f32 matmuls default to split-bfloat16 passes; these coefficients
# feed cancellation-heavy math, so contractions demand true f32 accumulation
# (Precision.HIGHEST).
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


def _minor_sq_sum(p_comp, q_comp):
    """sum over i<j of (p_i q_j - p_j q_i)^2 from per-component [R, N]
    lists: Lagrange's identity |p|^2|q|^2 - (p.q)^2, cancellation-free."""
    out = 0.0
    d = len(p_comp)
    for i in range(d):
        for j in range(i + 1, d):
            m = p_comp[i] * q_comp[j] - p_comp[j] * q_comp[i]
            out = out + m * m
    return out


# --------------------------------------------------------------------------
# sphere (sphere.c:57-112)


def sphere_distances(blk, o, v, pre):
    c = blk.center                                     # [N, D]
    D = c.shape[1]
    voc = pre["vo"][:, None] - _mm(v, c)               # v . (o - c)
    # minors of (v, o-c): m_ij = (v_i o_j - v_j o_i) - (v_i c_j - v_j c_i)
    oc_perp2 = 0.0
    for i in range(D):
        for j in range(i + 1, D):
            w = (v[:, i] * o[:, j] - v[:, j] * o[:, i])[:, None]
            m = w - (v[:, i][:, None] * c[:, j][None, :]
                     - v[:, j][:, None] * c[:, i][None, :])
            oc_perp2 = oc_perp2 + m * m
    desc = blk.radius2[None, :] - oc_perp2
    # conservative silhouette margin: candidates within the coarse pass's
    # own rounding error survive to the hit-local refine pass, which makes
    # the real hit/miss call (see sphere_refine).  The minors carry an
    # absolute error of ~|o||c| * eps each.
    oc2 = (pre["oo"][:, None] - 2.0 * _mm(o, c)
           + mathnd.dot(c, c)[None, :])
    margin = 64.0 * jnp.finfo(o.dtype).eps * jnp.sqrt(
        jnp.maximum(oc_perp2, blk.radius2[None, :])
        * jnp.maximum(oc2, 1.0))
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
    ln = _mm(v, nrm)
    pln = mathnd.dot(p, nrm)[None, :] - _mm(o, nrm)    # (p - o) . n
    d = pln / jnp.where(jnp.abs(ln) > EPSILON, ln, 1.0)
    ok = (jnp.abs(ln) > EPSILON) & (d >= EPSILON)
    # radial bound (hdisk); hplanes carry radius2 = inf
    op2 = (pre["oo"][:, None] - 2.0 * _mm(o, p) + mathnd.dot(p, p)[None, :])
    opv = pre["vo"][:, None] - _mm(v, p)               # v . (o - p)
    hit_dist2 = op2 + 2.0 * d * opv + d * d * pre["vv"][:, None]
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
    axes = [blk.axes[:, i, :] for i in range(A)]       # A x [N, D]
    alphas = [_mm(v, ax) for ax in axes]               # v . a_i, [R, N]
    betas = [_mm(o, ax) - mathnd.dot(blk.base, ax)[None, :]
             for ax in axes]                           # (o-B) . a_i

    # per-component P_d, Q_d as [R, N] from broadcasts (no [R, N, D])
    P = []
    Q = []
    for d in range(D):
        pd = -v[:, d][:, None]
        qd = blk.base[:, d][None, :] - o[:, d][:, None]   # -(o - B)_d
        for i in range(A):
            a_d = axes[i][:, d][None, :]
            pd = pd + alphas[i] * a_d
            qd = qd + betas[i] * a_d
        P.append(pd)
        Q.append(qd)
    qa = sum(p * p for p in P)
    qb = 2.0 * sum(p * q for p, q in zip(P, Q))
    qq = sum(q * q for q in Q)
    qc = qq - blk.qc_off[None, :]

    def ends_ok(t):
        """Axis-projection slab test: s_i = b_i + t a_i within [lo, hi]
        (between_ends / within_orthotope)."""
        ok = jnp.ones(t.shape, bool)
        for i in range(A):
            s = betas[i] + t * alphas[i]
            ok &= (s >= blk.lo[:, i][None, :]) & (s <= blk.hi[:, i][None, :])
        return ok

    # det = qb^2 - 4 qa qc rewritten through Lagrange's identity:
    # (2 P.Q)^2 - 4|P|^2(|Q|^2 - off) = 4(qa*off - gram(P, Q))
    gram = _minor_sq_sum(P, Q)
    det = 4.0 * (qa * blk.qc_off[None, :] - gram)
    # conservative silhouette margin (see sphere_distances): |Q| can be as
    # large as the origin's distance to the object
    margin = 256.0 * jnp.finfo(o.dtype).eps * (
        qa * blk.qc_off[None, :] + jnp.sqrt(
            jnp.maximum(gram, qa * blk.qc_off[None, :])
            * jnp.maximum(qa * qq, 1.0)))
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

    t_out = jnp.where(ok2 | ok1, t_quad, t_slab)

    pierced = _cell_pierce(blk, o, v)
    if pierced is None:     # scene has no gated rows: statically absent
        return t_out
    return jnp.where(pierced, t_out, MISS)


def _cell_pierce(blk, o, v):
    """kd leaf-cell gate: the reference only TESTS an object when traversal
    visits a leaf cell containing it (kd_node_intersect, kd-tree.c:482-568
    entered through aabb_intersect(&tree->bb), kd-tree.c:598), which both
    clips shell/phantom halos (orthotope EPSILON shells, facet surface
    shells, D>3 hfacet phantom hypersurfaces) at silhouettes and preserves
    the hits the C does show inside larger cells.  gate_t* rows are +/-BIG
    boxes for non-gated rows, making this a no-op there.  Per
    aabb_intersect, near-parallel dims (|v| < EPSILON^2) skip the t-slab
    test (kd-tree.c:97-99) but traversal still picks children by POSITION
    there (kd-tree.c:556-566) -- hence the separate gate_p*.

    Returns [R, N] bool, or None when the block is statically gate-free.

    The B (cells-per-item) axis iterates as a lax.fori_loop, NOT an
    unrolled Python loop: at B = 24 (dense scenes' budgeted gates) an
    unrolled version multiplied the already-large jnp trace graph by
    B x D [R, N] intermediates, and XLA:CPU's buffer assignment kept
    enough of them live to attempt >100 GB allocations on the f64
    random600 path (the class of failure behind VERDICT r4's ~224 GiB
    crash).  The loop form carries only the accumulator."""
    B = blk.gate_tlo.shape[1]
    if B == 0:
        return None
    R, D = o.shape
    N = blk.gate_tlo.shape[0]
    shape = (R, N)

    def one_cell(b, pierced):
        # [N, D] slices of this cell's box
        ctlo = jax.lax.dynamic_index_in_dim(blk.gate_tlo, b, axis=1,
                                            keepdims=False)
        cthi = jax.lax.dynamic_index_in_dim(blk.gate_thi, b, axis=1,
                                            keepdims=False)
        cplo = jax.lax.dynamic_index_in_dim(blk.gate_plo, b, axis=1,
                                            keepdims=False)
        cphi = jax.lax.dynamic_index_in_dim(blk.gate_phi, b, axis=1,
                                            keepdims=False)
        tl = jnp.full(shape, -BIG, o.dtype)
        tu = jnp.full(shape, BIG, o.dtype)
        ok_pos = jnp.ones(shape, bool)
        for d in range(D):
            vd = v[:, d][:, None]
            od = o[:, d][:, None]
            usable = jnp.abs(vd) >= EPSILON * EPSILON   # EPSILON2
            safe_v = jnp.where(usable, vd, 1.0)
            t_a = (ctlo[None, :, d] - od) / safe_v
            t_b = (cthi[None, :, d] - od) / safe_v
            tl = jnp.where(usable, jnp.maximum(tl, jnp.minimum(t_a, t_b)),
                           tl)
            tu = jnp.where(usable, jnp.minimum(tu, jnp.maximum(t_a, t_b)),
                           tu)
            ok_pos &= usable | ((od >= cplo[None, :, d] - EPSILON)
                                & (od <= cphi[None, :, d] + EPSILON))
        return pierced | (ok_pos & (tu + EPSILON >= -EPSILON)
                          & (tl - EPSILON <= tu + EPSILON))

    if B == 1:
        return one_cell(0, jnp.zeros(shape, bool))
    return jax.lax.fori_loop(0, B, one_cell, jnp.zeros(shape, bool))


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
    (facet.c:149-164)."""
    b0 = blk.basis[:, 0, :]
    b1 = blk.basis[:, 1, :]
    base = blk.verts[:, 1, :]
    D = base.shape[1]
    a0, a1 = _mm(v, b0), _mm(v, b1)
    c0 = _mm(o, b0) - mathnd.dot(base, b0)[None, :]
    c1 = _mm(o, b1) - mathnd.dot(base, b1)[None, :]
    # per-component perpendicular residuals as [R, N]
    v_perp = []
    x_perp = []
    for d in range(D):
        v_perp.append(a0 * b0[:, d][None, :] + a1 * b1[:, d][None, :]
                      - v[:, d][:, None])
        x_perp.append(c0 * b0[:, d][None, :] + c1 * b1[:, d][None, :]
                      - (o[:, d][:, None] - base[:, d][None, :]))
    qa = sum(p * p for p in v_perp)
    qb = 2.0 * sum(p * x for p, x in zip(v_perp, x_perp))
    qc = sum(x * x for x in x_perp)

    small_qa = jnp.abs(qa) < EPSILON
    small_qb = jnp.abs(qb) < EPSILON
    t_lin = -qc / jnp.where(small_qb & (qb != 0.0), qb, 1.0)
    t_min = -qb / (2.0 * jnp.where(small_qa, 1.0, qa))
    t = jnp.where(small_qa, jnp.where(small_qb & (qb != 0.0), t_lin, -1.0),
                  t_min)
    # |surf| at the minimum = gram(v_perp, X_perp)/qa (Lagrange identity);
    # evaluating the quadratic directly cancels catastrophically in f32
    gram = _minor_sq_sum(v_perp, x_perp)
    surf = jnp.where(small_qa, qa * t * t + qb * t + qc,
                     gram / jnp.where(small_qa, 1.0, qa))
    ok = (t >= EPSILON) & (jnp.abs(surf) <= EPSILON)

    # inside test: angle at v_i between (hit - v_i) and edge_i must not
    # exceed the interior angle (compare cosines; acos is monotone)
    for i in range(3):
        vi = blk.verts[:, i, :]
        ei = blk.edges[:, i, :]
        u_dot_e = (_mm(o, ei) - mathnd.dot(vi, ei)[None, :]
                   + t * _mm(v, ei))
        u2 = (pre["oo"][:, None] - 2.0 * _mm(o, vi)
              + mathnd.dot(vi, vi)[None, :]
              + 2.0 * t * (pre["vo"][:, None] - _mm(v, vi))
              + t * t * pre["vv"][:, None])
        div = jnp.sqrt(jnp.maximum(u2, 0.0) * mathnd.dot(ei, ei)[None, :])
        cos_q = u_dot_e / jnp.where(div > EPSILON, div, 1.0)
        # degenerate div: vectNd_angle returns -1, which passes the > test
        ok &= (div <= EPSILON) | (cos_q >= blk.cos_angles[:, i][None, :])
    # kd leaf-cell gate (see _cell_pierce): the EPSILON surface shell is
    # only reachable where the C's traversal tests the item
    pierced = _cell_pierce(blk, o, v)
    if pierced is not None:
        ok &= pierced
    return jnp.where(ok, t, MISS)


def facet_normal(blk, rows, hit, o, v, t):
    return blk.normal[rows]  # facet.c:257: dir[0] everywhere


# --------------------------------------------------------------------------
# hfacet: ones-vector linear solve + barycentric inside test


def hfacet_distances(blk, o, v, pre):
    """hfacet.c:211-310: t = -(Q.1)/(R.1) where R/Q are the differences
    between a vector and its projection into the plane basis; both contract
    against the all-ones vector, which collapses to scalar sums here."""
    v0 = blk.verts[:, 0, :]
    v_ue0 = _mm(v, blk.ue0)
    v_ep = _mm(v, blk.ep)
    rv = (v_ue0 * blk.sum_ue0[None, :] + v_ep * blk.sum_ep[None, :]
          - pre["sv"][:, None])
    x_ue0 = _mm(o, blk.ue0) - mathnd.dot(v0, blk.ue0)[None, :]
    x_ep = _mm(o, blk.ep) - mathnd.dot(v0, blk.ep)[None, :]
    qv = (x_ue0 * blk.sum_ue0[None, :] + x_ep * blk.sum_ep[None, :]
          - (pre["so"][:, None] - v0.sum(-1)[None, :]))
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

    # Per-ray bounding-sphere gate (bounding.c:34-85).  The ones-contraction
    # solve enforces only ONE of the D-2 plane constraints, so it can return
    # phantom "hits" whose point is far off the true plane (the barycentric
    # test projects the point into the plane first, so it can't catch them).
    # The C rejects these because trace() bounds-culls every object per ray
    # BEFORE calling intersect (object.c:605-630); replicate that cull here:
    # hit possible iff desc = voc^2 - |oc|^2 + r^2 >= 0 and the sphere is
    # not entirely behind the origin (voc > 0 with voc^2 > desc).
    oc2 = (pre["oo"][:, None] - 2.0 * _mm(o, blk.b_center)
           + mathnd.dot(blk.b_center, blk.b_center)[None, :])
    voc = pre["vo"][:, None] - _mm(v, blk.b_center)
    desc = voc * voc - oc2 + (blk.b_radius * blk.b_radius)[None, :]
    ok &= (desc >= 0.0) & ~((voc > 0.0) & (voc * voc > desc))
    # kd leaf-cell gate (see _cell_pierce): for D > 3 the phantom
    # hypersurface's visible extent IS the set of rays reaching a leaf
    # cell containing the item -- the bounding-sphere cull above matches
    # the C's trace() but NOT which rays ever reach trace()
    pierced = _cell_pierce(blk, o, v)
    if pierced is not None:
        ok &= pierced
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
