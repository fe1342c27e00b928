"""Pallas TPU megakernel for the closest-hit distance pass.

One kernel does, per ray tile x object:
  0. a per-TILE conservative cull: interval arithmetic over the tile's ray
     bounds vs the object's bounding sphere decides, on the scalar unit,
     whether the whole 2048-ray tile can possibly hit the object -- the
     TPU-native equivalent of the reference's kd-tree/bounding cull
     (kd-tree.c, bounding.c:34-85).  Coherent tiles skip most of the scene.
  1. a cheap coarse solve for the closest-approach anchor t_hat,
  2. a *hit-local re-solve*: shift the ray origin to p = o + t_hat v, where
     every magnitude collapses from |camera-to-object| (~100) down to object
     scale, making the f32 discriminant exact enough for silhouettes, thin
     cylinders, and the shadow same-point test, and
  3. the acceptance tests (near-root-then-far order, axis slab ends,
     orthotope surface fallback) exactly as the C does them
     (sphere.c:57-112, hplane.c:39-75, hdisk.c:61-85, cylinder.c:104-210,
     hcylinder.c:132-244, orthotope.c:150-302),
maintaining a running winner in registers.  A final small loop resolves the
winner's material row (color/reflectivity/transparency/ior) from SMEM, so
the engine needs NO per-ray gathers afterwards (TPU gathers are the single
most expensive op in the naive pipeline).  HBM sees one read of the rays
and one write of the per-ray results.

Normals come free in the local frame: the perpendicular component of
(hit - base) is -(Q' + delta P) for quadrics and oc' + delta v for spheres.

Data layout: rays and normals travel as [D_PAD, R//LANE, LANE] so every
value in the kernel is a full (RT//LANE, LANE) vreg tile.

Modes:
  closest  -- winner t/mat/normal/material (+ per-ray excluded object id)
  any      -- occlusion: winner t/mat only (directional shadows)
  shadow   -- point-light shadow semantics: dist_limit scan-order truncation
              over infinite objects (object.c:736-738 + kd-tree.c:592-594)
              via a first-rank pass then a conditional-min pass

Covers all five families (sphere / plane / quadric / facet / hfacet);
large scenes pack into SMEM-sized chunks (compile._pack_chunked), the
kernel runs once per chunk, and the tracer min-merges chunk winners.
f32 only -- the f64 golden-parity path stays on the jnp kernels in
intersect.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ndt_tpu.constants import (BIG, EPSILON, MIN_PIXEL_FRAC,
                               SPECULAR_POWER)


def _ipow(x, n):
    """x**n for static integer n by binary exponentiation (no transcendental
    pow on the VPU hot path)."""
    assert float(n) == int(n), n
    n = int(n)
    acc = None
    sq = x
    while n:
        if n & 1:
            acc = sq if acc is None else acc * sq
        sq = sq * sq
        n >>= 1
    return acc if acc is not None else jnp.ones_like(x)

import os as _os
LANE = 128
RT = int(_os.environ.get("NDT_PALLAS_RT", 4096))  # rays per grid program
# 4096 benches ~10% faster than 2048 on v5e (better VPU occupancy per
# grid step while the tile cull stays effective); 8192+ loses coherence
_UNROLL = int(_os.environ.get("NDT_PALLAS_UNROLL", 1))
D_PAD = 8
N_PROPS = 8        # color3, reflect3, transparent, refract_index


class PallasMeta(NamedTuple):
    """Static scene layout for kernel specialization."""

    dim: int
    n_sph: int
    n_pln: int
    n_quad: int
    a_quad: int  # padded axis count of the quadric block
    b_gate: int  # kd leaf-cell gate boxes per quadric (1 = no gating)
    # static (global_id, shadow_rank) of the scene's INFINITE leaves, rank
    # ascending: the shadow-mode first-rank pass and the fused in-kernel
    # shadow tests evaluate exactly these instead of scanning every
    # candidate for its rank (there are usually 0-2 infinite objects)
    inf_gids: tuple = ()
    n_fct: int = 0   # facet family rows (facet.c triangles)
    n_hf: int = 0    # hfacet family rows (hfacet.c triangles)
    b_fct: int = 0   # kd leaf-cell gate boxes per facet (0 = no gating)
    b_hf: int = 0    # kd leaf-cell gate boxes per hfacet (0 = no gating)


# --------------------------------------------------------------------------
# per-family candidate evaluation (returns refined t and, optionally,
# unnormalized normal components)


def _sphere_eval(sph_ref, n, o, v, D, want_normal):
    w = n * (D + 1)
    c = [sph_ref[w + d] for d in range(D)]
    r2 = sph_ref[w + D]
    oc = [o[d] - c[d] for d in range(D)]
    voc = sum(v[d] * oc[d] for d in range(D))
    t_hat = -voc                           # closest approach anchor
    ocl = [oc[d] + t_hat * v[d] for d in range(D)]  # hit-local offset
    perp2 = 0.0
    for a in range(D):
        for b in range(a + 1, D):
            m = v[a] * ocl[b] - v[b] * ocl[a]
            perp2 = perp2 + m * m
    desc = r2 - perp2
    droot = jnp.sqrt(jnp.maximum(desc, 0.0))
    vocl = sum(v[d] * ocl[d] for d in range(D))     # ~0, kills residue
    near = t_hat - vocl - droot
    far = t_hat - vocl + droot
    t = jnp.where(near >= EPSILON, near,
                  jnp.where(far >= EPSILON, far, BIG))
    t = jnp.where(desc >= 0.0, t, BIG)
    if not want_normal:
        return t, None
    dt_ = t - t_hat
    nrm = [ocl[d] + dt_ * v[d] for d in range(D)]   # hit - center
    return t, nrm


def _plane_eval(pln_ref, n, o, v, D, want_normal):
    w = n * (2 * D + 1)
    p = [pln_ref[w + d] for d in range(D)]
    nv = [pln_ref[w + D + d] for d in range(D)]
    r2 = pln_ref[w + 2 * D]
    ln = sum(v[d] * nv[d] for d in range(D))
    pln = sum((p[d] - o[d]) * nv[d] for d in range(D))
    dd = pln / jnp.where(jnp.abs(ln) > EPSILON, ln, 1.0)
    ok = (jnp.abs(ln) > EPSILON) & (dd >= EPSILON)
    dist2 = 0.0
    for d in range(D):
        off = (o[d] - p[d]) + dd * v[d]
        dist2 = dist2 + off * off
    ok &= dist2 <= r2
    t = jnp.where(ok, dd, BIG)
    if not want_normal:
        return t, None
    nrm = [jnp.broadcast_to(nv[d], t.shape) for d in range(D)]
    return t, nrm


def _quadric_eval(qb_ref, qa_ref, ql_ref, qh_ref, qo_ref, qs_ref,
                  qgi_ref, qgt_ref, qgp_ref, n, o, v, D, A, B,
                  want_normal):
    base = [qb_ref[n * D + d] for d in range(D)]
    ax = [[qa_ref[n * A * D + i * D + d] for d in range(D)] for i in range(A)]
    lo = [ql_ref[n * A + i] for i in range(A)]
    hi = [qh_ref[n * A + i] for i in range(A)]
    off = qo_ref[n]
    slab = qs_ref[n]

    x = [o[d] - base[d] for d in range(D)]
    alpha = [sum(v[d] * ax[i][d] for d in range(D)) for i in range(A)]
    beta = [sum(x[d] * ax[i][d] for d in range(D)) for i in range(A)]
    P = [sum(alpha[i] * ax[i][d] for i in range(A)) - v[d] for d in range(D)]
    qa = sum(p * p for p in P)
    safe_qa = jnp.where(jnp.abs(qa) > 1e-20, qa, 1.0)
    Q0 = [sum(beta[i] * ax[i][d] for i in range(A)) - x[d] for d in range(D)]
    pq = sum(p * q for p, q in zip(P, Q0))
    t_hat = -pq / safe_qa                  # coarse closest-approach anchor

    # hit-local re-solve at p = o + t_hat v (object-scale magnitudes)
    beta_l = [beta[i] + t_hat * alpha[i] for i in range(A)]
    xl = [x[d] + t_hat * v[d] for d in range(D)]
    Q = [sum(beta_l[i] * ax[i][d] for i in range(A)) - xl[d]
         for d in range(D)]
    qb = 2.0 * sum(p * q for p, q in zip(P, Q))
    gram = 0.0
    for a in range(D):
        for b in range(a + 1, D):
            m = P[a] * Q[b] - P[b] * Q[a]
            gram = gram + m * m
    det = 4.0 * (qa * off - gram)
    droot = jnp.sqrt(jnp.maximum(det, 0.0))
    d_near = (-qb - droot) / (2.0 * safe_qa)
    d_far = (-qb + droot) / (2.0 * safe_qa)
    t_near = t_hat + d_near
    t_far = t_hat + d_far

    def ends(delta, t_abs):
        ok = jnp.ones(t_abs.shape, bool)
        for i in range(A):
            s = beta_l[i] + delta * alpha[i]
            ok &= (s >= lo[i]) & (s <= hi[i])
        return ok

    is_slab = slab > 0
    usable = jnp.abs(qa) > 1e-20
    quad_valid = (det >= 0.0) & (
        (is_slab & (jnp.abs(qa) > EPSILON)) | ((~is_slab) & usable))
    ok2 = quad_valid & (t_near > EPSILON) & ends(d_near, t_near)
    ok1 = quad_valid & (t_far > EPSILON) & ends(d_far, t_far)

    # orthotope closest-approach fallback (orthotope.c:233-275)
    d_min = -qb / (2.0 * safe_qa)
    t_f = t_hat + d_min
    surf = gram / safe_qa - off
    ok_f = (is_slab & usable & (t_f >= EPSILON)
            & (jnp.abs(surf) <= EPSILON) & ends(d_min, t_f))

    t = jnp.where(ok2, t_near,
                  jnp.where(ok1, t_far, jnp.where(ok_f, t_f, BIG)))

    # kd leaf-cell gate (see intersect.quadric_distances): the reference
    # only tests a slab when the ray pierces a leaf cell containing its kd
    # item, which bounds the orthotope's EPSILON-shell halo.  B == 1 with
    # +/-BIG boxes when the scene has no slabs (no-op, folded by XLA).
    # Gate boxes are DEDUPED per kd item (pack_params): all rows of one
    # item -- e.g. the ~130 expanded faces of a 5-D hcube -- share one
    # table entry through the qgi slot index, which cuts the dominant
    # SMEM cost of gated dense scenes ~5x (and with it the chunk count).
    if B:
        gi = qgi_ref[n]
        pierced = None
        for b in range(B):
            tl = jnp.full(t.shape, -BIG)
            tu = jnp.full(t.shape, BIG)
            ok_pos = jnp.ones(t.shape, bool)
            for d in range(D):
                w = (gi * B + b) * D + d
                usable = jnp.abs(v[d]) >= EPSILON * EPSILON   # EPSILON2
                safe_v = jnp.where(usable, v[d], 1.0)
                t_a = (qgt_ref[2 * w] - o[d]) / safe_v
                t_b = (qgt_ref[2 * w + 1] - o[d]) / safe_v
                tl = jnp.where(usable,
                               jnp.maximum(tl, jnp.minimum(t_a, t_b)), tl)
                tu = jnp.where(usable,
                               jnp.minimum(tu, jnp.maximum(t_a, t_b)), tu)
                ok_pos &= usable | (
                    (o[d] >= qgp_ref[2 * w] - EPSILON)
                    & (o[d] <= qgp_ref[2 * w + 1] + EPSILON))
            pb = (ok_pos & (tu + EPSILON >= -EPSILON)
                  & (tl - EPSILON <= tu + EPSILON))
            pierced = pb if pierced is None else (pierced | pb)
        t = jnp.where(pierced, t, BIG)
    if not want_normal:
        return t, None
    delta = jnp.where(ok2, d_near, jnp.where(ok1, d_far, d_min))
    nrm = [-(Q[d] + delta * P[d]) for d in range(D)]
    return t, nrm


def _facet_width(D, B=0):
    """Flat facet table row width (see pack_params layout); B gate boxes
    append 4*B*D values (per box: tlo/thi then plo/phi, d-interleaved)."""
    return 10 * D + 11 + 4 * B * D


def _row_gate_pierce(ref, gate_off, B, D, o, v):
    """kd leaf-cell gate over row-embedded boxes (see intersect._cell_pierce
    for semantics/citations).  ``gate_off`` is the row offset of the first
    box; each box is [tlo0 thi0 tlo1 thi1 ... plo0 phi0 ...] (2D t-bounds
    then 2D position bounds)."""
    pierced = None
    for b in range(B):
        gb = gate_off + b * 4 * D
        tl = jnp.full(o[0].shape, -BIG)
        tu = jnp.full(o[0].shape, BIG)
        ok_pos = jnp.ones(o[0].shape, bool)
        for d in range(D):
            usable = jnp.abs(v[d]) >= EPSILON * EPSILON   # EPSILON2
            safe_v = jnp.where(usable, v[d], 1.0)
            t_a = (ref[gb + 2 * d] - o[d]) / safe_v
            t_b = (ref[gb + 2 * d + 1] - o[d]) / safe_v
            tl = jnp.where(usable,
                           jnp.maximum(tl, jnp.minimum(t_a, t_b)), tl)
            tu = jnp.where(usable,
                           jnp.minimum(tu, jnp.maximum(t_a, t_b)), tu)
            ok_pos &= usable | (
                (o[d] >= ref[gb + 2 * D + 2 * d] - EPSILON)
                & (o[d] <= ref[gb + 2 * D + 2 * d + 1] + EPSILON))
        pb = (ok_pos & (tu + EPSILON >= -EPSILON)
              & (tl - EPSILON <= tu + EPSILON))
        pierced = pb if pierced is None else (pierced | pb)
    return pierced


def _facet_eval(fct_ref, n, o, v, D, B, want_normal):
    """Triangle facet (facet.c:166-269): plane closest-approach with an
    EPSILON surface-distance acceptance, then the vertex-angle inside test
    (facet.c:149-164).  Mirrors intersect.facet_distances, with the
    Lagrange-identity gram trick for the f32-stable |surf| at the minimum.

    Row layout: b0[D] b1[D] base[D] bb0 bb1 v0..v2[3D] e0..e2[3D]
    vdote[3] edote[3] cosang[3] normal[D] [gates: 4*B*D]."""
    w = n * _facet_width(D, B)
    b0 = [fct_ref[w + d] for d in range(D)]
    b1 = [fct_ref[w + D + d] for d in range(D)]
    base = [fct_ref[w + 2 * D + d] for d in range(D)]
    bb0 = fct_ref[w + 3 * D]
    bb1 = fct_ref[w + 3 * D + 1]

    a0 = sum(v[d] * b0[d] for d in range(D))
    a1 = sum(v[d] * b1[d] for d in range(D))
    c0 = sum(o[d] * b0[d] for d in range(D)) - bb0
    c1 = sum(o[d] * b1[d] for d in range(D)) - bb1
    qa = 0.0
    qb = 0.0
    qc = 0.0
    v_perp = []
    x_perp = []
    for d in range(D):
        vp = a0 * b0[d] + a1 * b1[d] - v[d]
        xp = c0 * b0[d] + c1 * b1[d] - (o[d] - base[d])
        v_perp.append(vp)
        x_perp.append(xp)
        qa = qa + vp * vp
        qb = qb + vp * xp
        qc = qc + xp * xp
    qb = 2.0 * qb

    small_qa = jnp.abs(qa) < EPSILON
    small_qb = jnp.abs(qb) < EPSILON
    t_lin = -qc / jnp.where(small_qb & (qb != 0.0), qb, 1.0)
    t_min = -qb / (2.0 * jnp.where(small_qa, 1.0, qa))
    t = jnp.where(small_qa,
                  jnp.where(small_qb & (qb != 0.0), t_lin, -1.0), t_min)
    gram = 0.0
    for a in range(D):
        for b in range(a + 1, D):
            m = v_perp[a] * x_perp[b] - v_perp[b] * x_perp[a]
            gram = gram + m * m
    surf = jnp.where(small_qa, qa * t * t + qb * t + qc,
                     gram / jnp.where(small_qa, 1.0, qa))
    ok = (t >= EPSILON) & (jnp.abs(surf) <= EPSILON)

    oo = sum(o[d] * o[d] for d in range(D))
    vo = sum(v[d] * o[d] for d in range(D))
    vv = sum(v[d] * v[d] for d in range(D))
    for i in range(3):
        vi = [fct_ref[w + 3 * D + 2 + i * D + d] for d in range(D)]
        ei = [fct_ref[w + 6 * D + 2 + i * D + d] for d in range(D)]
        vdote = fct_ref[w + 9 * D + 2 + i]      # vi . ei
        edote = fct_ref[w + 9 * D + 5 + i]      # ei . ei
        cosang = fct_ref[w + 9 * D + 8 + i]
        u_dot_e = (sum(o[d] * ei[d] for d in range(D)) - vdote
                   + t * sum(v[d] * ei[d] for d in range(D)))
        ovi = sum(o[d] * vi[d] for d in range(D))
        vvi = sum(v[d] * vi[d] for d in range(D))
        vivi = sum(x * x for x in vi)
        u2 = oo - 2.0 * ovi + vivi + 2.0 * t * (vo - vvi) + t * t * vv
        div = jnp.sqrt(jnp.maximum(u2, 0.0) * edote)
        cos_q = u_dot_e / jnp.where(div > EPSILON, div, 1.0)
        # degenerate div: vectNd_angle returns -1, which passes (> test)
        ok &= (div <= EPSILON) | (cos_q >= cosang)
    if B:
        # kd leaf-cell gate: the EPSILON shell is only reachable where the
        # reference's traversal tests the item (see intersect._cell_pierce)
        ok &= _row_gate_pierce(fct_ref, w + 10 * D + 11, B, D, o, v)
    t_out = jnp.where(ok, t, BIG)
    if not want_normal:
        return t_out, None
    nrm = [jnp.broadcast_to(fct_ref[w + 9 * D + 11 + d], t_out.shape)
           for d in range(D)]                    # facet.c:257: dir[0]
    return t_out, nrm


def _hfacet_width(D, B=0):
    return 7 * D + 12 + 4 * B * D


def _hfacet_eval(hf_ref, n, o, v, D, B, want_normal):
    """hfacet (hfacet.c:211-310): ones-contraction linear solve + 2-D
    barycentric inside test + the per-ray bounding-sphere gate that the C
    gets from trace()'s cull (object.c:605-630) -- mirrors
    intersect.hfacet_distances.

    Row layout: v0[D] ue0[D] ep[D] sum_ue0 sum_ep v0_ue0 v0_ep v0_sum
    x2 y2 x3 y3 inv_den use_normals vn0..vn2[3D] b_center[D] b_r2
    [gates: 4*B*D]."""
    w = n * _hfacet_width(D, B)
    v0 = [hf_ref[w + d] for d in range(D)]
    ue0 = [hf_ref[w + D + d] for d in range(D)]
    ep = [hf_ref[w + 2 * D + d] for d in range(D)]
    sum_ue0 = hf_ref[w + 3 * D]
    sum_ep = hf_ref[w + 3 * D + 1]
    v0_ue0 = hf_ref[w + 3 * D + 2]
    v0_ep = hf_ref[w + 3 * D + 3]
    v0_sum = hf_ref[w + 3 * D + 4]
    x2 = hf_ref[w + 3 * D + 5]
    y2 = hf_ref[w + 3 * D + 6]
    x3 = hf_ref[w + 3 * D + 7]
    y3 = hf_ref[w + 3 * D + 8]
    inv_den = hf_ref[w + 3 * D + 9]
    use_n = hf_ref[w + 3 * D + 10]

    sv = sum(v[d] for d in range(D))
    so = sum(o[d] for d in range(D))
    v_ue0 = sum(v[d] * ue0[d] for d in range(D))
    v_ep = sum(v[d] * ep[d] for d in range(D))
    rv = v_ue0 * sum_ue0 + v_ep * sum_ep - sv
    x_ue0 = sum(o[d] * ue0[d] for d in range(D)) - v0_ue0
    x_ep = sum(o[d] * ep[d] for d in range(D)) - v0_ep
    qv = x_ue0 * sum_ue0 + x_ep * sum_ep - (so - v0_sum)
    ok = jnp.abs(rv) >= EPSILON
    t = -qv / jnp.where(ok, rv, 1.0)
    ok &= t > EPSILON

    xp = x_ue0 + t * v_ue0
    yp = x_ep + t * v_ep
    l1 = ((y2 - y3) * (xp - x3) + (x3 - x2) * (yp - y3)) * inv_den
    l2 = (y3 * (xp - x3) + (0.0 - x3) * (yp - y3)) * inv_den
    l3 = 1.0 - l1 - l2
    for l in (l1, l2, l3):
        ok &= (l >= -EPSILON) & (l <= 1.0 + EPSILON)

    # per-ray bounding-sphere gate (bounding.c:34-85): the ones solve
    # enforces only one of the D-2 plane constraints, so phantom hits far
    # off the plane must be culled exactly as the C's trace() does
    oo = sum(o[d] * o[d] for d in range(D))
    vo = sum(v[d] * o[d] for d in range(D))
    bc = [hf_ref[w + 6 * D + 11 + d] for d in range(D)]
    br2 = hf_ref[w + 7 * D + 11]
    oc2 = (oo - 2.0 * sum(o[d] * bc[d] for d in range(D))
           + sum(b * b for b in bc))
    voc = vo - sum(v[d] * bc[d] for d in range(D))
    desc = voc * voc - oc2 + br2
    ok &= (desc >= 0.0) & ~((voc > 0.0) & (voc * voc > desc))
    if B:
        # kd leaf-cell gate: the D>3 phantom hypersurface's visible extent
        # is the set of rays reaching a leaf cell containing the item (see
        # intersect._cell_pierce)
        ok &= _row_gate_pierce(hf_ref, w + 7 * D + 12, B, D, o, v)
    t_out = jnp.where(ok, t, BIG)
    if not want_normal:
        return t_out, None
    # flag[0]: barycentric-interpolated vertex normals, else the direction
    # from the plane's closest point to the OBSERVER (hfacet.c:279-297);
    # magnitudes don't matter downstream (shading normalizes)
    nrm = []
    d0_ue0 = sum((o[d] - v0[d]) * ue0[d] for d in range(D))
    d0_ep = sum((o[d] - v0[d]) * ep[d] for d in range(D))
    for d in range(D):
        vn = (hf_ref[w + 3 * D + 11 + d] * l1
              + hf_ref[w + 4 * D + 11 + d] * l2
              + hf_ref[w + 5 * D + 11 + d] * l3)
        on = v0[d] + ue0[d] * d0_ue0 + ep[d] * d0_ep
        nrm.append(jnp.where(use_n > 0.0, vn,
                             jnp.broadcast_to(o[d] - on, t_out.shape)))
    return t_out, nrm


# --------------------------------------------------------------------------
# per-tile conservative cull (scalar unit): can ANY ray in the tile hit the
# object's bounding sphere?  Interval arithmetic over the tile's per-
# component origin/direction ranges.


def _imul(alo, ahi, blo, bhi):
    c1, c2, c3, c4 = alo * blo, alo * bhi, ahi * blo, ahi * bhi
    return (jnp.minimum(jnp.minimum(c1, c2), jnp.minimum(c3, c4)),
            jnp.maximum(jnp.maximum(c1, c2), jnp.maximum(c3, c4)))


def _tile_bounds(o, v, D):
    return ([jnp.min(o[d]) for d in range(D)],
            [jnp.max(o[d]) for d in range(D)],
            [jnp.min(v[d]) for d in range(D)],
            [jnp.max(v[d]) for d in range(D)])


def _tile_may_hit(tb, c, r2, D):
    """Conservative: lower-bound the squared perpendicular distance from
    the center to every ray line in the tile, and the 'behind' condition."""
    o_lo, o_hi, v_lo, v_hi = tb
    perp2_lo = 0.0
    voc_lo = 0.0
    voc_hi = 0.0
    oc = [(o_lo[d] - c[d], o_hi[d] - c[d]) for d in range(D)]
    for d in range(D):
        plo, phi = _imul(v_lo[d], v_hi[d], oc[d][0], oc[d][1])
        voc_lo = voc_lo + plo
        voc_hi = voc_hi + phi
    for a in range(D):
        for b in range(a + 1, D):
            p1lo, p1hi = _imul(v_lo[a], v_hi[a], oc[b][0], oc[b][1])
            p2lo, p2hi = _imul(v_lo[b], v_hi[b], oc[a][0], oc[a][1])
            mlo = p1lo - p2hi
            mhi = p1hi - p2lo
            m2 = jnp.where((mlo <= 0.0) & (mhi >= 0.0), 0.0,
                           jnp.minimum(mlo * mlo, mhi * mhi))
            perp2_lo = perp2_lo + m2
    radial_ok = perp2_lo <= r2
    # sphere entirely behind every ray: farthest root -voc + r < EPSILON
    r = jnp.sqrt(jnp.maximum(r2, 0.0))
    ahead_ok = (-voc_lo + r) >= EPSILON
    return radial_ok & ahead_ok


# --------------------------------------------------------------------------


import os

_USE_CULL = os.environ.get("NDT_PALLAS_CULL", "1") != "0"
_USE_PROPS = os.environ.get("NDT_PALLAS_PROPS", "1") != "0"
# front-to-back early exit over reach-sorted candidate lists (the kd
# traversal near-to-far break, kd-tree.c:534-590); NDT_EARLY_EXIT=0 for A/B
_EARLY_EXIT = os.environ.get("NDT_EARLY_EXIT", "1") != "0"
# candidates per early-exit check: amortizes the cross-lane max reduction
_EE_GROUP = int(os.environ.get("NDT_EE_GROUP", 8))
# scene size (chunk rows) below which the early exit stays off: at
# flagship scale (~125 objects) the loop/reduction overhead measurably
# outweighs the skipped evals (see ARCHITECTURE.md perf journal); the
# exit pays off when per-tile candidate lists are long
_EE_MIN_OBJECTS = int(os.environ.get("NDT_EE_MIN_OBJECTS", 192))
# interpret mode (CPU correctness tests) skips the early exit by default:
# the grouped while-loop bodies inline _EE_GROUP full evals per family,
# which explodes interpreter-mode compile time/memory on large scenes.
# Tests that exercise the exit force this on (with small scenes).
_EE_INTERPRET = os.environ.get("NDT_EE_INTERPRET", "0") != "0"


def _use_early_exit(meta: "PallasMeta", interpret: bool = False) -> bool:
    if interpret and not _EE_INTERPRET:
        return False
    n = (meta.n_sph + meta.n_pln + meta.n_quad + meta.n_fct + meta.n_hf)
    return _EARLY_EXIT and n >= _EE_MIN_OBJECTS


def _fam_meta(meta: PallasMeta):
    """(family key, cull-count column, global-id offset) of present
    families, in global-id order (must match pack_params concatenation)."""
    out = []
    off = 0
    for key, col, n in (("sph", 0, meta.n_sph), ("pln", 1, meta.n_pln),
                        ("quad", 2, meta.n_quad), ("fct", 3, meta.n_fct),
                        ("hf", 4, meta.n_hf)):
        if n:
            out.append((key, col, off))
        off += n
    return out


def _gid_fam(meta: PallasMeta, gid):
    """Static global id -> (family key, local row)."""
    for key, n in (("sph", meta.n_sph), ("pln", meta.n_pln),
                   ("quad", meta.n_quad), ("fct", meta.n_fct),
                   ("hf", meta.n_hf)):
        if gid < n:
            return key, gid
        gid -= n
    raise ValueError(f"gid out of range: {gid}")


N_FAMS = 5   # cull-count columns (sph, pln, quad, fct, hf)
N_KERNEL_TABLES = 17  # params[:17] feed the kernels; [17] is the cull AABB


def _make_kernel(meta: PallasMeta, mode: str, interpret: bool = False,
                 has_init: bool = False, accum: bool = False):
    """mode: 'closest' | 'any' | 'shadow'.

    ``has_init``: the winner state (t/mat[/normal/props]) of the PREVIOUS
    scene chunk arrives as extra VMEM inputs and seeds the running winner,
    so the front-to-back early exit of chunk k prunes against the best hit
    of chunks 0..k-1 (the TPU analogue of threading ``*t_ptr`` through the
    C's kd traversal, kd-tree.c:541-556) instead of starting from BIG.

    ``accum`` (pallas_trace_grouped): the grid is (n_tiles, n_chunks) with
    the CHUNK axis fastest, so for a fixed tile the output blocks are
    revisited across consecutive chunk steps and the winner accumulates in
    the output VMEM window itself: chunk step c > 0 seeds its state from
    the out refs (what step c-1 wrote); step c == 0 seeds from the init
    refs (if has_init, the previous GROUP's winner) or from BIG/-1.  One
    kernel launch replaces the per-chunk launch chain, whose serialized
    launch latency dominates narrow-batch (stack-phase) iterations."""
    early = _use_early_exit(meta, interpret)
    D = meta.dim
    A = meta.a_quad
    want_normal = mode == "closest"
    NOTINF = (1 << 30) - 1  # python literal; captured jnp consts are disallowed

    def kernel(sph_ref, pln_ref, qbase_ref, qaxes_ref, qlo_ref, qhi_ref,
               qoff_ref, qslab_ref, qgi_ref, qgt_ref, qgp_ref, fct_ref,
               hf_ref, mat_ref, rank_ref, bnd_ref, prop_ref,
               lists_ref, counts_ref, reach_ref, live_ref,
               o_ref, v_ref, aux_ref, *rest):
        if has_init:
            if mode == "closest":
                ti_ref, mi_ref, ni_ref, pi_ref = rest[:4]
                rest = rest[4:]
            else:
                ti_ref, mi_ref = rest[:2]
                rest = rest[2:]
        out_refs = rest
        if accum:
            # chunk-grid accumulation: state = init (first chunk step) or
            # the out window (later steps; same VMEM block, revisited)
            first_chunk = pl.program_id(1) == 0

            def seeded(init_val, out_val):
                return jnp.where(first_chunk, init_val, out_val)
        o = [o_ref[d] for d in range(D)]       # each (RT//LANE, LANE)
        v = [v_ref[d] for d in range(D)]
        shape = o[0].shape
        live_f = live_ref[0]                   # 1.0 live / 0.0 discard

        # per-tile compact surviving-object lists, built vectorized in XLA
        # (cull_lists below) and delivered as blocked SMEM rows
        fam_meta = _fam_meta(meta)

        def make_evals(o, v, normals):
            return {
                "sph": lambda n: _sphere_eval(sph_ref, n, o, v, D, normals),
                "pln": lambda n: _plane_eval(pln_ref, n, o, v, D, normals),
                "quad": lambda n: _quadric_eval(
                    qbase_ref, qaxes_ref, qlo_ref, qhi_ref, qoff_ref,
                    qslab_ref, qgi_ref, qgt_ref, qgp_ref, n, o, v, D, A,
                    meta.b_gate, normals),
                "fct": lambda n: _facet_eval(fct_ref, n, o, v, D,
                                             meta.b_fct, normals),
                "hf": lambda n: _hfacet_eval(hf_ref, n, o, v, D,
                                             meta.b_hf, normals),
            }

        evals = make_evals(o, v, want_normal)
        gid_fam = functools.partial(_gid_fam, meta)

        def first_rank_pass(sev, limit):
            """Lowest shadow rank among INFINITE leaves hit within the
            limit (the C's scan-order break, object.c:736-738) -- the
            infinite leaves are statically known, so this unrolls over
            the usual 0-2 of them instead of scanning every candidate."""
            fr = jnp.full(shape, NOTINF, jnp.int32)
            for gid, rank in meta.inf_gids:
                name, loc = gid_fam(gid)
                t_e, _ = sev[name](loc)
                within = (t_e < limit) & (t_e < BIG * 0.5)
                fr = jnp.where(within, jnp.minimum(fr, jnp.int32(rank)), fr)
            return fr

        fam_sizes = {"sph": meta.n_sph, "pln": meta.n_pln,
                     "quad": meta.n_quad, "fct": meta.n_fct,
                     "hf": meta.n_hf}

        def families(visit):
            for name, fam_i, gid0 in fam_meta:
                ev = evals[name]
                cnt = counts_ref[0, 0, fam_i]
                visit(cnt, gid0,
                      lambda k, gid0=gid0, ev=ev: ev(
                          lists_ref[0, 0, gid0 + k] - gid0),
                      lambda k, gid0=gid0: lists_ref[0, 0, gid0 + k] - gid0,
                      fam_sizes[name])

        if mode in ("closest", "any"):
            excl = aux_ref[0]                  # excluded MATERIAL id tile
            if mode == "closest":
                t_ref, m_ref, n_ref, p_ref = out_refs
            else:
                t_ref, m_ref = out_refs
            if has_init:
                t1 = ti_ref[0]
                m1 = mi_ref[0]
                if want_normal:
                    n1 = [ni_ref[d] for d in range(D)]
            else:
                t1 = jnp.full(shape, BIG, jnp.float32)
                m1 = jnp.full(shape, -1, jnp.int32)
                if want_normal:
                    n1 = [jnp.zeros(shape, jnp.float32) for _ in range(D)]
            if accum:
                t1 = seeded(t1, t_ref[0])
                m1 = seeded(m1, m_ref[0])
                if want_normal:
                    n1 = [seeded(n1[d], n_ref[d]) for d in range(D)]
            state = {}

            def visit(count, gid0, ev, row, sz):
                def step(k, valid, t1, m1, n1):
                    n = row(k)
                    t, nrm = ev(k)
                    mat = mat_ref[gid0 + n]
                    t = jnp.where(mat == excl, BIG, t)
                    if valid is not None:
                        t = jnp.where(valid, t, BIG)
                    b = t < t1
                    t1 = jnp.where(b, t, t1)
                    m1 = jnp.where(b, mat, m1)
                    if want_normal:
                        n1 = [jnp.where(b, nd, n1d)
                              for nd, n1d in zip(nrm, n1)]
                    return t1, m1, n1

                if early:
                    # candidates arrive sorted by their reach lower bound;
                    # stop once the next candidate cannot undercut any live
                    # lane's current winner (near-to-far kd traversal
                    # break, kd-tree.c:534-590).  Candidates advance in
                    # groups of _EE_GROUP so the cross-lane max reduction
                    # amortizes; overshoot within a group evaluates culled
                    # (provably missing) rows, which is wasted work but
                    # never wrong.
                    M = min(_EE_GROUP, sz)

                    def cond(carry):
                        k = carry[0]
                        tmax = carry[-1]
                        kc = jnp.minimum(k, sz - 1)
                        return ((k < count)
                                & (reach_ref[0, 0, gid0 + kc] <= tmax))

                    def wbody(carry):
                        k = carry[0]
                        t1, m1 = carry[1], carry[2]
                        n1 = list(carry[3:3 + D]) if want_normal else None
                        for j in range(M):
                            idx = jnp.minimum(k + j, sz - 1)
                            t1, m1, n1 = step(idx, k + j < count,
                                              t1, m1, n1)
                        tmax = jnp.max(t1 * live_f)
                        if want_normal:
                            return (k + M, t1, m1, *n1, tmax)
                        return (k + M, t1, m1, tmax)

                    tmax0 = jnp.max(state["t1"] * live_f)
                    if want_normal:
                        init = (jnp.int32(0), state["t1"], state["m1"],
                                *state["n1"], tmax0)
                    else:
                        init = (jnp.int32(0), state["t1"], state["m1"],
                                tmax0)
                    out = jax.lax.while_loop(cond, wbody, init)
                    state["t1"], state["m1"] = out[1], out[2]
                    if want_normal:
                        state["n1"] = list(out[3:3 + D])
                    return

                def body(k, carry):
                    if want_normal:
                        t1, m1, *n1 = carry
                    else:
                        t1, m1 = carry
                        n1 = None
                    t1, m1, n1 = step(k, None, t1, m1, n1)
                    if want_normal:
                        return (t1, m1, *n1)
                    return (t1, m1)

                init = ((state["t1"], state["m1"], *state["n1"])
                        if want_normal else (state["t1"], state["m1"]))
                out = jax.lax.fori_loop(0, count, body, init,
                                        unroll=_UNROLL)
                state["t1"], state["m1"] = out[0], out[1]
                if want_normal:
                    state["n1"] = list(out[2:])

            state["t1"], state["m1"] = t1, m1
            if want_normal:
                state["n1"] = n1
            families(visit)

            t_ref[...] = state["t1"][None]
            m_ref[...] = state["m1"][None]
            if mode == "closest":
                for d in range(D):
                    n_ref[d] = state["n1"][d]
                for d in range(D, D_PAD):
                    n_ref[d] = jnp.zeros(shape, jnp.float32)
                # winner material properties from SMEM (no host gathers),
                # resolved over the tile's SURVIVING candidates only --
                # the winner is always on the cull list, so dead/culled
                # materials never need a pass
                if has_init:
                    p0 = tuple(pi_ref[j] for j in range(N_PROPS))
                else:
                    p0 = tuple(jnp.zeros(shape, jnp.float32)
                               for _ in range(N_PROPS))
                if accum:
                    p0 = tuple(seeded(p0[j], p_ref[j])
                               for j in range(N_PROPS))
                pstate = {"p": p0}

                def vprop(count, gid0, ev, row, sz):
                    def body(k, props):
                        mat = mat_ref[gid0 + row(k)]
                        sel = state["m1"] == mat
                        return tuple(
                            jnp.where(sel, prop_ref[mat * N_PROPS + j], pj)
                            for j, pj in enumerate(props))

                    pstate["p"] = jax.lax.fori_loop(0, count, body,
                                                    pstate["p"])

                if _USE_PROPS:
                    families(vprop)
                for j in range(N_PROPS):
                    p_ref[j] = pstate["p"][j]

        else:
            limit = aux_ref[0]
            # pass 1: first (lowest) rank among infinite objects hit within
            # the limit (the C's trace() breaks at the first such object in
            # scan order; compile assigns ranks in that order) -- unrolled
            # over the statically known infinite leaves
            first = {"rank": first_rank_pass(evals, limit)}

            # pass 2: min over finite objects + infinite objects with
            # rank <= first_rank
            t_ref, m_ref = out_refs
            if has_init:
                # chunk 0 carries every infinite leaf, so threaded chunks
                # k>0 are finite-only and seed from chunk k-1's winner
                st = {"t1": ti_ref[0], "m1": mi_ref[0]}
            else:
                st = {"t1": jnp.full(shape, BIG, jnp.float32),
                      "m1": jnp.full(shape, -1, jnp.int32)}
            if accum:
                st = {"t1": seeded(st["t1"], t_ref[0]),
                      "m1": seeded(st["m1"], m_ref[0])}

            # a winner farther than limit + margin can never pass the
            # downstream same-point-within-EPSILON test (ndt.c:217-228), so
            # lanes cap their contribution to the early-exit threshold at
            # the limit: fully-unoccluded tiles stop after the candidates
            # within reach of their lights
            cap = limit * (1.0 + 1e-3) + 0.01

            def visit2(count, gid0, ev, row, sz):
                def step(k, valid, t1, m1):
                    n = row(k)
                    t, _ = ev(k)
                    rank = rank_ref[gid0 + n]
                    elig = (rank >= NOTINF) | (rank <= first["rank"])
                    t = jnp.where(elig, t, BIG)
                    if valid is not None:
                        t = jnp.where(valid, t, BIG)
                    b = t < t1
                    return (jnp.where(b, t, t1),
                            jnp.where(b, mat_ref[gid0 + n], m1))

                if early:
                    M = min(_EE_GROUP, sz)

                    def cond(carry):
                        k, _, _, tmax = carry
                        kc = jnp.minimum(k, sz - 1)
                        return ((k < count)
                                & (reach_ref[0, 0, gid0 + kc] <= tmax))

                    def wbody(carry):
                        k, t1, m1, _ = carry
                        for j in range(M):
                            idx = jnp.minimum(k + j, sz - 1)
                            t1, m1 = step(idx, k + j < count, t1, m1)
                        tmax = jnp.max(jnp.minimum(t1, cap) * live_f)
                        return (k + M, t1, m1, tmax)

                    tmax0 = jnp.max(jnp.minimum(st["t1"], cap) * live_f)
                    out = jax.lax.while_loop(
                        cond, wbody,
                        (jnp.int32(0), st["t1"], st["m1"], tmax0))
                    st["t1"], st["m1"] = out[1], out[2]
                    return

                def body(k, carry):
                    return step(k, None, *carry)

                out = jax.lax.fori_loop(0, count, body,
                                        (st["t1"], st["m1"]))
                st["t1"], st["m1"] = out

            families(visit2)
            t_ref[...] = st["t1"][None]
            m_ref[...] = st["m1"][None]

    return kernel


def _make_shade_kernel(meta: PallasMeta, fused: tuple, fused_spec: bool,
                       carry: bool = False, escalate: bool = False):
    """The fused shading kernel: given the closest-hit pass's winner
    (t / mat / normal / material props) it reruns apply_lights
    (ndt.c:71-326) entirely in-registers -- each light's shadow trace over
    its XLA-precomputed per-tile cull list, the two-sided diffuse, the C's
    mag-0.5 specular -- and emits the finished local color.  This replaces
    one shadow kernel launch + one occlusion launch + the whole elementwise
    XLA shading chain per bounce (the chain, not the traces, dominated the
    unfused profile).

    ``fused``: per-light kind chars 'p'/'s'/'d'; ``fused_spec`` mirrors -p.
    Light table layout: see trace.fused_light_info."""
    D = meta.dim
    A = meta.a_quad
    NOTINF = (1 << 30) - 1
    nf = len(fused)

    def kernel(sph_ref, pln_ref, qbase_ref, qaxes_ref, qlo_ref, qhi_ref,
               qoff_ref, qslab_ref, qgi_ref, qgt_ref, qgp_ref, fct_ref,
               hf_ref, mat_ref, rank_ref, bnd_ref, prop_ref, lvec_ref,
               *rest):
        n_area = fused.count("a")
        lists = rest[:nf]
        counts = rest[nf:2 * nf]
        area_refs = rest[2 * nf:2 * nf + n_area]
        rest = rest[2 * nf + n_area:]
        if carry:
            (o_ref, v_ref, t_ref, m_ref, n_ref, pr_ref, w_ref, f_ref,
             c_ref, lv_ref, o2_ref, v2_ref, w2_ref, f2_ref, c2_ref,
             nx_ref) = rest
        else:
            o_ref, v_ref, t_ref, m_ref, n_ref, pr_ref, loc_ref = rest
        o = [o_ref[d] for d in range(D)]
        v = [v_ref[d] for d in range(D)]
        t1s = t_ref[0]
        m1s = m_ref[0]
        nrm1 = [n_ref[d] for d in range(D)]
        wc = [pr_ref[j] for j in range(3)]      # winner color
        wr = [pr_ref[3 + j] for j in range(3)]  # winner reflectivity
        wt = pr_ref[6]                          # winner transparent

        fam_meta = _fam_meta(meta)

        def make_evals(so, sv):
            return {
                "sph": lambda n: _sphere_eval(sph_ref, n, so, sv, D, False),
                "pln": lambda n: _plane_eval(pln_ref, n, so, sv, D, False),
                "quad": lambda n: _quadric_eval(
                    qbase_ref, qaxes_ref, qlo_ref, qhi_ref, qoff_ref,
                    qslab_ref, qgi_ref, qgt_ref, qgp_ref, n, so, sv, D, A,
                    meta.b_gate, False),
                "fct": lambda n: _facet_eval(fct_ref, n, so, sv, D,
                                             meta.b_fct, False),
                "hf": lambda n: _hfacet_eval(hf_ref, n, so, sv, D,
                                             meta.b_hf, False),
            }

        gid_fam = functools.partial(_gid_fam, meta)

        def first_rank_pass(sev, limit):
            # lowest rank among INFINITE leaves hit within the limit (the
            # C's scan-order break, object.c:736-738), unrolled over the
            # statically known infinite leaves (usually 0-2)
            fr = jnp.full(t1s.shape, NOTINF, jnp.int32)
            for gid, rank in meta.inf_gids:
                name, loc = gid_fam(gid)
                t_e, _ = sev[name](loc)
                within = (t_e < limit) & (t_e < BIG * 0.5)
                fr = jnp.where(within, jnp.minimum(fr, jnp.int32(rank)), fr)
            return fr

        def shadow_pass(sev, list_ref, cnt_ref, first_rank=None):
            """Closest hit of this light's shadow rays over the tile's
            XLA-culled survivor list (same structure as the trace pass)."""
            t0 = jnp.full(t1s.shape, BIG, jnp.float32)
            m0 = jnp.full(t1s.shape, -1, jnp.int32)
            for name, fam_i, gid0 in fam_meta:
                ev = sev[name]
                cnt = cnt_ref[0, 0, fam_i]

                def body(k, carry, ev=ev, gid0=gid0, list_ref=list_ref):
                    t_acc, m_acc = carry
                    n = list_ref[0, 0, gid0 + k] - gid0
                    gid = gid0 + n
                    t_e, _ = ev(n)
                    if first_rank is not None:
                        rank = rank_ref[gid]
                        elig = (rank >= NOTINF) | (rank <= first_rank)
                        t_e = jnp.where(elig, t_e, BIG)
                    b = t_e < t_acc
                    return (jnp.where(b, t_e, t_acc),
                            jnp.where(b, mat_ref[gid], m_acc))

                t0, m0 = jax.lax.fori_loop(0, cnt, body, (t0, m0),
                                           unroll=_UNROLL)
            return t0, m0

        hitm = t1s < BIG * 0.5
        p = [o[d] + t1s * v[d] for d in range(D)]
        nn = sum(nrm1[d] * nrm1[d] for d in range(D))
        nlen = jnp.sqrt(nn)
        vdotn = sum(v[d] * nrm1[d] for d in range(D))
        # rev_view = src - p = -t1s * v  (ndt.c:160-168)
        rv_dot_n = -t1s * vdotn
        # ambient: winner color * (scene ambient + ambient lights),
        # precomputed into lvec[0:3] (ndt.c:89-111); lvec[3:6] = background
        out_rgb = [wc[j] * lvec_ref[j] for j in range(3)]

        off = 6
        a_i = 0
        for li, lkind in enumerate(fused):
            lcol = [lvec_ref[off + j] for j in range(3)]
            lspec = [lvec_ref[off + 3 + j] for j in range(3)]
            off += 6
            if lkind == "d":
                u = [lvec_ref[off + d] for d in range(D)]
                off += D
                # directional (ndt.c:230-249): from the surface, EPSILON
                # off, against -unit(light dir); blocked by ANY hit
                so = [p[d] - u[d] * EPSILON for d in range(D)]
                sv = [0.0 - u[d] for d in range(D)]   # scalars
                sev = make_evals(so, sv)
                t_s, _ = shadow_pass(sev, lists[li], counts[li])
                shadow_ok = ~(t_s < BIG * 0.5)
                lvu = u                  # unit light_vec
                ldist2 = 1.0             # ndt.c:252-258
                rl_dot_n = -sum(u[d] * nrm1[d] for d in range(D))
            else:
                if lkind == "a":
                    # DISK/RECT: the per-ray sampled surface point, then
                    # treated exactly like a point light (ndt.c:143-147)
                    lp = [area_refs[a_i][d] for d in range(D)]
                    a_i += 1
                else:
                    lp = [lvec_ref[off + d] for d in range(D)]
                    off += D
                if lkind == "s":
                    sdir = [lvec_ref[off + d] for d in range(D)]
                    ccut = lvec_ref[off + D]
                    off += D + 1
                # point/spot (ndt.c:209-228): from the LIGHT toward the
                # surface; lit iff the closest hit within dist+EPSILON is
                # the same object within EPSILON of the shaded point
                sd_ = [p[d] - lp[d] for d in range(D)]
                dist2 = sum(x * x for x in sd_)
                dist = jnp.sqrt(dist2)
                inv = 1.0 / jnp.maximum(dist, 1e-20)
                sv = [sd_[d] * inv for d in range(D)]
                limit = dist + EPSILON
                sev = make_evals(lp, sv)
                fr = first_rank_pass(sev, limit)
                t_s, m_s = shadow_pass(sev, lists[li], counts[li],
                                       first_rank=fr)
                d2 = sum((lp[d] + t_s * sv[d] - p[d]) ** 2
                         for d in range(D))
                shadow_ok = ((t_s < BIG * 0.5) & (m_s == m1s)
                             & (d2 <= EPSILON * EPSILON))
                if lkind == "s":   # cone (ndt.c:201-207)
                    cosang = sum(sdir[d] * sv[d] for d in range(D))
                    shadow_ok &= cosang >= ccut
                lvu = sv
                ldist2 = dist2
                rl_dot_n = -sum(sv[d] * nrm1[d] for d in range(D))

            # two-sided test (ndt.c:160-168)
            lit = (rl_dot_n * rv_dot_n > 0.0) & shadow_ok & hitm
            # diffuse |cos|/dist^2, opaque only (ndt.c:261-273)
            ndotl = sum(nrm1[d] * lvu[d] for d in range(D))
            cos_a = jnp.abs(ndotl) / jnp.where(nlen > EPSILON, nlen, 1.0)
            scale = cos_a / ldist2
            dmask = lit & (wt <= 0.0)
            for j in range(3):
                out_rgb[j] = out_rgb[j] + jnp.where(
                    dmask, wc[j] * lcol[j] * scale, 0.0)
            if fused_spec:
                # the C's specular: reflect the light direction with mag
                # 0.5, dot the reverse view, ^50 (ndt.c:276-310)
                coef = 1.5 * ndotl / nn
                lr = [lvu[d] - coef * nrm1[d] for d in range(D)]
                lrn = jnp.sqrt(sum(x * x for x in lr))
                ok = lrn > EPSILON
                lru = [jnp.where(ok, lr[d] / jnp.where(ok, lrn, 1.0),
                                 lr[d]) for d in range(D)]
                rv = jnp.maximum(0.0, -sum(lru[d] * v[d] for d in range(D)))
                rvn = _ipow(rv, SPECULAR_POWER)
                for j in range(3):
                    out_rgb[j] = out_rgb[j] + jnp.where(
                        lit, wr[j] * lspec[j] * rvn, 0.0)
        if not carry:
            for j in range(3):
                loc_ref[j] = out_rgb[j]
            return

        # ---- carry mode: the engine's whole bounce-loop arithmetic -------
        # (chain-mode body of get_ray_color, ndt.c:329-419): accumulate the
        # node color, spawn the mirror bounce, update weight/importance.
        live = lv_ref[0] > 0.0
        hit = hitm & live
        contrib = jnp.maximum(jnp.maximum(wr[0], wr[1]), wr[2])  # ndt.c:393
        refl_any = (wr[0] != 0.0) | (wr[1] != 0.0) | (wr[2] != 0.0)
        for j in range(3):
            lw = (1.0 - wr[j]) if fused_spec else 1.0   # ndt.c:405-414
            node = jnp.where(hit, lw * out_rgb[j],
                             jnp.where(live, lvec_ref[3 + j], 0.0))
            c2_ref[j] = c_ref[j] + w_ref[j] * node
        # importance cutoff frac < 1/512 (ndt.c:336-337); the max-depth
        # condition is ANDed on by the caller (it's a loop scalar)
        nxt = (hit & (contrib > 0.0) & refl_any
               & (f_ref[0] * contrib >= MIN_PIXEL_FRAC))
        # mirror bounce v' = unitize(reflect(v, n, 1)) (vectNd.c:101-117)
        coef2 = 2.0 * vdotn / nn
        rf = [v[d] - coef2 * nrm1[d] for d in range(D)]
        rfn = jnp.sqrt(sum(x * x for x in rf))
        okn = rfn > EPSILON
        rfu = [jnp.where(okn, rf[d] / jnp.where(okn, rfn, 1.0), rf[d])
               for d in range(D)]
        for d in range(D):
            o2_ref[d] = jnp.where(nxt, p[d], o[d])
            v2_ref[d] = jnp.where(nxt, rfu[d], v[d])
        for d in range(D, D_PAD):
            o2_ref[d] = jnp.zeros(t1s.shape, jnp.float32)
            v2_ref[d] = jnp.zeros(t1s.shape, jnp.float32)
        for j in range(3):
            w2_ref[j] = jnp.where(nxt, w_ref[j] * wr[j], w_ref[j])
        f2_ref[0] = jnp.where(nxt, f_ref[0] * contrib, f_ref[0])
        if escalate:
            # stack-mode escalation (engine._chain_loop): a live lane whose
            # winner is TRANSPARENT freezes (its chain accumulation is
            # discarded; the engine re-runs it from its primary ray in
            # stack mode, ndt.c:421-430).  Signalled as nx = -1.
            taint = hit & (wt > 0.0)
            nx_ref[0] = jnp.where(taint, -1.0,
                                  jnp.where(nxt & ~taint, 1.0, 0.0))
        else:
            nx_ref[0] = jnp.where(nxt, 1.0, 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("meta", "fused", "fused_spec",
                                             "interpret", "escalate"))
def pallas_shade(params, o, v, t, mat, nrm, props, lvec, culls,
                 meta: PallasMeta, fused: tuple, fused_spec: bool = True,
                 interpret: bool = False, carry=None, area=(),
                 escalate: bool = False):
    """Fused apply_lights over the closest-hit pass's outputs.

    o, v: [R, D] f32 (R a multiple of RT); t [R]; mat [R] i32; nrm [R, D];
    props [R, N_PROPS]; lvec: flat light table; culls: per fused light
    (lists [n_tiles, N], counts [n_tiles, N_FAMS]) over that light's shadow
    rays (from trace.fused_light_info / cull_lists).

    ``area``: per fused 'a' (DISK/RECT) light, its per-ray sampled surface
    point [R, D] (ndt.c:116-147), in fused order -- travels to the kernel
    as a VMEM ray-shaped array and is consumed as that light's position.

    Without ``carry``: returns the local color [R, 3].  With
    ``carry = (w [R,3], frac [R], color [R,3], live [R] bool)``: also runs
    the chain-mode bounce arithmetic in-kernel and returns
    (o' [R,D], v' [R,D], w' [R,3], frac' [R], color' [R,3], nxt [R] f32)."""
    R, D = o.shape
    assert R % RT == 0, R
    nf = len(fused)
    o_t = _to_tiles(o, R)
    v_t = _to_tiles(v, R)
    t_t = t.reshape(1, R // LANE, LANE)
    m_t = mat.reshape(1, R // LANE, LANE)
    n_t = _to_tiles(nrm, R)
    p_t = props.T.reshape(N_PROPS, R // LANE, LANE)

    rows = RT // LANE
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((D_PAD, rows, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    one_spec = pl.BlockSpec((1, rows, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    rgb_spec = pl.BlockSpec((3, rows, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    props_spec = pl.BlockSpec((N_PROPS, rows, LANE), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    n_total = max(meta.n_sph + meta.n_pln + meta.n_quad + meta.n_fct
                  + meta.n_hf, 1)
    list_spec = pl.BlockSpec((1, 1, n_total), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    cnt_spec = pl.BlockSpec((1, 1, N_FAMS), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)

    lists_in = [c[0][:, None, :] for c in culls]
    counts_in = [c[1][:, None, :] for c in culls]
    area_in = [_to_tiles(a, R) for a in area]
    assert len(area) == fused.count("a"), (len(area), fused)

    base_in = [o_t, v_t, t_t, m_t.astype(jnp.int32), n_t, p_t]
    base_spec = [ray_spec, ray_spec, one_spec, one_spec, ray_spec,
                 props_spec]
    sd1 = jax.ShapeDtypeStruct((1, R // LANE, LANE), jnp.float32)
    sd3 = jax.ShapeDtypeStruct((3, R // LANE, LANE), jnp.float32)
    sdD = jax.ShapeDtypeStruct((D_PAD, R // LANE, LANE), jnp.float32)
    if carry is None:
        extra_in, extra_spec = [], []
        out_specs, out_shape = rgb_spec, sd3
    else:
        w, frac, color, live = carry
        extra_in = [w.T.reshape(3, R // LANE, LANE),
                    frac.reshape(1, R // LANE, LANE),
                    color.T.reshape(3, R // LANE, LANE),
                    live.astype(jnp.float32).reshape(1, R // LANE, LANE)]
        extra_spec = [rgb_spec, one_spec, rgb_spec, one_spec]
        out_specs = [ray_spec, ray_spec, rgb_spec, one_spec, rgb_spec,
                     one_spec]
        out_shape = [sdD, sdD, sd3, sd1, sd3, sd1]

    kernel = _make_shade_kernel(meta, fused, fused_spec,
                                carry=carry is not None, escalate=escalate)
    out = pl.pallas_call(
        kernel,
        grid=(R // RT,),
        in_specs=([smem()] * (N_KERNEL_TABLES + 1)
                  + [list_spec] * nf + [cnt_spec] * nf
                  + [ray_spec] * len(area_in) + base_spec + extra_spec),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*params[:N_KERNEL_TABLES], lvec.astype(jnp.float32), *lists_in,
      *counts_in, *area_in, *base_in, *extra_in)
    if carry is None:
        return out.reshape(3, R).T
    o2, v2, w2, f2, c2, nxt = out
    return (o2[:D].reshape(D, R).T, v2[:D].reshape(D, R).T,
            w2.reshape(3, R).T, f2.reshape(R), c2.reshape(3, R).T,
            nxt.reshape(R))


def pack_params(scene):
    """Flatten the supported blocks into 1-D SMEM tables.

    SMEM allocations are padded per-ROW to 512 bytes, so a [N, w] table
    costs 512*N bytes regardless of w (268K at 533 objects -- an instant
    smem OOM for hcube-expanded scenes).  Every per-object table is
    therefore a flat row-major 1-D array indexed with static strides."""
    from ndt_tpu.scene.compile import NOT_INFINITE

    D = scene.dim
    sph = scene.spheres
    pln = scene.planes
    quad = scene.quadrics
    f32 = np.float32

    mats, ranks, bnds, aabbs = [], [], [], []

    def bounds_rows(blk):
        r = np.asarray(blk.b_radius, np.float64)
        r2 = np.where(r < 0, -1.0, r * r)
        return np.concatenate([np.asarray(blk.b_center, f32),
                               r2[:, None].astype(f32)], axis=1)

    # Geometry AABB per leaf row [n, 2, D] for the tile-level box cull
    # (cull_lists): bounding SPHERES are very loose around slab-shaped
    # leaves (orthotope m-faces, thin cylinders), and random scenes are
    # dominated by them -- the box test cuts tile survivor lists ~10x on
    # the dense configs.  Boxes are widened by _AABB_PAD so every
    # EPSILON-shell / closest-approach acceptance stays inside (the C's
    # cull contract: hits lie within the object's bounds, object.c:582-603;
    # only D>3 hfacet phantoms can hit outside their geometry, so hfacet
    # rows use the box CIRCUMSCRIBING their bounding sphere -- exactly the
    # reachability the reference's sphere cull grants them).
    _AABB_PAD = 0.02

    def aabb_pad(lo, hi):
        pad = _AABB_PAD + 1e-4 * np.maximum(np.abs(lo), np.abs(hi))
        return np.stack([np.clip(lo - pad, -BIG, BIG),
                         np.clip(hi + pad, -BIG, BIG)], axis=1).astype(f32)

    if sph is not None:
        sph_tab = np.concatenate(
            [np.asarray(sph.center, f32),
             np.asarray(sph.radius2, f32)[:, None]], axis=1)
        mats.append(np.asarray(sph.mat_id, np.int32))
        ranks.append(np.asarray(sph.shadow_rank, np.int32))
        bnds.append(bounds_rows(sph))
        c = np.asarray(sph.center, np.float64)
        r = np.sqrt(np.asarray(sph.radius2, np.float64))
        aabbs.append(aabb_pad(c - r[:, None], c + r[:, None]))
    else:
        sph_tab = np.zeros((1, D + 1), f32)
    if pln is not None:
        r2 = np.minimum(np.asarray(pln.radius2, np.float64), BIG).astype(f32)
        pln_tab = np.concatenate(
            [np.asarray(pln.point, f32), np.asarray(pln.normal, f32),
             r2[:, None]], axis=1)
        mats.append(np.asarray(pln.mat_id, np.int32))
        ranks.append(np.asarray(pln.shadow_rank, np.int32))
        bnds.append(bounds_rows(pln))
        # hdisk: hits within radius of the center; hplane: radius2 = BIG^2
        # clamps to an effectively infinite (never-culled) box
        c = np.asarray(pln.point, np.float64)
        r = np.sqrt(np.minimum(np.asarray(pln.radius2, np.float64),
                               BIG))
        aabbs.append(aabb_pad(c - r[:, None], c + r[:, None]))
    else:
        pln_tab = np.zeros((1, 2 * D + 1), f32)
    if quad is not None:
        n_q, A, _ = quad.axes.shape
        qbase = np.asarray(quad.base, f32)
        qaxes = np.asarray(quad.axes, f32).reshape(n_q, A * D)
        qlo = np.clip(np.asarray(quad.lo, np.float64), -BIG, BIG).astype(f32)
        qhi = np.clip(np.asarray(quad.hi, np.float64), -BIG, BIG).astype(f32)
        qoff = np.asarray(quad.qc_off, f32)[:, None]
        qslab = np.asarray(quad.is_slab, f32)[:, None]
        mats.append(np.asarray(quad.mat_id, np.int32))
        ranks.append(np.asarray(quad.shadow_rank, np.int32))
        bnds.append(bounds_rows(quad))
        # axis span (lo/hi projections) + radial extent sqrt(qc_off) in
        # every dim (conservative for the perpendicular complement);
        # orthotope slabs (qc_off = EPSILON) get their sqrt(EPSILON)=0.01
        # shell inside _AABB_PAD.  Infinite cylinders (lo/hi at +-BIG)
        # produce never-culled boxes, matching their r2 < 0 sentinel.
        base64 = np.asarray(quad.base, np.float64)
        ax64 = np.asarray(quad.axes, np.float64)
        lo64 = np.clip(np.asarray(quad.lo, np.float64), -BIG, BIG)
        hi64 = np.clip(np.asarray(quad.hi, np.float64), -BIG, BIG)
        t1 = lo64[:, :, None] * ax64
        t2 = hi64[:, :, None] * ax64
        rp = (np.sqrt(np.maximum(np.asarray(quad.qc_off, np.float64), 0.0))
              [:, None])
        aabbs.append(aabb_pad(
            np.clip(base64 + np.minimum(t1, t2).sum(1) - rp, -BIG, BIG),
            np.clip(base64 + np.maximum(t1, t2).sum(1) + rp, -BIG, BIG)))
        B = quad.gate_tlo.shape[1]          # 0 = slab-free, gate skipped
        # interleaved lo/hi per (slot, box, dim): qgt[2w]=lo, qgt[2w+1]=hi.
        # Gate boxes come from an item's kd leaf-cell union, so every row
        # of the same kd item (e.g. all ~130 expanded faces of a 5-D
        # hcube) carries an IDENTICAL box set: dedupe byte-equal rows into
        # slots and index them through qgi.  On random150 this shrinks the
        # gate tables from 80% of the quadric SMEM cost to a side table,
        # dropping the scene from 8 SMEM chunks to 2 (the bounce tail pays
        # per chunk per iteration, so dense frames track the chunk count).
        if B:
            qgt = np.stack([np.asarray(quad.gate_tlo, f32),
                            np.asarray(quad.gate_thi, f32)], axis=-1)
            qgp = np.stack([np.asarray(quad.gate_plo, f32),
                            np.asarray(quad.gate_phi, f32)], axis=-1)
            both = np.concatenate([qgt.reshape(n_q, -1),
                                   qgp.reshape(n_q, -1)], axis=1)
            _, slots, qgi = np.unique(both, axis=0, return_index=True,
                                      return_inverse=True)
            qgi = qgi.reshape(-1).astype(np.int32)
            qgt = qgt[slots]
            qgp = qgp[slots]
        else:
            qgt = np.zeros((1, 1, D, 2), f32)
            qgp = qgt
            qgi = np.zeros(n_q, np.int32)
    else:
        A = 1
        B = 1
        qbase = np.zeros((1, D), f32)
        qaxes = np.zeros((1, D), f32)
        qlo = np.zeros((1, 1), f32)
        qhi = np.zeros((1, 1), f32)
        qoff = np.zeros((1, 1), f32)
        qslab = np.zeros((1, 1), f32)
        qgi = np.zeros(1, np.int32)
        qgt = np.stack([np.full((1, 1, D), -BIG, f32),
                        np.full((1, 1, D), BIG, f32)], axis=-1)
        qgp = qgt

    def gate_cols(blk):
        """Row-embedded gate boxes: per box [tlo/thi d-interleaved (2D),
        plo/phi d-interleaved (2D)] -- the layout _row_gate_pierce reads."""
        Bk = blk.gate_tlo.shape[1]
        if Bk == 0:
            return None, 0
        nb = blk.gate_tlo.shape[0]
        gt = np.stack([np.asarray(blk.gate_tlo, f32),
                       np.asarray(blk.gate_thi, f32)], axis=-1)  # [n,B,D,2]
        gp = np.stack([np.asarray(blk.gate_plo, f32),
                       np.asarray(blk.gate_phi, f32)], axis=-1)
        cols = np.concatenate([gt.reshape(nb, Bk, 2 * D),
                               gp.reshape(nb, Bk, 2 * D)], axis=2)
        return cols.reshape(nb, Bk * 4 * D), Bk

    fct = scene.facets
    B_f = 0
    if fct is not None:
        # row layout documented in _facet_eval
        verts = np.asarray(fct.verts, np.float64)        # [n, 3, D]
        edges = np.asarray(fct.edges, np.float64)
        basis = np.asarray(fct.basis, np.float64)        # [n, 2, D]
        base = verts[:, 1, :]
        n_f = verts.shape[0]
        fgates, B_f = gate_cols(fct)
        fct_tab = np.concatenate([
            basis[:, 0, :], basis[:, 1, :], base,
            (base * basis[:, 0, :]).sum(1)[:, None],
            (base * basis[:, 1, :]).sum(1)[:, None],
            verts.reshape(n_f, 3 * D), edges.reshape(n_f, 3 * D),
            (verts * edges).sum(2),                       # vi . ei  [n, 3]
            (edges * edges).sum(2),                       # ei . ei  [n, 3]
            np.asarray(fct.cos_angles, np.float64),
            np.asarray(fct.normal, np.float64),
        ], axis=1).astype(f32)
        if B_f:
            fct_tab = np.concatenate([fct_tab, fgates], axis=1)
        assert fct_tab.shape[1] == _facet_width(D, B_f), fct_tab.shape
        mats.append(np.asarray(fct.mat_id, np.int32))
        ranks.append(np.asarray(fct.shadow_rank, np.int32))
        bnds.append(bounds_rows(fct))
        # facet hits pass the vertex-angle inside test (facet.c:149-164),
        # so they lie on the triangle to within the EPSILON shell
        aabbs.append(aabb_pad(verts.min(1), verts.max(1)))
    else:
        fct_tab = np.zeros((1, _facet_width(D)), f32)

    hf = scene.hfacets
    B_h = 0
    if hf is not None:
        # row layout documented in _hfacet_eval
        verts = np.asarray(hf.verts, np.float64)
        v0 = verts[:, 0, :]
        ue0 = np.asarray(hf.ue0, np.float64)
        ep = np.asarray(hf.ep, np.float64)
        n_h = verts.shape[0]
        x2 = np.asarray(hf.bary_x2, np.float64)
        y2 = np.asarray(hf.bary_y2, np.float64)
        x3 = np.asarray(hf.bary_x3, np.float64)
        y3 = np.asarray(hf.bary_y3, np.float64)
        den = (y2 - y3) * (0.0 - x3) + (x3 - x2) * (0.0 - y3)
        inv_den = 1.0 / np.where(np.abs(den) > 0, den, 1.0)
        br = np.asarray(hf.b_radius, np.float64)
        hf_tab = np.concatenate([
            v0, ue0, ep,
            np.asarray(hf.sum_ue0, np.float64)[:, None],
            np.asarray(hf.sum_ep, np.float64)[:, None],
            (v0 * ue0).sum(1)[:, None], (v0 * ep).sum(1)[:, None],
            v0.sum(1)[:, None],
            x2[:, None], y2[:, None], x3[:, None], y3[:, None],
            inv_den[:, None],
            np.asarray(hf.use_normals, np.float64)[:, None],
            np.asarray(hf.vnormals, np.float64).reshape(n_h, 3 * D),
            np.asarray(hf.b_center, np.float64),
            (br * br)[:, None],
        ], axis=1).astype(f32)
        hgates, B_h = gate_cols(hf)
        if B_h:
            hf_tab = np.concatenate([hf_tab, hgates], axis=1)
        assert hf_tab.shape[1] == _hfacet_width(D, B_h), hf_tab.shape
        mats.append(np.asarray(hf.mat_id, np.int32))
        ranks.append(np.asarray(hf.shadow_rank, np.int32))
        bnds.append(bounds_rows(hf))
        # D>3 hfacet phantom hits can lie far off the triangle (see
        # module docstring): keep the C's reachability by circumscribing
        # the bounding SPHERE, not the vertex box
        bc = np.asarray(hf.b_center, np.float64)
        brr = np.where(br < 0, BIG, br)[:, None]
        aabbs.append(aabb_pad(np.clip(bc - brr, -BIG, BIG),
                              np.clip(bc + brr, -BIG, BIG)))
    else:
        hf_tab = np.zeros((1, _hfacet_width(D)), f32)

    mat_tab = (np.concatenate(mats) if mats
               else np.zeros(1, np.int32))
    rank_tab = (np.concatenate(ranks) if ranks
                else np.full(1, NOT_INFINITE, np.int32))
    bnd_tab = (np.concatenate(bnds) if bnds
               else np.full((1, D + 1), -1.0, f32))
    aabb_tab = (np.concatenate(aabbs) if aabbs
                else np.stack([np.full((1, D), -BIG, f32),
                               np.full((1, D), BIG, f32)], axis=1))

    prop_tab = np.concatenate(
        [np.asarray(scene.color, f32), np.asarray(scene.reflect, f32),
         np.asarray(scene.transparent, f32)[:, None],
         np.asarray(scene.refract_index, f32)[:, None]], axis=1)

    inf_rows = np.nonzero(rank_tab < NOT_INFINITE)[0]
    inf_gids = tuple(sorted(
        ((int(g), int(rank_tab[g])) for g in inf_rows),
        key=lambda gr: gr[1]))

    meta = PallasMeta(
        dim=D,
        n_sph=0 if sph is None else sph.center.shape[0],
        n_pln=0 if pln is None else pln.point.shape[0],
        n_quad=0 if quad is None else quad.base.shape[0],
        a_quad=A,
        b_gate=B,
        inf_gids=inf_gids,
        n_fct=0 if fct is None else fct.verts.shape[0],
        n_hf=0 if hf is None else hf.verts.shape[0],
        b_fct=B_f,
        b_hf=B_h,
    )
    # aabb_tab (index 17) is consumed by cull_lists only; pallas calls
    # strip params down to the 17 kernel tables (params[:N_KERNEL_TABLES])
    return meta, (sph_tab.ravel(), pln_tab.ravel(), qbase.ravel(),
                  qaxes.ravel(), qlo.ravel(), qhi.ravel(), qoff.ravel(),
                  qslab.ravel(), qgi, qgt.ravel(), qgp.ravel(),
                  fct_tab.ravel(), hf_tab.ravel(),
                  mat_tab, rank_tab, bnd_tab.ravel(),
                  prop_tab.ravel(), aabb_tab.ravel())


def cull_lists(params, o, v, meta, live=None, limit=None,
               want_reach=False):
    """Vectorized per-tile object culling in XLA: interval arithmetic over
    each RT-ray tile's origin/direction bounds vs every object's bounding
    sphere, then per-family compaction into (lists [n_tiles, N],
    counts [n_tiles, N_FAMS]) consumed by the kernel as blocked SMEM rows.

    The same conservative test as the reference's bounding-sphere cull
    (bounding.c:34-85) but at tile granularity: the tile may hit the object
    unless the lower bound of every ray's squared perpendicular distance
    exceeds r^2, or the whole sphere is behind every ray.

    ``limit`` ([R] f32, optional): per-ray max hit distance (shadow rays
    stop at the light, ndt.c:157-178).  Adds a range cull: a sphere whose
    nearest point from the tile's origin box is farther than the tile's
    max limit can never occlude -- this is what kills the far side of a
    large scene for shadow batches, whose origins (hit points) spread too
    much in depth for the perpendicular-distance test alone to bite.

    ``want_reach``: additionally return reach [n_tiles, N] f32 -- a
    conservative lower bound on the hit distance of each tile's listed
    object for ANY ray in the tile (distance from the tile's origin box to
    the object's bounding sphere) -- and sort each family's per-tile list
    by it ascending.  The kernel walks the list front-to-back and STOPS
    once reach exceeds every live lane's current-best t: the TPU-native
    analogue of the reference's near-to-far kd traversal early-out
    (kd-tree.c:534-590), exact because a later object cannot beat a closer
    winner."""
    R, D = o.shape
    bnd = params[15].reshape(-1, D + 1)       # center + r2 (-1 = infinite)
    n_tiles = R // RT
    o_t = o.reshape(n_tiles, RT, D)
    v_t = v.reshape(n_tiles, RT, D)
    if live is None:
        o_lo, o_hi = o_t.min(1), o_t.max(1)   # [n_tiles, D]
        v_lo, v_hi = v_t.min(1), v_t.max(1)
    else:
        # bounce loops re-trace a tile with only SOME lanes still alive
        # (dead lanes carry stale rays whose results are discarded): bound
        # the intervals over live lanes only, so the cull stays tight for
        # the survivors, and drop fully-dead tiles outright below
        lv = live.reshape(n_tiles, RT, 1)
        o_lo = jnp.where(lv, o_t, BIG).min(1)
        o_hi = jnp.where(lv, o_t, -BIG).max(1)
        v_lo = jnp.where(lv, v_t, BIG).min(1)
        v_hi = jnp.where(lv, v_t, -BIG).max(1)
    c = bnd[:, :D]                             # [N, D]
    r2 = bnd[:, D]                             # [N]

    oc_lo = o_lo[:, None, :] - c[None, :, :]   # [n_tiles, N, D]
    oc_hi = o_hi[:, None, :] - c[None, :, :]

    def imul(alo, ahi, blo, bhi):
        cands = jnp.stack([alo * blo, alo * bhi, ahi * blo, ahi * bhi])
        return cands.min(0), cands.max(0)

    perp2_lo = 0.0
    voc_lo = 0.0
    for d in range(D):
        plo, phi = imul(v_lo[:, None, d], v_hi[:, None, d],
                        oc_lo[:, :, d], oc_hi[:, :, d])
        voc_lo = voc_lo + plo
    for a in range(D):
        for b in range(a + 1, D):
            p1lo, p1hi = imul(v_lo[:, None, a], v_hi[:, None, a],
                              oc_lo[:, :, b], oc_hi[:, :, b])
            p2lo, p2hi = imul(v_lo[:, None, b], v_hi[:, None, b],
                              oc_lo[:, :, a], oc_hi[:, :, a])
            mlo = p1lo - p2hi
            mhi = p1hi - p2lo
            m2 = jnp.where((mlo <= 0.0) & (mhi >= 0.0), 0.0,
                           jnp.minimum(mlo * mlo, mhi * mhi))
            perp2_lo = perp2_lo + m2
    r = jnp.sqrt(jnp.maximum(r2, 0.0))[None, :]
    may_hit = (perp2_lo <= r2[None, :]) & ((-voc_lo + r) >= EPSILON)

    # geometry-AABB slab test (params[17], packed in pack_params): per
    # (tile, leaf), interval bounds on each ray's slab entry/exit give
    # Elo <= min over dims' far-crossing hull and Xhi >= ... such that
    # for EVERY ray in the tile, enter(ray) >= max_d Elo_d and
    # exit(ray) <= min_d Xhi_d; the tile provably misses the box when
    # max_d Elo_d > min_d Xhi_d, when the box lies entirely behind
    # (min_d Xhi_d < 0), or when some dim's slab is strictly outside the
    # origin hull with no ray moving toward it.  Much tighter than the
    # bounding sphere for slab-shaped leaves (orthotope m-faces, thin
    # cylinders): ~10x fewer survivors on dense random scenes.  Boxes are
    # pre-widened (aabb_pad) so EPSILON shells stay inside; comparisons
    # carry additional slack for f32 interval rounding.
    aabb = params[17].reshape(-1, 2, D)
    blo = aabb[:, 0, :]                        # [N, D]
    bhi = aabb[:, 1, :]
    use_box = _os.environ.get("NDT_BOX_CULL", "1") != "0"
    box_elo = jnp.full(may_hit.shape, -BIG, jnp.float32)
    box_xhi = jnp.full(may_hit.shape, BIG, jnp.float32)
    box_never = jnp.zeros(may_hit.shape, bool)
    for d in range(D):
        VL = v_lo[:, None, d]
        VH = v_hi[:, None, d]
        n1l = blo[None, :, d] - o_hi[:, None, d]
        n1h = blo[None, :, d] - o_lo[:, None, d]
        n2l = bhi[None, :, d] - o_hi[:, None, d]
        n2h = bhi[None, :, d] - o_lo[:, None, d]
        pos = VL > 0.0
        neg = VH < 0.0

        def div_lo(nl, vl, vh):
            # lower bound of n/v over n >= nl, v in [vl, vh], 0 < vl <= vh
            return jnp.where(nl >= 0.0, nl / vh, nl / vl)

        def div_hi(nh, vl, vh):
            return jnp.where(nh >= 0.0, nh / vl, nh / vh)

        # v > 0: slab entered at (blo-o)/v, left at (bhi-o)/v; v < 0
        # mirrors via t = (o-bhi)/(-v).  Mixed-sign v: unbounded hulls.
        el = jnp.where(pos, div_lo(jnp.where(pos, n1l, 1.0),
                                   jnp.where(pos, VL, 1.0), VH),
                       jnp.where(neg, div_lo(jnp.where(neg, -n2h, 1.0),
                                             jnp.where(neg, -VH, 1.0),
                                             -VL), -BIG))
        xh = jnp.where(pos, div_hi(n2h, jnp.where(pos, VL, 1.0), VH),
                       jnp.where(neg, div_hi(-n1l, jnp.where(neg, -VH, 1.0),
                                             -VL), BIG))
        box_elo = jnp.maximum(box_elo, el)
        box_xhi = jnp.minimum(box_xhi, xh)
        # origin hull strictly above the slab with no ray moving down
        # (or below with none moving up): the slab is never entered at any
        # t >= 0.  VL/VH comparisons are exact (no tolerance): a ray with
        # any motion toward the slab keeps the candidate.
        # f32 rounding of n = b - o scales with the operand magnitudes
        # (~1.2e-7 * max(|o|, |b|)), which outgrows the boxes' absolute
        # aabb_pad once origins sit far from the scene (e.g. bounce rays
        # spawned ~1e5 units out): pad the comparison by a
        # magnitude-scaled slack so a borderline slab can't falsely cull
        sd = 1e-6 * (jnp.maximum(jnp.abs(o_lo[:, None, d]),
                                 jnp.abs(o_hi[:, None, d]))
                     + jnp.maximum(jnp.abs(blo[None, :, d]),
                                   jnp.abs(bhi[None, :, d])))
        box_never |= (n2h < -sd) & (VL >= 0.0)
        box_never |= (n1l > sd) & (VH <= 0.0)
    # the t-compare slack is relative to the computed t values (slab-entry
    # rounding scales with t, ~1.2e-7 * t; 1e-5 gives ~80x margin) plus
    # the absolute EPSILON for near-zero t
    tslack = EPSILON + 1e-5 * jnp.abs(box_xhi)
    box_ok = ~((box_elo > box_xhi + tslack)
               | (box_xhi < -tslack) | box_never)
    if use_box:
        may_hit &= box_ok
    # min distance from the tile's origin box to the sphere center
    straddle = (oc_lo <= 0.0) & (oc_hi >= 0.0)
    m = jnp.where(straddle, 0.0,
                  jnp.minimum(jnp.abs(oc_lo), jnp.abs(oc_hi)))
    d2_lo = (m * m).sum(-1)                    # [n_tiles, N]
    if limit is not None and _os.environ.get("NDT_LIMIT_CULL", "1") != "0":
        lim = limit.reshape(n_tiles, RT)
        if live is not None:
            lim = jnp.where(live.reshape(n_tiles, RT), lim, 0.0)
        lim_hi = lim.max(1)                    # [n_tiles]
        lim_reach = lim_hi[:, None] + r
        may_hit &= d2_lo <= lim_reach * lim_reach
    may_hit = may_hit | (r2[None, :] < 0.0)   # infinite leaves never cull
    if live is not None:
        # fully-dead tiles run zero kernel iterations (even infinite leaves)
        may_hit &= live.reshape(n_tiles, RT).any(1)[:, None]

    # per-family stable compaction: surviving gids first.  Without reach,
    # small families use a sort-free cumsum + one-hot scatter (cheap
    # elementwise ops, no TPU sort); the one-hot is O(sz^2) per tile, so
    # wide families (large scenes packed into chunks) switch to a per-row
    # stable sort.  With reach, survivors sort by reach ascending (the
    # reach value doubles as the sort key; culled slots key to BIG).
    n_tot = bnd.shape[0]
    fam_sizes = [meta.n_sph, meta.n_pln, meta.n_quad, meta.n_fct,
                 meta.n_hf]
    if want_reach:
        # conservative under-estimate: 0.1% multiplicative slack plus an
        # absolute EPSILON absorb f32 rounding and not-exactly-unit v, so
        # the kernel's early-out can only fire late, never wrongly.  The
        # box-entry hull (every ray enters the leaf's AABB at
        # t >= box_elo) usually dominates the origin-box-to-sphere
        # distance; both are true lower bounds, so take the max.
        reach_sph = jnp.maximum(
            (jnp.sqrt(d2_lo) - r) * (1.0 - 1e-3) - EPSILON, 0.0)
        reach_box = jnp.maximum(box_elo * (1.0 - 1e-3) - EPSILON, 0.0)
        reach_all = jnp.maximum(reach_sph, reach_box)
        reach_all = jnp.where(r2[None, :] < 0.0, 0.0, reach_all)
    lists = []
    counts = []
    reaches = []
    off = 0
    for sz in fam_sizes:
        if sz == 0:
            counts.append(jnp.zeros((n_tiles,), jnp.int32))
            continue
        mh = may_hit[:, off:off + sz]
        slots = jnp.arange(sz, dtype=jnp.int32)
        if want_reach:
            keys = jnp.where(mh, reach_all[:, off:off + sz], BIG)
            gids = jnp.broadcast_to(slots + off, mh.shape)
            sk, sg = jax.lax.sort((keys, gids), dimension=1,
                                  is_stable=True, num_keys=1)
            lists.append(sg.astype(jnp.int32))
            reaches.append(sk)
        elif sz <= 256:
            pos = jnp.cumsum(mh.astype(jnp.int32), axis=1) - 1   # [T, sz]
            onehot = ((pos[:, :, None] == slots[None, None, :])
                      & mh[:, :, None])
            gid_col = (slots + off)[None, :, None]
            lists.append((onehot * gid_col).sum(1).astype(jnp.int32))
        else:
            keys = jnp.where(mh, jnp.int32(0), jnp.int32(1))
            _, srt = jax.lax.sort_key_val(
                keys, jnp.broadcast_to(slots + off, mh.shape),
                dimension=1, is_stable=True)
            lists.append(srt.astype(jnp.int32))
        counts.append(mh.sum(1, dtype=jnp.int32))
        off += sz
    lists = (jnp.concatenate(lists, axis=1) if lists
             else jnp.zeros((n_tiles, 1), jnp.int32))
    if lists.shape[1] < max(n_tot, 1):
        lists = jnp.pad(lists, ((0, 0), (0, max(n_tot, 1) - lists.shape[1])))
    counts = jnp.stack(counts, axis=1)         # [n_tiles, N_FAMS]
    if want_reach:
        reach = (jnp.concatenate(reaches, axis=1) if reaches
                 else jnp.zeros((n_tiles, 1), jnp.float32))
        if reach.shape[1] < max(n_tot, 1):
            reach = jnp.pad(
                reach, ((0, 0), (0, max(n_tot, 1) - reach.shape[1])))
        return lists, counts, reach
    return lists, counts


def _to_tiles(a, R):
    """[R, D] rays -> [D_PAD, R//LANE, LANE] full-vreg layout."""
    D = a.shape[1]
    out = jnp.zeros((D_PAD, R // LANE, LANE), jnp.float32)
    return out.at[:D].set(a.T.reshape(D, R // LANE, LANE))


@functools.partial(jax.jit,
                   static_argnames=("meta", "mode", "interpret"))
def pallas_trace(params, o, v, aux, meta: PallasMeta, mode: str = "closest",
                 interpret: bool = False, live=None, init=None):
    """Winner over the sphere/plane/quadric blocks.

    o, v: [R, D] f32, R a multiple of RT.  aux: per-ray int32 excluded
    MATERIAL id ('closest'/'any') or f32 distance limit ('shadow').
    live: optional [R] bool -- lanes whose result the caller will discard
    are False; dead lanes return garbage but fully-dead tiles are skipped.
    init: optional previous-chunk winner state seeding the running winner
    (closest: (t, mat, nrm [R, D], props [R, N_PROPS]); any/shadow:
    (t, mat)) -- see _make_kernel's has_init.
    Returns (t [R], mat [R] i32, normal [R, D] | None, props [R, 8] | None).
    """
    R, D = o.shape
    assert R % RT == 0, R
    o_t = _to_tiles(o, R)
    v_t = _to_tiles(v, R)
    aux_t = aux.reshape(1, R // LANE, LANE)

    kernel = _make_kernel(meta, mode, interpret, has_init=init is not None)
    grid = (R // RT,)
    rows = RT // LANE
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((D_PAD, rows, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    aux_spec = pl.BlockSpec((1, rows, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    out1_spec = pl.BlockSpec((1, rows, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    props_spec = pl.BlockSpec((N_PROPS, rows, LANE), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)

    shapes = {
        "closest": (
            [out1_spec, out1_spec, ray_spec, props_spec],
            [jax.ShapeDtypeStruct((1, R // LANE, LANE), jnp.float32),
             jax.ShapeDtypeStruct((1, R // LANE, LANE), jnp.int32),
             jax.ShapeDtypeStruct((D_PAD, R // LANE, LANE), jnp.float32),
             jax.ShapeDtypeStruct((N_PROPS, R // LANE, LANE), jnp.float32)]),
        "any": (
            [out1_spec, out1_spec],
            [jax.ShapeDtypeStruct((1, R // LANE, LANE), jnp.float32),
             jax.ShapeDtypeStruct((1, R // LANE, LANE), jnp.int32)]),
        "shadow": (
            [out1_spec, out1_spec],
            [jax.ShapeDtypeStruct((1, R // LANE, LANE), jnp.float32),
             jax.ShapeDtypeStruct((1, R // LANE, LANE), jnp.int32)]),
    }
    out_specs, out_shape = shapes[mode]

    n_total = max(meta.n_sph + meta.n_pln + meta.n_quad + meta.n_fct
                  + meta.n_hf, 1)
    if _use_early_exit(meta, interpret):
        lists, counts, reach = cull_lists(
            params, o, v, meta, live,
            limit=aux if mode == "shadow" else None, want_reach=True)
    else:
        lists, counts = cull_lists(
            params, o, v, meta, live,
            limit=aux if mode == "shadow" else None)
        reach = jnp.zeros(lists.shape, jnp.float32)
    lists = lists[:, None, :]
    counts = counts[:, None, :]
    reach = reach[:, None, :]
    if live is None:
        live_t = jnp.ones((1, R // LANE, LANE), jnp.float32)
    else:
        live_t = live.astype(jnp.float32).reshape(1, R // LANE, LANE)
    list_spec = pl.BlockSpec((1, 1, n_total), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    cnt_spec = pl.BlockSpec((1, 1, N_FAMS), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)
    reach_spec = pl.BlockSpec((1, 1, n_total), lambda i: (i, 0, 0),
                              memory_space=pltpu.SMEM)
    init_in, init_spec = [], []
    if init is not None:
        ti, mi = init[0], init[1]
        init_in = [ti.reshape(1, R // LANE, LANE),
                   mi.astype(jnp.int32).reshape(1, R // LANE, LANE)]
        init_spec = [out1_spec, out1_spec]
        if mode == "closest":
            init_in += [_to_tiles(init[2], R),
                        init[3].T.reshape(N_PROPS, R // LANE, LANE)]
            init_spec += [ray_spec, props_spec]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([smem()] * N_KERNEL_TABLES
                  + [list_spec, cnt_spec, reach_spec,
                     aux_spec, ray_spec, ray_spec, aux_spec]
                  + init_spec),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*params[:N_KERNEL_TABLES], lists, counts, reach, live_t, o_t, v_t,
      aux_t, *init_in)

    t = outs[0].reshape(R)
    mat = outs[1].reshape(R)
    if mode == "closest":
        nrm = outs[2][:D].reshape(D, R).T
        props = outs[3].reshape(N_PROPS, R).T
        return t, mat, nrm, props
    return t, mat, None, None


@functools.partial(jax.jit,
                   static_argnames=("m", "meta", "mode", "interpret"))
def pallas_trace_grouped(params, m, o, v, aux, meta: PallasMeta,
                         mode: str = "closest", interpret: bool = False,
                         live=None, init=None):
    """pallas_trace over ``m`` scene chunks SHARING one meta, as a single
    kernel launch with grid (n_tiles, m): the chunk axis iterates fastest,
    so for each ray tile the winner accumulates in the revisited output
    VMEM window across consecutive chunk steps (see _make_kernel's
    ``accum``).  Replaces the per-chunk launch chain whose serialized
    launch latency dominated narrow (stack-phase) batches: one closest
    trace of a 6-chunk scene is 1 launch instead of 6.

    ``params``: the 17 pack_params tables, each stacked to a leading
    [m, ...] chunk axis (compile._pack_chunked builds these).  Chunk ORDER
    inside the group is preserved by the grid iteration, so equal-t ties
    keep resolving to the earlier chunk, bit-identically to the
    sequential-call path.  ``init`` seeds chunk step 0 (the previous
    GROUP's winner), exactly like pallas_trace's ``init``."""
    R, D = o.shape
    assert R % RT == 0, R
    o_t = _to_tiles(o, R)
    v_t = _to_tiles(v, R)
    aux_t = aux.reshape(1, R // LANE, LANE)

    kernel = _make_kernel(meta, mode, interpret,
                          has_init=init is not None, accum=True)
    n_tiles = R // RT
    grid = (n_tiles, m)
    rows = RT // LANE

    def smem_tab(tab):
        # tables arrive [m, 1, L] (compile._group_chunks); squeezing the
        # chunk and singleton axes leaves the 1-D per-chunk ref the kernel
        # body indexes, while the block's last-two dims (1, L) equal the
        # array's, satisfying Mosaic's SMEM block rule
        return pl.BlockSpec((None, None, tab.shape[2]),
                            lambda i, c: (c, 0, 0),
                            memory_space=pltpu.SMEM)

    ray_spec = pl.BlockSpec((D_PAD, rows, LANE), lambda i, c: (0, i, 0),
                            memory_space=pltpu.VMEM)
    aux_spec = pl.BlockSpec((1, rows, LANE), lambda i, c: (0, i, 0),
                            memory_space=pltpu.VMEM)
    out1_spec = pl.BlockSpec((1, rows, LANE), lambda i, c: (0, i, 0),
                             memory_space=pltpu.VMEM)
    props_spec = pl.BlockSpec((N_PROPS, rows, LANE), lambda i, c: (0, i, 0),
                              memory_space=pltpu.VMEM)

    shapes = {
        "closest": (
            [out1_spec, out1_spec, ray_spec, props_spec],
            [jax.ShapeDtypeStruct((1, R // LANE, LANE), jnp.float32),
             jax.ShapeDtypeStruct((1, R // LANE, LANE), jnp.int32),
             jax.ShapeDtypeStruct((D_PAD, R // LANE, LANE), jnp.float32),
             jax.ShapeDtypeStruct((N_PROPS, R // LANE, LANE), jnp.float32)]),
        "any": (
            [out1_spec, out1_spec],
            [jax.ShapeDtypeStruct((1, R // LANE, LANE), jnp.float32),
             jax.ShapeDtypeStruct((1, R // LANE, LANE), jnp.int32)]),
        "shadow": (
            [out1_spec, out1_spec],
            [jax.ShapeDtypeStruct((1, R // LANE, LANE), jnp.float32),
             jax.ShapeDtypeStruct((1, R // LANE, LANE), jnp.int32)]),
    }
    out_specs, out_shape = shapes[mode]

    n_total = max(meta.n_sph + meta.n_pln + meta.n_quad + meta.n_fct
                  + meta.n_hf, 1)
    ee = _use_early_exit(meta, interpret)
    lists_c, counts_c, reach_c = [], [], []
    for ci in range(m):
        p_c = tuple(t[ci] for t in params)
        if ee:
            l, cnt, rch = cull_lists(
                p_c, o, v, meta, live,
                limit=aux if mode == "shadow" else None, want_reach=True)
        else:
            l, cnt = cull_lists(
                p_c, o, v, meta, live,
                limit=aux if mode == "shadow" else None)
            rch = jnp.zeros(l.shape, jnp.float32)
        lists_c.append(l)
        counts_c.append(cnt)
        reach_c.append(rch)
    lists = jnp.stack(lists_c)[:, :, None, :]      # [m, n_tiles, 1, n_tot]
    counts = jnp.stack(counts_c)[:, :, None, :]
    reach = jnp.stack(reach_c)[:, :, None, :]
    if live is None:
        live_t = jnp.ones((1, R // LANE, LANE), jnp.float32)
    else:
        live_t = live.astype(jnp.float32).reshape(1, R // LANE, LANE)
    list_spec = pl.BlockSpec((None, 1, 1, n_total),
                             lambda i, c: (c, i, 0, 0),
                             memory_space=pltpu.SMEM)
    cnt_spec = pl.BlockSpec((None, 1, 1, N_FAMS),
                            lambda i, c: (c, i, 0, 0),
                            memory_space=pltpu.SMEM)
    reach_spec = pl.BlockSpec((None, 1, 1, n_total),
                              lambda i, c: (c, i, 0, 0),
                              memory_space=pltpu.SMEM)
    init_in, init_spec = [], []
    if init is not None:
        ti, mi = init[0], init[1]
        init_in = [ti.reshape(1, R // LANE, LANE),
                   mi.astype(jnp.int32).reshape(1, R // LANE, LANE)]
        init_spec = [out1_spec, out1_spec]
        if mode == "closest":
            init_in += [_to_tiles(init[2], R),
                        init[3].T.reshape(N_PROPS, R // LANE, LANE)]
            init_spec += [ray_spec, props_spec]
    tab_in = [params[t] for t in range(N_KERNEL_TABLES)]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([smem_tab(t) for t in tab_in]
                  + [list_spec, cnt_spec, reach_spec,
                     aux_spec, ray_spec, ray_spec, aux_spec]
                  + init_spec),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*tab_in, lists, counts, reach, live_t, o_t, v_t, aux_t, *init_in)

    t = outs[0].reshape(R)
    mat = outs[1].reshape(R)
    if mode == "closest":
        nrm = outs[2][:D].reshape(D, R).T
        props = outs[3].reshape(N_PROPS, R).T
        return t, mat, nrm, props
    return t, mat, None, None
