"""Adaptive refinement: Whitted corner-grid anti-aliasing (-w) and the
per-pixel convergence sampling loop.

Whitted AA (ndt.c:655-733, 900-1103): pass 1 renders a (W+1) x (H+1) grid
of pixel-corner samples; pass 2 averages each pixel's 4 corners and, where
the L1 spread exceeds aa_diff/255 (image_avg_dbl_pixels4, image.c:1175),
recursively subdivides the quad -- rendering 5 midpoints and recursing into
whichever quadrants stay noisy -- down to step 1/2^aa_depth.  The pixel is
the recursive average of its leaf quads.

This is data-dependent control flow, so the TPU formulation is host-driven
breadth-first refinement: one device batch per level renders ALL active
quads' midpoints at once (the worklists shrink geometrically), with the
variance tests and bookkeeping in numpy.  Work per level is compacted, so
the cost matches the C's "% resampled" economics (ndt.c:1060-1068).

Adaptive sampling (get_pixel_color, ndt.c:474-563): after the first two
jittered samples, a pixel keeps sampling while the running-mean change
exceeds 1/256, up to 10,000 samples.  Batched: one sample per round for the
still-active pixel subset (host-compacted indices).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ndt_tpu.constants import MAX_SAMPLE_DIFF, MAX_SAMPLES
from ndt_tpu.render.engine import (RenderOptions, gen_rays,
                                   render_rays_chunked)


def _render_points(scene_data, cam_data, gx, gy, amap, key, opts, eye,
                   aperture):
    """Render samples at fractional corner-grid coordinates (gx, gy) using
    the affine screen mapping x = ax*gx + bx, y = ay*gy + by with
    amap = (ax, bx, ay, by).  The mono mapping is ax = 1/(W+1), bx = -0.5,
    ay = -1/(H+1), by = 0.5 (ndt.c:629-633 with the corner grid's
    width+1/height+1); stereo eye panels use their layout's scaling
    (ndt.c:590-630)."""
    from ndt_tpu.render.pallas_trace import RT

    ax, bx, ay, by = amap
    dt = np.dtype(opts.dtype)
    x = (ax * gx + bx).astype(dt)
    y = (ay * gy + by).astype(dt)
    P = len(x)
    mesh = opts.devices        # -b r composes with -w: refinement batches
    n_dev = 1                  # shard over the mesh like the corner grid
    if mesh is not None:
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    quantum = RT if RT % n_dev == 0 else RT * n_dev
    pad = (-P) % quantum
    if pad:
        x = np.concatenate([x, np.zeros(pad, dt)])
        y = np.concatenate([y, np.zeros(pad, dt)])
    o, v = jax.jit(gen_rays, static_argnames=("opts", "eye", "jitter",
                                              "aperture"))(
        cam_data, jnp.asarray(x), jnp.asarray(y), key, opts, eye, False,
        aperture)
    if mesh is not None:
        from ndt_tpu.parallel.mesh import render_rays_sharded

        c, d, n = render_rays_sharded(scene_data, o, v, key, opts, mesh)
    else:
        c, d, n = render_rays_chunked(scene_data, o, v, key, opts)
    return np.asarray(c)[:P], int(n)


def whitted_refine(scene_data, cam_data, corners, opts: RenderOptions,
                   aa_diff: int, aa_depth: int, key, eye="center",
                   amap=None, size=None):
    """corners: [H+1, W+1, 3] pass-1 grid.  Returns ([H, W, 3] image,
    resampled_pixel_count, extra_rays).

    ``size=(W, H)`` overrides the panel size (stereo eye panels are
    smaller than the frame) and ``amap=(ax, bx, ay, by)`` the affine
    corner-grid -> screen mapping (default: the mono layout)."""
    W, H = size if size is not None else (opts.width, opts.height)
    if amap is None:
        amap = (1.0 / (W + 1), -0.5, -1.0 / (H + 1), 0.5)
    thresh = aa_diff / 255.0
    if opts.devices is not None:
        from ndt_tpu.parallel.mesh import replicate

        # replicate once; per-level render_rays_sharded calls are then free
        scene_data = replicate(opts.devices, scene_data)

    c1 = corners[:-1, :-1]   # (i, j)
    c2 = corners[:-1, 1:]    # (i+1, j)
    c3 = corners[1:, :-1]    # (i, j+1)
    c4 = corners[1:, 1:]     # (i+1, j+1)
    avg = (c1 + c2 + c3 + c4) / 4.0

    def l1var(a, p1, p2, p3, p4):
        v = 0.0
        for p in (p1, p2, p3, p4):
            v = v + np.abs(a - p).sum(-1)
        # alpha channel is constant 1.0 in all rendered samples: zero term
        return v

    var = l1var(avg, c1, c2, c3, c4)
    flagged = var > thresh
    out = np.where(flagged[..., None], 0.0, avg)
    n_flagged = int(flagged.sum())
    if n_flagged == 0 or aa_depth <= 0:
        return np.where(flagged[..., None], avg, out), n_flagged, 0

    ys, xs = np.nonzero(flagged)
    pix = ys * W + xs
    quads = dict(
        pix=pix,
        x=xs.astype(np.float64), y=ys.astype(np.float64),
        step=np.ones(len(pix)),
        w=np.ones(len(pix)),
        c1=c1[ys, xs], c2=c2[ys, xs], c3=c3[ys, xs], c4=c4[ys, xs],
    )
    out_flat = out.reshape(-1, 3)
    extra_rays = 0
    min_step = 1.0 / (2 << (aa_depth - 1))  # ndt.c:663

    level = 0
    while len(quads["pix"]) and level < aa_depth + 1:
        n_q = len(quads["pix"])
        hs = quads["step"] / 2.0
        # 5 midpoints per quad: center, top-mid, left, right, bottom
        gx = np.concatenate([quads["x"] + hs, quads["x"] + hs, quads["x"],
                             quads["x"] + quads["step"], quads["x"] + hs])
        gy = np.concatenate([quads["y"] + hs, quads["y"], quads["y"] + hs,
                             quads["y"] + hs, quads["y"] + quads["step"]])
        key, skey = jax.random.split(key)
        mids, nr = _render_points(scene_data, cam_data, gx, gy, amap,
                                  skey, opts, eye, aperture=True)
        extra_rays += nr
        p5, p6, p7, p8, p9 = (mids[k * n_q:(k + 1) * n_q] for k in range(5))

        subquads = [
            # (corner colors), (x offset, y offset)
            ((quads["c1"], p6, p7, p5), (0.0, 0.0)),
            ((p6, quads["c2"], p5, p8), (1.0, 0.0)),
            ((p7, p5, quads["c3"], p9), (0.0, 1.0)),
            ((p5, p8, p9, quads["c4"]), (1.0, 1.0)),
        ]
        next_q = {k: [] for k in quads}
        for (s1, s2, s3, s4), (ox, oy) in subquads:
            savg = (s1 + s2 + s3 + s4) / 4.0
            svar = l1var(savg, s1, s2, s3, s4)
            recurse = (svar > thresh) & (hs >= min_step)
            # leaves contribute w/4 * avg
            leaf = ~recurse
            if leaf.any():
                np.add.at(out_flat, quads["pix"][leaf],
                          (quads["w"][leaf] / 4.0)[:, None] * savg[leaf])
            if recurse.any():
                next_q["pix"].append(quads["pix"][recurse])
                next_q["x"].append(quads["x"][recurse] + ox * hs[recurse])
                next_q["y"].append(quads["y"][recurse] + oy * hs[recurse])
                next_q["step"].append(hs[recurse])
                next_q["w"].append(quads["w"][recurse] / 4.0)
                next_q["c1"].append(s1[recurse])
                next_q["c2"].append(s2[recurse])
                next_q["c3"].append(s3[recurse])
                next_q["c4"].append(s4[recurse])
        if next_q["pix"]:
            quads = {k: np.concatenate(v) for k, v in next_q.items()}
        else:
            quads = {k: np.zeros((0,) + np.shape(v[0])[1:] if v else (0,))
                     for k, v in next_q.items()}
            quads["pix"] = np.zeros(0, np.int64)
        level += 1

    # any quads cut off by the level cap resolve to their corner average
    if len(quads["pix"]):
        savg = (quads["c1"] + quads["c2"] + quads["c3"] + quads["c4"]) / 4.0
        np.add.at(out_flat, quads["pix"], quads["w"][:, None] * savg)

    return out_flat.reshape(H, W, 3), n_flagged, extra_rays


def render_adaptive_samples(scene_data, cam_data, x, y, key,
                            opts: RenderOptions, eye="center"):
    """get_pixel_color's convergence loop (ndt.c:474-563), batched: renders
    jittered samples per pixel until the running-mean delta falls under
    1/256 (min opts.samples, max 10,000).  Returns (color, depth, rays)."""
    from ndt_tpu.render.pallas_trace import RT

    dt = np.dtype(opts.dtype)
    mesh = opts.devices        # -b r composes with adaptive sampling: each
    n_dev = 1                  # round's compacted batch is mesh-sharded
    if mesh is not None:
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        from ndt_tpu.parallel.mesh import replicate

        # replicate once: render_rays_sharded's replicate() is idempotent,
        # so the per-round calls below ship no scene bytes
        scene_data = replicate(mesh, scene_data)
    batch_quantum = RT if RT % n_dev == 0 else RT * n_dev

    P = len(x)
    t_clr = np.zeros((P, 3), np.float64)
    depth0 = np.zeros(P, np.float64)
    t_n = np.zeros(P, np.int64)
    active_idx = np.arange(P)
    total_rays = 0
    clr_diff = np.full(P, 256.0)
    i = 0
    while len(active_idx):
        key, skey = jax.random.split(key)
        xs = np.asarray(x)[active_idx]
        ys = np.asarray(y)[active_idx]
        pad = (-len(xs)) % batch_quantum
        xs_p = np.concatenate([xs, np.zeros(pad, dt)]).astype(dt)
        ys_p = np.concatenate([ys, np.zeros(pad, dt)]).astype(dt)
        o, v = jax.jit(gen_rays, static_argnames=("opts", "eye", "jitter",
                                                  "aperture"))(
            cam_data, jnp.asarray(xs_p), jnp.asarray(ys_p), skey, opts, eye,
            True, True)
        if mesh is not None:
            from ndt_tpu.parallel.mesh import render_rays_sharded

            c, d, n = render_rays_sharded(scene_data, o, v, skey, opts,
                                          mesh)
        else:
            c, d, n = render_rays_chunked(scene_data, o, v, skey, opts)
        c = np.asarray(c)[:len(xs)]
        d = np.asarray(d)[:len(xs)]
        total_rays += int(n)

        prev_sum = t_clr[active_idx].copy()
        t_clr[active_idx] += c
        t_n[active_idx] += 1
        if i == 0:
            depth0[active_idx] = d
        m = t_n[active_idx]
        # ndt.c:552-555 compares t_clr/(i-1) vs (t_clr+l_clr)/i at loop
        # index i, but t_clr then holds i samples and the new sum i+1 --
        # the C's denominators run one BELOW the true sample counts.  The
        # quirk is load-bearing: with identical samples s the "diff" is
        # s/((m-2)(m-1)), not 0, so even converged bright pixels keep
        # sampling until (m-2)(m-1) >= 256*s (~17 samples at s=1).
        # Replicate exactly; updates only from the 3rd sample (C: i > 1).
        diff = np.abs(prev_sum / np.maximum(m - 2, 1)[:, None]
                      - t_clr[active_idx] / np.maximum(m - 1, 1)[:, None]
                      ).max(-1)
        clr_diff[active_idx] = np.where(m >= 3, diff, 256.0)

        i += 1
        keep = (t_n[active_idx] < opts.samples) | (
            (t_n[active_idx] < MAX_SAMPLES)
            & (clr_diff[active_idx] > MAX_SAMPLE_DIFF))
        active_idx = active_idx[keep]
        if i >= MAX_SAMPLES:
            break
    color = (t_clr / np.maximum(t_n, 1)[:, None]).astype(dt)
    return color, depth0.astype(dt), total_rays
