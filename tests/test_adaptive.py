"""Whitted AA and adaptive sampling."""

import numpy as np

from ndt_tpu.render.engine import RenderOptions, render_frame
from ndt_tpu.scene.model import Scene


def _scene():
    scn = Scene("mini", 4)
    s = scn.add_object("sphere", "ball")
    s.add_pos(np.array([0, 0, 10.0, 0])).add_size(2.0)
    s.set_color(0.9, 0.2, 0.2)
    floor = scn.add_object("hplane", "floor")
    floor.add_pos(np.array([0, -3.0, 0, 0])).add_dir(np.array([0, 1.0, 0, 0]))
    floor.set_color(0.5, 0.5, 0.5)
    scn.ambient[:] = 0.3
    lgt = scn.add_light()
    lgt.pos = np.array([5.0, 10.0, 0, 0])
    lgt.set_color(50, 50, 50)
    scn.cam.set_aim(np.array([0, 2.0, -8.0, 0]), np.array([0, 0, 10.0, 0]),
                    np.array([0, 1.0, 0, 0]))
    scn.bg[:] = [0.1, 0.2, 0.3]
    return scn


def test_whitted_refines_edges():
    scn = _scene()
    base = RenderOptions(width=48, height=36, samples=1, tile=4096,
                         max_optic_depth=3)
    won = RenderOptions(width=48, height=36, samples=1, tile=4096,
                        max_optic_depth=3, whitted=True, aa_diff=8,
                        aa_depth=3)
    img0, _, n0 = render_frame(scn, base)
    img1, _, n1 = render_frame(scn, won)
    assert np.isfinite(img1).all()
    assert n1 > n0  # corner grid + refinement rays
    # AA smooths the silhouette: the refined image has intermediate values
    # at the sphere edge that the point-sampled one lacks
    diff = np.abs(img0 - img1).max()
    assert diff > 0.01


def test_whitted_flat_region_unrefined():
    # a uniform background needs no refinement: whitted output equals the
    # 4-corner average everywhere and the resample count is small
    scn = _scene()
    scn.objects = scn.objects[:0]  # no objects: pure background
    s = scn.add_object("sphere", "tiny")
    s.add_pos(np.array([100.0, 100, 100, 0])).add_size(0.1)
    s.set_color(1, 1, 1)
    won = RenderOptions(width=32, height=24, samples=1, tile=2048,
                        max_optic_depth=2, whitted=True, aa_diff=8,
                        aa_depth=2)
    img, _, _ = render_frame(scn, won)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    flat = (np.abs(img - bg).max(-1) < 1e-6).mean()
    assert flat > 0.98, f"only {flat:.2%} of pixels are pure background"


def test_adaptive_sampling_converges():
    scn = _scene()
    opts = RenderOptions(width=24, height=18, samples=4, tile=1024,
                         max_optic_depth=3, adaptive=True)
    img, dep, n = render_frame(scn, opts)
    assert np.isfinite(img).all()
    # jittered adaptive mean close to the deterministic single sample
    det = RenderOptions(width=24, height=18, samples=1, tile=1024,
                        max_optic_depth=3)
    img0, _, _ = render_frame(scn, det)
    assert np.abs(img - img0).mean() < 0.05


def test_adaptive_uses_more_samples_than_min():
    scn = _scene()
    opts = RenderOptions(width=16, height=12, samples=2, tile=512,
                         max_optic_depth=2, adaptive=True)
    _, _, n_adaptive = render_frame(scn, opts)
    fixed = RenderOptions(width=16, height=12, samples=2, tile=512,
                          max_optic_depth=2, adaptive=False)
    _, _, n_fixed = render_frame(scn, fixed)
    assert n_adaptive >= n_fixed  # noisy edge pixels keep sampling


def test_whitted_applies_to_stereo_modes():
    """-w now composes with every stereo layout (the C applies resampling
    to the frame regardless of stereo mode, ndt.c:1039-1103): each eye
    panel gets its own corner grid + refinement under the panel's affine
    screen mapping."""
    for mode in ("side", "over", "anaglyph"):
        scn = _scene()
        opts_w = RenderOptions(width=32, height=24, samples=1, tile=2048,
                               stereo=mode, whitted=True, aa_diff=8,
                               aa_depth=2)
        opts_p = RenderOptions(width=32, height=24, samples=1, tile=2048,
                               stereo=mode)
        img_w, _, n_w = render_frame(scn, opts_w)
        img_p, _, n_p = render_frame(scn, opts_p)
        assert np.isfinite(img_w).all(), mode
        assert img_w.shape == img_p.shape
        # corner-grid sampling shifts by ~half a pixel: images must agree
        # in the large (same scene) without being the same sampling
        assert np.abs(img_w - img_p).mean() < 0.08, mode
        if mode == "anaglyph":
            assert (img_w[..., 1] == 0).all()
