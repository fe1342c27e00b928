"""End-to-end rendering: golden bands vs the C reference, determinism,
depth maps, stereo layouts, image IO."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndt_tpu.image_io import bytes_to_linear, linear_to_bytes, normalize_depth
from ndt_tpu.render.engine import (RenderOptions, _pixel_grid, render_frame,
                                   render_tile)
from ndt_tpu.scene.compile import compile_scene
from ndt_tpu.scene.model import Scene
from ndt_tpu.scenes import get_scene

from conftest import load_golden


def _band_render(scene_name, frames, golden, rows, dtype="float32",
                 width=640, height=480):
    """Render a horizontal band of the golden image and compare bytes."""
    mod = get_scene(scene_name)
    scn = Scene(scene_name, 4)
    mod.scene_setup(scn, 4, 0, frames)
    if hasattr(mod, "scene_cleanup"):
        mod.scene_cleanup()
    scn.cam.aim()
    dt = np.dtype(dtype)
    sd = compile_scene(scn, dt)
    cd = scn.cam.data(dt.type)
    cd = dataclasses.replace(cd, dir_x=cd.dir_x * dt.type(width / height))
    xx, yy = _pixel_grid(width, height, dt)
    xb = xx[rows].ravel()
    yb = yy[rows].ravel()
    opts = RenderOptions(width=width, height=height, samples=1,
                         tile=len(xb), dtype=dtype)
    c, d, n = render_tile(sd, cd, jnp.asarray(xb), jnp.asarray(yb),
                          jax.random.PRNGKey(0), opts, "center")
    mine = np.asarray(c).reshape(-1, width, 3)
    ref = load_golden(golden)[rows]
    mine_b = linear_to_bytes(mine).astype(np.float64) / 255.0
    return mine_b, ref


def test_balls_band_matches_c_golden():
    rows = slice(180, 260)  # through the balls and wireframe
    mine, ref = _band_render("balls", 1500, "balls_4d_640x480_f0.png", rows)
    rmse = np.sqrt(((mine - ref) ** 2).mean())
    assert rmse < 1e-3, f"RMSE {rmse}"


@pytest.mark.slow
def test_balls_full_frame_matches_c_golden():
    """Full-frame flagship golden (VERDICT r2 weak 4): every row of the
    640x480 balls frame vs the C binary, so a quiet top-of-frame
    regression (sky gradient, wireframe tops, light falloff) cannot hide
    behind the band test above.  f64 so it is pixel-exact: in f32 two
    isolated knife-edge pixels flip winners vs the C's doubles (measured
    frame RMSE 4.4e-4, still under the band threshold), which would force
    a loose per-pixel bound here."""
    # the pixel-exact bounds below require real float64 compute; without
    # conftest's jax_enable_x64 JAX silently downcasts and the tolerances
    # fail with no hint why (ADVICE r3) -- fail explicitly instead
    assert jax.config.jax_enable_x64, \
        "jax_enable_x64 is off: f64 golden bounds need conftest's x64 config"
    rows = slice(0, 480)
    mine, ref = _band_render("balls", 1500, "balls_4d_640x480_f0.png", rows,
                             dtype="float64")
    rmse = np.sqrt(((mine - ref) ** 2).mean())
    assert rmse < 5e-5, f"RMSE {rmse}"
    # per-pixel worst case too: a localized artifact averages away in
    # whole-frame RMSE.  1.5/255 = nothing beyond byte-rounding jitter.
    worst = np.abs(mine - ref).max()
    assert worst < 1.5 / 255, f"worst pixel diff {worst}"


def test_builtin_band_matches_c_golden():
    rows = slice(220, 260)  # through the refractive sphere
    mine, ref = _band_render("test", 300, "test_4d_640x480_f0.png", rows)
    rmse = np.sqrt(((mine - ref) ** 2).mean())
    assert rmse < 2e-3, f"RMSE {rmse}"


def _small_scene():
    scn = Scene("mini", 4)
    s = scn.add_object("sphere", "ball")
    s.add_pos(np.array([0, 0, 10.0, 0])).add_size(2.0)
    s.set_color(0.9, 0.2, 0.2).set_reflect(0.3, 0.3, 0.3)
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


def test_render_deterministic():
    scn = _small_scene()
    opts = RenderOptions(width=32, height=24, samples=1, tile=1024)
    img1, _, n1 = render_frame(scn, opts)
    img2, _, n2 = render_frame(scn, opts)
    np.testing.assert_array_equal(img1, img2)
    assert n1 == n2 > 0


def test_depth_map():
    scn = _small_scene()
    opts = RenderOptions(width=32, height=24, samples=1, tile=1024,
                         record_depth=True)
    img, dep, _ = render_frame(scn, opts)
    assert dep.shape == (24, 32)
    # sphere pixels are closer (bigger 1/dist) than floor pixels
    assert dep.max() > 0
    norm = normalize_depth(dep)
    assert norm.min() == 0.0 and norm.max() == 1.0


def test_background_on_miss():
    scn = _small_scene()
    opts = RenderOptions(width=16, height=12, samples=1, tile=256)
    img, _, _ = render_frame(scn, opts)
    # top corner rays miss everything -> background
    np.testing.assert_allclose(img[0, 0], [0.1, 0.2, 0.3], atol=1e-6)


def test_multisample_close_to_single():
    scn = _small_scene()
    o1 = RenderOptions(width=16, height=12, samples=1, tile=256)
    o4 = RenderOptions(width=16, height=12, samples=4, tile=256)
    img1, _, _ = render_frame(scn, o1)
    img4, _, _ = render_frame(scn, o4)
    # jittered samples average near the deterministic render
    assert np.abs(img1 - img4).mean() < 0.08


@pytest.mark.parametrize("mode,shape", [
    ("side", (24, 32, 3)), ("over", (24, 32, 3)), ("anaglyph", (24, 32, 3)),
])
def test_stereo_modes(mode, shape):
    scn = _small_scene()
    opts = RenderOptions(width=32, height=24, samples=1, tile=1024,
                         stereo=mode)
    img, _, _ = render_frame(scn, opts)
    assert img.shape == shape
    assert np.isfinite(img).all()
    if mode == "anaglyph":
        assert (img[..., 1] == 0).all()  # green channel zeroed (ndt.c:645)


def test_vr_and_pano_cameras():
    from ndt_tpu.camera import CameraType

    for ctype in (CameraType.VR, CameraType.PANO):
        scn = _small_scene()
        scn.cam.type = ctype
        scn.cam.v_fov = np.pi / 2
        scn.cam.h_fov = 2 * np.pi
        opts = RenderOptions(width=24, height=12, samples=1, tile=512)
        img, _, _ = render_frame(scn, opts)
        assert np.isfinite(img).all()


def test_transparent_scene_refraction_runs():
    scn = _small_scene()
    scn.objects[0].transparent = True
    scn.objects[0].refract_index = 1.5
    opts = RenderOptions(width=16, height=12, samples=1, tile=256)
    img, _, nrays = render_frame(scn, opts)
    assert np.isfinite(img).all()
    # refraction children mean strictly more rays than the opaque render
    scn2 = _small_scene()
    _, _, nrays2 = render_frame(scn2, opts)
    assert nrays > nrays2


def test_specular_toggle():
    scn = _small_scene()
    opts_on = RenderOptions(width=16, height=12, samples=1, tile=256)
    opts_off = dataclasses.replace(opts_on, specular=False)
    img_on, _, _ = render_frame(scn, opts_on)
    img_off, _, _ = render_frame(scn, opts_off)
    assert not np.array_equal(img_on, img_off)


def test_pixel_byte_roundtrip():
    img = np.random.RandomState(0).rand(4, 4, 3)
    again = bytes_to_linear(linear_to_bytes(img))
    assert np.abs(again - img).max() < 0.01


def test_chain_compaction_matches_full_width():
    """The block-gather bounce compaction (engine._render_rays_chain) must
    reproduce the full-width loop exactly: same rays traced, same colors
    (modulo one float add reordering), same depth."""
    from ndt_tpu.render.engine import gen_rays, render_rays
    from ndt_tpu.render.pallas_trace import RT

    scn = Scene("compact", 4)
    scn.ambient[:] = 0.2
    lgt = scn.add_light()
    lgt.pos = np.array([0.0, 50.0, 0.0, 0.0])
    lgt.set_color(200, 200, 200)
    floor = scn.add_object("hplane").set_color(.6, .6, .6).set_reflect(.4, .4, .4)
    floor.add_pos(np.array([0.0, -5.0, 0.0, 0.0]))
    floor.add_dir(np.array([0.0, 1.0, 0.0, 0.0]))
    for i in range(3):
        s = scn.add_object("sphere").set_color(.7, .2, .2).set_reflect(.5, .5, .5)
        s.add_pos(np.array([i * 6.0 - 6.0, 2.0, -20.0 - 4.0 * i, 0.0]))
        s.add_size(3.0)
    scn.cam.set_aim(np.array([0.0, 5.0, 20.0, 0.0]), np.zeros(4),
                    np.array([0.0, 10.0, 0.0, 0.0]), 0.0)
    scn.cam.aim()

    dt = np.float32
    sd = compile_scene(scn, dt)
    cd = scn.cam.data(dt)
    R = RT * 16                    # smallest batch that triggers compaction
    w = h = int(np.sqrt(R))
    assert w * h == R
    xx, yy = _pixel_grid(w, h, np.dtype(dt))
    x, y = jnp.asarray(xx.ravel()), jnp.asarray(yy.ravel())
    key = jax.random.PRNGKey(3)

    outs = {}
    for compact in (0, 4):
        opts = RenderOptions(width=w, height=h, samples=1, tile=R,
                             compact=compact, max_optic_depth=8)
        o, v = gen_rays(cd, x, y, key, opts, "center", False, False)
        c, d, n = jax.jit(render_rays, static_argnames="opts")(
            sd, o, v, key, opts)
        outs[compact] = (np.asarray(c), np.asarray(d), int(n))
    c0, d0, n0 = outs[0]
    c4, d4, n4 = outs[4]
    assert n0 == n4
    assert n0 > R  # reflections actually happened
    np.testing.assert_array_equal(d0, d4)
    np.testing.assert_allclose(c0, c4, atol=1e-6)


def test_chunked_scene_trace_matches_jnp(monkeypatch):
    """Large scenes split into SMEM-sized chunks (compile._pack_chunked);
    force chunking on the balls scene with a tiny budget and check the
    interpret-mode megakernel's merged winners against the jnp path."""
    from ndt_tpu.render import trace as trace_mod
    from ndt_tpu.scene import compile as compile_mod
    from ndt_tpu.scenes import get_scene

    mod = get_scene("balls")
    scn = Scene("balls", 4)
    mod.scene_setup(scn, 4, 0, 1500)
    scn.cam.aim()
    monkeypatch.setattr(compile_mod, "_SMEM_BUDGET", 10 * 1024)
    sd = compile_scene(scn, np.float32)
    assert len(sd.pmeta) >= 3            # actually chunked

    dt = np.float32
    cd = scn.cam.data(dt)
    xx, yy = _pixel_grid(64, 48, np.dtype(dt))
    from ndt_tpu.render.engine import gen_rays

    opts = RenderOptions(width=64, height=48, samples=1, tile=64 * 48)
    o, v = gen_rays(cd, jnp.asarray(xx.ravel()), jnp.asarray(yy.ravel()),
                    jax.random.PRNGKey(0), opts, "center", False, False)

    trace_mod.set_trace_impl("pallas-interpret")
    try:
        tr_p = trace_mod.trace(sd, o, v, need_normal=True)
        sh_p = trace_mod.shadow_trace(sd, o, v,
                                      jnp.full(o.shape[0], 100.0, dt))
    finally:
        trace_mod.set_trace_impl("jnp")
    try:
        tr_j = trace_mod.trace(sd, o, v, need_normal=True)
        sh_j = trace_mod.shadow_trace(sd, o, v,
                                      jnp.full(o.shape[0], 100.0, dt))
    finally:
        trace_mod.set_trace_impl("auto")

    hit_p, hit_j = np.asarray(tr_p.hit), np.asarray(tr_j.hit)
    assert (hit_p == hit_j).mean() > 0.999   # knife-edge margins may differ
    agree = hit_p & hit_j
    np.testing.assert_allclose(np.asarray(tr_p.t)[agree],
                               np.asarray(tr_j.t)[agree], rtol=2e-4,
                               atol=2e-3)
    assert (np.asarray(tr_p.mat_id)[agree]
            == np.asarray(tr_j.mat_id)[agree]).all()
    s_agree = np.asarray(sh_p.hit) & np.asarray(sh_j.hit)
    assert (np.asarray(sh_p.mat_id)[s_agree]
            == np.asarray(sh_j.mat_id)[s_agree]).mean() > 0.999


def _area_light_scene(kind):
    from ndt_tpu.scene.model import LightType

    scn = Scene("area", 4)
    s = scn.add_object("sphere", "blocker")
    s.add_pos(np.array([0, 3.0, 10.0, 0])).add_size(1.5)
    s.set_color(0.8, 0.2, 0.2)
    floor = scn.add_object("hplane", "floor")
    floor.add_pos(np.array([0, 0.0, 0, 0])).add_dir(np.array([0, 1.0, 0, 0]))
    floor.set_color(0.7, 0.7, 0.7)
    lgt = scn.add_light(kind)
    lgt.pos = np.array([0.0, 12.0, 10.0, 0.0])
    lgt.radius = 3.0
    lgt.set_color(120, 120, 120)
    lgt.aim(np.array([0.0, 0.0, 10.0, 0.0]))   # scene_aim_light
    lgt.prepare()
    scn.cam.set_aim(np.array([0, 6.0, -6.0, 0]), np.array([0, 0, 10.0, 0]),
                    np.array([0, 1.0, 0, 0]))
    scn.ambient[:] = 0.1
    return scn


@pytest.mark.parametrize("kind", ["DISK", "RECT"])
def test_area_lights_cast_soft_shadows(kind):
    """DISK/RECT lights sample a random surface point per shading event
    (ndt.c:116-147): with many samples the shadow edge is a penumbra --
    pixels neither fully lit nor fully dark."""
    from ndt_tpu.scene.model import LightType

    scn = _area_light_scene(LightType[kind])
    opts = RenderOptions(width=48, height=36, samples=24, adaptive=False,
                         tile=48 * 36)
    img, _, _ = render_frame(scn, opts)
    lum = np.asarray(img).mean(-1)
    # gray floor pixels only (exclude the red blocker sphere and the sky)
    floor = (np.abs(img[..., 0] - img[..., 1]) < 0.05)[16:30]
    vals = lum[16:30][floor]
    lit, dark = vals.max(), vals.min()
    assert lit > 2.5 * dark + 1e-3         # a shadow exists
    mid = ((vals > dark + 0.25 * (lit - dark))
           & (vals < dark + 0.75 * (lit - dark)))
    assert mid.sum() >= 3                  # ...with a penumbra


def test_depth_of_field_blurs_far_objects():
    """Aperture sampling (ndt.c:527-542): with focus on the near sphere, a
    far sphere's silhouette spreads over more pixels than at aperture 0."""
    def build():
        scn = _small_scene()
        far = scn.add_object("sphere", "far")
        far.add_pos(np.array([3.0, 1.0, 40.0, 0])).add_size(2.0)
        far.set_color(0.1, 0.9, 0.1)
        scn.cam.focal_distance = 18.0      # focus at the near sphere
        return scn

    def green_extent(aperture):
        scn = build()
        scn.cam.aperture_radius = aperture
        opts = RenderOptions(width=64, height=48, samples=32,
                             adaptive=False, tile=64 * 48, seed=5)
        img, _, _ = render_frame(scn, opts)
        greenish = ((img[..., 1] > img[..., 0] + 0.02)
                    & (img[..., 1] > img[..., 2] + 0.02)
                    & (img[..., 1] > 0.1))
        return int(greenish.sum())

    sharp = green_extent(0.0)
    blurred = green_extent(1.5)
    assert sharp > 0
    assert blurred > sharp * 1.2


def test_fused_inkernel_shading_matches_unfused():
    """The megakernel's fused mode (render/pallas_trace.py) computes the
    whole apply_lights pass -- per-light shadow traces, two-sided diffuse,
    the C's mag-0.5 specular (ndt.c:71-326) -- in-registers.  Its frames
    must match the unfused pallas path (kernel + XLA shading) and the jnp
    reference on a scene with point + spot + directional lights and
    reflective bounces."""
    from ndt_tpu.render import engine
    from ndt_tpu.render import trace as trace_mod
    from ndt_tpu.render.engine import gen_rays, render_rays
    from ndt_tpu.render.trace import fused_light_info
    from ndt_tpu.scene.model import LightType

    scn = _small_scene()
    spot = scn.add_light(LightType.SPOT)
    spot.pos = np.array([-5.0, 8.0, 4.0, 0])
    spot.dir = np.array([0.5, -1.0, 0.5, 0])
    spot.angle = 30.0  # host model field; compile reads l.angle (degrees)
    spot.set_color(60, 60, 60)
    sun = scn.add_light(LightType.DIRECTIONAL)
    sun.dir = np.array([0.3, -1.0, 0.2, 0])
    sun.set_color(0.5, 0.5, 0.4)
    cyl = scn.add_object("cylinder", "cyl")
    cyl.add_pos(np.array([-2.0, -1.0, 8.0, 0]))
    cyl.add_pos(np.array([2.0, 1.0, 9.0, 0]))
    cyl.add_size(0.6).add_flag(1)
    cyl.set_color(0.9, 0.5, 0.2)
    scn.cam.aim()

    sd = jax.device_put(compile_scene(scn, np.float32))
    assert fused_light_info(sd) is not None
    cd = scn.cam.data(np.float32)
    W, H = 64, 64
    opts = RenderOptions(width=W, height=H, samples=1, tile=W * H,
                         compact=0)
    xs = np.linspace(-0.5, 0.5, W, dtype=np.float32)
    ys = np.linspace(-0.5, 0.5, H, dtype=np.float32)
    xg, yg = np.meshgrid(xs, ys)
    key = jax.random.PRNGKey(0)
    o, v = gen_rays(cd, jnp.asarray(xg.ravel()), jnp.asarray(yg.ravel()),
                    key, opts, "center", False, False)

    # same scene with the spot turned off -- proves the cone actually
    # lights pixels, so the fused/unfused comparison is not vacuous
    spot_col = spot.color.copy()
    spot.set_color(0, 0, 0)
    sd_dark = jax.device_put(compile_scene(scn, np.float32))
    spot.color = spot_col

    runs = {}
    old = engine._FUSED_SHADOW
    try:
        for name, impl, fuse in (("jnp", "jnp", False),
                                 ("unfused", "pallas-interpret", False),
                                 ("fused", "pallas-interpret", True)):
            trace_mod.set_trace_impl(impl)
            engine._FUSED_SHADOW = fuse
            runs[name] = np.asarray(render_rays(sd, o, v, key, opts)[0])
        trace_mod.set_trace_impl("jnp")
        engine._FUSED_SHADOW = False
        runs["dark"] = np.asarray(render_rays(sd_dark, o, v, key, opts)[0])
    finally:
        trace_mod.set_trace_impl("auto")
        engine._FUSED_SHADOW = old

    assert np.abs(runs["jnp"] - runs["dark"]).max() > 0.01, \
        "spot cone never lights a pixel -- parity test is degenerate"

    # shading boundary tests (shadow same-point EPSILON, spot cone) may
    # flip on a knife-edge pixel because the kernel's in-register hit
    # point and XLA's differ in f32 op order -- allow isolated pixels
    d = np.abs(runs["fused"] - runs["unfused"])
    assert (d > 2e-5).any(axis=1).mean() < 0.002, d.max()
    assert d.max() < 5e-3
    diff = np.abs(runs["fused"] - runs["jnp"])
    assert (diff > 1e-3).any(axis=1).mean() < 0.002, diff.max()


def test_fused_shading_specular_toggle():
    """-p (specular off) must flow into the fused kernel too."""
    from ndt_tpu.render import engine
    from ndt_tpu.render import trace as trace_mod
    from ndt_tpu.render.engine import gen_rays, render_rays

    scn = _small_scene()
    scn.cam.aim()
    sd = jax.device_put(compile_scene(scn, np.float32))
    cd = scn.cam.data(np.float32)
    opts_s = RenderOptions(width=32, height=32, samples=1, tile=1024,
                           compact=0)
    opts_p = dataclasses.replace(opts_s, specular=False)
    xs = np.linspace(-0.5, 0.5, 32, dtype=np.float32)
    xg, yg = np.meshgrid(xs, xs)
    key = jax.random.PRNGKey(0)
    o, v = gen_rays(cd, jnp.asarray(xg.ravel()), jnp.asarray(yg.ravel()),
                    key, opts_s, "center", False, False)
    old = engine._FUSED_SHADOW
    try:
        trace_mod.set_trace_impl("pallas-interpret")
        engine._FUSED_SHADOW = True
        c_fs = np.asarray(render_rays(sd, o, v, key, opts_s)[0])
        c_fp = np.asarray(render_rays(sd, o, v, key, opts_p)[0])
        engine._FUSED_SHADOW = False
        c_us = np.asarray(render_rays(sd, o, v, key, opts_s)[0])
        c_up = np.asarray(render_rays(sd, o, v, key, opts_p)[0])
    finally:
        trace_mod.set_trace_impl("auto")
        engine._FUSED_SHADOW = old
    np.testing.assert_allclose(c_fs, c_us, atol=2e-5)
    np.testing.assert_allclose(c_fp, c_up, atol=2e-5)
    assert np.abs(c_fs - c_fp).max() > 1e-3   # specular actually differs


def _render_impls(sd, scn, opts, W, H, impls):
    """Render the same rays under several (trace_impl, fused) configs."""
    from ndt_tpu.render import engine
    from ndt_tpu.render import trace as trace_mod
    from ndt_tpu.render.engine import gen_rays, render_rays

    cd = scn.cam.data(np.float32)
    xs = np.linspace(-0.5, 0.5, W, dtype=np.float32)
    ys = np.linspace(-0.5, 0.5, H, dtype=np.float32)
    xg, yg = np.meshgrid(xs, ys)
    key = jax.random.PRNGKey(0)
    o, v = gen_rays(cd, jnp.asarray(xg.ravel()), jnp.asarray(yg.ravel()),
                    key, opts, "center", False, False)
    runs = {}
    old = engine._FUSED_SHADOW
    try:
        for name, impl, fuse in impls:
            trace_mod.set_trace_impl(impl)
            engine._FUSED_SHADOW = fuse
            runs[name] = np.asarray(render_rays(sd, o, v, key, opts)[0])
    finally:
        trace_mod.set_trace_impl("auto")
        engine._FUSED_SHADOW = old
    return runs


@pytest.mark.parametrize("kind", ["DISK", "RECT"])
def test_fused_area_light_matches_jnp(kind):
    """DISK/RECT area lights now run in the fused in-kernel shading path:
    the per-ray sampled light position (ndt.c:116-147) travels to the shade
    kernel as a VMEM array.  Same keys => identical sample points, so the
    fused render must match the jnp path."""
    from ndt_tpu.render.trace import fused_light_info
    from ndt_tpu.scene.model import LightType

    scn = _area_light_scene(LightType[kind])
    sd = jax.device_put(compile_scene(scn, np.float32))
    assert fused_light_info(sd) is not None
    assert fused_light_info(sd)[0] == ("a",)
    W = H = 32
    opts = RenderOptions(width=W, height=H, samples=1, tile=W * H,
                         compact=0)
    runs = _render_impls(sd, scn, opts, W, H,
                         (("jnp", "jnp", False),
                          ("fused", "pallas-interpret", True)))
    d = np.abs(runs["fused"] - runs["jnp"])
    assert (d.max(axis=1) > 1e-3).mean() < 0.002, d.max()


def test_facet_scene_in_megakernel():
    """The built-in test scene (hplane + spheres + facet + hcylinder,
    scene.c:429-571) has a facet, which previously forced the XLA fallback;
    the megakernel now evaluates facet/hfacet families in-kernel and the
    scene qualifies for fused shading."""
    from ndt_tpu.render.trace import fused_light_info

    mod = get_scene("test")
    scn = Scene("test", 4)
    mod.scene_setup(scn, 4, 0, 300, None)
    scn.cam.aim()
    sd = jax.device_put(compile_scene(scn, np.float32))
    assert sd.pmeta is not None and len(sd.pmeta) == 1
    assert sd.pmeta[0].n_fct == 1
    assert fused_light_info(sd) is not None
    W = H = 48
    opts = RenderOptions(width=W, height=H, samples=1, tile=W * H,
                         compact=0)
    runs = _render_impls(sd, scn, opts, W, H,
                         (("jnp", "jnp", False),
                          ("pl", "pallas-interpret", False),
                          ("plf", "pallas-interpret", True)))
    for k in ("pl", "plf"):
        d = np.abs(runs[k] - runs["jnp"])
        # knife-edge silhouette/shadow pixels may flip in f32; bulk must match
        assert (d.max(axis=1) > 1e-3).mean() < 0.005, (k, d.max())


def test_hfacet_in_megakernel():
    """hfacet's in-kernel eval (ones-solve + barycentric + per-ray
    bounding gate + both normal modes, hfacet.c:211-310) must reproduce
    the jnp kernel (up to f32 op-order noise and isolated knife-edge
    pixels) on a scene with interpolated-normal and observer-normal
    hfacets."""
    from ndt_tpu.scene.model import LightType

    scn = Scene("hf", 4)
    floor = scn.add_object("hplane", "floor")
    floor.add_pos(np.array([0., -2., 0., 0.]))
    floor.add_dir(np.array([0., 1., 0., 0.]))
    floor.set_color(0.8, 0.8, 0.8)
    hf = scn.add_object("hfacet", "tri")
    hf.add_pos(np.array([-2., 0., 8., 0.]))
    hf.add_pos(np.array([2., 0., 9., 0.]))
    hf.add_pos(np.array([0., 3., 8.5, 0.]))
    for _ in range(3):
        hf.add_dir(np.array([0., 0., -1., 0.]))
    hf.add_flag(1)                      # barycentric vertex normals
    hf.set_color(0.9, 0.3, 0.2)
    hf2 = scn.add_object("hfacet", "tri2")
    hf2.add_pos(np.array([1., -1., 6., 0.5]))
    hf2.add_pos(np.array([3., -1., 7., 0.5]))
    hf2.add_pos(np.array([2., 1., 6.5, 0.5]))
    for _ in range(3):
        hf2.add_dir(np.array([0., 0., -1., 0.]))
    hf2.add_flag(0)                     # observer-side normal
    hf2.set_color(0.2, 0.4, 0.9)
    sph = scn.add_object("sphere", "s")
    sph.add_pos(np.array([-1.5, -0.5, 6., 0.])).add_size(0.8)
    sph.set_color(0.4, 0.9, 0.4)
    sph.set_reflect(0.4, 0.4, 0.4)
    lgt = scn.add_light(LightType.POINT)
    lgt.pos = np.array([3., 8., 2., 0.])
    lgt.set_color(80, 80, 80)
    scn.ambient = np.array([0.3, 0.3, 0.3])
    scn.cam.set_aim(np.array([0., 1., -4., 0.]),
                    np.array([0., 0.5, 8., 0.]),
                    np.array([0., 1., 0., 0.]))
    sd = jax.device_put(compile_scene(scn, np.float32))
    assert sd.pmeta[0].n_hf == 2
    W = H = 48
    opts = RenderOptions(width=W, height=H, samples=1, tile=W * H,
                         compact=0)
    runs = _render_impls(sd, scn, opts, W, H,
                         (("jnp", "jnp", False),
                          ("pl", "pallas-interpret", False),
                          ("plf", "pallas-interpret", True)))
    assert runs["jnp"].std() > 0.01    # scene renders non-trivially
    for k in ("pl", "plf"):
        d = np.abs(runs[k] - runs["jnp"])
        assert (d.max(axis=1) > 1e-3).mean() < 0.002, (k, d.max())


def test_stack_compaction_matches_full_width():
    """The stack-mode (refractive) bounce loop has the same adaptive
    block-compaction ladder as chain mode (engine._render_rays_stack):
    identical rays traced, colors, and depth vs the full-width loop."""
    from ndt_tpu.render.engine import gen_rays, render_rays
    from ndt_tpu.render.pallas_trace import RT

    scn = Scene("compact_t", 4)
    scn.ambient[:] = 0.2
    lgt = scn.add_light()
    lgt.pos = np.array([0.0, 50.0, 0.0, 0.0])
    lgt.set_color(200, 200, 200)
    floor = scn.add_object("hplane").set_color(.6, .6, .6) \
        .set_reflect(.3, .3, .3)
    floor.add_pos(np.array([0.0, -5.0, 0.0, 0.0]))
    floor.add_dir(np.array([0.0, 1.0, 0.0, 0.0]))
    glass = scn.add_object("sphere").set_color(.2, .2, .7)
    glass.transparent = 1
    glass.refract_index = 1.44
    glass.add_pos(np.array([0.0, 2.0, -20.0, 0.0]))
    glass.add_size(3.0)
    mirror = scn.add_object("sphere").set_color(.7, .2, .2) \
        .set_reflect(.5, .5, .5)
    mirror.add_pos(np.array([6.0, 2.0, -24.0, 0.0]))
    mirror.add_size(3.0)
    scn.cam.set_aim(np.array([0.0, 5.0, 20.0, 0.0]), np.zeros(4),
                    np.array([0.0, 10.0, 0.0, 0.0]), 0.0)
    scn.cam.aim()

    dt = np.float32
    sd = compile_scene(scn, dt)
    assert sd.has_transparent
    cd = scn.cam.data(dt)
    R = RT * 16
    w = h = int(np.sqrt(R))
    xx, yy = _pixel_grid(w, h, np.dtype(dt))
    x, y = jnp.asarray(xx.ravel()), jnp.asarray(yy.ravel())
    key = jax.random.PRNGKey(3)

    outs = {}
    for compact in (0, 4):
        opts = RenderOptions(width=w, height=h, samples=1, tile=R,
                             compact=compact, max_optic_depth=6)
        o, v = gen_rays(cd, x, y, key, opts, "center", False, False)
        c, d, n = jax.jit(render_rays, static_argnames="opts")(
            sd, o, v, key, opts)
        outs[compact] = (np.asarray(c), np.asarray(d), int(n))
    c0, d0, n0 = outs[0]
    c4, d4, n4 = outs[4]
    assert n0 == n4
    assert n0 > R * 1.05           # refraction/reflection actually happened
    np.testing.assert_array_equal(d0, d4)
    np.testing.assert_allclose(c0, c4, atol=1e-6)


def test_early_exit_winners_identical(monkeypatch):
    """The front-to-back early exit over reach-sorted candidate lists
    (pallas_trace._EARLY_EXIT, the kd-traversal near-to-far break,
    kd-tree.c:534-590) skips only candidates whose reach lower bound
    exceeds every live lane's current-best t, so closest-hit winners are
    BIT-identical with it on or off; shadow winners may differ only
    beyond the limit cap, where the same-point test fails either way."""
    from ndt_tpu.render import pallas_trace as pt
    from ndt_tpu.render import trace as trace_mod
    from ndt_tpu.render.engine import gen_rays

    mod = get_scene("balls")
    scn = Scene("balls", 4)
    mod.scene_setup(scn, 4, 0, 1500)
    if hasattr(mod, "scene_cleanup"):
        mod.scene_cleanup()
    scn.cam.aim()
    sd = compile_scene(scn, np.float32)
    dt = np.float32
    cd = scn.cam.data(dt)
    xx, yy = _pixel_grid(64, 48, np.dtype(dt))
    opts = RenderOptions(width=64, height=48, samples=1, tile=64 * 48)
    o, v = gen_rays(cd, jnp.asarray(xx.ravel()), jnp.asarray(yy.ravel()),
                    jax.random.PRNGKey(0), opts, "center", False, False)
    limit = jnp.full(o.shape[0], 30.0, dt)

    results = {}
    trace_mod.set_trace_impl("pallas-interpret")
    try:
        monkeypatch.setattr(pt, "_EE_MIN_OBJECTS", 0)
        monkeypatch.setattr(pt, "_EE_INTERPRET", True)
        for ee in (True, False):
            monkeypatch.setattr(pt, "_EARLY_EXIT", ee)
            jax.clear_caches()
            tr = trace_mod.trace(sd, o, v, need_normal=True)
            sh = trace_mod.shadow_trace(sd, o, v, limit)
            results[ee] = (tr, sh)
    finally:
        trace_mod.set_trace_impl("auto")
        jax.clear_caches()

    (tr1, sh1), (tr0, sh0) = results[True], results[False]
    np.testing.assert_array_equal(np.asarray(tr1.t), np.asarray(tr0.t))
    np.testing.assert_array_equal(np.asarray(tr1.mat_id),
                                  np.asarray(tr0.mat_id))
    np.testing.assert_array_equal(np.asarray(tr1.normal),
                                  np.asarray(tr0.normal))
    cap = 30.0 * 1.001 + 0.01
    within = np.asarray(sh0.t) <= cap
    np.testing.assert_array_equal(np.asarray(sh1.t)[within],
                                  np.asarray(sh0.t)[within])
    np.testing.assert_array_equal(np.asarray(sh1.mat_id)[within],
                                  np.asarray(sh0.mat_id)[within])
    assert (np.asarray(sh1.t)[~within] > cap).all()


def test_stack_mode_submap_matches_full_width(monkeypatch):
    """Stack-mode batches above engine._STACK_TILE run as a lax.map over
    sub-batches (a 1080p refractive frame at full width exceeds HBM);
    with a deterministic scene (no area lights) the split render is
    bit-identical to the one-shot render."""
    import ndt_tpu.render.engine as eng
    from ndt_tpu.render.engine import gen_rays, render_rays
    from ndt_tpu.render.pallas_trace import RT

    scn = Scene("submap_t", 4)
    scn.ambient[:] = 0.2
    lgt = scn.add_light()
    lgt.pos = np.array([0.0, 50.0, 0.0, 0.0])
    lgt.set_color(200, 200, 200)
    floor = scn.add_object("hplane").set_color(.6, .6, .6)
    floor.add_pos(np.array([0.0, -5.0, 0.0, 0.0]))
    floor.add_dir(np.array([0.0, 1.0, 0.0, 0.0]))
    glass = scn.add_object("sphere").set_color(.2, .2, .7)
    glass.transparent = 1
    glass.refract_index = 1.44
    glass.add_pos(np.array([0.0, 2.0, -20.0, 0.0]))
    glass.add_size(3.0)
    scn.cam.set_aim(np.array([0.0, 5.0, 20.0, 0.0]), np.zeros(4),
                    np.array([0.0, 10.0, 0.0, 0.0]), 0.0)
    scn.cam.aim()

    dt = np.float32
    sd = compile_scene(scn, dt)
    assert sd.has_transparent
    cd = scn.cam.data(dt)
    R = RT * 4
    w, h = RT // 32, 128
    xx, yy = _pixel_grid(w, h, np.dtype(dt))
    x, y = jnp.asarray(xx.ravel()), jnp.asarray(yy.ravel())
    key = jax.random.PRNGKey(5)
    opts = RenderOptions(width=w, height=h, samples=1, tile=R,
                         max_optic_depth=6)
    o, v = gen_rays(cd, x, y, key, opts, "center", False, False)

    outs = {}
    for cap in (R, R // 4):
        monkeypatch.setattr(eng, "_STACK_TILE", cap)
        jax.clear_caches()
        c, d, n = jax.jit(render_rays, static_argnames="opts")(
            sd, o, v, key, opts)
        outs[cap] = (np.asarray(c), np.asarray(d), int(n))
    jax.clear_caches()
    (c1, d1, n1), (c4, d4, n4) = outs[R], outs[R // 4]
    assert n1 == n4
    np.testing.assert_array_equal(d1, d4)
    np.testing.assert_array_equal(c1, c4)


def test_chunked_facets_trace_matches_jnp(monkeypatch):
    """Facet/hfacet families now chunk like every other family
    (compile._pack_chunked) instead of falling back to a dense [R, N] jnp
    merge per trace call -- which made dense facet-bearing scenes
    pathologically slow.  Force chunking on a mixed scene with both facet
    families and compare the interpret-mode megakernel's merged winners
    against the jnp path."""
    from ndt_tpu.render import trace as trace_mod
    from ndt_tpu.scene import compile as compile_mod

    rng = np.random.RandomState(7)
    scn = Scene("fctmix", 4)
    scn.ambient[:] = 0.2
    lgt = scn.add_light()
    lgt.pos = np.array([0.0, 50.0, 10.0, 0.0])
    lgt.set_color(200, 200, 200)
    for i in range(6):
        s = scn.add_object("sphere").set_color(.7, .3, .3)
        s.add_pos(np.array([i * 3.0 - 7.5, 1.0, -18.0, 0.0]))
        s.add_size(1.2)
    for i in range(8):
        base = np.array([rng.uniform(-8, 8), rng.uniform(-2, 6),
                         rng.uniform(-26, -14), 0.0])
        fct = scn.add_object("facet" if i % 2 else "hfacet")
        fct.set_color(.3, .6, .3)
        for j in range(3):
            fct.add_pos(base + np.concatenate(
                [rng.uniform(-2, 2, 3), [0.0]]))
        for j in range(3):
            fct.add_dir(np.array([0.0, 1.0, 0.0, 0.0]))
        fct.add_flag(0)
    scn.cam.set_aim(np.array([0.0, 4.0, 12.0, 0.0]),
                    np.array([0.0, 0.0, -20.0, 0.0]),
                    np.array([0.0, 10.0, 0.0, 0.0]), 0.0)
    scn.cam.aim()
    monkeypatch.setattr(compile_mod, "_SMEM_BUDGET", 6 * 1024)
    sd = compile_scene(scn, np.float32)
    assert len(sd.pmeta) >= 2            # actually chunked
    assert any(m.n_fct or m.n_hf for m in sd.pmeta)

    dt = np.float32
    cd = scn.cam.data(dt)
    xx, yy = _pixel_grid(64, 48, np.dtype(dt))
    from ndt_tpu.render.engine import gen_rays

    opts = RenderOptions(width=64, height=48, samples=1, tile=64 * 48)
    o, v = gen_rays(cd, jnp.asarray(xx.ravel()), jnp.asarray(yy.ravel()),
                    jax.random.PRNGKey(0), opts, "center", False, False)

    trace_mod.set_trace_impl("pallas-interpret")
    try:
        tr_p = trace_mod.trace(sd, o, v, need_normal=True)
        sh_p = trace_mod.shadow_trace(sd, o, v,
                                      jnp.full(o.shape[0], 100.0, dt))
    finally:
        trace_mod.set_trace_impl("jnp")
    try:
        tr_j = trace_mod.trace(sd, o, v, need_normal=True)
        sh_j = trace_mod.shadow_trace(sd, o, v,
                                      jnp.full(o.shape[0], 100.0, dt))
    finally:
        trace_mod.set_trace_impl("auto")

    hit_p, hit_j = np.asarray(tr_p.hit), np.asarray(tr_j.hit)
    assert hit_p.any()
    assert (hit_p == hit_j).mean() > 0.999   # knife-edge margins may differ
    agree = hit_p & hit_j
    np.testing.assert_allclose(np.asarray(tr_p.t)[agree],
                               np.asarray(tr_j.t)[agree], rtol=2e-4,
                               atol=2e-3)
    assert (np.asarray(tr_p.mat_id)[agree]
            == np.asarray(tr_j.mat_id)[agree]).mean() > 0.999
    s_agree = np.asarray(sh_p.hit) & np.asarray(sh_j.hit)
    assert (np.asarray(sh_p.mat_id)[s_agree]
            == np.asarray(sh_j.mat_id)[s_agree]).mean() > 0.999


def test_chain_compaction_pads_nondivisible_width():
    """Batch widths that don't divide the compaction quantum (e.g.
    per-shard slices of a mesh-sharded 1080p frame) pad with dead lanes
    instead of silently losing compaction (engine._pad_dead): identical
    colors/depth/ray counts vs the full-width loop, and outputs sliced
    back to the caller's width."""
    from ndt_tpu.render.engine import gen_rays, render_rays
    from ndt_tpu.render.pallas_trace import RT

    scn = Scene("compact_pad", 4)
    scn.ambient[:] = 0.2
    lgt = scn.add_light()
    lgt.pos = np.array([0.0, 50.0, 0.0, 0.0])
    lgt.set_color(200, 200, 200)
    floor = scn.add_object("hplane").set_color(.6, .6, .6)
    floor.set_reflect(.4, .4, .4)
    floor.add_pos(np.array([0.0, -5.0, 0.0, 0.0]))
    floor.add_dir(np.array([0.0, 1.0, 0.0, 0.0]))
    s = scn.add_object("sphere").set_color(.7, .2, .2)
    s.set_reflect(.5, .5, .5)
    s.add_pos(np.array([0.0, 2.0, -20.0, 0.0]))
    s.add_size(3.0)
    scn.cam.set_aim(np.array([0.0, 5.0, 20.0, 0.0]), np.zeros(4),
                    np.array([0.0, 10.0, 0.0, 0.0]), 0.0)
    scn.cam.aim()

    dt = np.float32
    sd = compile_scene(scn, dt)
    cd = scn.cam.data(dt)
    q = RT * 4 * 4
    R = q + 512                    # not a quantum multiple
    w, h = 512, R // 512
    assert w * h == R
    xx, yy = _pixel_grid(w, h, np.dtype(dt))
    x, y = jnp.asarray(xx.ravel()), jnp.asarray(yy.ravel())
    key = jax.random.PRNGKey(9)

    outs = {}
    for compact in (0, 4):
        opts = RenderOptions(width=w, height=h, samples=1, tile=R,
                             compact=compact, max_optic_depth=8)
        o, v = gen_rays(cd, x, y, key, opts, "center", False, False)
        c, d, n = jax.jit(render_rays, static_argnames="opts")(
            sd, o, v, key, opts)
        outs[compact] = (np.asarray(c), np.asarray(d), int(n))
    c0, d0, n0 = outs[0]
    c4, d4, n4 = outs[4]
    assert c4.shape == (R, 3) and d4.shape == (R,)
    assert n0 == n4                # dead pad lanes trace nothing
    assert n0 > R                  # reflections actually happened
    np.testing.assert_array_equal(d0, d4)
    np.testing.assert_allclose(c0, c4, atol=1e-6)


def test_adaptive_ladder_widths():
    """engine._level_widths builds the geometric compaction ladder: each
    width holds whole 256-lane blocks and at least one RT-ray kernel tile,
    so every level's block gather and trace tiling stay aligned."""
    from ndt_tpu.render.engine import _BLK, _level_widths
    from ndt_tpu.render.pallas_trace import RT

    q = RT * 16                    # the compaction quantum at compact=4
    ws = _level_widths(5 * q, 4)   # the anim6d@480p batch: 327680 rays
    assert ws[0] == 5 * q
    for a, b in zip(ws, ws[1:]):
        assert a == 4 * b
        assert b % _BLK == 0 and b >= RT
    assert len(ws) >= 3            # deep tails get a genuinely narrow loop
    # a batch not divisible a level deeper stops the ladder early
    assert _level_widths(RT * 4, 4) == [RT * 4, RT]


def test_stack_ladder_sparse_live0_keeps_depth():
    """A mostly-dead tail sub-batch (live0 from render_rays' lax.map
    chunking) starts BELOW the first ladder cap, so the ladder descends
    before the primary iteration has run -- the depth map written by the
    child levels must survive the merges (depth travels with the gathered
    lanes, engine._compact_descend).  Regression: the first ladder cut
    treated the child depth buffer as scratch and returned an all-zero
    depth map for such batches."""
    from ndt_tpu.render.engine import (RenderOptions, _render_rays_stack,
                                       gen_rays)
    from ndt_tpu.render.pallas_trace import RT

    scn = Scene("sparse_t", 4)
    scn.ambient[:] = 0.2
    lgt = scn.add_light()
    lgt.pos = np.array([0.0, 50.0, 0.0, 0.0])
    lgt.set_color(200, 200, 200)
    floor = scn.add_object("hplane").set_color(.6, .6, .6) \
        .set_reflect(.3, .3, .3)
    floor.add_pos(np.array([0.0, -5.0, 0.0, 0.0]))
    floor.add_dir(np.array([0.0, 1.0, 0.0, 0.0]))
    glass = scn.add_object("sphere").set_color(.2, .2, .7)
    glass.transparent = 1
    glass.refract_index = 1.44
    glass.add_pos(np.array([0.0, 2.0, -20.0, 0.0]))
    glass.add_size(3.0)
    scn.cam.set_aim(np.array([0.0, 5.0, 20.0, 0.0]), np.zeros(4),
                    np.array([0.0, 10.0, 0.0, 0.0]), 0.0)
    scn.cam.aim()

    dt = np.float32
    sd = compile_scene(scn, dt)
    assert sd.has_transparent
    cd = scn.cam.data(dt)
    R = RT * 16                    # exactly the compaction quantum
    w = h = int(np.sqrt(R))
    xx, yy = _pixel_grid(w, h, np.dtype(dt))
    x, y = jnp.asarray(xx.ravel()), jnp.asarray(yy.ravel())
    key = jax.random.PRNGKey(3)
    nlive = 500                    # < R/4: the ladder descends immediately
    live0 = jnp.arange(R) < nlive

    outs = {}
    for compact in (0, 4):
        opts = RenderOptions(width=w, height=h, samples=1, tile=R,
                             compact=compact, max_optic_depth=6)
        o, v = gen_rays(cd, x, y, key, opts, "center", False, False)
        c, d, n = jax.jit(_render_rays_stack, static_argnames="opts")(
            sd, o, v, key, opts, live0=live0)
        outs[compact] = (np.asarray(c), np.asarray(d), int(n))
    c0, d0, n0 = outs[0]
    c4, d4, n4 = outs[4]
    assert n0 == n4
    assert d0[:nlive].max() > 0    # the primary rays actually hit
    # live lanes must agree exactly; dead lanes are sliced off by callers
    np.testing.assert_array_equal(d0[:nlive], d4[:nlive])
    np.testing.assert_allclose(c0[:nlive], c4[:nlive], atol=1e-6)


def test_escalation_nondivisible_width_pads_live0():
    """render_rays on a TRANSPARENT scene at a width that doesn't divide
    the compaction quantum: the escalation taint set (live0, caller-width
    R0) must pad alongside the ray buffers before being ANDed with the
    pad-lane mask.  Regression: `live0 & ~dead` raised a broadcast error
    (307200 vs 327680) on every bench-shaped f32 escalated render --
    e.g. random150 at 640x480 (engine._render_rays_stack)."""
    from ndt_tpu.render.engine import gen_rays, render_rays
    from ndt_tpu.render.pallas_trace import RT

    scn = Scene("esc_pad", 4)
    scn.ambient[:] = 0.2
    lgt = scn.add_light()
    lgt.pos = np.array([0.0, 50.0, 0.0, 0.0])
    lgt.set_color(200, 200, 200)
    floor = scn.add_object("hplane").set_color(.6, .6, .6) \
        .set_reflect(.3, .3, .3)
    floor.add_pos(np.array([0.0, -5.0, 0.0, 0.0]))
    floor.add_dir(np.array([0.0, 1.0, 0.0, 0.0]))
    glass = scn.add_object("sphere").set_color(.2, .2, .7)
    glass.transparent = 1
    glass.refract_index = 1.44
    glass.add_pos(np.array([0.0, 2.0, -20.0, 0.0]))
    glass.add_size(3.0)
    scn.cam.set_aim(np.array([0.0, 5.0, 20.0, 0.0]), np.zeros(4),
                    np.array([0.0, 10.0, 0.0, 0.0]), 0.0)
    scn.cam.aim()

    dt = np.float32
    sd = compile_scene(scn, dt)
    assert sd.has_transparent
    cd = scn.cam.data(dt)
    q = RT * 4 * 4
    R = q + 512                    # NOT a quantum multiple
    w, h = 512, R // 512
    xx, yy = _pixel_grid(w, h, np.dtype(dt))
    x, y = jnp.asarray(xx.ravel()), jnp.asarray(yy.ravel())
    key = jax.random.PRNGKey(5)

    outs = {}
    for compact in (0, 4):
        opts = RenderOptions(width=w, height=h, samples=1, tile=R,
                             compact=compact, max_optic_depth=6)
        o, v = gen_rays(cd, x, y, key, opts, "center", False, False)
        c, d, n = jax.jit(render_rays, static_argnames="opts")(
            sd, o, v, key, opts)
        outs[compact] = (np.asarray(c), np.asarray(d), int(n))
    c0, d0, n0 = outs[0]
    c4, d4, n4 = outs[4]
    assert c4.shape == (R, 3) and d4.shape == (R,)
    assert d0.max() > 0
    np.testing.assert_array_equal(d0, d4)
    np.testing.assert_allclose(c0, c4, atol=1e-6)
