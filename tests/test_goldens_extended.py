"""Extended golden parity vs the C reference binary: hypercube (both
configs), hypercube-points 6-D, random 5-D (bit-exact drand48 scene), VR /
pano cameras, and the side-by-side / anaglyph stereo layouts.

Goldens were rendered by the patched reference build (see
.claude/skills/verify/SKILL.md).  f64 renders reproduce the C (also f64)
to the byte on every scene below except isolated det-sign knife edges in
the orthotope EPSILON-shell (qc -= EPSILON, orthotope.c:203): the C's
qb*qb - 4*qa*qc cancels catastrophically at tangency while our Gram form
is cancellation-free, so 1-2 pixels per frame can legitimately flip.
Thresholds are set accordingly; f32 full-frame checks live in
test_render.py-style TPU runs and accept wider shell/silhouette noise.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndt_tpu.camera import CameraType
from ndt_tpu.image_io import linear_to_bytes
from ndt_tpu.render.engine import RenderOptions, _pixel_grid, render_tile
from ndt_tpu.scene.compile import compile_scene
from ndt_tpu.scene.model import Scene
from ndt_tpu.scenes import get_scene

from conftest import load_golden


def _band(scene_key, name, dim, width, height, golden, rows,
          config=None, cam_type=None, dtype="float64"):
    mod = get_scene(scene_key)
    scn = Scene(name, dim)
    total = mod.scene_frames(dim, config)
    mod.scene_setup(scn, dim, 0, total, config)
    if cam_type is not None:
        scn.cam.type = cam_type
        scn.cam.v_fov, scn.cam.h_fov = np.pi, 2 * np.pi  # ndt.c:1425-1426
    scn.cam.aim()
    dt = np.dtype(dtype)
    sd = compile_scene(scn, dt)
    cd = scn.cam.data(dt.type)
    cd = dataclasses.replace(cd, dir_x=cd.dir_x * dt.type(width / height))
    xx, yy = _pixel_grid(width, height, dt)
    xb, yb = xx[rows].ravel(), yy[rows].ravel()
    opts = RenderOptions(width=width, height=height, samples=1,
                         tile=len(xb), dtype=dtype)
    c, _, _ = render_tile(sd, cd, jnp.asarray(xb), jnp.asarray(yb),
                          jax.random.PRNGKey(0), opts, "center")
    mine = linear_to_bytes(np.asarray(c).reshape(-1, width, 3))
    ref = load_golden(golden)[rows]
    return mine.astype(np.float64) / 255.0, ref


def _rmse(a, b):
    return float(np.sqrt(((a - b) ** 2).mean()))


def test_hypercube_band_matches_c():
    """Default config: cluster of orthotope faces + cylinders + corner
    spheres; the flag=2 'edge' hcylinders must be invisible (C kd quirk,
    see compile._flatten) and the kd leaf-cell gate must clip/keep the
    orthotope shell hits exactly."""
    mine, ref = _band("hypercube", "hypercube", 4, 320, 240,
                      "hypercube_4d_320x240_f0.png", slice(60, 90))
    bad = (np.abs(mine - ref).max(axis=2) > 16 / 255).sum()
    assert bad <= 3, f"{bad} pixels deviate"
    assert _rmse(mine, ref) < 5e-3


def test_hypercube_hcube_band_matches_c():
    """config 'hcube': one hcube object expanded into orthotope faces that
    share the cube's kd item for the cell gate (hcube.c:236-249)."""
    mine, ref = _band("hypercube", "hcube", 4, 320, 240,
                      "hypercube_hcube_4d_320x240_f0.png", slice(60, 90),
                      config="hcube")
    bad = (np.abs(mine - ref).max(axis=2) > 16 / 255).sum()
    assert bad <= 3, f"{bad} pixels deviate"
    assert _rmse(mine, ref) < 5e-3


def test_hypercube_points_6d_matches_c():
    """6-D corner spheres + edge cylinders: f64 is bit-exact."""
    mine, ref = _band("hypercube-points", "hypercube_points", 6, 160, 120,
                      "hypercube_points_6d_160x120_f0.png", slice(0, 120))
    assert _rmse(mine, ref) == 0.0


def test_random_5d_matches_c():
    """Bit-exact scene build (unseeded glibc drand48 stream + the C's
    registry order) and bit-exact render."""
    mine, ref = _band("random", "random", 5, 320, 240,
                      "random_5d_320x240_f0.png", slice(60, 80),
                      config="20")
    assert _rmse(mine, ref) == 0.0


def test_vr_camera_matches_c():
    mine, ref = _band("test", "test", 4, 160, 120,
                      "test_vr_4d_160x120_f0.png", slice(0, 120),
                      cam_type=CameraType.VR)
    assert _rmse(mine, ref) == 0.0


def test_pano_camera_matches_c():
    """Pano at vFov=pi relies on the f64 tan(M_PI/2) sign (camera.c:540 --
    f32's pi/2 rounds up and flips the image, see camera.data)."""
    mine, ref = _band("test", "test", 4, 160, 120,
                      "test_pano_4d_160x120_f0.png", slice(0, 120),
                      cam_type=CameraType.PANO)
    assert _rmse(mine, ref) < 1e-3


@pytest.mark.parametrize("stereo,golden", [
    ("side", "test_side_4d_160x120_f0.png"),
    ("anaglyph", "test_anaglyph_4d_160x120_f0.png"),
])
def test_stereo_layouts_match_c(stereo, golden):
    from ndt_tpu.render.engine import render_frame

    mod = get_scene("test")
    scn = Scene("test", 4)
    mod.scene_setup(scn, 4, 0, 300)
    res = render_frame(scn, RenderOptions(width=160, height=120,
                                          stereo=stereo, dtype="float64",
                                          tile=1 << 14))
    mine = linear_to_bytes(res[0]).astype(np.float64) / 255.0
    ref = load_golden(golden)
    assert _rmse(mine, ref) < 1e-3


@pytest.mark.parametrize("frame", [12, 60])
def test_nelder_mead_scene_golden(frame):
    """scenes/nelder-mead.c mirror: the NM state machine transcription
    (utils/nelder_mead.py) reproduces the C's iterate sequence exactly --
    410 frames (205 iterations) for the default 20-point unseeded-drand48
    3-D cloud -- so the rendered trail/simplex frames are bit-identical."""
    from ndt_tpu.render.engine import render_tile
    from ndt_tpu.scenes import nelder_mead_scene

    nelder_mead_scene.scene_cleanup()
    mod = get_scene("nelder-mead")
    total = mod.scene_frames(3, None)
    assert total == 410            # 205 iterations, same as the C
    scn = Scene("nelder-mead", 3)
    mod.scene_setup(scn, 3, frame, total)
    nelder_mead_scene.scene_cleanup()
    scn.cam.aim()
    dt = np.dtype("float64")
    sd = compile_scene(scn, dt)
    cd = scn.cam.data(dt.type)
    cd = dataclasses.replace(cd, dir_x=cd.dir_x * dt.type(200 / 150))
    xx, yy = _pixel_grid(200, 150, dt)
    opts = RenderOptions(width=200, height=150, samples=1,
                         tile=xx.size, dtype="float64")
    c, _, _ = render_tile(sd, cd, jnp.asarray(xx.ravel()),
                          jnp.asarray(yy.ravel()),
                          jax.random.PRNGKey(0), opts, "center")
    mine = linear_to_bytes(
        np.asarray(c).reshape(150, 200, 3)).astype(np.float64) / 255.0
    ref = load_golden(f"nelder_mead_3d_200x150_f{frame}.png")
    assert _rmse(mine, ref) < 1e-3
    assert (np.abs(mine - ref).max(axis=-1) > 1 / 255.0).sum() == 0
