"""Golden parity for the remaining deterministic feature axes:

* lights3d — SPOT cone + POINT + DIRECTIONAL light types, color AND the
  `-z` depth-map channel (normalize + byte pipeline, image.c:1019-1066);
* over/under stereo layout (`-m o`, ndt.c:601-611);
* Whitted recursive anti-aliasing (`-w -a 8,3`: corner grid pass +
  variance-driven recursive resample, ndt.c:655-733 / 900-1103).

Goldens rendered by the patched C reference (see
.claude/skills/verify/SKILL.md); f64 renders reproduce the C bit-exactly
(Whitted tolerance allows isolated recursion-boundary pixels).
"""

import numpy as np

from ndt_tpu.image_io import linear_to_bytes, normalize_depth
from ndt_tpu.render.engine import RenderOptions, render_frame
from ndt_tpu.scene.model import Scene
from ndt_tpu.scenes import get_scene

from conftest import load_golden


def _frame(scene_key, dim, opts, frame=0, total=None, config=None):
    mod = get_scene(scene_key)
    scn = Scene(scene_key, dim)
    total = total if total is not None else mod.scene_frames(dim, config)
    mod.scene_setup(scn, dim, frame, total, config)
    img, depth, _ = render_frame(scn, opts)
    return (linear_to_bytes(img).astype(np.float64) / 255.0, depth)


def _rmse(a, b):
    return float(np.sqrt(((a - b) ** 2).mean()))


def test_lights3d_color_and_depth_golden():
    opts = RenderOptions(width=200, height=150, samples=1, dtype="float64",
                         record_depth=True)
    mine, depth = _frame("lights3d", 3, opts)
    ref = load_golden("lights3d_3d_200x150_f0.png")
    assert _rmse(mine, ref) < 1e-3
    assert (np.abs(mine - ref).max(axis=-1) > 1 / 255.0).sum() == 0

    dmine = linear_to_bytes(
        np.repeat(normalize_depth(depth)[..., None], 3, axis=-1)
    ).astype(np.float64) / 255.0
    dref = load_golden("lights3d_3d_200x150_f0_depth.png")
    assert _rmse(dmine, dref) < 1e-3
    assert (np.abs(dmine - dref).max(axis=-1) > 1 / 255.0).sum() <= 2


def test_over_under_stereo_golden():
    opts = RenderOptions(width=160, height=120, samples=1, dtype="float64",
                         stereo="over")
    mine, _ = _frame("test", 4, opts, total=300)
    ref = load_golden("test_over_4d_160x120_f0.png")
    assert _rmse(mine, ref) < 1e-3


def test_whitted_aa_golden():
    opts = RenderOptions(width=160, height=120, samples=1, dtype="float64",
                         whitted=True, aa_diff=8, aa_depth=3)
    mine, _ = _frame("test", 4, opts, total=300)
    ref = load_golden("test_whitted_4d_160x120_f0.png")
    assert _rmse(mine, ref) < 2e-3


def test_hidef_stereo_golden_bands():
    """HIDEF 3D layout (ndt.c:613-630): 1920x2205, rows 0-1079 left eye,
    45 blank rows, rows 1125-2204 right eye, both at the 1080-row aspect.
    Band-compare one stripe from each eye against the C golden."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ndt_tpu.render.engine import RenderOptions, render_tile
    from ndt_tpu.scene.compile import compile_scene

    mod = get_scene("test")
    scn = Scene("test", 4)
    mod.scene_setup(scn, 4, 0, 300)
    scn.cam.aim()
    dt = np.dtype("float64")
    sd = compile_scene(scn, dt)
    cd = scn.cam.data(dt.type)
    cd = dataclasses.replace(cd, dir_x=cd.dir_x * dt.type(1920 / 1080.0))
    ref = load_golden("test_hidef_4d_1920x2205_f0.png")
    opts = RenderOptions(width=1920, height=2205, samples=1,
                         dtype="float64", stereo="hidef", tile=1 << 17)

    xs = (np.arange(1920, dtype=np.float64) / 1920 - 0.5)
    for j0, j1, base, eye in ((560, 600, 0, "left"),
                              (1685, 1725, 1125, "right")):
        jp = np.arange(j0, j1, dtype=np.float64) - base
        ys = -(jp / 1080.0 - 0.5)
        xg, yg = np.meshgrid(xs, ys)
        c, _, _ = render_tile(sd, cd, jnp.asarray(xg.ravel()),
                              jnp.asarray(yg.ravel()),
                              jax.random.PRNGKey(0),
                              dataclasses.replace(opts, tile=xg.size), eye)
        mine = linear_to_bytes(
            np.asarray(c).reshape(-1, 1920, 3)).astype(np.float64) / 255.0
        rmse = float(np.sqrt(((mine - ref[j0:j1]) ** 2).mean()))
        assert rmse < 1e-3, (eye, rmse)


def test_infinite_objects_golden():
    """Infinite cylinder (flag[1]=1) + infinite hcylinder (flag[0]=1):
    unbounded quadrics participate in closest hits AND in the shadow scan's
    infinite-first rank truncation (object.c:736-738)."""
    opts = RenderOptions(width=240, height=180, samples=1, dtype="float64")
    mine, _ = _frame("infinite4d", 4, opts)
    ref = load_golden("infinite4d_4d_240x180_f0.png")
    assert _rmse(mine, ref) < 1e-3
    assert (np.abs(mine - ref).max(axis=-1) > 1 / 255.0).sum() == 0
