"""Golden parity for BASELINE configs 4 and 5:

  4. cluster objects with a kmeans bounding hierarchy in a 5-D scene
     (objects/cluster.c + kmeans.c) — the 'cluster5d' fixture;
  5. a YAML-defined 6-D animated multi-frame scene with tiles sharded
     across the device mesh (scenes/yaml.c + scene.c YAML serde + MPI row
     mode) — the 'anim6d' fixture dumped to YAML and rendered back.

Goldens were rendered by the patched C reference (scenes/cluster5d.c,
scenes/anim6d.c in the round's /tmp/refsrc; see
.claude/skills/verify/SKILL.md).  f64 renders reproduce the C bit-exactly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndt_tpu.image_io import linear_to_bytes
from ndt_tpu.render.engine import RenderOptions, _pixel_grid, render_tile
from ndt_tpu.scene.compile import compile_scene
from ndt_tpu.scene.model import Scene
from ndt_tpu.scenes import get_scene

from conftest import load_golden


def _render_band(scn, width, height, rows):
    scn.cam.aim()
    dt = np.dtype("float64")
    sd = compile_scene(scn, dt)
    cd = scn.cam.data(dt.type)
    cd = dataclasses.replace(cd, dir_x=cd.dir_x * dt.type(width / height))
    xx, yy = _pixel_grid(width, height, dt)
    xb, yb = xx[rows].ravel(), yy[rows].ravel()
    opts = RenderOptions(width=width, height=height, samples=1,
                         tile=len(xb), dtype="float64")
    c, _, _ = render_tile(sd, cd, jnp.asarray(xb), jnp.asarray(yb),
                          jax.random.PRNGKey(0), opts, "center")
    return linear_to_bytes(
        np.asarray(c).reshape(-1, width, 3)).astype(np.float64) / 255.0


def _setup(scene_key, dim, frame=0, total=None, config=None):
    mod = get_scene(scene_key)
    scn = Scene(scene_key, dim)
    total = total if total is not None else mod.scene_frames(dim, config)
    mod.scene_setup(scn, dim, frame, total, config)
    return scn


def _rmse(a, b):
    return float(np.sqrt(((a - b) ** 2).mean()))


def test_cluster5d_golden():
    """Config 4: 40 spheres inside a cluster object, k=4, 5-D."""
    rows = slice(80, 150)
    scn = _setup("cluster5d", 5)
    assert scn.objects[1].type_name == "cluster"
    assert len(scn.objects[1].children) == 40
    mine = _render_band(scn, 320, 240, rows)
    ref = load_golden("cluster5d_5d_320x240_f0.png")[rows]
    assert _rmse(mine, ref) < 1e-3
    assert (np.abs(mine - ref).max(axis=-1) > 1 / 255.0).sum() == 0


def test_cluster5d_scene_cluster_wrap_is_transparent():
    """scene.cluster(k) (scene_cluster, scene.c:252-340) regroups objects
    into a kmeans hierarchy without changing the image."""
    rows = slice(110, 130)
    scn = _setup("cluster5d", 5)
    plain = _render_band(scn, 320, 240, rows)
    scn2 = _setup("cluster5d", 5)
    scn2.cluster(3)
    wrapped = _render_band(scn2, 320, 240, rows)
    np.testing.assert_array_equal(plain, wrapped)


@pytest.mark.parametrize("frame", [0, 1, 3])
def test_anim6d_golden_frames(frame):
    """Config 5 geometry: the 6-D animated fixture matches the C across
    frames (orbiting sphere leaves/reenters the visible 3-flat)."""
    rows = slice(30, 90)
    scn = _setup("anim6d", 6, frame=frame, total=4)
    mine = _render_band(scn, 160, 120, rows)
    ref = load_golden(f"anim6d_6d_160x120_f{frame}.png")[rows]
    assert _rmse(mine, ref) < 1e-3


def test_anim6d_yaml_roundtrip_golden(tmp_path):
    """Config 5 proper: dump all 4 frames as a multi-document YAML stream,
    load a middle frame back through the 'yaml' scene, render, compare."""
    from ndt_tpu.scenes import anim6d

    path = str(tmp_path / "anim6d.yaml")
    n = anim6d.write_yaml_frames(path, 6)
    assert n == 4

    mod = get_scene("yaml")
    assert mod.scene_frames(6, path) == 4
    scn = Scene("anim6d", 6)
    mod.scene_setup(scn, 6, 2, 4, path)
    assert scn.dim == 6
    rows = slice(30, 90)
    mine = _render_band(scn, 160, 120, rows)
    ref = load_golden("anim6d_6d_160x120_f2.png")[rows]
    assert _rmse(mine, ref) < 1e-3


def test_anim6d_yaml_sharded_full_frame(tmp_path):
    """Config 5 end-to-end: YAML frame rendered with pixel tiles sharded
    across the 8-device CPU mesh (the MPI row-mode analogue), full frame."""
    from ndt_tpu.parallel.mesh import make_pixel_mesh, render_grid_sharded
    from ndt_tpu.scenes import anim6d

    path = str(tmp_path / "anim6d.yaml")
    anim6d.write_yaml_frames(path, 6)
    mod = get_scene("yaml")
    scn = Scene("anim6d", 6)
    mod.scene_setup(scn, 6, 1, 4, path)
    scn.cam.aim()

    width, height = 160, 120
    dt = np.dtype("float64")
    sd = compile_scene(scn, dt)
    cd = scn.cam.data(dt.type)
    cd = dataclasses.replace(cd, dir_x=cd.dir_x * dt.type(width / height))
    xx, yy = _pixel_grid(width, height, dt)
    opts = RenderOptions(width=width, height=height, samples=1,
                         tile=width * height, dtype="float64")
    mesh = make_pixel_mesh()
    c, _, _ = render_grid_sharded(sd, cd, jnp.asarray(xx.ravel()),
                                  jnp.asarray(yy.ravel()),
                                  jax.random.PRNGKey(0), opts, mesh)
    mine = linear_to_bytes(
        np.asarray(c).reshape(height, width, 3)).astype(np.float64) / 255.0
    ref = load_golden("anim6d_6d_160x120_f1.png")
    assert _rmse(mine, ref) < 1e-3
