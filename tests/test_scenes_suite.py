"""Every workload scene builds, compiles, and renders a tiny frame; YAML
round-trips; the CLI drives end to end."""

import os

import numpy as np
import pytest

from ndt_tpu.render.engine import RenderOptions, render_frame
from ndt_tpu.scene.compile import compile_scene
from ndt_tpu.scene.model import Scene
from ndt_tpu.scenes import get_scene, scene_names


@pytest.mark.parametrize("name,dim", [
    ("test", 4), ("empty", 4), ("balls", 4), ("hypercube", 4),
    ("hypercube-points", 4), ("random", 5), ("nelder-mead", 4),
    ("hypercube", 3), ("random", 4),
])
def test_scene_builds_and_renders(name, dim):
    mod = get_scene(name)
    scn = Scene(name, dim)
    # random with the default 40 objects expands hcubes to 500+ leaves and
    # dominates suite wall-clock; 6 objects still exercises every code path
    # (bit-exact parity at 20 objects lives in test_goldens_extended)
    config = "6" if name == "random" else None
    frames = mod.scene_frames(dim, config) if hasattr(mod, "scene_frames") \
        else 300
    mod.scene_setup(scn, dim, 0, max(frames, 1), config)
    if hasattr(mod, "scene_cleanup"):
        mod.scene_cleanup()
    sd = compile_scene(scn, np.float32)
    assert sd.n_leaves > 0
    img, _, nrays = render_frame(
        scn, RenderOptions(width=24, height=16, samples=1, tile=512,
                           max_optic_depth=4))
    assert np.isfinite(img).all()
    assert nrays > 0


def test_hypercube_hcube_config():
    mod = get_scene("hypercube")
    scn = Scene("x", 4)
    mod.scene_setup(scn, 4, 10, 2400, "hcube")
    assert scn.name == "hcube"
    assert any(o.type_name == "hcube" for o in scn.objects)


def test_hypercube_walls_config():
    mod = get_scene("hypercube")
    scn = Scene("x", 4)
    mod.scene_setup(scn, 4, 0, 2400, "walls")
    assert scn.name.endswith("-reflect")
    assert sum(1 for o in scn.objects if o.type_name == "hplane") == 3


def test_balls_physics_deterministic():
    mod = get_scene("balls")
    s1 = Scene("b", 4)
    mod.scene_setup(s1, 4, 0, 1500)
    mod.scene_cleanup()
    s2 = Scene("b", 4)
    mod.scene_setup(s2, 4, 0, 1500)
    mod.scene_cleanup()
    p1 = [o.pos[0] for o in s1.objects if o.type_name == "sphere"][:100]
    p2 = [o.pos[0] for o in s2.objects if o.type_name == "sphere"][:100]
    np.testing.assert_array_equal(np.stack(p1), np.stack(p2))


def test_balls_physics_advances():
    mod = get_scene("balls")
    s1 = Scene("b", 4)
    mod.scene_setup(s1, 4, 0, 1500)
    s2 = Scene("b", 4)
    mod.scene_setup(s2, 4, 1, 1500)  # stateful: second call advances
    mod.scene_cleanup()
    p1 = np.stack([o.pos[0] for o in s1.objects if o.name.startswith("ball")])
    p2 = np.stack([o.pos[0] for o in s2.objects if o.name.startswith("ball")])
    assert np.abs(p1 - p2).max() > 0


def test_yaml_roundtrip(tmp_path):
    from ndt_tpu.scene.yaml_io import (scene_read_yaml, scene_write_yaml,
                                       scene_yaml_count_frames)

    mod = get_scene("test")
    scn = Scene("test", 4)
    mod.scene_setup(scn, 4, 0, 300)
    path = str(tmp_path / "scene.yaml")
    scene_write_yaml(scn, path)
    # append a second frame document
    mod2 = get_scene("empty")
    scn2 = Scene("empty", 4)
    mod2.scene_setup(scn2, 4, 0, 300)
    scene_write_yaml(scn2, path, append=True)

    assert scene_yaml_count_frames(path) == 2
    back = scene_read_yaml(path, 0)
    assert back.name == "test"
    assert back.dim == 4
    assert len(back.objects) == len(scn.objects)
    assert len(back.lights) == len(scn.lights)
    o0, b0 = scn.objects[1], back.objects[1]
    np.testing.assert_allclose(b0.pos[0], o0.pos[0])
    assert b0.transparent == o0.transparent
    np.testing.assert_allclose(b0.color, o0.color)
    # frame 1 is the empty scene
    assert scene_read_yaml(path, 1).name == "empty"

    # and the yaml scene module renders it
    ymod = get_scene("yaml")
    assert ymod.scene_frames(4, path) == 2
    scn3 = Scene("x", 4)
    ymod.scene_setup(scn3, 4, 0, 2, path)
    assert scn3.name == "test"
    img, _, _ = render_frame(
        scn3, RenderOptions(width=16, height=12, samples=1, tile=256,
                            max_optic_depth=3))
    assert np.isfinite(img).all()


def test_cli_end_to_end(tmp_path, monkeypatch):
    from ndt_tpu import cli

    monkeypatch.chdir(tmp_path)
    rc = cli.main(["-s", "empty", "-d", "4", "-r", "24x16", "-f", "0:0:300",
                   "-q", "fast"])
    assert rc == 0
    out = tmp_path / "images" / "empty" / "4d" / "24x16" / \
        "empty_24x16_0000.png"
    assert out.exists()


def test_cli_depth_and_yaml(tmp_path, monkeypatch):
    from ndt_tpu import cli

    monkeypatch.chdir(tmp_path)
    rc = cli.main(["-s", "empty", "-d", "3", "-r", "16x12", "-f", "0:0:300",
                   "-z", "-y", "-l", "3"])
    assert rc == 0
    assert (tmp_path / "images" / "empty" / "3d" / "16x12" / "depth" /
            "empty_16x12_0000.png").exists()
    assert (tmp_path / "yaml" / "empty" / "empty_00000.yaml").exists()


def test_cli_object_plugin_dir(tmp_path, monkeypatch):
    """-o loads custom object-type modules from a directory (the dlopen
    plugin dir, object.c:125-158): the module registers its type at import
    and a scene file can then build with it."""
    from ndt_tpu import cli

    objdir = tmp_path / "objects"
    objdir.mkdir()
    (objdir / "pair.py").write_text("""
import numpy as np
from ndt_tpu.scene.model import Object, ObjectTypeInfo, register_object_type

def expand_pair(obj):
    out = []
    for sgn in (-1.0, 1.0):
        s = Object(obj.dim, "sphere")
        s.add_pos(obj.pos[0] + sgn * obj.dir[0])
        s.add_size(obj.size[0])
        out.append(s)
    return out

register_object_type(ObjectTypeInfo(
    "pair", n_pos=1, n_dir=1, n_size=1, n_flag=0, n_obj=0,
    expand=expand_pair))
""")
    scene = tmp_path / "pairscene.py"
    scene.write_text("""
import numpy as np

def scene_setup(scn, dimensions, frame, frames, config=None):
    scn.name = "pairscene"
    p = scn.add_object("pair", "twin")
    p.add_pos(np.zeros(dimensions))
    d = np.zeros(dimensions); d[0] = 3.0
    p.add_dir(d)
    p.add_size(1.0)
    p.set_color(0.9, 0.3, 0.3)
    lgt = scn.add_light()
    pos = np.zeros(dimensions); pos[1] = 10.0
    lgt.pos = pos
    lgt.set_color(80, 80, 80)
    scn.ambient[:] = 0.4
    eye = np.zeros(dimensions); eye[2] = -12.0
    scn.cam.set_aim(eye, np.zeros(dimensions), None)
""")
    monkeypatch.chdir(tmp_path)
    rc = cli.main(["-s", str(scene), "-d", "3", "-r", "24x16", "-f",
                   "0:0:1", "-o", str(objdir)])
    assert rc == 0
    out = tmp_path / "images" / "pairscene" / "3d" / "24x16" / \
        "pairscene_24x16_0000.png"
    assert out.exists()
    img = np.asarray(__import__("PIL.Image", fromlist=["open"])
                     .open(out).convert("RGB"))
    assert img.max() > 0


def test_cli_frame_range_resume(tmp_path, monkeypatch):
    from ndt_tpu import cli

    monkeypatch.chdir(tmp_path)
    rc = cli.main(["-s", "empty", "-d", "3", "-r", "16x12", "-f", "2:3:300",
                   "-q", "fast"])
    assert rc == 0
    d = tmp_path / "images" / "empty" / "3d" / "16x12"
    assert not (d / "empty_16x12_0000.png").exists()
    assert (d / "empty_16x12_0002.png").exists()
    assert (d / "empty_16x12_0003.png").exists()
