"""Mesh sharding: an 8-device CPU mesh must reproduce the single-device
render bit-for-bit (the TPU equivalent of MPI row mode, ndt.c:1438)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ndt_tpu.parallel.mesh import make_pixel_mesh, render_grid_sharded
from ndt_tpu.render.engine import RenderOptions, _pixel_grid, render_tile
from ndt_tpu.scene.compile import compile_scene
from ndt_tpu.scene.model import Scene


def _scene():
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
    scn.cam.aim()
    return scn


def test_eight_device_mesh_matches_single():
    assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
    scn = _scene()
    dt = np.float32
    sd = compile_scene(scn, dt)
    cd = scn.cam.data(dt)
    cd = dataclasses.replace(cd, dir_x=cd.dir_x * dt(32 / 24))
    xx, yy = _pixel_grid(32, 24, np.dtype(dt))
    x, y = xx.ravel(), yy.ravel()  # 768 rays, divisible by 8
    opts = RenderOptions(width=32, height=24, samples=1, tile=len(x))
    key = jax.random.PRNGKey(0)

    c1, d1, n1 = render_tile(sd, cd, jnp.asarray(x), jnp.asarray(y), key,
                             opts, "center")

    mesh = make_pixel_mesh(jax.devices()[:8])
    c8, d8, n8 = render_grid_sharded(sd, cd, x, y, key, opts, mesh)

    np.testing.assert_allclose(np.asarray(c8), np.asarray(c1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(d8), np.asarray(d1), atol=1e-6)
    assert int(n8) == int(n1)


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_cli_row_sharded_matches_default(tmp_path, monkeypatch):
    """-b r (mesh-sharded tiles) must produce the identical frame to the
    default single-device path."""
    from ndt_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    assert main(["-d", "3", "-f", "0:0", "-r", "64x48",
                 "-s", "lights3d"]) == 0
    plain = tmp_path / "images/lights3d/3d/64x48/lights3d_64x48_0000.png"
    data_plain = plain.read_bytes()
    plain.unlink()
    assert main(["-d", "3", "-f", "0:0", "-r", "64x48", "-b", "r",
                 "-s", "lights3d"]) == 0
    assert plain.read_bytes() == data_plain


def test_cli_frame_parallel_mode(tmp_path, monkeypatch):
    """-b f (FRAME mode): frames round-robin across the 8-device CPU mesh
    and all land on disk."""
    from ndt_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    assert main(["-d", "6", "-f", "0:3", "-r", "48x36", "-b", "f",
                 "-s", "anim6d"]) == 0
    for i in range(4):
        assert (tmp_path
                / f"images/anim6d/6d/48x36/anim6d_48x36_000{i}.png").exists()


def test_cli_yaml_snapshots_rerender(tmp_path, monkeypatch):
    """-y writes per-frame YAML snapshots (ndt.c:1798-1810) that re-render
    identically through the 'yaml' scene."""
    from ndt_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    assert main(["-d", "3", "-f", "0:0", "-r", "48x36",
                 "-s", "lights3d", "-y"]) == 0
    frame = tmp_path / "images/lights3d/3d/48x36/lights3d_48x36_0000.png"
    snap = tmp_path / "yaml/lights3d/lights3d_00000.yaml"
    assert snap.exists()
    data = frame.read_bytes()
    frame.unlink()
    assert main(["-d", "3", "-f", "0:0", "-r", "48x36",
                 "-s", "yaml", "-u", str(snap)]) == 0
    frame2 = tmp_path / "images/lights3d/3d/48x36/lights3d_48x36_0000.png"
    assert frame2.read_bytes() == data


def test_cli_num_processes_implies_multihost(tmp_path, monkeypatch):
    """--num-processes/--process-id without --multihost must still run the
    distributed bootstrap (silently ignoring them would have every rank
    render the whole job as process 0)."""
    import ndt_tpu.parallel.distributed as dist
    from ndt_tpu.cli import main

    calls = []

    def fake_init(coordinator=None, num_processes=None, process_id=None,
                  local_device_ids=None):
        calls.append((coordinator, num_processes, process_id))
        return 0, 1

    monkeypatch.setattr(dist, "init_distributed", fake_init)
    monkeypatch.chdir(tmp_path)
    assert main(["-s", "empty", "-d", "3", "-r", "16x12", "-f", "0:0:300",
                 "--num-processes", "1", "--process-id", "0"]) == 0
    assert calls == [(None, 1, 0)]


def test_sharded_adaptive_sampling_matches_single_device():
    """-b r now composes with -n samples: the adaptive convergence
    sampler's per-round batches shard over the mesh, and the result must
    be bit-identical to the single-device adaptive render (same keys,
    same convergence path)."""
    import dataclasses

    from ndt_tpu.render.engine import RenderOptions, render_frame
    from ndt_tpu.parallel.mesh import make_pixel_mesh

    def scene():
        from ndt_tpu.scene.model import Scene

        scn = Scene("mini", 4)
        s = scn.add_object("sphere", "ball")
        s.add_pos(np.array([0, 0, 10.0, 0])).add_size(2.0)
        s.set_color(0.9, 0.2, 0.2)
        floor = scn.add_object("hplane", "floor")
        floor.add_pos(np.array([0, -3.0, 0, 0]))
        floor.add_dir(np.array([0, 1.0, 0, 0]))
        floor.set_color(0.5, 0.5, 0.5)
        scn.ambient[:] = 0.3
        lgt = scn.add_light()
        lgt.pos = np.array([5.0, 10.0, 0, 0])
        lgt.set_color(50, 50, 50)
        scn.cam.set_aim(np.array([0, 2.0, -8.0, 0]),
                        np.array([0, 0, 10.0, 0]),
                        np.array([0, 1.0, 0, 0]))
        return scn

    opts1 = RenderOptions(width=24, height=16, samples=3, adaptive=True,
                          tile=24 * 16)
    img1, _, n1 = render_frame(scene(), opts1)
    mesh = make_pixel_mesh(jax.devices()[:8])
    opts8 = dataclasses.replace(opts1, devices=mesh)
    img8, _, n8 = render_frame(scene(), opts8)
    assert n1 == n8
    np.testing.assert_array_equal(img1, img8)

    # -b r also composes with -w: the refinement midpoint batches shard
    # over the mesh and must stay bit-identical to the single-device path
    optsw1 = RenderOptions(width=24, height=16, samples=1, whitted=True,
                           aa_diff=4, aa_depth=2, tile=25 * 17)
    imgw1, _, nw1 = render_frame(scene(), optsw1)
    optsw8 = dataclasses.replace(optsw1, devices=mesh)
    imgw8, _, nw8 = render_frame(scene(), optsw8)
    # ray-trace counts are execution-layout-dependent (per-shard bounce
    # loops retire dead lanes at different iterations), so only the image
    # must match
    assert nw8 > 0
    np.testing.assert_array_equal(imgw1, imgw8)
