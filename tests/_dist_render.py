"""Shared helper for the multi-process distributed test: renders a small
deterministic frame through the sharded path so the parent (single-process)
and children (two jax.distributed processes) can compare outputs bit-exactly.

Must be importable without conftest (children run it standalone).
"""

import dataclasses

import numpy as np


def render_small(mesh, width=32, height=24, dim=4):
    import jax
    import jax.numpy as jnp

    from ndt_tpu.parallel.mesh import render_grid_sharded
    from ndt_tpu.render.engine import RenderOptions, _pixel_grid
    from ndt_tpu.scene.compile import compile_scene
    from ndt_tpu.scene.model import Scene
    from ndt_tpu.scenes import get_scene

    mod = get_scene("balls")
    scn = Scene("balls", dim)
    mod.scene_setup(scn, dim, 0, 1500)
    mod.scene_cleanup()
    scn.cam.aim()
    dt = np.float32
    sd = compile_scene(scn, dt)
    cd = scn.cam.data(dt)
    cd = dataclasses.replace(cd, dir_x=cd.dir_x * dt(width / height))
    opts = RenderOptions(width=width, height=height, samples=1,
                         tile=width * height)
    xx, yy = _pixel_grid(width, height, np.dtype(dt))
    key = jax.random.PRNGKey(0)
    color, depth, nrays = render_grid_sharded(
        sd, cd, jnp.asarray(xx.ravel()), jnp.asarray(yy.ravel()), key,
        opts, mesh)
    return np.asarray(color), np.asarray(depth), int(nrays)
