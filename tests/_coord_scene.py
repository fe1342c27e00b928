"""Deliberately rank-dependent scene for the coordinated FRAME-mode test:
the sphere color depends on jax.process_index() AT BUILD TIME, so replay
semantics (every process runs scene_setup) would give each rank a
different frame, while coordinator-built FRAME mode (-b f: process 0
builds + broadcasts, ndt.c:1831-1998) must make every rank render process
0's red sphere.

Must be importable without conftest (the distributed children run
standalone).
"""

import numpy as np


def scene_frames(dimensions, config=None):
    return 2


def scene_setup(scn, dimensions, frame, frames, config=None):
    import jax

    scn.name = "coord"
    d = dimensions

    def vec(*comps):
        v = np.zeros(d)
        v[: len(comps)] = comps[:d]
        return v

    scn.cam.set_aim(vec(0.0, 4.0, 20.0), vec(0.0, 0.0), vec(0, 10), 0.0)
    scn.ambient[:] = 0.3

    from ndt_tpu.scene.model import LightType

    pt = scn.add_light(LightType.POINT)
    pt.pos = vec(-10.0, 15.0, 10.0)
    pt.set_color(160, 160, 160)

    # the rank-dependent part: red iff built on the coordinator
    color = (0.9, 0.1, 0.1) if jax.process_index() == 0 else (0.1, 0.9, 0.1)
    sph = scn.add_object("sphere", "s")
    sph.set_color(*color)
    sph.add_pos(vec(0.0, 0.0, float(frame))).add_size(3.0)
    return 1
