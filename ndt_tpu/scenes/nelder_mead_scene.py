"""The 'nelder-mead' visualization scene (scenes/nelder-mead.c): runs the
minimal-bounding-sphere Nelder-Mead optimization over a random point cloud
and renders, per frame, the bounding points, the iterate history so far, and
the current simplex edges.  scene_frames runs the FULL optimization to count
iterations (nelder-mead.c scene_frames), 2 frames per iteration."""

from __future__ import annotations

import numpy as np

from ndt_tpu.scene.model import LightType, Scene
from ndt_tpu.utils.bounding import radius_about
from ndt_tpu.utils.drand48 import Drand48
from ndt_tpu.utils.nelder_mead import NelderMead

_N_POINTS = 12


def _make_points(dim):
    rng = Drand48(7)
    return [np.array([rng() * 20 - 10 for _ in range(dim)])
            for _ in range(_N_POINTS)]


def _run_nm(dim, max_iter=None):
    pts = [(p, 0.0) for p in _make_points(dim)]
    nm = NelderMead(dim).set_seed(np.mean([p for p, _ in pts], axis=0))
    history = []
    while not nm.done(1e-4, 1000):
        if max_iter is not None and nm.iterations >= max_iter:
            break
        x = nm.next_point()
        nm.add_result(x, radius_about(pts, x))
        history.append(x)
    return pts, nm, history


def scene_frames(dimensions, config=None):
    _, nm, history = _run_nm(dimensions)
    return max(2 * len(history), 2)


def scene_setup(scn: Scene, dimensions, frame, frames, config=None):
    scn.name = "nelder-mead"
    d = dimensions
    n_iter = max(frame // 2, 1)
    pts, nm, history = _run_nm(d, max_iter=n_iter)

    def vec(*comps):
        v = np.zeros(d)
        v[: len(comps)] = comps[:d]
        return v

    scn.cam.set_aim(vec(60, 25, 40, 0), vec(0, 0, 0, 0), vec(0, 10), 0.0)
    scn.bg[:] = [0.1, 0.1, 0.15]
    scn.ambient[:] = 0.3
    lgt = scn.add_light(LightType.POINT)
    lgt.pos = vec(30, 50, 20, 0)
    lgt.set_color(400, 400, 400)

    floor = scn.add_object("hplane", "floor")
    floor.set_color(0.7, 0.7, 0.7)
    floor.add_pos(vec(0, -15)).add_dir(vec(0, 1))

    # bounding points
    for k, (p, _) in enumerate(pts):
        s = scn.add_object("sphere", f"point {k}")
        s.set_color(0.9, 0.9, 0.2)
        s.add_pos(p).add_size(0.5)

    # iterate history
    for k, x in enumerate(history):
        s = scn.add_object("sphere", f"iterate {k}")
        s.set_color(0.2, 0.4, 0.9)
        s.add_pos(x).add_size(0.3)

    # current simplex edges
    if nm.points and len(nm.points) > 1:
        verts = nm.points
        for i in range(len(verts)):
            for j in range(i + 1, len(verts)):
                if np.linalg.norm(verts[i] - verts[j]) < 1e-9:
                    continue
                c = scn.add_object("cylinder", f"simplex {i}-{j}")
                c.set_color(0.9, 0.3, 0.3)
                c.add_pos(verts[i]).add_pos(verts[j])
                c.add_size(0.15).add_flag(1)

    # current best: the enclosing sphere itself, transparent
    center = nm.best_point()
    s = scn.add_object("sphere", "bounding sphere")
    s.set_color(0.3, 0.9, 0.3).set_reflect(0.1, 0.1, 0.1)
    s.add_pos(center).add_size(max(radius_about(pts, center), 1e-3))
    s.transparent = True
    s.refract_index = 1.01
    return 1
