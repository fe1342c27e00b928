"""The 'random' stress scene (scenes/random.c): N random objects of random
registered types with random materials (25% transparent), five lights --
the culling/valgrind workload (BASELINE.md config 3).  Object count via the
-u config string.  Uses the exact drand48/lrand48 stream like the C (though
type ORDER differs from the C's directory scan, so geometry is equivalent in
distribution, not bitwise)."""

from __future__ import annotations

import numpy as np

from ndt_tpu.scene.model import LightType, Scene, object_types, Object
from ndt_tpu.utils.drand48 import Drand48


def scene_frames(dimensions, config=None):
    return 300


def scene_setup(scn: Scene, dimensions, frame, frames, config=None):
    scn.name = "random"
    d = dimensions
    rng = Drand48(0)

    num_objs = 40
    if config:
        try:
            num_objs = int(config)
        except ValueError:
            pass

    scn.bg[:] = [0.3, 0.5, 0.75]

    types = object_types()

    def rand_component():
        return rng() * 10 + 2

    def rand_size():
        return rng() * 3 + 1

    i = 0
    while i < num_objs:
        rnd_type = types[rng.lrand48() % len(types)]
        if rnd_type == "cluster":  # needs sub-objects; C skips n_pos<=0
            continue
        obj = Object(d, rnd_type, f"{i}: {rnd_type}")
        info_counts = _param_counts(obj)
        n_pos, n_dir, n_size, n_flag = info_counts
        if n_pos <= 0:
            continue
        for _ in range(n_pos):
            obj.add_pos(np.array([rand_component() for _ in range(d)]))
        for _ in range(n_dir):
            v = np.array([rand_component() for _ in range(d)])
            v = v / np.linalg.norm(v)
            obj.add_dir(v)
        for _ in range(n_size):
            obj.add_size(rand_size())
        for _ in range(n_flag):
            obj.add_flag(1)
        obj.get_bounds()
        if obj.bounds_radius is not None and obj.bounds_radius < 0:
            continue  # reject infinite objects (random.c:104-110)
        obj.set_color(0.5 * rng() + 0.5, 0.5 * rng() + 0.5,
                      0.5 * rng() + 0.5)
        obj.set_reflect(0.25 * rng(), 0.25 * rng(), 0.25 * rng())
        obj.transparent = rng() < 0.25
        if obj.transparent:
            obj.refract_index = 1.0 + rng()
        scn.objects.append(obj)
        i += 1

    def vec(*comps):
        v = np.zeros(d)
        v[: len(comps)] = comps[:d]
        return v

    scn.cam.set_aim(vec(30, 30, -30, 30), vec(5, 5, 5, 5), None, 0.0)

    scn.add_light(LightType.AMBIENT).set_color(0.1, 0.1, 0.1)
    lgt = scn.add_light(LightType.POINT)
    lgt.pos = vec(10, 15, -15, 10)
    lgt.set_color(100, 100, 100)
    for _ in range(4):
        lgt = scn.add_light(LightType.POINT)
        lgt.pos = vec(rng() * 20 + 15, rng() * 20 + 15, rng() * 20 + 15,
                      rng() * 20 + 15)
        lgt.set_color(200, 200, 200)
    return 1


def _param_counts(obj):
    """Mirror each type's params() ABI call (flag-dependent counts use the
    same defaults the C's random scene hits: 1 flag each)."""
    t = obj.type_name
    if t == "sphere":
        return 1, 0, 1, 0
    if t == "hplane":
        return 1, 1, 0, 0
    if t == "hdisk":
        return 1, 1, 1, 0
    if t == "cylinder":
        return 2, 0, 1, 1
    if t == "hcylinder":
        return obj.dim - 1, 0, 1, 1
    if t == "orthotope":
        # flag[0] defaults to 1 direction when unset (orthotope.c:83-86);
        # the C adds the flag AFTER reading params, so n_dir resolves to 1
        obj.add_flag(1)
        return 1, 1, 0, 0
    if t in ("facet", "hfacet"):
        return 3, 3, 0, 1
    if t == "hcube":
        return 1, obj.dim, obj.dim, 0
    return 0, 0, 0, 0
