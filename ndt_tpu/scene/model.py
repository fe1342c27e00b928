"""Host-side scene object model: the builder API users construct scenes with.

Rebuild of the reference's generic ``object`` struct + plugin registry
(object.h:23-74, object.c:51-158) and ``scene``/``light`` structs
(scene.h:16-62).  The dlopen plugin registry becomes a Python type registry:
each object type declares its parameter schema (how many positions,
directions, sizes, flags, sub-objects it needs -- the ``params`` ABI call,
objects/object.h:16) and the scene compiler (scene/compile.py) maps types
onto vectorized device intersectors.

All arrays here are numpy float64 -- scene construction is host work, exactly
like the C.  Transforms (move/rotate/rotate2) mirror object.c:518-580.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Dict, List, Optional

import numpy as np

from ndt_tpu import mathnd
from ndt_tpu.camera import Camera
from ndt_tpu.constants import EPSILON


@dataclasses.dataclass(frozen=True)
class ObjectTypeInfo:
    """Parameter schema for an object type (objects/object.h:12-20).

    Counts may be fixed ints or callables ``f(obj) -> int`` for types whose
    parameter count depends on dimension/flags (hcylinder needs D-1
    positions, orthotope flag[0] directions, hcube D of each).

    Custom types (the dlopen plugin ABI's replacement, objects/stubs.c and
    objects/README.md:121-135): register with an ``expand`` callable that
    lowers one object into a list of builtin-type (or other registered)
    Objects at compile time -- exactly how hcube becomes orthotope faces.
    Expanded leaves report the PARENT's material, like hcube faces do
    (hcube.c:244-247).  ``bounding`` optionally overrides the bounding
    point list; by default the union of the expansion's points is used."""

    name: str
    n_pos: object
    n_dir: object
    n_size: object
    n_flag: object
    n_obj: object
    expand: object = None      # f(obj) -> List[Object], compile-time
    bounding: object = None    # f(obj) -> [(center, radius), ...]


_REGISTRY: Dict[str, ObjectTypeInfo] = {}


def register_object_type(info: ObjectTypeInfo):
    _REGISTRY[info.name] = info
    return info


def get_type_info(name: str) -> Optional[ObjectTypeInfo]:
    return _REGISTRY.get(name)


def object_types() -> List[str]:
    """registered_types() equivalent (object.c:160-183) -- sorted for
    deterministic iteration (the C's order depends on directory scan)."""
    return sorted(_REGISTRY.keys())


def register_objects(directory: str) -> List[str]:
    """Import every ``*.py`` in ``directory`` (the dlopen plugin-dir scan,
    object.c:125-158; CLI ``-o``).  Each module registers its custom types
    at import time via register_object_type (docs/EXTENDING.md).  Returns
    the module names loaded, sorted like object_types()."""
    import importlib.util
    import os

    loaded = []
    for fn in sorted(os.listdir(directory)):
        if not fn.endswith(".py") or fn.startswith("_"):
            continue
        path = os.path.join(directory, fn)
        spec = importlib.util.spec_from_file_location(
            "ndt_user_objects_" + fn[:-3], path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        loaded.append(fn[:-3])
    return loaded


# The builtin types and their schemas, straight from each plugin's params():
register_object_type(ObjectTypeInfo("sphere", 1, 0, 1, 0, 0))          # sphere.c:39-50
register_object_type(ObjectTypeInfo("hplane", 1, 1, 0, 0, 0))          # hplane.c:16-28
register_object_type(ObjectTypeInfo("hdisk", 1, 1, 1, 0, 0))           # hdisk.c:41-53
register_object_type(ObjectTypeInfo("cylinder", 2, 0, 1, 1, 0))        # cylinder.c:58-71
register_object_type(
    ObjectTypeInfo("hcylinder", lambda o: o.dim - 1, 0, 1, 0, 0))      # hcylinder.c:77-89
register_object_type(
    ObjectTypeInfo("orthotope", 1,
                   lambda o: o.flag[0] if o.flag else 1, 0, 1, 0))     # orthotope.c:77-92
register_object_type(ObjectTypeInfo("facet", 3, 3, 0, 1, 0))           # facet.c:90-102
register_object_type(ObjectTypeInfo("hfacet", 3, 3, 0, 1, 0))          # hfacet.c:99-110
register_object_type(
    ObjectTypeInfo("hcube", 1, lambda o: o.dim, lambda o: o.dim, 0, 0))  # hcube.c:192-204
register_object_type(
    ObjectTypeInfo("cluster", 0, 0, 0, 1, lambda o: len(o.children)))  # cluster.c params


class Object:
    """Generic scene object (object.h:23-74): a type name, material, and
    growable parameter lists (positions / directions / sizes / flags /
    sub-objects)."""

    def __init__(self, dim: int, type_name: str, name: str = ""):
        if type_name not in _REGISTRY:
            raise ValueError(f"unknown object type {type_name!r}; "
                             f"registered: {object_types()}")
        self.dim = dim
        self.type_name = type_name
        self.name = name
        # material (object.h: red/green/blue, *_r reflectivity, transparency)
        self.color = np.zeros(3, dtype=np.float64)
        self.reflect = np.zeros(3, dtype=np.float64)
        self.transparent = False
        self.refract_index = 1.0
        # parameters
        self.pos: List[np.ndarray] = []
        self.dir: List[np.ndarray] = []
        self.size: List[float] = []
        self.flag: List[int] = []
        self.children: List[Object] = []
        # bounds: radius<0 means infinite (object.c:588-598); None = unset
        self.bounds_center: Optional[np.ndarray] = None
        self.bounds_radius: Optional[float] = None

    # -- builder API (object.c:456-515) -------------------------------
    def add_pos(self, v):
        self.pos.append(np.asarray(v, dtype=np.float64).copy())
        return self

    def add_dir(self, v):
        self.dir.append(np.asarray(v, dtype=np.float64).copy())
        return self

    def add_size(self, s):
        self.size.append(float(s))
        return self

    def add_flag(self, f):
        self.flag.append(int(f))
        return self

    def add_obj(self, obj: "Object"):
        self.children.append(obj)
        return self

    def set_color(self, r, g, b):
        self.color = np.array([r, g, b], dtype=np.float64)
        return self

    def set_reflect(self, r, g, b):
        self.reflect = np.array([r, g, b], dtype=np.float64)
        return self

    # -- validation (object.c:336-408 object_validate) ----------------
    def _count(self, spec):
        return spec(self) if callable(spec) else spec

    def validate(self):
        info = _REGISTRY[self.type_name]
        checks = [("positions", len(self.pos), self._count(info.n_pos)),
                  ("directions", len(self.dir), self._count(info.n_dir)),
                  ("sizes", len(self.size), self._count(info.n_size)),
                  ("flags", len(self.flag), self._count(info.n_flag)),
                  ("sub-objects", len(self.children), self._count(info.n_obj))]
        for what, have, need in checks:
            if have < need:
                raise ValueError(
                    f"object {self.name!r} ({self.type_name}): "
                    f"needs {need} {what}, has {have}")
        for p in self.pos + self.dir:
            if p.shape != (self.dim,):
                raise ValueError(
                    f"object {self.name!r}: parameter vector of shape "
                    f"{p.shape} in a {self.dim}-D object")
        for c in self.children:
            c.validate()
        return self

    # -- transforms (object.c:518-580) ---------------------------------
    def move(self, offset):
        offset = np.asarray(offset, dtype=np.float64)
        self.pos = [p + offset for p in self.pos]
        if self.bounds_center is not None:
            self.bounds_center = self.bounds_center + offset
        for c in self.children:
            c.move(offset)
        return self

    def rotate(self, center, i, j, angle):
        self.pos = [mathnd.rotate(p, center, i, j, angle) for p in self.pos]
        self.dir = [mathnd.rotate(d, None, i, j, angle) for d in self.dir]
        if self.bounds_center is not None:
            self.bounds_center = mathnd.rotate(self.bounds_center, center, i, j, angle)
        for c in self.children:
            c.rotate(center, i, j, angle)
        return self

    def rotate2(self, center, v1, v2, angle):
        self.pos = [mathnd.rotate2(p, center, v1, v2, angle) for p in self.pos]
        self.dir = [mathnd.rotate2(d, None, v1, v2, angle) for d in self.dir]
        if self.bounds_center is not None:
            self.bounds_center = mathnd.rotate2(self.bounds_center, center, v1, v2, angle)
        for c in self.children:
            c.rotate2(center, v1, v2, angle)
        return self

    # -- bounding points (each plugin's bounding_points ABI) -----------
    def bounding_points(self):
        """Return a list of (center, radius) bounding spheres whose union
        encloses the object; empty list means infinite extent."""
        t = self.type_name
        if t == "sphere":
            return [(self.pos[0], self.size[0])]                    # sphere.c:52-55
        if t == "hplane":
            return []                                               # hplane.c:30-37
        if t == "hdisk":
            return [(self.pos[0], self.size[0])]                    # hdisk.c:55-59
        if t == "cylinder":
            if len(self.flag) < 2 or self.flag[1] == 0:             # cylinder.c:73-83
                return [(self.pos[0], self.size[0]), (self.pos[1], self.size[0])]
            return []
        if t == "hcylinder":
            if len(self.flag) > 0 and self.flag[0] == 0:            # hcylinder.c:91-100
                return [(p, self.size[0]) for p in self.pos]
            return []
        if t == "orthotope":
            m = self.flag[0]                                        # orthotope.c:94-120
            pts = []
            for mask in range(1 << m):
                corner = self.pos[0].copy()
                for k in range(m):
                    if (mask >> k) & 1:
                        corner = corner + self.dir[k]
                pts.append((corner, 0.0))
            return pts
        if t in ("facet", "hfacet"):
            return [(p, 0.0) for p in self.pos]                     # facet.c:104-110
        if t == "hcube":
            d = self.dim                                            # hcube.c:206-234
            pts = []
            for mask in range(1 << d):
                corner = self.pos[0].copy()
                for k in range(d):
                    value = (mask >> k) & 1
                    corner = corner + self.dir[k] * ((0.5 - value) * self.size[k])
                pts.append((corner, 0.0))
            return pts
        if t == "cluster":
            pts = []                                                # cluster.c bounding
            for c in self.children:
                pts.extend(c.bounding_points())
            return pts
        info = _REGISTRY.get(t)
        if info is not None and info.bounding is not None:
            return info.bounding(self)
        if info is not None and info.expand is not None:
            pts = []
            for sub in info.expand(self):
                pts.extend(sub.bounding_points())
            return pts
        raise ValueError(f"no bounding rule for type {t!r}")

    def get_bounds(self):
        """object_get_bounds (object.c:582-603): fit the minimal enclosing
        sphere of the bounding points (Nelder-Mead-refined), +EPSILON pad;
        empty point list => radius -1 (infinite)."""
        from ndt_tpu.utils.bounding import optimal_bounding_sphere

        pts = self.bounding_points()
        if not pts:
            self.bounds_center = np.zeros(self.dim)
            self.bounds_radius = -1.0
            return self
        center, radius = optimal_bounding_sphere(pts)
        if radius > 0.0:
            radius += EPSILON
        self.bounds_center, self.bounds_radius = center, radius
        return self


class LightType(enum.IntEnum):
    """scene.h:16-22."""

    AMBIENT = 0
    POINT = 1
    DIRECTIONAL = 2
    SPOT = 3
    DISK = 4
    RECT = 5


class Light:
    """scene.h:36-49.  New lights default to POINT (scene.c:118)."""

    def __init__(self, dim: int, type: LightType = LightType.POINT, name: str = ""):
        self.dim = dim
        self.type = LightType(type)
        self.name = name
        self.pos = np.zeros(dim, dtype=np.float64)
        self.dir = np.zeros(dim, dtype=np.float64)
        self.u = np.zeros(dim, dtype=np.float64)
        self.v = np.zeros(dim, dtype=np.float64)
        self.u1 = np.zeros(dim, dtype=np.float64)
        self.v1 = np.zeros(dim, dtype=np.float64)
        self.radius = 0.0
        self.color = np.zeros(3, dtype=np.float64)
        self.angle = 0.0  # spot cone half-angle, degrees (ndt.c:204)
        self.prepared = False

    def set_color(self, r, g, b):
        self.color = np.array([r, g, b], dtype=np.float64)
        return self

    def aim(self, target):
        """scene_aim_light (scene.c:149-180): build the u/v area-light basis
        from the aim direction."""
        target = np.asarray(target, dtype=np.float64)
        aim_dir = mathnd.unitize(target - self.pos)
        temp = aim_dir.copy()
        temp[0] = 1.0 if abs(aim_dir[0]) < EPSILON else -aim_dir[0]
        self.u, _ = mathnd.orthogonalize(temp, aim_dir)
        temp = aim_dir.copy()
        temp[1] = 1.0 if abs(aim_dir[1]) < EPSILON else -aim_dir[1]
        self.v, _ = mathnd.orthogonalize(temp, aim_dir)
        return self

    def prepare(self):
        """scene_prepare_light (scene.c:182-195): orthonormal u1/v1."""
        if self.type in (LightType.DISK, LightType.RECT):
            self.u1, self.v1 = mathnd.orthogonalize(self.u, self.v)
        self.prepared = True
        return self


class Scene:
    """scene.h:51-62 + builder helpers from scene.c."""

    def __init__(self, name: str, dim: int):
        self.name = name
        self.dim = dim
        self.objects: List[Object] = []
        self.lights: List[Light] = []
        self.ambient = np.zeros(3, dtype=np.float64)
        self.bg = np.zeros(3, dtype=np.float64)
        self.bg_alpha = 1.0  # scene_init (scene.c:40)
        self.cam = Camera(dim)

    def add_object(self, type_name: str, name: str = "") -> Object:
        """scene_alloc_object (scene.c:60-78)."""
        obj = Object(self.dim, type_name, name)
        self.objects.append(obj)
        return obj

    def add_light(self, type: LightType = LightType.POINT, name: str = "") -> Light:
        """scene_alloc_light (scene.c:107-122)."""
        lgt = Light(self.dim, type, name)
        self.lights.append(lgt)
        return lgt

    def remove_object(self, obj: Object):
        self.objects.remove(obj)

    def validate(self):
        """scene_validate_objects (scene.c:228-239)."""
        for o in self.objects:
            o.validate()
        return self

    def describe(self) -> str:
        """scene_print (scene.c:342-369): the object tree with types/names,
        preceded by the camera state."""
        lines = [f"scene {self.name!r}: {self.dim}-D, "
                 f"{len(self.objects)} objects, {len(self.lights)} lights, "
                 f"ambient {tuple(round(float(x), 3) for x in self.ambient)}"]
        lines.append(self.cam.describe())
        for lgt in self.lights:
            lines.append(f"  light {lgt.type.name.lower()}"
                         f"{' ' + lgt.name if lgt.name else ''}: "
                         f"color {tuple(round(float(x), 3) for x in lgt.color)}")

        def walk(objs, depth):
            for o in objs:
                lines.append("    " * depth + f"  {o.type_name}: {o.name}")
                walk(o.children, depth + 1)

        walk(self.objects, 0)
        return "\n".join(lines)

    def print(self):
        print(self.describe())

    def find_dupes(self):
        """scene_find_dupes (scene.c:371-400): exact-parameter duplicates."""
        dupes = []
        seen = {}
        for o in self.objects:
            key = (o.type_name,
                   tuple(tuple(p) for p in o.pos),
                   tuple(tuple(d) for d in o.dir),
                   tuple(o.size), tuple(o.flag))
            if key in seen:
                dupes.append(o)
            else:
                seen[key] = o
        return dupes

    def remove_dupes(self):
        """scene_remove_dupes (scene.c:402-427)."""
        for o in self.find_dupes():
            self.objects.remove(o)
        return self

    def cluster(self, k: int):
        """scene_cluster (scene.c:252-340): wrap finite objects in a k-means
        cluster hierarchy and infinite ones in an unbounded cluster.  The
        cluster tree is a culling container; the compiler flattens it but
        keeps the hierarchy for grouped culling."""
        from ndt_tpu.utils.kmeans import build_cluster_tree

        finite = [o for o in self.objects if o.get_bounds().bounds_radius is not None
                  and o.bounds_radius >= 0.0]
        infinite = [o for o in self.objects if o not in finite]
        if not finite:
            return self
        root = build_cluster_tree(self.dim, finite, k)
        # The C wraps infinite objects in an unbounded cluster
        # (scene.c:311-330), but scene_cluster only runs WITHOUT_KDTREE
        # (ndt.c:1897-1911); our compiler implements the kd-path semantics,
        # where an infinite object nested in a cluster is unreachable (see
        # compile._flatten's kd-parity quirk note).  Keeping them top-level
        # preserves the C's rendered result: they land in the trace-always
        # infinite list either way.
        self.objects = [root] + infinite
        return self
