"""The workload suite: Python rebuilds of the reference's scenes/*.c plugins.

Each scene module exposes the same ABI the C plugins do (README.md:60-135):

    scene_setup(scn, dimensions, frame, frames, config) -> None | int
    scene_frames(dimensions, config) -> int           (optional)
    scene_cleanup() -> None                           (optional)

where ``scn`` is an ``ndt_tpu.scene.Scene``.  get_scene() replaces the
dlopen-based registry (ndt.c:1652-1665).
"""

from __future__ import annotations

import importlib

_SCENES = {
    "test": "ndt_tpu.scenes.builtin",
    "builtin": "ndt_tpu.scenes.builtin",
    "empty": "ndt_tpu.scenes.empty",
    "balls": "ndt_tpu.scenes.balls",
    "hypercube": "ndt_tpu.scenes.hypercube",
    "hypercube-points": "ndt_tpu.scenes.hypercube_points",
    "random": "ndt_tpu.scenes.random_scene",
    "cluster5d": "ndt_tpu.scenes.cluster5d",
    "lights3d": "ndt_tpu.scenes.lights3d",
    "infinite4d": "ndt_tpu.scenes.infinite4d",
    "anim6d": "ndt_tpu.scenes.anim6d",
    "nelder-mead": "ndt_tpu.scenes.nelder_mead_scene",
    "yaml": "ndt_tpu.scenes.yaml_scene",
}


def scene_names():
    return sorted(set(_SCENES))


def get_scene(name: str):
    """Resolve a scene module by name (accepts 'balls', 'scenes/balls.so',
    'balls.py' and paths to custom python scene files)."""
    import os

    base = os.path.basename(name)
    for suffix in (".so", ".py", ".c"):
        if base.endswith(suffix):
            base = base[: -len(suffix)]
    if base in _SCENES:
        return importlib.import_module(_SCENES[base])
    if os.path.exists(name) and name.endswith(".py"):
        spec = importlib.util.spec_from_file_location(base, name)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    raise ValueError(f"unknown scene {name!r}; available: {scene_names()}")
