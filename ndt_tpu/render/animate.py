"""Animation runner: the FRAME-distribution modes, TPU-style.

The reference farms whole frames to MPI ranks (MPI_MODE_FRAME/FRAME2,
ndt.c:55-56, 1770-1998): rank 0 builds every scene (stateful scenes stay
consistent), ships them to workers, and collects/saves rendered frames.
Here the same shape is: the host builds every scene in order (physics state
lives host-side) and hands frames to the renderer; PNG encoding runs on a
background pool (image_io.AsyncSaver plays the role of the background save
threads, image.c:741-803), overlapping with the next frame's render.
``render_animation_multidevice`` additionally round-robins whole frames
across the available jax devices with async dispatch -- the FRAME-mode
analogue, with device placement replacing MPI_Send of serialized scenes
(ndt.c:1831-1837).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional

import numpy as np

import jax

from ndt_tpu.image_io import AsyncSaver, save_depth
from ndt_tpu.render.engine import RenderOptions, render_frame
from ndt_tpu.scene.model import Scene
from ndt_tpu.utils.timing import Timer


@dataclasses.dataclass
class FrameResult:
    index: int
    path: str
    seconds: float
    rays: int


def render_animation(scene_mod, dimensions: int, first: int, last: int,
                     total: int, opts: RenderOptions,
                     out_dir: str, name_fmt: str = "{name}_{res}_{i:04d}.png",
                     config: Optional[str] = None,
                     scene_hook: Optional[Callable[[Scene, int], None]] = None,
                     progress: Optional[Callable[[FrameResult], None]] = None):
    """Render frames [first, last] of an animation.

    scene_setup runs for EVERY frame index from 0, including skipped ones,
    so stateful scenes (balls physics) stay consistent with the reference's
    resume semantics (ndt.c:1818-1825)."""
    saver = AsyncSaver()
    timer = Timer()
    results = []
    res_str = f"{opts.width}x{opts.height}"
    total_rays = 0
    for i in range(0, last + 1):
        scn = Scene("scene", dimensions)
        scene_mod.scene_setup(scn, dimensions, i, total, config)
        if i < first:
            continue
        if scene_hook is not None:
            scene_hook(scn, i)
        t = Timer()
        img, depth, nrays = render_frame(scn, opts)
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, name_fmt.format(
            name=scn.name, res=res_str, i=i))
        saver.save(path, img)
        if opts.record_depth and depth is not None:
            ddir = os.path.join(out_dir, "depth")
            os.makedirs(ddir, exist_ok=True)
            save_depth(os.path.join(ddir, name_fmt.format(
                name=scn.name, res=res_str, i=i)), depth)
        total_rays += int(nrays)
        r = FrameResult(i, path, t.elapsed(), int(nrays))
        results.append(r)
        if progress is not None:
            progress(r)
    saver.drain()
    return results, timer.elapsed(), total_rays


def render_animation_multidevice(scene_mod, dimensions: int, first: int,
                                 last: int, total: int, opts: RenderOptions,
                                 out_dir: str, config: Optional[str] = None,
                                 devices=None, frame_stride=None):
    """FRAME-mode parallelism: frame i renders on device i % n, all frames
    dispatched asynchronously (one fused XLA program per frame), collected
    and saved in order.  The scene pytree for each frame is device_put to
    its worker -- the moral equivalent of mpi_send_scene (ndt.c:1193-1246)
    without the YAML round-trip, since pytrees ship directly.

    frame_stride=(pid, n): multi-process FRAME2 mode -- this process
    renders only frames with (i - first) % n == pid (ndt.c:1831-1837
    round-robin over ranks); scene_setup still replays every frame so
    stateful scenes stay consistent (ndt.c:1818-1825)."""
    import dataclasses as dc

    import jax.numpy as jnp

    from ndt_tpu.render.engine import _pixel_grid, render_tile_fused
    from ndt_tpu.scene.compile import compile_scene

    devices = list(devices if devices is not None else jax.devices())
    saver = AsyncSaver()
    timer = Timer()
    res_str = f"{opts.width}x{opts.height}"
    dt = np.dtype(opts.dtype)

    xx, yy = _pixel_grid(opts.width, opts.height, dt)
    pending = []  # (index, device arrays)
    os.makedirs(out_dir, exist_ok=True)
    total_rays = 0
    mine = None
    if frame_stride is not None:
        from ndt_tpu.parallel.distributed import process_frame_indices

        mine = set(process_frame_indices(first, last, *frame_stride))
    n_dispatched = 0
    for i in range(0, last + 1):
        scn = Scene("scene", dimensions)
        scene_mod.scene_setup(scn, dimensions, i, total, config)
        if i < first:
            continue
        if mine is not None and i not in mine:
            continue
        if not scn.cam.prepared:
            scn.cam.aim()
        # round-robin over THIS process's rendered frames -- indexing by
        # the global frame number would collide with the frame stride
        # (gcd(proc_count, n_devices) > 1 leaves devices idle)
        dev = devices[n_dispatched % len(devices)]
        n_dispatched += 1
        sd = jax.device_put(compile_scene(scn, dt), dev)
        cd = scn.cam.data(dt.type)
        cd = dc.replace(cd, dir_x=cd.dir_x * dt.type(opts.width / opts.height))
        cd = jax.device_put(cd, dev)
        x = jax.device_put(jnp.asarray(xx.ravel()), dev)
        y = jax.device_put(jnp.asarray(yy.ravel()), dev)
        key = jax.random.fold_in(jax.random.PRNGKey(opts.seed), i)
        c, d, n = render_tile_fused(sd, cd, x, y, key, opts, "center")
        # overlap this frame's framebuffer download with the next frame's
        # scene prep + dispatch
        for a in (c, d):
            if hasattr(a, "copy_to_host_async"):
                a.copy_to_host_async()
        pending.append((i, scn.name, c, d, n))
        # collect when every device has a frame in flight
        if len(pending) >= len(devices):
            total_rays += _drain_one(pending, saver, out_dir, res_str, opts)
    while pending:
        total_rays += _drain_one(pending, saver, out_dir, res_str, opts)
    saver.drain()
    return timer.elapsed(), total_rays, n_dispatched


def render_animation_coordinated(scene_mod, dimensions: int, first: int,
                                 last: int, total: int, opts: RenderOptions,
                                 out_dir: str,
                                 config: Optional[str] = None):
    """Coordinator-built FRAME mode (the reference's ``-b f``,
    ndt.c:1831-1998): process 0 runs scene_setup for EVERY frame -- it is
    the only process that ever does, so scene builders that are expensive,
    stateful, or draw fresh entropy behave exactly as in a serial run --
    and broadcasts each built scene as a YAML buffer
    (parallel.distributed.broadcast_scene ≙ mpi_send_scene,
    ndt.c:1153-1246).  Frame i is rendered by process
    ((i - first) % (count - 1)) + 1 (ndt.c:1834: rank 0 coordinates and
    does not render); with a single process it degenerates to a serial
    render.  Unlike the reference, the renderer saves its own frame
    instead of shipping pixels back to rank 0 (TPU pod hosts each have
    storage; the image return trip ndt.c:1940-1987 buys nothing).

    Returns (seconds, total_rays, frames_rendered_by_THIS_process)."""
    import jax

    from ndt_tpu.parallel.distributed import broadcast_scene

    pid, count = jax.process_index(), jax.process_count()
    saver = AsyncSaver()
    timer = Timer()
    res_str = f"{opts.width}x{opts.height}"
    total_rays = 0
    n_mine = 0
    for i in range(0, last + 1):
        scn = None
        if pid == 0:
            scn = Scene("scene", dimensions)
            scene_mod.scene_setup(scn, dimensions, i, total, config)
        if i < first:
            continue
        scn = broadcast_scene(scn)
        render_rank = ((i - first) % (count - 1)) + 1 if count > 1 else 0
        if pid != render_rank:
            continue
        if not scn.cam.prepared:
            scn.cam.aim()
        img, depth, nrays = render_frame(scn, opts)
        odir = out_dir.replace("SCENE", scn.name)
        os.makedirs(odir, exist_ok=True)
        saver.save(os.path.join(
            odir, f"{scn.name}_{res_str}_{i:04d}.png"), img)
        if opts.record_depth and depth is not None:
            ddir = os.path.join(odir, "depth")
            os.makedirs(ddir, exist_ok=True)
            save_depth(os.path.join(
                ddir, f"{scn.name}_{res_str}_{i:04d}.png"),
                np.asarray(depth).reshape(opts.height, opts.width))
        total_rays += int(nrays)
        n_mine += 1
    saver.drain()
    return timer.elapsed(), total_rays, n_mine


def _drain_one(pending, saver, out_dir, res_str, opts):
    i, name, c, d, n = pending.pop(0)
    # out_dir may carry a SCENE placeholder (the name is only known once
    # scene_setup has run, ndt.c:1840-1848)
    odir = out_dir.replace("SCENE", name)
    os.makedirs(odir, exist_ok=True)
    img = np.asarray(c).reshape(opts.height, opts.width, 3)
    saver.save(os.path.join(odir, f"{name}_{res_str}_{i:04d}.png"), img)
    if opts.record_depth and d is not None:
        ddir = os.path.join(odir, "depth")
        os.makedirs(ddir, exist_ok=True)
        save_depth(os.path.join(ddir, f"{name}_{res_str}_{i:04d}.png"),
                   np.asarray(d).reshape(opts.height, opts.width))
    return int(n)
