"""Device-mesh parallelism: pixel-tile sharding over TPU chips.

The reference's distribution model (SURVEY.md section 2.6) is embarrassingly
parallel rendering: pthreads stripe rows within a node (ndt.c:803-849), MPI
stripes rows/pixels across nodes with a tree-reduction image collect
(ndt.c:1277-1309), and FRAME modes farm whole frames to ranks.  On TPU all
of that collapses into ONE mechanism: a `jax.sharding.Mesh` over chips with
the ray batch sharded on a ``pixels`` axis.  The scene pytree is replicated
(the SPMD program is the broadcast -- no YAML-over-MPI_Bcast needed,
ndt.c:1153-1246), XLA splits every [R, ...] tensor across chips, no
collectives are required during tracing (rays never talk to each other),
and the framebuffer gather to the host is the image 'collect'.

Frame-level parallelism (MPI FRAME/FRAME2 modes) maps to rendering distinct
frames on distinct mesh slices / processes -- see render/animate.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_pixel_mesh(devices=None) -> Mesh:
    """A 1-D mesh over all (or the given) devices, axis name 'px'."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), axis_names=("px",))


def shard_rays(mesh: Mesh, *arrays):
    """Place [R, ...] ray arrays sharded on the pixel axis.

    In multi-process runs every process holds the full host value (pixel
    grids are computed deterministically everywhere), so each just feeds
    its addressable shards -- no data moves between hosts."""
    sh = NamedSharding(mesh, P("px"))
    if jax.process_count() > 1:
        return tuple(
            jax.make_array_from_callback(
                a.shape, sh, lambda idx, a=a: np.asarray(a)[idx])
            for a in arrays)
    return tuple(jax.device_put(a, sh) for a in arrays)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree over the mesh (the scene 'broadcast': the SPMD
    program ships no bytes, every process already has the value --
    vs the reference's YAML-over-MPI_Bcast, ndt.c:1153-1246).

    Idempotent: leaves already placed with this sharding pass through
    untouched, so callers in per-tile/per-round loops (adaptive sampling,
    whitted refinement) can pre-replicate the scene once and every
    subsequent call is free."""
    sh = NamedSharding(mesh, P())

    def put(a):
        if isinstance(a, jax.Array) and a.sharding == sh:
            return a
        if jax.process_count() > 1:
            return jax.make_array_from_callback(
                np.shape(a), sh, lambda idx: np.asarray(a)[idx])
        return jax.device_put(a, sh)

    return jax.tree_util.tree_map(put, tree)


@functools.lru_cache(maxsize=64)
def _rays_program(mesh: Mesh, opts):
    """Compiled shard_map program for render_rays_sharded, cached on
    (mesh, opts) -- jit keys on the callable, so rebuilding the closure per
    call would retrace + recompile the megakernel program every frame."""
    from ndt_tpu.render.engine import render_rays

    def body(scene, os_, vs_, k):
        c, d, n = render_rays(scene, os_, vs_, k, opts)
        return c, d, jax.lax.psum(n, "px")

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("px"), P("px"), P()),
        out_specs=(P("px"), P("px"), P()),
        check_vma=False))


@functools.lru_cache(maxsize=64)
def _grid_program(mesh: Mesh, opts, eye: str):
    """Compiled shard_map program for render_grid_sharded (see
    _rays_program for why this is cached)."""
    from ndt_tpu.render.engine import render_tile_fused as render_tile

    def body(scene, cam, xs, ys, k):
        c, d, n = render_tile(scene, cam, xs, ys, k, opts, eye)
        return c, d, jax.lax.psum(n, "px")

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P("px"), P("px"), P()),
        out_specs=(P("px"), P("px"), P()),
        check_vma=False))


def render_rays_sharded(scene_data, o, v, key, opts, mesh: Mesh):
    """Render a pre-generated ray batch with rays sharded across the mesh
    (used by the adaptive sampler so `-b r` composes with samples > 1).
    o, v: [R, D] with R divisible by the mesh size."""
    from ndt_tpu.render.engine import render_rays

    scene_r = replicate(mesh, scene_data)
    o_s, v_s = shard_rays(mesh, jnp.asarray(o), jnp.asarray(v))
    color, depth, nrays = _rays_program(mesh, opts)(scene_r, o_s, v_s, key)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        color = multihost_utils.process_allgather(color, tiled=True)
        depth = multihost_utils.process_allgather(depth, tiled=True)
    return color, depth, nrays


def render_grid_sharded(scene_data, cam_data, x, y, key, opts, mesh: Mesh,
                        eye: str = "center"):
    """Render a flat pixel grid with rays sharded across the mesh.

    x, y: [R] with R divisible by mesh size (callers pad).  The mesh program
    is `shard_map`: each chip runs the UNMODIFIED single-device render
    (pallas megakernels, chip-local bounce compaction) on its R/n slice of
    the ray batch -- tracing is embarrassingly parallel, so the per-device
    program is byte-identical to the single-chip one and the only
    collectives are the nrays psum and the framebuffer gather when the
    caller pulls the image to host.  (GSPMD auto-partitioning of the same
    program measured 100x slower device time + 7x compile time through the
    partitioner, even on a 1-device mesh -- the while-loop + pallas
    custom-call mix defeats it; manual sharding is the TPU-native shape.)
    """
    scene_r = replicate(mesh, scene_data)
    cam_r = replicate(mesh, cam_data)
    x_s, y_s = shard_rays(mesh, jnp.asarray(x), jnp.asarray(y))
    color, depth, nrays = _grid_program(mesh, opts, eye)(
        scene_r, cam_r, x_s, y_s, key)
    if jax.process_count() > 1:
        # image collect (ndt.c:1277-1309's tree reduction): all-gather the
        # px-sharded framebuffer so every process holds the full frame
        from jax.experimental import multihost_utils

        color = multihost_utils.process_allgather(color, tiled=True)
        depth = multihost_utils.process_allgather(depth, tiled=True)
    return color, depth, nrays
