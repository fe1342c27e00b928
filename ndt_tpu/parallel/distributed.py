"""Multi-host (multi-process) execution: the MPI surface, TPU-native.

The reference's multi-node story is MPI: `MPI_Init` (ndt.c:1433-1436), a
YAML scene broadcast (ndt.c:1153-1246), row-striped rendering per rank, a
binary-tree image reduction (ndt.c:1277-1309), and FRAME/FRAME2 modes that
farm whole frames to ranks (ndt.c:1940-1998).  On TPU pods the same three
ideas map to:

* `jax.distributed.initialize()` -- process bootstrap (replaces MPI_Init);
* a global `Mesh` over every chip of every host, rays sharded on the
  ``px`` axis -- scene "broadcast" is just replication of the compiled
  scene pytree (every process computes it deterministically; no bytes move);
* `multihost_utils.process_allgather` of the framebuffer -- the image
  collect (replaces the tree reduction; XLA lowers it to an efficient
  all-gather over ICI/DCN).

Frame parallelism (FRAME2) needs no communication at all: scene_setup
replays deterministically from frame 0 on every process (the same property
the reference exploits when skipping frames, ndt.c:1818-1825), so each
process renders a disjoint frame subset and writes its own files.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None):
    """Bootstrap multi-process JAX (replaces MPI_Init, ndt.c:1433-1436).

    With no arguments on a TPU pod, jax auto-detects the coordinator from
    the TPU metadata.  Off-pod (CPU/GPU or tests), pass coordinator
    ("host:port"), num_processes and process_id explicitly or via the
    NDT_COORDINATOR / NDT_NUM_PROCESSES / NDT_PROCESS_ID environment
    variables.  Returns (process_id, process_count).
    """
    coordinator = coordinator or os.environ.get("NDT_COORDINATOR")
    if num_processes is None and "NDT_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NDT_NUM_PROCESSES"])
    if process_id is None and "NDT_PROCESS_ID" in os.environ:
        process_id = int(os.environ["NDT_PROCESS_ID"])
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def process_frame_indices(first: int, last: int,
                          process_id: Optional[int] = None,
                          process_count: Optional[int] = None):
    """FRAME2-mode frame assignment: frame i goes to process
    (i - first) % process_count (ndt.c:1831-1837 round-robin, with every
    process rendering -- the no-coordinator variant, ndt.c:55-56)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    return [i for i in range(first, last + 1) if (i - first) % n == pid]


def is_coordinator() -> bool:
    return jax.process_index() == 0


def broadcast_scene(scn=None):
    """Ship a coordinator-built Scene to every process (FRAME-mode scene
    transport, ndt.c:1153-1246: rank 0 serializes the scene to a YAML
    buffer and MPI_Send/Bcast's it; receivers re-parse and rebuild).

    Process 0 passes the Scene; everyone else passes None.  Two
    broadcast_one_to_all rounds (length, then the padded byte payload --
    receivers cannot size the second buffer without the first) move the
    YAML text over the distributed backend; all processes return an
    identical re-parsed Scene.  This is what makes ``-b f`` correct for
    scene_setup that is expensive or draws fresh entropy: only the
    coordinator ever runs it."""
    import numpy as np

    from jax.experimental import multihost_utils

    from ndt_tpu.scene.yaml_io import (scene_read_yaml_buffer,
                                       scene_write_yaml_buffer)

    if jax.process_index() == 0:
        if scn is None:
            raise ValueError("coordinator must pass the Scene")
        payload = np.frombuffer(
            scene_write_yaml_buffer(scn).encode("utf-8"), np.uint8)
        n = np.int32(payload.size)
    else:
        payload, n = None, np.int32(0)
    n = int(multihost_utils.broadcast_one_to_all(n))
    buf = np.zeros((n,), np.uint8)
    if payload is not None:
        buf[:] = payload
    buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return scene_read_yaml_buffer(buf.tobytes().decode("utf-8"))
