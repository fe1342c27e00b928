"""The `ndt` command-line driver (ndt.c:1336-2105 rebuild).

Flag-compatible with the reference's getopt loop (ndt.c:1450-1747):

  -a diff,depth   anti-aliasing args (with -w)
  -b mode         distribution mode r/p (row/pixel: mesh-shard tiles) or
                  f/F (frame-parallel across devices)
  -d dims         spatial dimensions (default 3)
  -f frames       last | first:last | first:last:total (frame-range resume,
                  ndt.c:1510-1523)
  -k num          clusters per level (scene_cluster, WITHOUT_KDTREE path)
  -l num          max reflect/refract recursion depth (default 128)
  -m mode         stereo: s side-by-side, o over/under, a anaglyph,
                  h hidef-1080p-3D, m mono [default]
  -n samples      per-pixel resampling count
  -o directory    object plugin dir (accepted for compatibility; the type
                  registry is builtin -- see scene/model.py)
  -p              disable specular highlights
  -q quality      high/med/low/fast presets (aa_depth, aa_diff, max_depth)
                  = (17,1,128) (2,1,20) (0,255,5) (0,255,1) (ndt.c:1589-1624)
  -r resolution   4k | 1080p | 720p | 480p | WxH
  -s scene        scene name or module ('balls', 'scenes/balls.so', .py path)
  -t threads      render threads (accepted; parallelism is the TPU mesh)
  -u config       free-form scene config string
  -v mode[,vFov,hFov]  radial camera: s* spherical VR, c* cylindrical pano
  -w              Whitted recursive anti-aliasing
  -y              write per-frame YAML scene snapshots
  -z              record depth maps
  -g              use cluster culling hierarchy (scene_cluster)

Output layout mirrors ndt.c:1840-1873:
  images/<scene>/<D>d[_<stereo>][_<cam>]/<WxH>/<scene>_<WxH>_<frame>.png
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

STEREO_NAMES = {"s": ("side", "sbs2l"), "o": ("over", "ab2l"),
                "a": ("anaglyph", "arbg"), "h": ("hidef", "high"),
                "m": ("mono", "")}
QUALITY = {"h": (17, 1, 128), "m": (2, 1, 20), "l": (0, 255, 5),
           "f": (0, 255, 1)}
RESOLUTIONS = {"4k": (3840, 2160), "1080p": (1920, 1080),
               "720p": (1280, 720), "480p": (720, 480)}


def parse_frames(spec: str):
    """-f: last | first:last | first:last:total (ndt.c:1510-1523)."""
    parts = spec.split(":")
    if len(parts) == 1:
        return 0, int(parts[0]), None
    if len(parts) == 2:
        return int(parts[0]), int(parts[1]), None
    return int(parts[0]), int(parts[1]), int(parts[2])


def build_argparser():
    p = argparse.ArgumentParser(
        prog="ndt", add_help=False,
        description="TPU-native n-dimensional ray tracer")
    p.add_argument("-a", dest="aa", default=None, help="aa diff,depth")
    p.add_argument("-b", dest="dist_mode", default=None)
    p.add_argument("-d", dest="dimensions", type=int, default=3)
    p.add_argument("-f", dest="frames", default=None)
    p.add_argument("-g", dest="cluster", action="store_true")
    p.add_argument("-h", dest="help", action="store_true")
    p.add_argument("-k", dest="cluster_k", type=int, default=6)
    p.add_argument("-l", dest="max_depth", type=int, default=128)
    # -3 is the reference's alias for -m (ndt.c:1533-1534)
    p.add_argument("-m", "-3", dest="stereo", default="m")
    p.add_argument("-n", dest="samples", type=int, default=1)
    p.add_argument("-o", dest="obj_dir", default=None)
    p.add_argument("-p", dest="no_specular", action="store_true")
    p.add_argument("-q", dest="quality", default=None)
    p.add_argument("-r", dest="resolution", default=None)
    p.add_argument("-s", dest="scene", default="test")
    p.add_argument("-t", dest="threads", type=int, default=1)
    p.add_argument("-u", dest="config", default=None)
    p.add_argument("-v", dest="radial", default=None)
    p.add_argument("-w", dest="whitted", action="store_true")
    p.add_argument("-y", dest="write_yaml", action="store_true")
    p.add_argument("-z", dest="depth_map", action="store_true")
    # multi-host bootstrap (replaces mpirun's rank/size plumbing,
    # ndt.c:1433-1436); on TPU pods --multihost alone auto-detects the
    # coordinator, off-pod pass all three (or NDT_COORDINATOR /
    # NDT_NUM_PROCESSES / NDT_PROCESS_ID env vars)
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (multi-process run)")
    p.add_argument("--coordinator", default=None,
                   help="coordinator host:port (multi-host off-pod)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.help:
        build_argparser().print_help()
        return 0

    from ndt_tpu.camera import CameraType
    from ndt_tpu.image_io import AsyncSaver, save_depth
    from ndt_tpu.render.engine import RenderOptions, render_frame
    from ndt_tpu.scene.model import Scene
    from ndt_tpu.scenes import get_scene
    from ndt_tpu.utils.timing import Timer

    width, height = 1920, 1080
    if args.resolution:
        if args.resolution in RESOLUTIONS:
            width, height = RESOLUTIONS[args.resolution]
        else:
            width, height = (int(t) for t in args.resolution.split("x"))

    aa_diff, aa_depth = 20, 4
    max_depth = args.max_depth
    if args.quality:
        q = args.quality[0].lower()
        if q not in QUALITY:
            print(f"unknown quality preset {args.quality!r}")
            return 1
        aa_depth, aa_diff, max_depth = QUALITY[q]
    if args.aa:
        d, dep = args.aa.split(",")
        aa_diff, aa_depth = int(d), int(dep)

    stereo, mode_str = STEREO_NAMES.get(args.stereo[0].lower(), ("mono", ""))
    if stereo == "hidef":
        width, height = 1920, 2205  # ndt.c:613-630

    cam_str = ""
    cam_type = CameraType.NORMAL
    v_fov, h_fov = np.pi, 2 * np.pi
    if args.radial:
        parts = args.radial.split(",")
        kind = parts[0][0].lower()
        if kind == "s":
            cam_type, cam_str = CameraType.VR, "vr"
        elif kind == "c":
            cam_type, cam_str = CameraType.PANO, "pano"
        else:
            print(f"Unrecognized radial mode: {parts[0]}")
            return 1
        if len(parts) > 1:
            v_fov = float(parts[1]) * np.pi / 180.0
        if len(parts) > 2:
            h_fov = float(parts[2]) * np.pi / 180.0

    if args.obj_dir:
        # the dlopen plugin directory (-o, ndt.c:1578-1580): import every
        # *.py so it can register custom object types (docs/EXTENDING.md)
        from ndt_tpu.scene.model import register_objects

        for name in register_objects(args.obj_dir):
            print(f"registering object module '{name}'.")

    mod = get_scene(args.scene)
    dims = args.dimensions

    total_frames = None
    if hasattr(mod, "scene_frames"):
        total_frames = mod.scene_frames(dims, args.config)
    first, last, total = 0, (total_frames or 300) - 1, total_frames
    if args.frames:
        first, last, total = parse_frames(args.frames)
    if total is None:
        total = total_frames or max(last + 1, 1)

    dist_char = (args.dist_mode or "").strip()[:1] if args.dist_mode else ""
    dist_mode = dist_char.lower()
    # --num-processes/--process-id imply multi-host: silently ignoring them
    # would have every rank render (and write) the whole job as process 0
    multihost = (args.multihost or args.coordinator
                 or args.num_processes is not None
                 or args.process_id is not None
                 or os.environ.get("NDT_COORDINATOR"))
    proc_id, proc_count = 0, 1
    if multihost:
        from ndt_tpu.parallel.distributed import init_distributed

        proc_id, proc_count = init_distributed(
            args.coordinator, args.num_processes, args.process_id)
        print(f"multihost: process {proc_id}/{proc_count}", flush=True)
    mesh = None
    if dist_mode in ("r", "p"):
        # MPI row/pixel-mode analogue: pixel tiles sharded over the device
        # mesh (the granularity difference disappears on TPU -- both are
        # a partition of the flat ray batch)
        from ndt_tpu.parallel.mesh import make_pixel_mesh

        mesh = make_pixel_mesh()

    opts = RenderOptions(
        width=width, height=height, samples=args.samples,
        max_optic_depth=max_depth, stereo=stereo,
        specular=not args.no_specular, record_depth=args.depth_map,
        whitted=args.whitted,
        aa_diff=aa_diff, aa_depth=aa_depth,
        seed=0, devices=mesh)

    # -b f = FRAME (process 0 builds every scene and broadcasts it,
    # workers render, ndt.c:1831-1998) vs -b F = FRAME2 (every process
    # replays scene_setup deterministically and renders its stride,
    # ndt.c:55-56).  Single-process runs collapse both to the
    # multi-device round-robin.
    if dist_mode == "f":
        total_frames2 = total
        res_str = f"{width}x{height}"
        out_dir = os.path.join(
            "images", "SCENE",
            f"{dims}d{'_' + mode_str if mode_str else ''}"
            f"{'_' + cam_str if cam_str else ''}", res_str)
        if dist_char == "f" and proc_count > 1:
            from ndt_tpu.render.animate import render_animation_coordinated

            secs, total_rays, n = render_animation_coordinated(
                mod, dims, first, last, total_frames2, opts, out_dir,
                config=args.config)
        else:
            # FRAME2: whole frames round-robin across this process's
            # devices; multi-process adds the frame stride
            from ndt_tpu.render.animate import render_animation_multidevice

            stride = (proc_id, proc_count) if proc_count > 1 else None
            devices = None
            if proc_count > 1:
                import jax

                devices = jax.local_devices()
            secs, total_rays, n = render_animation_multidevice(
                mod, dims, first, last, total_frames2, opts, out_dir,
                config=args.config, devices=devices, frame_stride=stride)
        print(f"rendered {n} frames in {secs:.1f}s "
              f"({secs / max(n, 1):.2f} s/frame, "
              f"{total_rays / secs / 1e6:.1f} Mrays/s)")
        return 0

    # output layout (ndt.c:1840-1873)
    res_str = f"{width}x{height}"
    dname = os.path.join(
        "images", "SCENE",
        f"{dims}d{'_' + mode_str if mode_str else ''}"
        f"{'_' + cam_str if cam_str else ''}", res_str)

    saver = AsyncSaver()
    timer = Timer()
    rendered = 0
    total_rays = 0
    # NDT_PROFILE=<dir>: capture a jax.profiler trace of the frame loop
    profile_dir = os.environ.get("NDT_PROFILE")
    profiler_cm = None
    if profile_dir:
        import contextlib

        import jax.profiler

        profiler_cm = jax.profiler.trace(profile_dir)
        profiler_cm.__enter__()
    for i in range(0, last + 1):
        scn = Scene("scene", dims)
        mod.scene_setup(scn, dims, i, total, args.config)
        # scene_setup runs for SKIPPED frames too, so stateful scenes
        # (balls physics) stay consistent (ndt.c:1818-1825)
        if i < first:
            continue

        scn.cam.type = cam_type
        if args.radial:
            scn.cam.v_fov, scn.cam.h_fov = v_fov, h_fov
        if args.cluster:
            scn.cluster(args.cluster_k)

        out_dir = dname.replace("SCENE", scn.name)
        os.makedirs(out_dir, exist_ok=True)
        fname = os.path.join(out_dir, f"{scn.name}_{res_str}_{i:04d}.png")

        if args.write_yaml and (proc_count == 1 or proc_id == 0):
            # rank-0-writes, like the image saves below: in multihost r/p
            # every process reaches this point with the same scene
            from ndt_tpu.scene.yaml_io import scene_write_yaml

            ydir = os.path.join("yaml", scn.name)
            os.makedirs(ydir, exist_ok=True)
            scene_write_yaml(scn, os.path.join(ydir, f"{scn.name}_{i:05d}.yaml"))

        img, depth, nrays = render_frame(scn, opts)
        total_rays += nrays
        if proc_count > 1 and proc_id != 0:
            # multihost r/p: every process holds the full gathered frame;
            # only the coordinator writes files (ndt.c rank-0 saves)
            rendered += 1
            continue
        saver.save(fname, img)
        if args.depth_map and depth is not None:
            ddir = os.path.join(out_dir, "depth")
            os.makedirs(ddir, exist_ok=True)
            save_depth(os.path.join(ddir, f"{scn.name}_{res_str}_{i:04d}.png"),
                       depth)
        rendered += 1
        done = i - first + 1
        remaining = timer.remaining(done, last - first + 1)
        print(f"frame {i}/{last} -> {fname}  "
              f"({timer.elapsed():.1f}s elapsed, ~{remaining:.0f}s left, "
              f"{nrays / 1e6:.1f} Mrays)", flush=True)

    if profiler_cm is not None:
        profiler_cm.__exit__(None, None, None)
        print(f"profiler trace written to {profile_dir}")
    saver.drain()
    secs = timer.elapsed()
    if rendered:
        # summary telemetry (ndt.c:2013-2057): avg s/frame + estimated
        # total chip-time for the whole animation at this rate
        spf = secs / rendered
        n_dev = 1
        try:
            import jax

            n_dev = max(len(jax.devices()), 1) if mesh is not None else 1
        except Exception:
            pass
        est_total = spf * (total if total else rendered) * n_dev
        print(f"rendered {rendered} frames in {secs:.1f}s "
              f"({spf:.2f} s/frame, "
              f"{total_rays / max(secs, 1e-9) / 1e6:.1f} Mrays/s); "
              f"est. {est_total / 3600.0:.2f} chip-hours for all "
              f"{total if total else rendered} frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
