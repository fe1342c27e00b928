#!/usr/bin/env python
"""Benchmark: all 5 BASELINE.md configs on one chip.

Prints ONE JSON line.  The headline metric stays config 1 (4-D balls at
1080p, the north-star 100 Mrays/s/chip target); configs 2-5 (hypercube
rotation + reflective 'walls' variant, random with culling, 5-D cluster,
6-D YAML-animation frame rendered through the mesh-sharded path) are
recorded in detail.configs so perf regressions on any workload shape are
visible round to round.

Methodology: the full render (camera rays, per-light shadow rays,
reflection bounces -- each trace counts as a ray, matching a CPU tracer's
accounting) runs on-device and is forced with a checksum reduction; a
(K_hi - K_lo)-frame slope isolates pure device time from this dev
harness's per-dispatch tunnel latency (~25 ms, absent on a production
PCIe-attached host).  NDT_BENCH_CONFIGS=1 limits the run to config 1.

Robustness (round 4; BENCH_r03 was rc=124 with no metric recorded): the
run ALWAYS emits its JSON line.  bench.py runs as a lightweight
COORDINATOR that spawns itself as a worker subprocess
(NDT_BENCH_WORKER=1): the worker takes the headline measurement first
and rewrites a snapshot file after every completed stage; the
coordinator -- never blocked in native code, so always responsive to
SIGTERM and its own deadline (NDT_BENCH_DEADLINE seconds, default 1080)
-- kills the worker when time is up and prints the latest snapshot.
This matters because a minutes-long XLA/Mosaic kernel compile holds the
worker's main thread inside native code where Python signal handlers
cannot run; a single in-process handler (the obvious design) would
never fire under the driver's `timeout`.  The worker also gates each
optional stage (download timing, VPU peak, utilization estimates,
secondary configs) on the remaining budget, and XLA compiles are cached
in .jax_cache so repeat runs skip the dominant cost.
"""

import json
import os
import signal
import subprocess
import sys
import time

_T0 = time.time()
_DEADLINE = _T0 + float(os.environ.get("NDT_BENCH_DEADLINE", "1080"))
_SNAPSHOT = os.environ.get("NDT_BENCH_SNAPSHOT") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_snapshot.json")

# Best-so-far record; the worker rewrites _SNAPSHOT with it after every
# completed stage, and the coordinator prints whatever snapshot exists
# when the worker finishes or time runs out.
_RESULT = {
    "metric": "Mrays/s/chip (4-D balls @1080p)",
    "value": 0.0,
    "unit": "Mrays/s",
    "vs_baseline": 0.0,
    "detail": {"status": "startup: no measurement yet"},
}


def _remaining():
    return _DEADLINE - time.time()


def _log(msg):
    print(f"bench[{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _snapshot():
    tmp = _SNAPSHOT + ".tmp"
    with open(tmp, "w") as f:
        f.write(json.dumps(_RESULT))
    os.replace(tmp, _SNAPSHOT)


def _coordinator():
    """Spawn the worker, babysit it against the deadline and incoming
    signals, and print exactly one JSON line from the latest snapshot."""
    try:
        os.unlink(_SNAPSHOT)
    except OSError:
        pass
    _snapshot()                       # a valid record exists from t=0
    env = dict(os.environ, NDT_BENCH_WORKER="1",
               NDT_BENCH_SNAPSHOT=_SNAPSHOT)
    proc = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                            stdout=sys.stderr, env=env)

    interrupted = []

    def _on_signal(signum, frame):
        interrupted.append(signum)

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    rc = None
    while rc is None and not interrupted and _remaining() > 10:
        try:
            rc = proc.wait(timeout=min(5.0, max(_remaining() - 10, 0.1)))
        except subprocess.TimeoutExpired:
            pass
    if rc is None:
        # deadline or signal: the worker may be GIL-stuck in a native
        # compile, so SIGKILL (SIGTERM could be deferred indefinitely)
        proc.kill()
        proc.wait()
    try:
        with open(_SNAPSHOT) as f:
            result = json.load(f)
    except Exception:
        result = _RESULT
    if rc is None or rc != 0:
        # rc None: we killed it (deadline/own signal); rc < 0: the driver's
        # `timeout` signalled the whole process group and the worker died
        # of the signal directly; rc > 0: worker crashed.  In every case
        # the snapshot holds the last fully-measured stage.
        why = (f"signal {interrupted[0]}" if interrupted else
               f"deadline {_DEADLINE - _T0:.0f}s" if rc is None else
               f"worker exit {rc}")
        result.setdefault("detail", {})["status"] = (
            f"stopped by {why} at t+{time.time() - _T0:.0f}s; "
            "partial result")
    print(json.dumps(result), flush=True)
    return 0 if result.get("value", 0) > 0 else (rc or 1)


def _build(scene_key, dim, width, height, frame=0, config=None):
    import dataclasses

    import numpy as np
    import jax

    from ndt_tpu.render.engine import _blocked_perm, _pixel_grid
    from ndt_tpu.scene.compile import compile_scene
    from ndt_tpu.scene.model import Scene
    from ndt_tpu.scenes import get_scene

    import jax.numpy as jnp

    mod = get_scene(scene_key)
    scn = Scene(scene_key, dim)
    total = mod.scene_frames(dim, config) if hasattr(mod, "scene_frames") \
        else 300
    mod.scene_setup(scn, dim, frame, total, config)
    if hasattr(mod, "scene_cleanup"):
        mod.scene_cleanup()
    if not scn.cam.prepared:
        scn.cam.aim()

    dt = np.float32
    scene_data = jax.device_put(compile_scene(scn, dt))
    cam = scn.cam.data(dt)
    cam = dataclasses.replace(cam, dir_x=cam.dir_x * dt(width / height))

    xx, yy = _pixel_grid(width, height, np.dtype(dt))
    perm, _ = _blocked_perm(width, height)
    from ndt_tpu.render.engine import RenderOptions
    from ndt_tpu.render.pallas_trace import RT
    R = xx.size
    # pad to the compaction quantum so the bounce loop takes the adaptive
    # block-gather ladder (engine._run_adaptive)
    c = RenderOptions.compact
    pad = (-R) % (RT * c * c)
    x = jnp.asarray(np.concatenate([xx.ravel()[perm], np.zeros(pad, dt)]))
    y = jnp.asarray(np.concatenate([yy.ravel()[perm], np.zeros(pad, dt)]))
    return scene_data, cam, x, y


def _measure(scene_data, cam, x, y, opts, K_hi=8, reps=5, sharded=False):
    """(mrays, rays_per_frame, s_per_frame_device) via the K-slope."""
    import jax
    import jax.numpy as jnp

    from ndt_tpu.render.engine import gen_rays, render_rays

    if sharded:
        # the -b r tile-sharded path (mesh over all local chips -- 1 in
        # this harness; the multi-chip shard_map program shape is what's
        # timed: per-chip it is the unmodified single-device render)
        from jax.sharding import PartitionSpec as P

        from ndt_tpu.parallel.mesh import make_pixel_mesh, replicate
        mesh = make_pixel_mesh()
        scene_data = replicate(mesh, scene_data)

        def _core(s, xs, ys, k):
            o, v = gen_rays(cam, xs, ys, k, opts, "center", False, False)
            c, d, n = render_rays(s, o, v, k, opts)
            return c, d, jax.lax.psum(n, "px")

        def render1(s, x, y, k):
            return jax.shard_map(
                _core, mesh=mesh,
                in_specs=(P(), P("px"), P("px"), P()),
                out_specs=(P("px"), P("px"), P()),
                check_vma=False)(s, x, y, k)
    else:
        def render1(s, x, y, k):
            o, v = gen_rays(cam, x, y, k, opts, "center", False, False)
            return render_rays(s, o, v, k, opts)

    # ONE jit with a dynamic frame count K (fori_loop with a traced bound
    # lowers to while) -- the giant render body is traced and compiled
    # exactly once per config; tracing/lowering dominates warm-cache wall
    # time (random150's kernel traces for minutes), so the old
    # three-trace scheme (nrays probe + K=1 jit + K_hi jit) tripled it.
    @jax.jit
    def f(s, x, y, k, K):
        def body(i, carry):
            acc, _ = carry
            c, d, n = render1(s, x, y, jax.random.fold_in(k, i))
            return acc + c.sum() + d.sum(), n
        return jax.lax.fori_loop(0, K, body,
                                 (jnp.float32(0), jnp.int32(0)))

    key = jax.random.PRNGKey(0)
    _, n0 = f(scene_data, x, y, key, 1)               # compile + warm
    nrays = int(n0)

    timed = {}
    for K in (1, K_hi):
        _ = float(f(scene_data, x, y, key, K)[0])     # warm (no compile)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(f(scene_data, x, y, key, K)[0])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        timed[K] = ts[len(ts) // 2]
    render_s = max((timed[K_hi] - timed[1]) / (K_hi - 1), 1e-9)
    dispatch_s = timed[1] - render_s
    return nrays / render_s / 1e6, nrays, render_s, dispatch_s


def _vpu_peak_gflops(reps=8):
    """Measured sustained f32 VPU throughput (GFLOP/s): P independent
    non-foldable update chains (z += 1e-7 * z * z: one mul + one fma =
    3 flops in 2 VPU instructions) over a VMEM-resident (256, 512) tile,
    scanned T times so the whole run is register/VMEM-bound compute.

    This replaces BENCH_r04's single dependent-FMA chain over a flat
    array, which measured ~343 GFLOP/s -- an overhead-bound number that
    two configs' useful-FLOP estimates exceeded (208% 'of peak', VERDICT
    r4 weak 4).  The chain must be nonlinear: an affine z*a+b chain
    constant-folds into a single fma and times pure dispatch.  Measured
    ~4.1 TFLOP/s on the bench v5e with this mix; est_pct_of_vpu_peak is
    est_useful_gflops / this, same flop-counting convention (fma = 2)."""
    import jax
    import jax.numpy as jnp

    P, U, T = 4, 64, 2000
    shape = (256, 512)

    @jax.jit
    def f(x):
        zs0 = tuple(x * (1.0 + 1e-3 * p) for p in range(P))

        def step(zs, _):
            for _ in range(U):
                zs = tuple(z + 1e-7 * (z * z) for z in zs)
            return zs, ()

        zs, _ = jax.lax.scan(step, zs0, None, length=T)
        return sum(z.sum() for z in zs)

    x = jnp.ones(shape, jnp.float32)
    _ = float(f(x))                               # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    n = shape[0] * shape[1]
    return 3.0 * U * P * T * n / ts[len(ts) // 2] / 1e9


def _family_flops(meta):
    """Approximate f32 op count of one (ray, candidate) evaluation per
    family, counted from pallas_trace._{sphere,plane,quadric,facet,
    hfacet}_eval (mul+add fused loosely; +-20%).  Order matches
    cull_lists' count columns (sph, pln, quad, fct, hf)."""
    D, A, B = meta.dim, meta.a_quad, meta.b_gate
    return [
        4 * D + 2 * D * (D - 1) + 14,                   # sphere
        8 * D + 12,                                     # plane
        10 * A * D + 2 * D * (D - 1) + 8 * A + 8 * B * D + 20,  # quadric
        32 * D + 2 * D * (D - 1) + 70,                  # facet
        14 * D + 44,                                    # hfacet
    ]


def _est_useful_flops_per_ray(sd, o, v):
    """Estimated useful intersection FLOPs per primary ray: the per-tile
    cull survivor counts (the exact lists the megakernel walks) times the
    per-family eval cost.  'Useful' = work on candidates that survive the
    same cull the kernel uses; the dense-regime utilization gap becomes a
    tracked number instead of prose (VERDICT r2 item 5)."""
    import functools

    import jax
    import numpy as np

    from ndt_tpu.render.pallas_trace import RT, cull_lists

    cl = functools.partial(jax.jit(cull_lists, static_argnames="meta"))
    total = 0.0
    for meta, tables in zip(sd.pmeta, sd.ptables):
        _, counts = cl(tables, o, v, meta)
        cnt = np.asarray(counts).astype(np.float64)    # [n_tiles, N_FAMS]
        fl = np.asarray(_family_flops(meta), np.float64)
        total += float((cnt * fl[None, :]).sum() * RT)
    return total / o.shape[0]


def _quality_config():
    """The quality-preset stage (VERDICT r4 item 7): builtin test scene,
    640x480, through the REAL host-driven frame path with the C's -q med
    equivalents (aa_depth 2, aa_diff 1, max_optic_depth 20,
    ndt.c:1589-1624): Whitted corner-grid pass + recursive refinement.
    Wall-clock (host refinement logic + tunnel dispatch included), so the
    number is conservative vs the device-only K-slope of the other
    configs."""
    import dataclasses

    import jax
    import numpy as np

    from ndt_tpu.render.adaptive import whitted_refine
    from ndt_tpu.render.engine import RenderOptions, _render_grid
    from ndt_tpu.scene.compile import compile_scene
    from ndt_tpu.scene.model import Scene
    from ndt_tpu.scenes import get_scene

    w, h = 640, 480
    mod = get_scene("test")
    scn = Scene("test", 4)
    mod.scene_setup(scn, 4, 0, 300, None)
    if hasattr(mod, "scene_cleanup"):
        mod.scene_cleanup()
    scn.cam.aim()
    dt = np.dtype(np.float32)
    sd = jax.device_put(compile_scene(scn, dt))
    cd = scn.cam.data(dt.type)
    cd = dataclasses.replace(cd, dir_x=cd.dir_x * dt.type(w / h))
    opts = RenderOptions(width=w, height=h, samples=1, whitted=True,
                         aa_diff=1, aa_depth=2, max_optic_depth=20,
                         tile=(w + 1) * (h + 1))
    amap = (1.0 / (w + 1), -0.5, -1.0 / (h + 1), 0.5)
    key = jax.random.PRNGKey(0)

    def once():
        gx = np.arange(w + 1, dtype=dt)
        gy = np.arange(h + 1, dtype=dt)
        xg, yg = np.meshgrid((amap[0] * gx + amap[1]).astype(dt.type),
                             (amap[2] * gy + amap[3]).astype(dt.type))
        c, _d, n = _render_grid(sd, cd, xg, yg, opts, "center", key)
        corners = np.asarray(c).reshape(h + 1, w + 1, 3)
        _img, n_res, extra = whitted_refine(
            sd, cd, corners, opts, opts.aa_diff, opts.aa_depth, key,
            eye="center", amap=amap, size=(w, h))
        return int(n) + int(extra), int(n_res)

    once()                                        # compile + warm
    t0 = time.perf_counter()
    n_rays, n_res = once()
    t = time.perf_counter() - t0
    return {"mrays_per_s": round(n_rays / t / 1e6, 2),
            "rays_per_frame": n_rays,
            "seconds_per_frame_wall": round(t, 4),
            "resampled_pct": round(100.0 * n_res / (w * h), 2),
            "resolution": f"{w}x{h}",
            "note": ("host-driven -q med path (whitted aa_depth 2, "
                     "aa_diff 1, max_optic_depth 20); wall-clock incl "
                     "host refinement + tunnel dispatch")}


def _wait_for_device(probe_timeout=120.0):
    """Wait for a responsive JAX backend; return its platform name.

    The dev harness's device tunnel can hang backend init indefinitely
    (jax.devices() blocks forever instead of raising).  Probe in throwaway
    subprocesses -- a hung probe can be killed and retried, whereas a hung
    jax import in THIS process would poison the cached backend for the
    whole run.  Retries until the tunnel answers or the global deadline
    nears; returns '' on give-up so main() can emit an explicit error
    record instead of stalling the driver."""
    import subprocess

    code = "import jax; print(jax.devices()[0].platform)"
    while True:
        try:
            p = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=min(probe_timeout,
                                           max(_remaining(), 5.0)))
            if p.returncode == 0 and p.stdout.strip():
                return p.stdout.strip().splitlines()[-1]
        except subprocess.TimeoutExpired:
            pass
        if _remaining() < probe_timeout:
            return ""
        _log("device tunnel unresponsive, retrying...")
        time.sleep(30)


def main():
    import numpy as np

    # Persistent compile cache: the megakernel compiles dominate bench
    # wall time; cached traces make repeat runs (and the driver's
    # end-of-round run after an in-round warmup) near-instant.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    os.environ.setdefault(
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    platform = _wait_for_device()
    if not platform:
        _RESULT["detail"] = {
            "error": "device tunnel unresponsive: jax backend init hung; "
                     "no measurement taken"}
        _snapshot()
        return 1
    _log(f"device up: {platform}")

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from ndt_tpu.render.engine import RenderOptions

    only1 = os.environ.get("NDT_BENCH_CONFIGS") == "1"

    # ---- config 1 (headline): 4-D balls @1080p --------------------------
    W, H = 1920, 1080
    sd, cam, x, y = _build("balls", 4, W, H, frame=0)
    opts = RenderOptions(width=W, height=H, samples=1, tile=x.size)
    _log("headline scene built; measuring")
    mrays, nrays, render_s, dispatch_s = _measure(sd, cam, x, y, opts,
                                                  K_hi=16, reps=7)
    _log(f"headline: {mrays:.1f} Mrays/s")

    baseline = 100.0  # Mrays/s/chip north star (BASELINE.json)
    detail = {
        "rays_per_frame": nrays,
        "seconds_per_frame_device": round(render_s, 4),
        "harness_dispatch_overhead_s": round(dispatch_s, 4),
        "resolution": "1920x1080",
    }
    _RESULT.update(value=round(mrays, 2),
                   vs_baseline=round(mrays / baseline, 4),
                   detail=detail)
    _snapshot()

    # ---- remaining stages, in PRIORITY order (VERDICT r4 item 3: the
    # BASELINE configs -- random600 above all -- must land inside the
    # deadline before any optional extra) --------------------------------
    import jax.numpy as jnp

    from ndt_tpu.render.engine import gen_rays, render_rays

    # VPU peak first: it is cheap (~10 s) and every config's est_util
    # needs the denominator
    vpu_peak = 0.0
    if _remaining() > 90:
        vpu_peak = _vpu_peak_gflops()
        detail["vpu_peak_gflops_measured"] = round(vpu_peak, 1)
        _snapshot()
        _log(f"vpu peak: {vpu_peak:.0f} GFLOP/s")

    def _util(sdc, camc, oc, xc, yc, n, rs):
        if vpu_peak <= 0 or _remaining() < 60:
            return {"est_util_skipped": "deadline"}
        try:
            op, vp = jax.jit(lambda xs, ys, k: gen_rays(
                camc, xs, ys, k, oc, "center", False, False))(
                    xc, yc, jax.random.PRNGKey(0))
            fppr = _est_useful_flops_per_ray(sdc, op, vp)
            gfs = fppr * n / rs / 1e9
            return {"est_useful_gflops_per_s": round(gfs, 1),
                    "est_pct_of_vpu_peak": round(100.0 * gfs / vpu_peak, 2)}
        except Exception as e:
            return {"est_util_error": f"{type(e).__name__}: {e}"[:200]}

    if _remaining() > 120:
        detail.update(_util(sd, cam, opts, x, y, nrays, render_s))
        _snapshot()

    configs = {}
    detail["configs"] = configs
    if not only1:
        specs = [
            # (name, scene, dim, W, H, frame, config, sharded) -- ordered
            # by round-over-round importance, NOT scene size: the dense
            # regime and the sharded animation frame carry the open perf
            # items, so they measure first if the deadline bites
            ("random600_5d", "random", 5, 640, 480, 0, "600", False),
            ("anim6d_sharded", "anim6d", 6, 640, 480, 1, None, True),
            ("random150_5d", "random", 5, 640, 480, 0, "150", False),
            ("hypercube", "hypercube", 4, 640, 480, 10, None, False),
            ("hypercube_walls", "hypercube", 4, 640, 480, 10, "walls",
             False),
            ("cluster5d", "cluster5d", 5, 640, 480, 0, None, False),
        ]
        for name, key_, dim, w, h, fr, cfg, sh in specs:
            if _remaining() < 150:
                configs[name] = {"skipped": "deadline"}
                continue
            try:
                _log(f"config {name}: building")
                sdc, camc, xc, yc = _build(key_, dim, w, h, frame=fr,
                                           config=cfg)
                oc = RenderOptions(width=w, height=h, samples=1,
                                   tile=xc.size)
                m, n, rs, ds = _measure(sdc, camc, xc, yc, oc, K_hi=8,
                                        reps=5, sharded=sh)
                configs[name] = {
                    "mrays_per_s": round(m, 2),
                    "rays_per_frame": n,
                    "seconds_per_frame_device": round(rs, 5),
                    "resolution": f"{w}x{h}",
                    **_util(sdc, camc, oc, xc, yc, n, rs),
                }
                _log(f"config {name}: {m:.2f} Mrays/s")
            except Exception as e:  # record, never sink the headline
                configs[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            _snapshot()

        # quality-preset config (VERDICT r4 item 7): the builtin test
        # scene through the REAL host-driven frame path with -q med
        # equivalents (Whitted AA depth 2, diff 1, max_optic_depth 20,
        # ndt.c:1589-1624) -- the adaptive/AA quality machinery gets a
        # tracked number (wall-clock, incl. host refinement logic)
        if _remaining() > 150:
            try:
                configs["builtin_qmed"] = _quality_config()
                _log("config builtin_qmed: "
                     f"{configs['builtin_qmed'].get('mrays_per_s')} Mrays/s"
                     f" ({configs['builtin_qmed'].get('resampled_pct')}%"
                     " resampled)")
            except Exception as e:
                configs["builtin_qmed"] = {
                    "error": f"{type(e).__name__}: {e}"[:300]}
            _snapshot()
        else:
            configs["builtin_qmed"] = {"skipped": "deadline"}

    # ---- optional extras, after every config has its number -------------
    if _remaining() > 120:
        # end-to-end including framebuffer download through the dev tunnel
        rays_fn = jax.jit(lambda s, x, y, k: render_rays(
            s, *gen_rays(cam, x, y, k, opts, "center", False, False),
            k, opts))
        t0 = time.perf_counter()
        _ = np.asarray(rays_fn(sd, x, y, jax.random.PRNGKey(0))[0])
        detail["seconds_incl_host_download"] = round(
            time.perf_counter() - t0, 4)
        _snapshot()
        _log("e2e download timed")

    if _remaining() > 180:
        # pipelined end-to-end: the frame in 4 tiles, each tile's download
        # started (copy_to_host_async) while the next tile computes -- the
        # engine's dispatch/download overlap (engine._render_grid)
        # measured on the exact path BENCH records (VERDICT r2 item 4).
        # Dispatch is async, so all 4 launches queue back-to-back and
        # downloads ride alongside.
        n_tiles = 4
        tr = x.size // n_tiles
        opts_t = RenderOptions(width=W, height=H, samples=1, tile=tr)
        tile_fn = jax.jit(lambda s, xs, ys, k: render_rays(
            s, *gen_rays(cam, xs, ys, k, opts_t, "center", False, False),
            k, opts_t))
        key0 = jax.random.PRNGKey(0)
        _ = np.asarray(tile_fn(sd, x[:tr], y[:tr], key0)[0])  # compile
        t0 = time.perf_counter()
        outs = []
        for i in range(n_tiles):
            c, d, _n = tile_fn(sd, x[i * tr:(i + 1) * tr],
                               y[i * tr:(i + 1) * tr],
                               jax.random.fold_in(key0, i))
            for a in (c, d):
                if hasattr(a, "copy_to_host_async"):
                    a.copy_to_host_async()
            outs.append((c, d))
        _cols = [np.asarray(c) for c, _ in outs]
        detail["seconds_incl_host_download_pipelined_4tile"] = round(
            time.perf_counter() - t0, 4)
        _snapshot()
        _log("pipelined path timed")

    # C reference binary (-O3 -t 1) on the SAME configs, measured once on
    # this dev host's single vCPU 2026-08-18 (the reference publishes no
    # numbers; see BASELINE.md and docs/ARCHITECTURE.md section 10) --
    # static context for detail.configs' seconds_per_frame_device
    detail["c_reference_s_per_frame_1core_static"] = {
        "balls_1080p_headline": 13.16,
        "hypercube": 2.11,
        "hypercube_walls": 7.41,
        "random150_5d": 30.72,
        "cluster5d": 12.96,
        "anim6d_sharded": 10.27,
        "random600_5d": 1332.48,
    }
    detail["bench_wall_s"] = round(time.time() - _T0, 1)

    _snapshot()
    return 0


if __name__ == "__main__":
    if os.environ.get("NDT_BENCH_WORKER") != "1":
        sys.exit(_coordinator())
    try:
        rc = main()
    except Exception as e:
        _RESULT.setdefault("detail", {})["status"] = (
            f"exception at t+{time.time() - _T0:.0f}s: "
            f"{type(e).__name__}: {e}"[:300])
        _snapshot()
        raise
    sys.exit(rc)
