#!/usr/bin/env python
"""Benchmark: the 4-D `balls` scene at 1080p on one chip (BASELINE.md).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mrays/s", "vs_baseline": N/100}

Methodology: the full render (camera rays, per-light shadow rays, reflection
bounces -- each trace counts as a ray, matching a CPU tracer's accounting)
runs on-device and is forced with a checksum reduction, so the number
measures rendering throughput.  The framebuffer download is reported
separately in "detail" (in this dev harness device<->host goes through a
network tunnel that a production host's PCIe link does not have).
"""

import json
import sys
import time


def main():
    import numpy as np
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ndt_tpu.render.engine import (RenderOptions, _blocked_perm,
                                       _pixel_grid, gen_rays, render_rays)
    from ndt_tpu.scene.compile import compile_scene
    from ndt_tpu.scene.model import Scene
    from ndt_tpu.scenes import get_scene

    width, height = 1920, 1080
    mod = get_scene("balls")
    scn = Scene("balls", 4)
    mod.scene_setup(scn, 4, 0, 1500)
    scn.cam.aim()

    dt = np.float32
    scene_data = jax.device_put(compile_scene(scn, dt))
    cam_data = dataclasses.replace(
        scn.cam.data(dt), dir_x=scn.cam.data(dt).dir_x * dt(width / height))

    xx, yy = _pixel_grid(width, height, np.dtype(dt))
    perm, inv = _blocked_perm(width, height)
    R = 1 << 21
    pad = R - xx.size
    x = jnp.asarray(np.concatenate([xx.ravel()[perm], np.zeros(pad, dt)]))
    y = jnp.asarray(np.concatenate([yy.ravel()[perm], np.zeros(pad, dt)]))
    key = jax.random.PRNGKey(0)
    opts = RenderOptions(width=width, height=height, samples=1, tile=R)

    rays_fn = jax.jit(
        lambda s, x, y, k: render_rays(
            s, *gen_rays(cam_data, x, y, k, opts, "center", False, False),
            k, opts),
        static_argnames=())

    def make_k(K):
        """K chained frame renders in ONE device program, forced by a
        scalar checksum: the (K_hi - K_lo) slope isolates pure device time
        from this harness's per-dispatch tunnel latency (~25 ms, absent on
        a production PCIe-attached host)."""
        @jax.jit
        def f(s, x, y, k):
            def body(i, acc):
                o, v = gen_rays(cam_data, x, y, jax.random.fold_in(k, i),
                                opts, "center", False, False)
                c, d, n = render_rays(s, o, v, jax.random.fold_in(k, i),
                                      opts)
                return acc + c.sum() + d.sum() + n.astype(jnp.float32)
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return f

    nrays = int(jax.jit(lambda s, x, y, k: rays_fn(s, x, y, k)[2])(
        scene_data, x, y, key))

    reps = 7
    timed = {}
    for K in (1, 16):
        f = make_k(K)
        _ = float(f(scene_data, x, y, key))           # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            chk = float(f(scene_data, x, y, key))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        timed[K] = ts[len(ts) // 2]                   # median: the dispatch
        # tunnel in this harness adds +-3 ms jitter per execution
    render_s = (timed[16] - timed[1]) / 15
    dispatch_s = timed[1] - render_s

    # end-to-end including the framebuffer download through this harness's
    # device tunnel (one frame)
    t0 = time.perf_counter()
    img = np.asarray(rays_fn(scene_data, x, y, key)[0])
    e2e_s = time.perf_counter() - t0

    mrays = nrays / render_s / 1e6
    baseline = 100.0  # Mrays/s/chip north star (BASELINE.json)
    print(json.dumps({
        "metric": "Mrays/s/chip (4-D balls @1080p)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline, 4),
        "detail": {
            "rays_per_frame": nrays,
            "seconds_per_frame_device": round(render_s, 4),
            "harness_dispatch_overhead_s": round(dispatch_s, 4),
            "seconds_incl_host_download": round(e2e_s, 4),
            "resolution": f"{width}x{height}",
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
