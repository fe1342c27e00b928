#!/usr/bin/env python
"""Benchmark: the 4-D `balls` scene at 1080p on one chip (BASELINE.md).

Prints ONE JSON line:
  {"metric": "Mrays/s/chip", "value": N, "unit": "Mrays/s",
   "vs_baseline": N/100}

Methodology: compile+warm a frame, then time renders of the flagship frame
(camera rays + per-light shadow rays + reflection bounces all count as rays,
matching the trace-call accounting a CPU ray tracer would report).
"""

import json
import sys
import time

import numpy as np


def main():
    from ndt_tpu.render.engine import RenderOptions, render_frame
    from ndt_tpu.scene.model import Scene
    from ndt_tpu.scenes import get_scene

    width, height = 1920, 1080
    mod = get_scene("balls")
    scn = Scene("balls", 4)
    mod.scene_setup(scn, 4, 0, 1500)

    opts = RenderOptions(width=width, height=height, samples=1,
                         tile=1 << 17)
    # warm-up: compile
    img, _, nrays = render_frame(scn, opts)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        img, _, nrays = render_frame(scn, opts)
    elapsed = (time.perf_counter() - t0) / reps

    mrays = nrays / elapsed / 1e6
    baseline = 100.0  # Mrays/s/chip north star (BASELINE.json)
    print(json.dumps({
        "metric": "Mrays/s/chip (4-D balls @1080p)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline, 4),
        "detail": {
            "rays_per_frame": int(nrays),
            "seconds_per_frame": round(elapsed, 4),
            "resolution": f"{width}x{height}",
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
