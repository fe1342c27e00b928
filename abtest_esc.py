"""A/B driver for the stack-mode escalation / batched-pop knobs (r5).

Usage: [env knobs] python abtest_esc.py <config>
Configs: anim6d | random150 | random600 | builtin | balls.
Prints one JSON line with the K-slope Mrays/s for the current env
(NDT_STACK_ESCALATE, NDT_ESC_TAINT_MAX, NDT_STACK_POP,
NDT_STACK_POP_WMAX).  Run once per env combo: the knobs are module
constants read at import time.
"""
import json
import os
import sys

import bench
from ndt_tpu.render.engine import RenderOptions

SPECS = {
    "anim6d": ("anim6d", 6, 640, 480, 1, None, True),
    "random150": ("random", 5, 640, 480, 0, "150", False),
    "random600": ("random", 5, 640, 480, 0, "600", False),
    "builtin": ("test", 4, 640, 480, 0, None, False),
    "balls": ("balls", 4, 1920, 1080, 0, None, False),
}

cfg = sys.argv[1] if len(sys.argv) > 1 else "anim6d"
name, dim, W, H, fr, conf, sh = SPECS[cfg]
sd, cam, x, y = bench._build(name, dim, W, H, frame=fr, config=conf)
opts = RenderOptions(width=W, height=H, samples=1, tile=x.size)
m, n, rs, ds = bench._measure(sd, cam, x, y, opts, K_hi=8, reps=5,
                              sharded=sh)
tag = {k: os.environ.get(k, "") for k in
       ("NDT_STACK_ESCALATE", "NDT_ESC_TAINT_MAX", "NDT_STACK_POP",
        "NDT_STACK_POP_WMAX")}
print(json.dumps({"cfg": cfg, "env": tag, "mrays": round(m, 2),
                  "rays_per_frame": int(n), "s_frame": round(rs, 5)}))
