import os, sys, time
grain = sys.argv[1]
os.environ["NDT_COMPACT_GRAIN"] = grain
import bench, jax
import jax.numpy as jnp
from ndt_tpu.render.engine import RenderOptions, gen_rays, render_rays

specs = [("balls", 4, 1920, 1080, 0, None),
         ("random", 5, 640, 480, 0, "150"),
         ("anim6d", 6, 640, 480, 1, None),
         ("hypercube", 4, 640, 480, 10, "walls")]
for name, dim, W, H, fr, cfg in specs:
    sd, cam, x, y = bench._build(name, dim, W, H, frame=fr, config=cfg)
    opts = RenderOptions(width=W, height=H, samples=1, tile=x.size)
    def render1(s, x, y, k, cam=cam, opts=opts):
        o, v = gen_rays(cam, x, y, k, opts, 'center', False, False)
        return render_rays(s, o, v, k, opts)
    @jax.jit
    def f(s, x, y, k, render1=render1):
        c, d, n = render1(s, x, y, k)
        return c.sum() + d.sum() + n.astype(jnp.float32)
    chk = float(f(sd, x, y, jax.random.PRNGKey(0)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(sd, x, y, jax.random.PRNGKey(0)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{grain} {name}{cfg or ''}: {ts[len(ts)//2]*1000:.1f} ms  chk={chk}")
