"""nelder-mead, kmeans, bounding, drand48, timing."""

import numpy as np

from ndt_tpu.utils.bounding import optimal_bounding_sphere, radius_about
from ndt_tpu.utils.drand48 import Drand48
from ndt_tpu.utils.kmeans import build_cluster_tree, kmeans
from ndt_tpu.utils.nelder_mead import NelderMead, minimize
from ndt_tpu.utils.timing import Timer


def test_drand48_exact_sequence():
    """First values of srand48(1); drand48() -- libc-verified constants."""
    rng = Drand48(1)
    got = [rng() for _ in range(3)]
    # glibc srand48(1); drand48() x3, printed at %.17g
    want = [0.041630344771878214, 0.45449244472862915, 0.8348172181669149]
    np.testing.assert_array_equal(got, want)


def test_nelder_mead_quadratic():
    target = np.array([3.0, -2.0, 5.0])
    best = minimize(lambda x: ((x - target) ** 2).sum(), np.zeros(3),
                    eps=1e-8, max_iterations=2000)
    np.testing.assert_allclose(best, target, atol=1e-3)


def test_nelder_mead_history():
    nm = NelderMead(2).set_seed([0.0, 0.0])
    fn = lambda x: (x ** 2).sum()
    while not nm.done(1e-6, 200):
        x = nm.next_point()
        nm.add_result(x, fn(x))
    assert len(nm.history) > 3
    assert nm.best_value() < 1e-4


def test_optimal_bounding_sphere_two_points():
    pts = [(np.array([0.0, 0, 0, 0]), 0.0), (np.array([2.0, 0, 0, 0]), 0.0)]
    center, radius = optimal_bounding_sphere(pts)
    # minimal sphere: center (1,0,0,0), radius 1
    assert radius <= 1.01
    assert radius_about(pts, center) <= radius + 1e-12


def test_bounding_sphere_covers_points():
    rng = np.random.RandomState(0)
    pts = [(rng.randn(5) * 3, abs(rng.randn()) * 0.5) for _ in range(12)]
    center, radius = optimal_bounding_sphere(pts)
    for c, r in pts:
        assert np.linalg.norm(center - c) + r <= radius + 1e-9


def test_kmeans_separates_clusters():
    rng = np.random.RandomState(1)
    a = rng.randn(20, 4) + 10
    b = rng.randn(20, 4) - 10
    labels = kmeans(np.vstack([a, b]), 2)
    assert len(set(labels[:20])) == 1
    assert len(set(labels[20:])) == 1
    assert labels[0] != labels[20]


def test_cluster_tree():
    from ndt_tpu.scene.model import Object

    objs = []
    rng = np.random.RandomState(2)
    for k in range(20):
        o = Object(4, "sphere", f"s{k}")
        o.add_pos(rng.randn(4) * 10).add_size(0.5)
        objs.append(o)
    root = build_cluster_tree(4, objs, 4)
    assert root.type_name == "cluster"

    def leaves(o):
        if o.type_name == "cluster":
            return sum((leaves(c) for c in o.children), [])
        return [o]

    assert len(leaves(root)) == 20


def test_timer():
    t = Timer()
    assert t.elapsed() >= 0
    assert t.remaining(1, 2) >= 0


def test_native_kd_cells_matches_python():
    """The C++ kd leaf-cell builder (native/kdsplit.cc) must reproduce the
    Python reference implementation bit-for-bit (same candidate order,
    same f64 clips)."""
    import ndt_tpu.native as native
    from ndt_tpu.utils.kdtree import build_c_exact

    if native.get_lib() is None:  # no compiler in this environment
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.RandomState(3)
    n = 80
    c = rng.rand(n, 5) * 60
    lo = c - rng.rand(n, 5) * 4
    hi = c + rng.rand(n, 5) * 4
    lo[0], hi[0] = np.inf, -np.inf          # inverted (never-bounded) row
    native_cells = build_c_exact(lo, hi)

    saved = native.kd_cells
    native.kd_cells = lambda *a: None       # force the Python path
    try:
        py_cells = build_c_exact(lo, hi)
    finally:
        native.kd_cells = saved

    assert [len(x) for x in native_cells] == [len(x) for x in py_cells]
    for a, b in zip(native_cells, py_cells):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
