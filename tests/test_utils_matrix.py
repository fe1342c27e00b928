"""matrix / texmap / kdtree utility modules."""

import numpy as np
import pytest

from ndt_tpu.utils import kdtree, matrix
from ndt_tpu.utils.texmap import MapMode, TextureMap


def test_matrix_solve_reference_selftest():
    """matrix_test_solve (matrix.c:398-442): a known 3x3 system."""
    a = np.array([[2.0, 1, -1], [-3, -1, 2], [-2, 1, 2]])
    b = np.array([8.0, -11, -3])
    x = matrix.gauss_elim_solve(a, b)
    np.testing.assert_allclose(x, [2, 3, -1], atol=1e-12)
    np.testing.assert_allclose(matrix.lu_solve(a, b), [2, 3, -1], atol=1e-12)


def test_matrix_random_roundtrips():
    rng = np.random.RandomState(0)
    for n in (2, 4, 7):
        a = rng.randn(n, n) + np.eye(n) * n
        b = rng.randn(n)
        np.testing.assert_allclose(a @ matrix.gauss_elim_solve(a, b), b,
                                   atol=1e-9)
        inv = matrix.invert(a)
        np.testing.assert_allclose(a @ inv, np.eye(n), atol=1e-9)
        np.testing.assert_allclose(matrix.det(a), np.linalg.det(a),
                                   rtol=1e-9)
        L, U = matrix.lu_decompose(a)
        np.testing.assert_allclose(L @ U, a, atol=1e-9)


def test_rotation_matches_mathnd():
    from ndt_tpu import mathnd

    v = np.array([1.0, 2.0, 3.0, 4.0])
    m = matrix.rotation(4, 0, 2, 0.8)
    got = m @ v
    want = mathnd.rotate(v, None, 0, 2, 0.8)
    np.testing.assert_allclose(got, want, atol=2e-4)  # mathnd eps-zeroes


def test_texture_map_modes():
    img = np.zeros((8, 8, 3))
    img[:, :4] = [1, 0, 0]
    img[:, 4:] = [0, 1, 0]
    base = np.zeros(4)
    basis = np.eye(4)[:3]
    for mode in MapMode:
        tm = TextureMap(img, base, basis, mode=mode)
        c = tm.sample(np.array([0.3, 0.2, 0.1, 0.0]))
        assert c.shape == (3,)
        assert np.isfinite(c).all()


def test_texture_local_coords_least_squares():
    base = np.array([1.0, 1, 1, 1])
    basis = np.array([[1.0, 0, 0, 0], [0, 2.0, 0, 0]])
    tm = TextureMap(np.zeros((4, 4, 3)), base, basis)
    c = tm.local_coords(np.array([3.0, 5.0, 1.0, 1.0]))
    np.testing.assert_allclose(c, [2.0, 2.0], atol=1e-12)


def test_kdtree_build_and_query():
    rng = np.random.RandomState(1)
    items = []
    centers = rng.randn(30, 4) * 20
    for k, c in enumerate(centers):
        items.append(kdtree.item_from_bounds([(c, 1.0)], k))
    root = kdtree.build(items)
    assert root.dim >= 0  # it actually split

    # a ray toward object 0 must include it among candidates
    o = centers[0] + np.array([50.0, 0, 0, 0])
    v = np.array([-1.0, 0, 0, 0])
    cands = kdtree.query_ray(root, o, v)
    assert 0 in cands
    assert len(cands) < 30  # culled something

    dims, bounds, children, offsets, ids = kdtree.flatten(root)
    assert sorted(ids.tolist()) == sorted(range(30))
    assert (children[dims >= 0] >= 0).all()


def test_kdtree_infinite_radius_items():
    it = kdtree.item_from_bounds([(np.zeros(3), -1.0)], 0)
    # radius taken as |r| (object_kdlist_add uses fabs, object.c:652)
    assert (it.bb.upper >= 1.0 - 1e-12).all()
