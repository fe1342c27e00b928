"""N-D vector math vs the C reference's formulas (vectNd.c).

The hardcoded vectors below were produced by compiling the reference's
vectNd.c into a dump harness (srand48(42), 4-D) -- they pin reflect/refract
to the C bit patterns.  Property tests cover the rest.
"""

import numpy as np
import pytest

from ndt_tpu import mathnd
from ndt_tpu.constants import EPSILON

# from the reference mathdump (srand48(42), first two draws), 17 sig digits
C_U1 = [0.39331389589108484, -0.62556205988387403, -0.67377485806362403,
        -0.0019311069790386554]
C_N1 = [-0.31459704256218401, -0.15532208402338199, 0.71288141605324995,
        -0.042371418710743569]
C_INDEX1 = 1.8816248886112774
C_REFRACT1 = [0.43586384159435804, -0.22046601591573983,
              -0.87209272843096164, 0.029524912103006312]
C_REFLECT1 = [-0.11037762658173417, -0.87424340900979403,
              0.46759736486013548, -0.069770665246752447]


def test_reflect_matches_c():
    got = mathnd.reflect(np.array(C_U1), np.array(C_N1), 1.0)
    np.testing.assert_allclose(got, C_REFLECT1, atol=1e-14)


def test_refract_matches_c():
    got = mathnd.refract(np.array(C_U1), np.array(C_N1), C_INDEX1)
    np.testing.assert_allclose(got, C_REFRACT1, atol=1e-13)


def test_reflect_involution():
    rng = np.random.RandomState(0)
    for d in (3, 4, 5, 6):
        u = rng.randn(d)
        n = rng.randn(d)
        r = mathnd.reflect(u, n, 1.0)
        rr = mathnd.reflect(r, n, 1.0)
        np.testing.assert_allclose(rr, u, atol=1e-12)
        # mirror reflection preserves length
        assert abs(np.linalg.norm(r) - np.linalg.norm(u)) < 1e-12


def test_refract_snell_angles():
    rng = np.random.RandomState(1)
    for d in (3, 4, 5):
        n = mathnd.unitize(rng.randn(d))
        u = mathnd.unitize(rng.randn(d))
        if np.dot(-u, n) < 0:
            u = mathnd.reflect(u, n, 1.0)  # make it approach the surface
        index = 1.5
        out = mathnd.refract(u, n, index)
        sin_in = np.sin(mathnd.angle(-u, n))
        sin_out = np.sin(mathnd.angle(out, -n))
        np.testing.assert_allclose(sin_in / sin_out, index, rtol=1e-8)


def test_total_internal_reflection():
    # dense-to-sparse at a grazing angle: theta_out = pi - theta_in
    n = np.array([0.0, 1.0, 0.0])
    u = mathnd.unitize(np.array([0.95, 0.3, 0.0]))  # exiting upward
    out = mathnd.refract(u, n, 2.5)
    assert np.isfinite(out).all()


def test_rotate_plane_and_epsilon_zeroing():
    v = np.array([1.0, 0.0, 5e-5, 2.0])
    got = mathnd.rotate(v, None, 0, 1, np.pi / 2)
    # (1,0) -> (0,1) in the 0-1 plane; the 5e-5 component is zeroed
    # (vectNd.c:251-255 zeroes ALL small components after rotation)
    np.testing.assert_allclose(got, [0.0, 1.0, 0.0, 2.0], atol=1e-12)


def test_rotate_zero_angle_is_identity():
    v = np.array([1.0, 2e-5, 0.0, 2.0])
    got = mathnd.rotate(v, None, 0, 1, 0.0)
    np.testing.assert_array_equal(got, v)  # strict no-op (vectNd.c:208)


def test_rotate2_matches_rotate_on_axis_planes():
    rng = np.random.RandomState(2)
    for d in (3, 4, 6):
        v = rng.randn(d)
        e0 = np.eye(d)[0]
        e1 = np.eye(d)[1]
        ang = 0.7
        got = mathnd.rotate2(v, None, e0, e1, ang)
        want = mathnd.rotate(v, None, 0, 1, ang)
        # rotate() zeroes small components; avoid that by using values >> eps
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_orthogonalize():
    rng = np.random.RandomState(3)
    a, b = rng.randn(5), rng.randn(5)
    o1, o2 = mathnd.orthogonalize(a, b)
    assert abs(np.dot(o1, o2)) < 1e-12
    np.testing.assert_allclose(np.linalg.norm(o1), 1.0)
    np.testing.assert_allclose(np.linalg.norm(o2), 1.0)


def test_angle3():
    p1 = np.array([1.0, 0, 0, 0])
    p2 = np.zeros(4)
    p3 = np.array([0, 2.0, 0, 0])
    np.testing.assert_allclose(mathnd.angle3(p1, p2, p3), np.pi / 2)


def test_unitize_guard():
    tiny = np.full(4, 1e-6)
    np.testing.assert_array_equal(mathnd.unitize(tiny), tiny)  # below EPSILON


def test_proj():
    a = np.array([3.0, 4.0, 0.0])
    onto = np.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(mathnd.proj(a, onto * 2), [3, 0, 0])
    np.testing.assert_allclose(mathnd.proj_unit(a, onto), [3, 0, 0])
