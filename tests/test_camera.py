"""Camera aiming vs values dumped from the C reference (camera_print after
camera_aim on the built-in test scene, D=4, frame 0)."""

import numpy as np

from ndt_tpu.camera import Camera, CameraType, target_point
from ndt_tpu.scene.model import Scene
from ndt_tpu.scenes import get_scene


def _aimed_test_camera():
    mod = get_scene("test")
    scn = Scene("test", 4)
    mod.scene_setup(scn, 4, 0, 300)
    return scn.cam.aim()


def test_aim_matches_c_reference():
    cam = _aimed_test_camera()
    # camera_print output of the patched reference binary
    np.testing.assert_allclose(cam.leveling, 2.402, atol=5e-4)
    np.testing.assert_allclose(cam.pos, [60, 40, 0, 5], atol=1e-12)
    np.testing.assert_allclose(
        cam.img_orig, [0.752919, -1.85736, 20.4363, -0.109073], atol=1e-4)
    np.testing.assert_allclose(
        cam.dir_x, [12.233, -2.26978e-06, 35.7187, 1.01545], atol=1e-3)
    np.testing.assert_allclose(
        cam.dir_y, [-19.8282, 31.4174, 6.79834, -0.264668], atol=1e-3)
    np.testing.assert_allclose(
        cam.local_z, [-0.784334, -0.554123, 0.270543, -0.0676357], atol=1e-5)
    np.testing.assert_allclose(
        cam.left_eye, [59.9595, 40, -0.118214, 4.99664], atol=1e-4)


def test_target_point_normal_projects_to_focal_surface():
    cam = _aimed_test_camera()
    cd = cam.data(np.float64)
    x = np.array([0.1])
    y = np.array([-0.2])
    pt = np.asarray(target_point(cd, x, y, cd.focal_distance))[0]
    # the focal scaling preserves the ray direction (camera.c:565-575)
    raw = cam.img_orig + 0.1 * cam.dir_x - 0.2 * cam.dir_y - cam.pos
    d1 = raw / np.linalg.norm(raw)
    d2 = (pt - cam.pos) / np.linalg.norm(pt - cam.pos)
    np.testing.assert_allclose(d1, d2, atol=1e-12)
    # and scales |pixel - pos| by focal_distance / screen_dist
    screen_dist = np.linalg.norm(cam.img_orig - cam.pos)
    np.testing.assert_allclose(
        np.linalg.norm(pt - cam.pos),
        cam.focal_distance / screen_dist * np.linalg.norm(raw), rtol=1e-12)
    # the central pixel sits exactly at the focal distance
    ctr = np.asarray(target_point(cd, np.array([0.0]), np.array([0.0]),
                                  cd.focal_distance))[0]
    np.testing.assert_allclose(np.linalg.norm(ctr - cam.pos),
                               cam.focal_distance, rtol=1e-9)


def test_vr_target_point():
    cam = Camera(4, type=CameraType.VR)
    cam.set_aim(np.zeros(4), np.array([0, 0, 10.0, 0]), None, 0.0)
    cam.aim()
    cd = cam.data(np.float64)
    # x=0, y=0 looks straight down localZ
    pt = np.asarray(target_point(cd, np.array([0.0]), np.array([0.0]), 5.0))[0]
    np.testing.assert_allclose(pt, cam.pos + 5.0 * cam.local_z, atol=1e-9)


def test_pano_target_point():
    cam = Camera(4, type=CameraType.PANO)
    cam.set_aim(np.zeros(4), np.array([0, 0, 10.0, 0]), None, 0.0)
    cam.aim()
    cd = cam.data(np.float64)
    pt = np.asarray(target_point(cd, np.array([0.25]), np.array([0.0]), 5.0))[0]
    # quarter turn of the default 2*pi hFov: along localX
    np.testing.assert_allclose(pt, cam.pos + 5.0 * cam.local_x, atol=1e-6)


def test_focus():
    cam = _aimed_test_camera()
    point = cam.pos + 7.5 * cam.local_z + 2.0 * cam.local_x
    cam.focus(point)
    np.testing.assert_allclose(cam.focal_distance, 7.5, atol=1e-9)


def test_focus_multi_sets_aperture():
    cam = _aimed_test_camera()
    pts = np.stack([cam.view_target + d for d in np.eye(4) * 3.0])
    cam.focus_multi(pts, confusion_radius=0.05)
    assert cam.aperture_radius > 0
    assert cam.focal_distance > 0


def test_flip_and_zoom():
    cam = Camera(4)
    cam.set_aim(np.zeros(4), np.array([0, 0, 10.0, 0]), None, 0.0)
    cam.zoom = 2.0
    cam.flip_x = True
    cam.aim_naive()
    cam2 = Camera(4)
    cam2.set_aim(np.zeros(4), np.array([0, 0, 10.0, 0]), None, 0.0)
    cam2.aim_naive()
    np.testing.assert_allclose(cam.dir_x, -cam2.dir_x / 2.0, atol=1e-12)
