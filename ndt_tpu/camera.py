"""N-D camera: aiming, leveling, stereo eyes, focus (camera.{h,c} rebuild).

All aiming math runs host-side in numpy float64 at scene-prep time (it is
per-frame scalar work, not on the ray hot path) and produces a plain-array
``CameraData`` pytree consumed by the device ray generator
(render/engine.py).  The aim algorithm is the reference's N-D generalization:
rotate the default axis-aligned camera toward the target through every (i, j)
coordinate-plane via atan2 of rise/run (camera.c:257-289), after an optional
golden-search over roll angle that levels the camera against an 'up' vector
(camera.c:132-178).
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

from ndt_tpu import mathnd
from ndt_tpu.constants import EPSILON, EYE_OFFSET


class CameraType(enum.IntEnum):
    """camera.h:16-19."""

    NORMAL = 0  # planar virtual screen
    VR = 1      # spherical screen
    PANO = 2    # cylindrical screen


@dataclasses.dataclass
class Camera:
    """Host camera state; mirrors the reference ``camera`` struct
    (camera.h:32-75).  Call :meth:`aim` after setting the view parameters to
    derive the render-ready vectors (pos/dirX/dirY/imgOrig/eyes/locals)."""

    dim: int
    type: CameraType = CameraType.NORMAL
    view_point: np.ndarray = None
    view_target: np.ndarray = None
    up: np.ndarray = None
    rotation: float = 0.0
    leveling: float = 0.0
    zoom: float = 1.0
    flip_x: bool = False
    flip_y: bool = False
    eye_offset: float = EYE_OFFSET
    h_fov: float = 2.0 * np.pi
    v_fov: float = np.pi / 2.0
    focal_distance: float = 100.0
    aperture_radius: float = 0.0

    # derived by aim()
    pos: np.ndarray = None
    img_orig: np.ndarray = None
    dir_x: np.ndarray = None
    dir_y: np.ndarray = None
    left_eye: np.ndarray = None
    right_eye: np.ndarray = None
    local_x: np.ndarray = None
    local_y: np.ndarray = None
    local_z: np.ndarray = None
    prepared: bool = False

    def __post_init__(self):
        d = self.dim
        z = lambda: np.zeros(d, dtype=np.float64)
        if self.view_point is None:
            self.view_point = z()
        if self.view_target is None:
            self.view_target = z()
        if self.up is None:
            self.up = z()
        self._reset_derived()

    def _reset_derived(self, focal_len=2.0, x_len=1.0, y_len=1.0):
        """camera_init/camera_reset (camera.c:63-130): default camera sits at
        the origin looking down +e2 with a screen ``focal_len`` away."""
        d = self.dim
        e = np.eye(d, dtype=np.float64)
        self.pos = np.zeros(d)
        self.dir_x = e[0] * x_len
        self.dir_y = e[1] * y_len
        self.img_orig = e[2] * focal_len
        self.left_eye = -self.eye_offset * e[0]
        self.right_eye = self.eye_offset * e[0]
        self.local_x = e[0].copy()
        self.local_y = e[1].copy()
        self.local_z = e[2].copy()
        self.prepared = False

    def set_aim(self, pos, target, up=None, rotation=0.0):
        """camera_set_aim (camera.c:329-341)."""
        self._reset_derived()
        self.view_point = np.asarray(pos, dtype=np.float64)
        self.view_target = np.asarray(target, dtype=np.float64)
        if up is not None:
            self.up = np.asarray(up, dtype=np.float64)
        self.rotation = float(rotation)
        self.leveling = 0.0
        return self

    def aim_naive(self):
        """camera_aim_naive (camera.c:180-327): reset to the default frame,
        then walk every ordered (i, j) dimension pair rotating the camera's
        defining points so the view axis lines up with the target."""
        d = self.dim
        pos = self.view_point.copy()
        target = self.view_target.copy()
        rot = self.rotation + self.leveling

        # reset, preserving the current focal length (|pos - imgOrig| of the
        # previous derived state) like camera_reset does
        focal_len = float(mathnd.dist(self.pos, self.img_orig))
        x_len = float(mathnd.l2norm(self.dir_x))
        y_len = float(mathnd.l2norm(self.dir_y))
        self._reset_derived(focal_len, x_len, y_len)

        target_dist = float(mathnd.dist(pos, target))
        focal_len2 = float(mathnd.l2norm(self.img_orig))
        self.img_orig = mathnd.unitize(self.img_orig) * target_dist
        self.dir_x = self.dir_x * (target_dist / focal_len2)
        self.dir_y = self.dir_y * (target_dist / focal_len2)

        pos_x = self.img_orig + self.dir_x
        pos_y = self.img_orig + self.dir_y

        # translate the defining points to the view point
        self.pos = self.pos + pos
        self.left_eye = self.left_eye + pos
        self.right_eye = self.right_eye + pos
        pos_x = pos_x + pos
        pos_y = pos_y + pos
        self.img_orig = self.img_orig + pos

        # roll in the screen plane before aiming (camera.c:249-254)
        pts = [pos_x, pos_y, self.img_orig, self.left_eye, self.right_eye]
        if rot != 0.0:
            pts = [mathnd.rotate(p, self.pos, 0, 1, rot) for p in pts]
        pos_x, pos_y, self.img_orig, self.left_eye, self.right_eye = pts

        # aim via atan2 in every ordered (i, j) plane (camera.c:257-289)
        for i in range(d):
            for j in range(d):
                if i == j:
                    continue
                cam_rise = self.img_orig[j] - self.pos[j]
                cam_run = self.img_orig[i] - self.pos[i]
                tar_rise = target[j] - self.pos[j]
                tar_run = target[i] - self.pos[i]
                if abs(cam_rise) < EPSILON:
                    cam_rise = 0.0
                if abs(cam_run) < EPSILON:
                    cam_run = 0.0
                if abs(tar_rise) < EPSILON:
                    tar_rise = 0.0
                if abs(tar_run) < EPSILON:
                    tar_run = 0.0
                cam_angle = np.arctan2(cam_rise, cam_run)
                tar_angle = np.arctan2(tar_rise, tar_run)
                if tar_angle < cam_angle:
                    tar_angle += 2.0 * np.pi
                ang = tar_angle - cam_angle
                pos_x = mathnd.rotate(pos_x, self.pos, i, j, ang)
                pos_y = mathnd.rotate(pos_y, self.pos, i, j, ang)
                self.img_orig = mathnd.rotate(self.img_orig, self.pos, i, j, ang)
                self.left_eye = mathnd.rotate(self.left_eye, self.pos, i, j, ang)
                self.right_eye = mathnd.rotate(self.right_eye, self.pos, i, j, ang)

        self.dir_x = pos_x - self.img_orig
        self.dir_y = pos_y - self.img_orig

        # local frame for VR/pano BEFORE flips/zoom (camera.c:303-309)
        self.local_x = mathnd.unitize(self.dir_x)
        self.local_y = mathnd.unitize(self.dir_y)
        self.local_z = mathnd.unitize(self.img_orig - self.pos)
        self.prepared = True

        if self.flip_x:
            self.dir_x = -self.dir_x
            self.left_eye, self.right_eye = self.right_eye, self.left_eye
        if self.flip_y:
            self.dir_y = -self.dir_y
        if self.zoom != 1.0 and abs(self.zoom) >= EPSILON:
            self.dir_x = self.dir_x / self.zoom
            self.dir_y = self.dir_y / self.zoom
        return self

    def aim(self):
        """camera_aim (camera.c:132-178): when an 'up' vector is set, search
        the roll ('leveling') angle that minimizes the angle between up and
        the screen's Y direction, halving the step whenever it stops
        improving; then do the naive aim."""
        up_len = float(mathnd.l2norm(self.up))
        if up_len > 0:
            tmp = Camera(self.dim)
            tmp.set_aim(self.view_point, self.view_target, self.up, 0.0)
            tmp.aim_naive()
            ang = float(mathnd.angle(self.up, tmp.dir_y))
            curr = 0.0
            delta = np.pi / 10.0
            while abs(delta) > (EPSILON / 1000.0):
                last = ang
                tmp.set_aim(self.view_point, self.view_target, self.up, curr)
                tmp.aim_naive()
                ang = float(mathnd.angle(self.up, tmp.dir_y))
                if ang >= last:
                    delta = -delta / 2.0
                curr += delta
            self.leveling = curr
        return self.aim_naive()

    def focus(self, point):
        """camera_focus (camera.c:358-376): focal distance = length of the
        camera-to-point vector projected on the view axis."""
        temp = np.asarray(point, dtype=np.float64) - self.pos
        self.focal_distance = float(mathnd.l2norm(mathnd.proj(temp, self.local_z)))
        return self

    def focus_multi(self, points, near_padding=0.0, far_padding=0.0,
                    confusion_radius=0.1, img_plane_dist=-1.0):
        """camera_focus_multi (camera.c:378-479): binary-search the largest
        aperture keeping every point within a circle of confusion, via the
        thin-lens equation; sets aperture_radius and focal_distance."""
        pts = np.asarray(points, dtype=np.float64)
        dists = mathnd.dist(pts, self.view_point)
        min_dist = float(dists.min()) - near_padding
        max_dist = float(dists.max()) + far_padding

        min_radius, max_radius = 0.0, 1.0 / EPSILON
        if img_plane_dist < 0.0:
            img_plane_dist = float(mathnd.dist(self.pos, self.img_orig))

        while max_radius - min_radius > EPSILON**2:
            curr = (min_radius + max_radius) / 2.0
            conf_dist = (img_plane_dist * confusion_radius) / curr
            min_img = img_plane_dist - conf_dist
            max_img = img_plane_dist + conf_dist
            f = 2.0 / (1 / min_dist + 1 / min_img + 1 / max_dist + 1 / max_img)
            u1 = 1.0 / (1 / f - 1 / min_img)
            u2 = 1.0 / (1 / f - 1 / max_img)
            if u2 < (min_dist - EPSILON) and u1 > (max_dist + EPSILON):
                min_radius = curr  # in focus: aperture can grow
            else:
                max_radius = curr
            self.aperture_radius = curr
            self.focal_distance = 1.0 / (1 / f - 1 / img_plane_dist)
        return self

    def describe(self) -> str:
        """camera_print (camera.c:583-611)."""
        def v(x):
            if x is None:
                return None
            return tuple(round(float(c), 4) for c in np.asarray(x))

        lines = [f"  camera type {int(self.type)}: viewPoint {v(self.view_point)}"
                 f" -> viewTarget {v(self.view_target)}, up {v(self.up)}"]
        if self.type in (CameraType.VR, CameraType.PANO):
            lines.append(f"    vFov,hFov: {self.v_fov:g},{self.h_fov:g}")
        if self.rotation:
            lines.append(f"    rotation: {self.rotation:g}")
        if self.aperture_radius > 0:
            lines.append(f"    aperture radius: {self.aperture_radius:g}, "
                         f"focal distance: {self.focal_distance:g}")
        if self.prepared:
            lines.append(f"    pos {v(self.pos)}, imgOrig {v(self.img_orig)}")
            lines.append(f"    dirX {v(self.dir_x)}, dirY {v(self.dir_y)}")
        return "\n".join(lines)

    def print(self):
        print(self.describe())

    def data(self, dtype=np.float32):
        """Pack the derived state into the flat pytree the device ray
        generator consumes."""
        return CameraData(
            cam_type=int(self.type),
            pos=np.asarray(self.pos, dtype=dtype),
            img_orig=np.asarray(self.img_orig, dtype=dtype),
            dir_x=np.asarray(self.dir_x, dtype=dtype),
            dir_y=np.asarray(self.dir_y, dtype=dtype),
            left_eye=np.asarray(self.left_eye, dtype=dtype),
            right_eye=np.asarray(self.right_eye, dtype=dtype),
            local_x=np.asarray(self.local_x, dtype=dtype),
            local_y=np.asarray(self.local_y, dtype=dtype),
            local_z=np.asarray(self.local_z, dtype=dtype),
            h_fov=dtype(self.h_fov),
            v_fov=dtype(self.v_fov),
            # f64 on host: float32 rounds pi/2 UP, flipping tan's sign at
            # vFov=pi (the C's tan(M_PI/2) is +1.6e16; f32's is negative)
            tan_half_v=dtype(np.tan(float(self.v_fov) / 2.0)),
            focal_distance=dtype(self.focal_distance),
            aperture_radius=dtype(self.aperture_radius),
        )


@dataclasses.dataclass(frozen=True)
class CameraData:
    """Device-side camera parameters (a pytree of arrays/scalars)."""

    cam_type: int  # static
    pos: object
    img_orig: object
    dir_x: object
    dir_y: object
    left_eye: object
    right_eye: object
    local_x: object
    local_y: object
    local_z: object
    h_fov: object
    v_fov: object
    tan_half_v: object
    focal_distance: object
    aperture_radius: object


def _camera_data_flatten(cd):
    children = (cd.pos, cd.img_orig, cd.dir_x, cd.dir_y, cd.left_eye,
                cd.right_eye, cd.local_x, cd.local_y, cd.local_z,
                cd.h_fov, cd.v_fov, cd.tan_half_v, cd.focal_distance,
                cd.aperture_radius)
    return children, cd.cam_type


def _camera_data_unflatten(cam_type, children):
    return CameraData(cam_type, *children)


import jax.tree_util  # noqa: E402

jax.tree_util.register_pytree_node(
    CameraData, _camera_data_flatten, _camera_data_unflatten
)


def target_point(cam: CameraData, x, y, dist):
    """camera_target_point (camera.c:504-581): map normalized screen coords
    (x in [-0.5, 0.5], y likewise) to a point on the focal surface.  Works
    batched: x/y may be ``[R]`` arrays (host numpy or device jnp)."""
    xp = mathnd._xp(x, cam.pos)
    if cam.cam_type == int(CameraType.VR):
        azi = x * cam.h_fov
        alt = y * cam.v_fov
        view_x = dist * xp.sin(azi) * xp.cos(alt)
        view_y = dist * xp.sin(alt)
        view_z = dist * xp.cos(azi) * xp.cos(alt)
        return (cam.pos + cam.local_x * view_x[..., None]
                + cam.local_y * view_y[..., None]
                + cam.local_z * view_z[..., None])
    if cam.cam_type == int(CameraType.PANO):
        azi = x * cam.h_fov
        y_size = 2.0 * cam.tan_half_v * dist  # camera.c:540, f64 tan
        view_x = dist * xp.sin(azi)
        view_y = y * y_size
        view_z = dist * xp.cos(azi) + 0.0 * azi
        return (cam.pos + cam.local_x * view_x[..., None]
                + cam.local_y * view_y[..., None]
                + cam.local_z * view_z[..., None])
    # NORMAL: planar screen, then projected onto the focal sphere
    pixel = (cam.img_orig + cam.dir_x * x[..., None]
             + cam.dir_y * y[..., None])
    screen_dist = mathnd.dist(cam.img_orig, cam.pos)
    temp = pixel - cam.pos
    scaled = cam.pos + temp * (dist / screen_dist)
    return xp.where(screen_dist > EPSILON, scaled, pixel)
