"""Image-based texture mapping (map.{h,c} rebuild).

A map projects an N-D hit point into a d-basis local frame via least
squares (map_vect, map.c:40-72 -- the production caller of
matrix_gauss_elim), converts the local coordinates to UV with a spherical /
cylindrical / linear / random mode (map.c:74-124), and samples the image
flat or bilinearly (map.c:126-188).  The reference exposes this publicly
although no builtin object plugin calls it; here the sampler is also
vectorized so compiled scenes could bind textures to materials.
"""

from __future__ import annotations

import enum

import numpy as np

from ndt_tpu.utils.matrix import gauss_elim_solve


class MapMode(enum.IntEnum):
    SPHERICAL = 0
    CYLINDRICAL = 1
    LINEAR = 2
    RANDOM = 3


class TextureMap:
    def __init__(self, image: np.ndarray, base: np.ndarray,
                 basis: np.ndarray, mode: MapMode = MapMode.SPHERICAL,
                 bilinear: bool = True):
        """image: [H, W, 3] linear floats; base: [D] map origin;
        basis: [d, D] spanning directions (d <= D)."""
        self.image = np.asarray(image, dtype=np.float64)
        self.base = np.asarray(base, dtype=np.float64)
        self.basis = np.asarray(basis, dtype=np.float64)
        self.mode = MapMode(mode)
        self.bilinear = bilinear

    @classmethod
    def load(cls, fname: str, base, basis, **kw):
        from ndt_tpu.image_io import load_image

        return cls(load_image(fname), base, basis, **kw)

    def local_coords(self, point: np.ndarray) -> np.ndarray:
        """Least-squares projection onto the basis (map_vect): solve
        (B B^T) c = B (p - base)."""
        rel = np.asarray(point, dtype=np.float64) - self.base
        bbt = self.basis @ self.basis.T
        rhs = self.basis @ rel
        return gauss_elim_solve(bbt, rhs)

    def uv(self, point: np.ndarray):
        c = self.local_coords(point)
        if self.mode == MapMode.SPHERICAL:
            # azimuth/elevation of the first three local coords (map.c:78-95)
            r = np.linalg.norm(c[:3]) or 1.0
            u = 0.5 + np.arctan2(c[1], c[0]) / (2 * np.pi)
            v = 0.5 - np.arcsin(np.clip(c[2] / r, -1, 1)) / np.pi
        elif self.mode == MapMode.CYLINDRICAL:
            u = 0.5 + np.arctan2(c[1], c[0]) / (2 * np.pi)
            v = c[2] % 1.0
        elif self.mode == MapMode.LINEAR:
            u = c[0] % 1.0
            v = c[1] % 1.0
        else:  # RANDOM (map.c:117-123): hash-style scatter
            u = (np.sin(c[0] * 12.9898 + c[1] * 78.233) * 43758.5453) % 1.0
            v = (np.sin(c[0] * 39.3468 + c[1] * 11.135) * 24634.6345) % 1.0
        return float(u), float(v)

    def sample(self, point: np.ndarray) -> np.ndarray:
        u, v = self.uv(point)
        h, w = self.image.shape[:2]
        x = u * (w - 1)
        y = v * (h - 1)
        if not self.bilinear:
            return self.image[int(round(y)) % h, int(round(x)) % w]
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        fx, fy = x - x0, y - y0
        x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
        x0, y0 = max(x0, 0), max(y0, 0)
        return ((1 - fx) * (1 - fy) * self.image[y0, x0]
                + fx * (1 - fy) * self.image[y0, x1]
                + (1 - fx) * fy * self.image[y1, x0]
                + fx * fy * self.image[y1, x1])


def sample_bilinear_batch(image, u, v):
    """Vectorized bilinear lookup for device-side texturing: image [H,W,3],
    u/v [R] in [0,1] -> [R,3] (jnp or numpy)."""
    import jax.numpy as jnp

    h, w = image.shape[:2]
    x = u * (w - 1)
    y = v * (h - 1)
    x0 = jnp.clip(jnp.floor(x).astype(int), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(int), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    return ((1 - fx) * (1 - fy) * image[y0, x0]
            + fx * (1 - fy) * image[y0, x1]
            + (1 - fx) * fy * image[y1, x0]
            + fx * fy * image[y1, x1])
