"""Image layer: pixel models, PNG/JPEG encode, async saves, depth maps.

Rebuild of image.{h,c}.  The reference keeps two pixel representations:
linear doubles in [0,1] and "quadratic" bytes (255*sqrt(linear), image.h:16,
34-43).  All rendering here happens in linear float; conversion to bytes
applies the same sqrt encoding, so output files are directly comparable to
the C binary's.

PNG/JPEG encoding uses Pillow on the host.  Background save threads
(image.c:741-803: a detached pthread per save with an active-save counter the
main loop drains before exit) become a small ThreadPoolExecutor with a
drain() barrier, letting the TPU render frame N+1 while the host encodes
frame N.
"""

from __future__ import annotations

import concurrent.futures
import os
import threading
from typing import Optional

import numpy as np

try:
    from PIL import Image as _PILImage
    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False


def linear_to_bytes(img: np.ndarray) -> np.ndarray:
    """pixel_d2c (image.h:34-38): clamp to [0,1], sqrt, scale to 0..255."""
    return (np.sqrt(np.clip(img, 0.0, 1.0)) * 255.0).astype(np.uint8)


def bytes_to_linear(img: np.ndarray) -> np.ndarray:
    """pixel_c2d (image.h:40-43): (byte/255)^2."""
    return (img.astype(np.float64) / 255.0) ** 2


def normalize_depth(depth: np.ndarray) -> np.ndarray:
    """dbl_image_normalize (image.c:1025-1066): min/max scale the recorded
    1/dist values into [0,1] (zeros -- no hit -- participate as 0)."""
    lo = float(depth.min())
    hi = float(depth.max())
    if hi - lo <= 0:
        return np.zeros_like(depth)
    return (depth - lo) / (hi - lo)


def save_image(path: str, img_linear: np.ndarray, fmt: Optional[str] = None):
    """Encode a [H, W, 3] linear float image to PNG/JPEG."""
    if not HAVE_PIL:
        raise RuntimeError("Pillow unavailable; cannot encode images")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = linear_to_bytes(img_linear)
    im = _PILImage.fromarray(data, mode="RGB")
    im.save(path, format=fmt)


def save_depth(path: str, depth: np.ndarray, fmt: Optional[str] = None):
    """Depth maps are written already-normalized, single channel replicated
    (ndt.c:1012-1018 + image.c:1025)."""
    norm = normalize_depth(depth)
    save_image(path, np.repeat(norm[..., None], 3, axis=-1), fmt)


def load_image(path: str) -> np.ndarray:
    """Load an image file into linear floats (image.c:271-343 equivalents);
    used by texture maps (map.c) and tests."""
    if not HAVE_PIL:
        raise RuntimeError("Pillow unavailable; cannot decode images")
    with _PILImage.open(path) as im:
        data = np.asarray(im.convert("RGB"))
    return bytes_to_linear(data)


# -- image arithmetic (image.h:105-116) -------------------------------------


def image_add(a, b):
    return a + b


def image_subtract(a, b):
    return a - b


def image_scale(a, s):
    return a * s


def image_avg(images):
    return np.mean(np.stack(images), axis=0)


def gaussian_kernel(size: int, std_dev: float) -> np.ndarray:
    """image_calc_gaussian (image.c:886-905)."""
    half = size // 2
    xs = np.arange(size) - half
    g = np.exp(-(xs[None, :] ** 2 + xs[:, None] ** 2) / (2 * std_dev ** 2))
    return g / g.sum()


def convolve(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """image_convolve (image.c:808-884): zero-padded 2-D convolution per
    channel."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    padded = np.pad(img, ((ph, ph), (pw, pw), (0, 0)))
    out = np.zeros_like(img)
    for dy in range(kh):
        for dx in range(kw):
            out += kernel[dy, dx] * padded[dy:dy + img.shape[0],
                                           dx:dx + img.shape[1]]
    return out


def image_downscale(img: np.ndarray, factor: int) -> np.ndarray:
    """image_scale by integer factor via box averaging (image.c:907-...)."""
    h, w = img.shape[0] // factor * factor, img.shape[1] // factor * factor
    v = img[:h, :w].reshape(h // factor, factor, w // factor, factor, -1)
    return v.mean(axis=(1, 3))


class AsyncSaver:
    """Background image saver (image_save_bg, image.c:741-803): submit
    encodes to a worker pool and drain before exit (ndt.c:2061-2066 spins on
    image_active_saves()).  Falls back to synchronous save on failure, like
    the C does when pthread_create fails (image.c:790-794)."""

    def __init__(self, workers: int = 2):
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=workers)
        self._pending = []
        self._lock = threading.Lock()

    def active_saves(self) -> int:
        with self._lock:
            self._pending = [f for f in self._pending if not f.done()]
            return len(self._pending)

    def save(self, path, img_linear, fmt=None):
        img_copy = np.array(img_linear, copy=True)
        try:
            fut = self._pool.submit(save_image, path, img_copy, fmt)
            with self._lock:
                self._pending.append(fut)
        except Exception:
            save_image(path, img_copy, fmt)

    def drain(self):
        with self._lock:
            pending, self._pending = self._pending, []
        for f in pending:
            f.result()

    def shutdown(self):
        self.drain()
        self._pool.shutdown()
