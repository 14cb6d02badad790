"""Pinhole camera with rad-tan distortion: TPU-native undistortion remap.

The reference undistorts every input frame with ``cv::undistort`` using a
camera matrix built from the *mean* focal length fm (camera.hpp:39,54-58).
cv::undistort computes, for each output pixel, the distorted source location
(forward distortion of the normalized output ray) and bilinearly samples the
input.  Here that source grid is precomputed once on the host (numpy) and the
per-frame remap is a vectorized bilinear gather on device — the standard
TPU-native replacement for a per-pixel CPU loop.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from rebvio_tpu.configs import CameraConfig


def distort_normalized(cam: CameraConfig, x: np.ndarray, y: np.ndarray):
    """Forward rad-tan distortion of normalized coords (OpenCV model)."""
    r2 = x * x + y * y
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2 + cam.k3 * r2 * r2 * r2
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return xd, yd


def make_undistort_map(cam: CameraConfig) -> np.ndarray:
    """[H,W,2] (src_x, src_y) sampling grid, using the mean-focal camera
    matrix exactly as the reference does (camera.hpp:39)."""
    fm = cam.fm
    v, u = np.meshgrid(np.arange(cam.rows, dtype=np.float64),
                       np.arange(cam.cols, dtype=np.float64), indexing="ij")
    x = (u - cam.cx) / fm
    y = (v - cam.cy) / fm
    xd, yd = distort_normalized(cam, x, y)
    src_x = fm * xd + cam.cx
    src_y = fm * yd + cam.cy
    return np.stack([src_x, src_y], axis=-1).astype(np.float32)


@jax.jit
def remap_bilinear(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img at grid (src_x, src_y); out-of-bounds -> 0,
    matching cv::undistort's constant-zero border."""
    H, W = img.shape
    sx = grid[..., 0]
    sy = grid[..., 1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yy, xx):
        inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        yc = jnp.clip(yy, 0, H - 1)
        xc = jnp.clip(xx, 0, W - 1)
        return jnp.where(inb, img[yc, xc], 0.0)

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


class Undistorter:
    """Precomputed remap + gain, replacing imageCallback's convertTo(x3.0) +
    cv::undistort (rebvio.cpp:38-48)."""

    def __init__(self, cam: CameraConfig, gain: float = 3.0):
        self.grid = jnp.asarray(make_undistort_map(cam))
        self.gain = gain

    def __call__(self, raw: jnp.ndarray) -> jnp.ndarray:
        img = raw.astype(jnp.float32) * self.gain
        return remap_bilinear(img, self.grid)
