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
    cv::undistort (rebvio.cpp:38-48).

    Two device paths:

    - uint8 input (the product path — EuRoC/reference frames are MONO8,
      rebvio.cpp:38): a packed-lane bilinear gather.  XLA's TPU gather is
      byte-throughput-bound (~10 GB/s measured on v5e), so the naive
      four-tap f32 formulation costs ~17 ms/frame.  Instead adjacent pixel
      PAIRS are packed arithmetically into one f32 lane (px0*256 + px1 —
      exact: integers < 2^24; float *bitcast* packing is corrupted by TPU
      denormal/NaN canonicalization), a 4-lane window row covers all four
      bilinear taps (top/bottom pair each), and one [N,4] row gather feeds
      a masked weighted sum.  Measured ~1.5 ms/frame, bit-identical to the
      f32 reference path up to summation order (including image borders:
      partial 2x2 footprints use per-tap zero fill like remap_bilinear).
    - float input (synthetic/test path): the plain remap_bilinear gather.
    """

    def __init__(self, cam: CameraConfig, gain: float = 3.0):
        grid = make_undistort_map(cam)
        self.grid = jnp.asarray(grid)
        self.gain = gain
        H, W = cam.rows, cam.cols
        self._hw = (H, W)
        self._u8_ok = (W % 2) == 0
        if not self._u8_ok:
            return
        Q = W // 2
        sx, sy = grid[..., 0].ravel(), grid[..., 1].ravel()
        x0 = np.floor(sx).astype(np.int64)
        y0 = np.floor(sy).astype(np.int64)
        fx = (sx - x0).astype(np.float32)
        fy = (sy - y0).astype(np.float32)
        # Border handling matches remap_bilinear's per-tap zero fill (a
        # partial 2x2 footprint evaluates its in-bounds taps; ADVICE r3: the
        # old packed path zeroed the whole output pixel instead).  Each tap
        # maps host-side to (fetched row: top/bottom, lane 0..3) of the
        # gathered 4-lane window, and its bilinear weight lands in one of two
        # precomputed [N,4] per-lane weight planes — invalid taps get weight
        # 0, so the wraparound a clipped base can reach is never read.  Same
        # runtime cost as the old mask form (two [N,4] multiplies).
        y0c = np.clip(y0, 0, H - 1)
        x0c = np.clip(x0, 0, W - 1)
        b = x0c >> 1
        N = sx.shape[0]
        wtop = np.zeros((N, 4), np.float32)
        wbot = np.zeros((N, 4), np.float32)
        rows_idx = np.arange(N)
        for ty, tx, w in (
            (y0, x0, (1 - fx) * (1 - fy)),
            (y0, x0 + 1, fx * (1 - fy)),
            (y0 + 1, x0, (1 - fx) * fy),
            (y0 + 1, x0 + 1, fx * fy),
        ):
            valid = (ty >= 0) & (ty < H) & (tx >= 0) & (tx < W)
            lane = np.clip(tx - 2 * b, 0, 3)  # in [0,3] whenever valid
            is_top = ty == y0c                # else the fetched bottom row
            wv = np.where(valid, w, 0.0).astype(np.float32)
            np.add.at(wtop, (rows_idx, lane), wv * is_top)
            np.add.at(wbot, (rows_idx, lane), wv * (~is_top))
        self._bl = jnp.asarray((y0c * Q + b).astype(np.int32))
        self._wtop = jnp.asarray(wtop)
        self._wbot = jnp.asarray(wbot)

    def _remap_u8(self, raw: jnp.ndarray) -> jnp.ndarray:
        H, W = self._hw
        Q = W // 2
        f = raw.astype(jnp.float32)
        flat = (f[:, 0::2] * 256.0 + f[:, 1::2]).ravel()           # [H*Q] packed pairs
        D = jnp.stack(
            [flat, jnp.roll(flat, -1), jnp.roll(flat, -Q), jnp.roll(flat, -Q - 1)], 1
        )
        # [N,4] row gather, CHUNKED: XLA's TPU row gather costs ~4x more
        # per index above ~16k indices per op (measured r4,
        # tools/stage_bench thresh), so the 361k-pixel gather runs as ~24
        # sub-16k gathers + one concat
        CH = 15040
        N = H * W
        q = jnp.concatenate(
            [D[self._bl[i:i + CH]] for i in range(0, N, CH)])
        hi = jnp.floor(q * (1.0 / 256.0))
        lo = q - hi * 256.0
        top = jnp.stack([hi[:, 0], lo[:, 0], hi[:, 1], lo[:, 1]], 1)   # [N,4] pixels
        bot = jnp.stack([hi[:, 2], lo[:, 2], hi[:, 3], lo[:, 3]], 1)
        out = (top * self._wtop).sum(1) + (bot * self._wbot).sum(1)
        return (out * self.gain).reshape(H, W)

    def __call__(self, raw: jnp.ndarray) -> jnp.ndarray:
        if raw.dtype == jnp.uint8 and self._u8_ok and raw.shape == self._hw:
            return self._remap_u8(raw)
        img = raw.astype(jnp.float32) * self.gain
        return remap_bilinear(img, self.grid)
