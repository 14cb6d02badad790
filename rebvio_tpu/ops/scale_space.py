"""DoG scale space as banded-matrix MXU contractions.

TPU-native rebuild of the reference frontend (rebvio/src/scale_space.cpp):

* ``FastGaussian`` (scale_space.cpp:14-182) approximates a Gaussian with n=3
  repeated box averages (widths from Kovesi's recipe, scale_space.cpp:20-35),
  each implemented in the reference as integral-image differences with
  border-area divisors (scale_space.cpp:48-171).
* Every pass is linear and separable: one box average is
  diag(1/ch) @ C_H @ img @ C_W @ diag(1/cw) with C_* banded ones matrices and
  c* the clipped-window tap counts.  Left-ops and right-ops commute, so the
  ENTIRE 3-pass cascade collapses to a single precomputed sandwich
  L @ img @ R — two matmuls on the MXU, zero gathers, zero cumsums.  This is
  the speed-of-light formulation for a 480x752 image: ~0.4 GMAC total.
* DoG = scale1 - scale0 (scale_space.cpp:210-219); squared gradient magnitude
  of scale0 via central differences (scale_space.cpp:221-233), also expressed
  as banded difference matrices (borders zeroed exactly like the reference).

The matrices live in a ``FrontendMatrices`` pytree passed into the jitted
ops, so they upload to the device once.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def box_widths(sigma: float, n: int = 3) -> Tuple[List[int], float]:
    """Box-filter widths for n-pass approximation of Gaussian(sigma), and the
    effective sigma after integer rounding (scale_space.cpp:20-35)."""
    w_ideal = math.sqrt(12.0 * sigma * sigma / (n + 1))
    w_l = int(w_ideal)
    if (w_l // 2) * 2 == w_l:
        w_l -= 1  # first odd integer <= w_ideal
    m = round((3 * n + 4 * n * w_l + n * w_l * w_l - 12.0 * sigma * sigma) / (4 + 4 * w_l))
    widths = [w_l] * m + [w_l + 2] * (n - m)
    sigma_true = math.sqrt((m * w_l * w_l + (n - m) * (w_l + 2.0) * (w_l + 2.0) - n) / 12.0)
    return widths, sigma_true


def _banded_ones(n: int, d: int) -> np.ndarray:
    """[n,n] banded ones: B[i,j] = 1 iff |i-j| <= d//2."""
    d2 = d // 2
    i = np.arange(n)
    return (np.abs(i[:, None] - i[None, :]) <= d2).astype(np.float64)


def _clip_counts(n: int, d: int) -> np.ndarray:
    d2 = d // 2
    i = np.arange(n)
    return (np.minimum(i + d2, n - 1) - np.maximum(i - d2, 0) + 1).astype(np.float64)


def _cascade_ops(n: int, widths: List[int]) -> np.ndarray:
    """Composed left-op for a length-n axis: prod_i diag(1/c_i) @ C_i."""
    op = np.eye(n)
    for d in widths:
        op = (np.diag(1.0 / _clip_counts(n, d)) @ _banded_ones(n, d)) @ op
    return op


def _offset_band(n: int, d: int) -> np.ndarray:
    """[n,n] banded offsets: B[i,j] = (j - i) iff |i-j| <= d//2 (the x / y
    ramps of the plane-fit window, edge_detector.cpp:59-64)."""
    d2 = d // 2
    i = np.arange(n)
    diff = i[None, :] - i[:, None]
    return np.where(np.abs(diff) <= d2, diff, 0).astype(np.float64)


def _central_diff(n: int) -> np.ndarray:
    """[n,n] central difference: out[i] = in[i+1] - in[i-1], borders 0."""
    m = np.zeros((n, n))
    i = np.arange(1, n - 1)
    m[i, i + 1] = 1.0
    m[i, i - 1] = -1.0
    return m


class FrontendMatrices(NamedTuple):
    """Device-resident banded operators for one (rows, cols) geometry."""

    LL: jnp.ndarray   # [2H,H] stacked scale-0/scale-1 left cascades
    R0: jnp.ndarray   # [W,W] scale-0 right cascade
    R1: jnp.ndarray   # [W,W] scale-1 right cascade
    S5H: jnp.ndarray  # [H,H] 5x5 window row-sum
    S5W: jnp.ndarray  # [W,W] 5x5 window col-sum
    XW: jnp.ndarray   # [W,W] x-ramp band
    YH: jnp.ndarray   # [H,H] y-ramp band


class ScaleSpaceParams:
    """Precomputed static parameters of the two-scale DoG pyramid
    (sigma0 = 3.56359, sigma1 = sigma0_true * 2^(1/3), scale_space.cpp:186)."""

    SIGMA0 = 3.56359
    SCALE_FACTOR = 1.2599

    def __init__(self, rows: int, cols: int, plane_fit_size: int = 2) -> None:
        self.rows, self.cols = rows, cols
        self.widths0, self.sigma0_true = box_widths(self.SIGMA0, 3)
        self.widths1, self.sigma1_true = box_widths(self.sigma0_true * self.SCALE_FACTOR, 3)
        H, W = rows, cols
        d5 = 2 * plane_fit_size + 1
        self._np_mats = dict(
            LL=np.concatenate(
                [_cascade_ops(H, self.widths0), _cascade_ops(H, self.widths1)], axis=0
            ),
            R0=_cascade_ops(W, self.widths0).T,
            R1=_cascade_ops(W, self.widths1).T,
            S5H=_banded_ones(H, d5),
            S5W=_banded_ones(W, d5),
            XW=_offset_band(W, d5).T,   # right-multiply: (img @ XW)[r,i] = sum_j img[r,j](j-i)
            YH=_offset_band(H, d5),     # left-multiply:  (YH @ img)[i,c] = sum_j (j-i) img[j,c]
        )
    def matrices(self) -> FrontendMatrices:
        # Constructed fresh each call: a cached device array would leak
        # tracers when first materialized inside a jit trace.
        return FrontendMatrices(
            **{k: jnp.asarray(v, jnp.float32) for k, v in self._np_mats.items()}
        )


def _mxu_dot(a: jnp.ndarray, b: jnp.ndarray, bf16: bool) -> jnp.ndarray:
    """Banded-operator matmul at the chosen MXU precision.

    bf16 operands run at the MXU's native rate (f32 matmuls are emulated in
    multiple bf16 passes); accumulation stays f32.  Only used where the
    profile opts in (EdgeDetectorConfig.frontend_bf16 — the fast profile's
    ATE-band contract, not the parity profile's reference anchoring)."""
    if not bf16:
        return a @ b
    return jnp.matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("bf16",))
def build_scale_space(
    img: jnp.ndarray, mats: FrontendMatrices, bf16: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (scale0, dog, mag) for a float image (scale_space.cpp:203-233).

    Both scales share one stacked left multiply [L0;L1] @ img; the right
    cascades stay separate (a blockdiag fusion would double the MACs with
    zero blocks — inside one jitted graph there is no per-matmul dispatch
    cost to amortize).
    """
    H, W = img.shape
    left = _mxu_dot(mats.LL, img, bf16)                       # [2H,W]
    s0 = _mxu_dot(left[:H], mats.R0, bf16)
    s1 = _mxu_dot(left[H:], mats.R1, bf16)
    dog = s1 - s0
    # central differences as shifted slices (VPU, no matmul); borders zeroed
    # via a fused iota mask (the reference computes interior pixels only) —
    # dynamic-update-slice border writes don't fuse on TPU and cost ~0.5 ms
    zc = jnp.zeros((H, 1), s0.dtype)
    zr = jnp.zeros((1, W), s0.dtype)
    dx = jnp.concatenate([zc, s0[:, 2:] - s0[:, :-2], zc], axis=1)
    dy = jnp.concatenate([zr, s0[2:, :] - s0[:-2, :], zr], axis=0)
    rr = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior1 = (rr >= 1) & (rr < H - 1) & (cc >= 1) & (cc < W - 1)
    mag = jnp.where(interior1, dx * dx + dy * dy, 0.0)
    return s0, dog, mag


def smooth(img: jnp.ndarray, widths: Tuple[int, ...]) -> jnp.ndarray:
    """Standalone cascade (used by tests): L @ img @ R for given widths."""
    H, W = img.shape
    L = jnp.asarray(_cascade_ops(H, list(widths)), jnp.float32)
    R = jnp.asarray(_cascade_ops(W, list(widths)).T, jnp.float32)
    return L @ img @ R
