"""DoG scale space: fast almost-Gaussian filtering + gradient magnitude.

TPU-native rebuild of the reference frontend (rebvio/src/scale_space.cpp):

* ``FastGaussian`` (scale_space.cpp:14-182) approximates a Gaussian with n=3
  repeated box averages whose widths come from Kovesi's "Fast Almost-Gaussian
  Filtering" recipe (scale_space.cpp:20-35).  The reference implements each
  box pass with an integral image and border-clamped 4-term differences with
  precomputed border-area divisors (scale_space.cpp:48-171).  Here each pass
  is a 2-D cumulative sum plus clamped-index gathers — the same math, fully
  vectorized; borders divide by the clipped window area exactly like the
  reference's divisor images.
* ``ScaleSpace`` (scale_space.cpp:184-233): two scales, one octave,
  sigma0 = 3.56359, sigma1 = sigma0_true * 1.2599 (= 2^(1/3)); DoG =
  scale1 - scale0; squared gradient magnitude of scale0 via central
  differences (interior pixels only, border stays 0).
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp


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


def _box_average(img: jnp.ndarray, d: int) -> jnp.ndarray:
    """One border-clamped box average of odd width d (scale_space.cpp:69-128).

    Window at (r,c) covers rows [max(0,r-d2), min(H-1,r+d2)] x cols likewise,
    divided by the true clipped area.
    """
    d2 = d // 2
    H, W = img.shape
    # 2-D integral image (inclusive cumsum both axes), as in createIntegralImage
    ii = jnp.cumsum(jnp.cumsum(img, axis=1), axis=0)
    # Pad with a leading zero row/col so that index -1 maps to 0.
    iiz = jnp.pad(ii, ((1, 0), (1, 0)))
    r = jnp.arange(H)[:, None]
    c = jnp.arange(W)[None, :]
    r1 = jnp.minimum(r + d2, H - 1) + 1     # +1 for the zero-pad offset
    r0 = jnp.maximum(r - d2, 0)             # exclusive lower bound in padded ii
    c1 = jnp.minimum(c + d2, W - 1) + 1
    c0 = jnp.maximum(c - d2, 0)
    # Window sum via 4-term difference on the padded integral image.
    s = (
        iiz[r1, c1]
        - iiz[r0, c1]
        - iiz[r1, c0]
        + iiz[r0, c0]
    )
    area = ((r1 - r0) * (c1 - c0)).astype(img.dtype)
    return s / area


def smooth(img: jnp.ndarray, widths: Tuple[int, ...]) -> jnp.ndarray:
    """Cascade of box averages ~= Gaussian blur (scale_space.cpp:173-182)."""
    out = img
    for d in widths:
        out = _box_average(out, d)
    return out


@partial(jax.jit, static_argnames=("widths0", "widths1"))
def build_scale_space(
    img: jnp.ndarray, widths0: Tuple[int, ...], widths1: Tuple[int, ...]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (scale0, dog, mag) for a float image (scale_space.cpp:203-233)."""
    s0 = smooth(img, widths0)
    s1 = smooth(img, widths1)
    dog = s1 - s0
    # Central differences of scale0, squared magnitude; borders zero.
    dx = jnp.zeros_like(s0).at[:, 1:-1].set(s0[:, 2:] - s0[:, :-2])
    dy = jnp.zeros_like(s0).at[1:-1, :].set(s0[2:, :] - s0[:-2, :])
    mag = dx * dx + dy * dy
    mag = mag.at[0, :].set(0.0).at[-1, :].set(0.0)
    mag = mag.at[:, 0].set(0.0).at[:, -1].set(0.0)
    return s0, dog, mag


class ScaleSpaceParams:
    """Precomputed static parameters of the two-scale DoG pyramid."""

    SIGMA0 = 3.56359
    SCALE_FACTOR = 1.2599  # 2^(1/3), scale_space.cpp:186

    def __init__(self) -> None:
        self.widths0, self.sigma0_true = box_widths(self.SIGMA0, 3)
        self.widths1, self.sigma1_true = box_widths(self.sigma0_true * self.SCALE_FACTOR, 3)
        self.widths0 = tuple(self.widths0)
        self.widths1 = tuple(self.widths1)

    def build(self, img: jnp.ndarray):
        return build_scale_space(img, self.widths0, self.widths1)
