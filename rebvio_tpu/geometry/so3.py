"""SO(3) utilities (exp/log maps, two-vector rotation) in pure jnp.

TPU-native replacement for the TooN::SO3 operations used throughout the
reference (TooN/so3.h; used at e.g. rebvio/src/rebvio.cpp:164,194,217,267-268
and types/imu.hpp:72).  All functions are float32, branch-free (jnp.where),
jit/vmap-safe, and numerically guarded around theta ~ 0 and theta ~ pi.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]_x such that hat(w) @ v == cross(w, v)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: exp([w]_x) with Taylor fallbacks near 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    # sin(t)/t and (1-cos(t))/t^2 with small-angle series
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def log(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse Rodrigues: rotation vector from rotation matrix.

    Handles theta near 0 (series) and theta near pi (diagonal extraction),
    mirroring the robustness of TooN::SO3::ln used for odometry output
    (rebvio.cpp:275).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # theta from an INNER-clipped cosine: arccos' diverges at +-1, so the
    # unclipped form poisons jacfwd/jacrev with NaN through the jnp.where
    # product rule even when a series branch supplies the primal (this
    # stalled the pose-graph GN: sequential factors are evaluated exactly at
    # their defining poses, i.e. exactly at identity).  Within the clip band
    # the small/near-pi branches below take over, so the primal is unchanged.
    theta = jnp.arccos(jnp.clip(cos_t, -1.0 + 3e-7, 1.0 - 3e-7))
    # antisymmetric part -> axis * sin(theta)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    small = cos_t > 1.0 - 1e-7   # theta < ~4.5e-4
    # w = theta / (2 sin(theta)) * v ; series 0.5 * (1 + theta^2/6) * v with
    # theta^2 ~ 3 - trace (polynomial in R: smooth exactly at identity)
    scale_generic = theta / (2.0 * jnp.sin(theta))
    scale_small = 0.5 + (3.0 - trace) / 12.0
    w_generic = jnp.where(small[..., None], scale_small[..., None] * v, scale_generic[..., None] * v)

    # Near pi: v -> 0; use sqrt of diagonal. axis_i = sqrt((R_ii+1)/2)
    near_pi = theta > (jnp.pi - 1e-3)
    d = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_abs = jnp.sqrt(jnp.clip((d + 1.0) * 0.5, 0.0, None))
    # fix signs from off-diagonal sums: sign(axis_i * axis_j) == sign(R_ij + R_ji)
    k = jnp.argmax(axis_abs, axis=-1)
    off = jnp.stack(
        [
            R[..., 1, 0] + R[..., 0, 1],   # pairs with (0,1)
            R[..., 2, 0] + R[..., 0, 2],   # (0,2)
            R[..., 2, 1] + R[..., 1, 2],   # (1,2)
        ],
        axis=-1,
    )

    def signed_axis(axis_abs, off, k):
        s0 = jnp.where(k == 0, 1.0, jnp.where(k == 1, jnp.sign(off[..., 0]) + (off[..., 0] == 0), jnp.sign(off[..., 1]) + (off[..., 1] == 0)))
        s1 = jnp.where(k == 1, 1.0, jnp.where(k == 0, jnp.sign(off[..., 0]) + (off[..., 0] == 0), jnp.sign(off[..., 2]) + (off[..., 2] == 0)))
        s2 = jnp.where(k == 2, 1.0, jnp.where(k == 0, jnp.sign(off[..., 1]) + (off[..., 1] == 0), jnp.sign(off[..., 2]) + (off[..., 2] == 0)))
        return jnp.stack([s0 * axis_abs[..., 0], s1 * axis_abs[..., 1], s2 * axis_abs[..., 2]], axis=-1)

    axis_pi = signed_axis(axis_abs, off, k)
    nrm = jnp.linalg.norm(axis_pi, axis=-1, keepdims=True)
    axis_pi = axis_pi / jnp.where(nrm > 0, nrm, 1.0)
    # magnitude near pi from the antisymmetric part (|v| = 2 sin theta):
    # accurate through exactly pi (the inner-clipped theta saturates there)
    # and with a finite derivative (arcsin' at 0 = 1; safe norm at v = 0)
    vn = jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-24)
    theta_pi = jnp.pi - jnp.arcsin(jnp.clip(0.5 * vn, 0.0, 1.0 - 1e-7))
    w_pi = axis_pi * theta_pi[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def rotation_between(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix taking direction a to direction b (minimal geodesic).

    Replacement for TooN::SO3(a, b) two-vector constructor used for
    gravity alignment of the global pose (rebvio.cpp:267-268).
    """
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), _EPS)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), _EPS)
    v = jnp.cross(a, b)
    c = jnp.sum(a * b, axis=-1)
    s2 = jnp.sum(v * v, axis=-1)
    # Generic case: R = I + [v]x + [v]x^2 (1-c)/s^2
    V = hat(v)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), V.shape)
    k = (1.0 - c) / jnp.where(s2 < _EPS, 1.0, s2)
    R_gen = eye + V + k[..., None, None] * (V @ V)
    # Antipodal case (c ~ -1): rotate pi around any axis orthogonal to a.
    # Build orthogonal via Householder-ish choice.
    alt = jnp.where(
        (jnp.abs(a[..., 0]) < 0.9)[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], a.dtype), a.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], a.dtype), a.shape),
    )
    ortho = jnp.cross(a, alt)
    ortho = ortho / jnp.maximum(jnp.linalg.norm(ortho, axis=-1, keepdims=True), _EPS)
    R_pi = exp(ortho * jnp.pi)
    antipodal = c < -1.0 + 1e-6
    return jnp.where(antipodal[..., None, None], R_pi, R_gen)
