"""Scale/Attitude/Bias nonlinear MAP estimator (7-state Gauss-Newton).

TPU-native rebuild of ``SABEstimator`` (rebvio/src/sab_estimator.cpp) and the
surrounding Kalman predict/update of ``Core::estimateBias``
(core.cpp:349-414).  The filter estimates X = [alpha, g(3), b(3)]: gravity
direction g, scale angle alpha (metric scale K = tan(alpha)), and visual
rotation bias b, by fusing the visually-derived acceleration a_v against the
accelerometer-derived a_s (Eq. 40 of Tarrio & Pedre 2017).

All matrices are tiny (7x7 / 11x11) dense float32 algebra inside the jitted
step — exactly the kind of op XLA fuses for free; no kernel needed.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rebvio_tpu.geometry import linalg, so3


def _use_pallas_sab() -> bool:
    """One-kernel SAB filter on TPU (REBVIO_PALLAS_SAB=0/1 overrides;
    default auto).  The XLA formulation is ~400 tiny kernels; the Mosaic
    mega-kernel (pallas_kernels.estimate_bias_pallas) runs the whole
    predict + GN + re-fuse chain in one launch.  Resolved at TRACE time
    when called inside a jitted pipeline (same caveat as the tube
    matcher's flag, matching.directed_match_tube)."""
    v = os.environ.get("REBVIO_PALLAS_SAB", "auto")
    if v in ("0", "1"):
        return v == "1"
    return jax.default_backend() == "tpu"


class SabProblem(NamedTuple):
    a_v: jnp.ndarray   # [3] visual acceleration
    a_s: jnp.ndarray   # [3] gravity-corrected acceleration
    G: jnp.ndarray     # [] gravity norm
    x_p: jnp.ndarray   # [7] prior state
    Pp: jnp.ndarray    # [7,7] prior covariance
    W_pp: jnp.ndarray  # [7,7] inverse of Pp (hoisted: constant across GN iters)
    Rv: jnp.ndarray    # [3,3] visual acceleration noise
    Rs: jnp.ndarray    # [3,3] accelerometer noise
    Rg: jnp.ndarray    # [] gravity-norm noise
    W_rest: jnp.ndarray = None  # [8,11] bottom block of the residual weight
                                # matrix (1/Rg row + W_pp block): constant
                                # across GN iterations, hoisted out of the
                                # per-iteration assembly (the 20-iteration
                                # loop is op-latency-bound)


def _w_rest(p: SabProblem) -> jnp.ndarray:
    r1 = jnp.concatenate(
        [jnp.zeros((1, 3), jnp.float32), (1.0 / p.Rg)[None, None],
         jnp.zeros((1, 7), jnp.float32)], axis=1,
    )
    r2 = jnp.concatenate([jnp.zeros((7, 4), jnp.float32), p.W_pp], axis=1)
    return jnp.concatenate([r1, r2])


def sab_problem(p: SabProblem, X: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build (JtJ, JtF) of the weighted 11-D residual at X
    (sab_estimator.cpp:40-165), including the dW/da terms from the
    alpha-dependent measurement covariance."""
    a = X[0]
    g = X[1:4]
    b = X[4:7]
    sa, ca = jnp.sin(a), jnp.cos(a)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    z33 = jnp.zeros((3, 3), jnp.float32)

    da = a - p.x_p[0]
    da = jnp.where(da > jnp.pi, da - 2 * jnp.pi, jnp.where(da < -jnp.pi, da + 2 * jnp.pi, da))
    Rb = so3.exp(b)
    Rg_vec = Rb @ g
    # residual F and dF/dalpha assembled by concatenation (dynamic-update-
    # slice chains don't fuse on TPU; one concatenate does)
    F = jnp.concatenate([
        (p.a_s + g) * ca - p.a_v * sa,
        jnp.stack([jnp.dot(g, g) - p.G * p.G, da]),
        Rg_vec - p.x_p[1:4],
        b - p.x_p[4:7],
    ])
    dFda = jnp.concatenate([
        -(p.a_s + g) * sa - p.a_v * ca,
        jnp.array([0.0, 1.0], jnp.float32),
        jnp.zeros((6,), jnp.float32),
    ])

    # dF/d[g, b]  (11x6)
    Gx = jnp.array(
        [
            [0.0, Rg_vec[2], -Rg_vec[1]],
            [-Rg_vec[2], 0.0, Rg_vec[0]],
            [Rg_vec[1], -Rg_vec[0], 0.0],
        ],
        jnp.float32,
    )
    dFdx1 = jnp.concatenate([
        jnp.concatenate([eye3 * ca, z33], axis=1),
        jnp.concatenate([2.0 * g, jnp.zeros((3,), jnp.float32)])[None, :],
        jnp.zeros((1, 6), jnp.float32),
        jnp.concatenate([Rb, Gx], axis=1),
        jnp.concatenate([z33, eye3], axis=1),
    ])

    Pz = sa * sa * p.Rv + ca * ca * p.Rs
    W0 = linalg.invert3(Pz)  # symmetric 3x3: closed form
    rest = p.W_rest if p.W_rest is not None else _w_rest(p)
    W = jnp.concatenate(
        [jnp.concatenate([W0, jnp.zeros((3, 8), jnp.float32)], axis=1), rest]
    )

    # dW/da and dW@P@dW are nonzero only in the leading 3x3 block
    dP0 = 2.0 * sa * ca * (p.Rv - p.Rs)
    dWda0 = -W0 @ dP0 @ W0
    dWPdW0 = dWda0 @ Pz @ dWda0
    F0 = F[0:3]
    dFda0 = dFda[0:3]

    WF = W @ F
    WdFda = W @ dFda
    j00 = 0.25 * F0 @ dWPdW0 @ F0 + dFda0 @ (dWda0 @ F0) + dFda @ WdFda
    dWdaF_pad = jnp.concatenate([dWda0 @ F0, jnp.zeros((8,), jnp.float32)])
    col = dFdx1.T @ (0.5 * dWdaF_pad + WdFda)
    JtJ = jnp.concatenate([
        jnp.concatenate([j00[None], col])[None, :],
        jnp.concatenate([col[:, None], dFdx1.T @ W @ dFdx1], axis=1),
    ])
    JtF = jnp.concatenate([
        (0.5 * F0 @ (dWda0 @ F0) + dFda @ WF)[None],
        dFdx1.T @ WF,
    ])
    return JtJ, JtF


_BIAS_SAT = 5e-1 / 25  # saturation limit on b (sab_estimator.cpp:34)


def sab_gauss_newton(p: SabProblem, X0: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Fixed-iteration Gauss-Newton with angle wrapping and bias saturation
    (sab_estimator.cpp:21-38; the reference caps at 20 with zero tolerances,
    but the solve converges well within 8 — identical golden-trajectory
    cross-ATE at 8/12/20, see configs.ImuConfig.sab_iterations).

    The 7x7 solve is the unrolled pivot-free Gauss-Jordan (linalg.gj_solve)
    rather than jnp.linalg.solve: the LU custom-call is dozens of tiny
    kernels per iteration on TPU, while the unrolled form is pure fusible
    vector ops.  The loop is unrolled (not lax.scan) for the same reason —
    the whole chain fuses into a handful of kernels."""

    X = X0
    for _ in range(iters):
        JtJ, JtF = sab_problem(p, X)
        h = linalg.gj_solve(JtJ, -JtF)
        X = X + h
        X = X.at[0].set(jnp.arctan2(jnp.sin(X[0]), jnp.cos(X[0])))
        X = X.at[4:7].set(jnp.clip(X[4:7], -_BIAS_SAT, _BIAS_SAT))
    return X


class EstimateBiasOut(NamedTuple):
    K: jnp.ndarray       # [] metric scale tan(alpha)
    X: jnp.ndarray       # [7] posterior state
    P: jnp.ndarray       # [7,7] posterior covariance
    g_est: jnp.ndarray   # [3]
    b_est: jnp.ndarray   # [3]
    Xvw: jnp.ndarray     # [6] bias-refused rigid transform correction


def estimate_bias(
    a_s: jnp.ndarray,
    a_v: jnp.ndarray,
    kP: jnp.ndarray,
    Rot: jnp.ndarray,
    X: jnp.ndarray,
    P: jnp.ndarray,
    Qg: jnp.ndarray,
    Qrot: jnp.ndarray,
    Qbias: jnp.ndarray,
    QKp: jnp.ndarray,
    Rg: jnp.ndarray,
    Rs: jnp.ndarray,
    Rv: jnp.ndarray,
    Wvw: jnp.ndarray,
    Xvw: jnp.ndarray,
    g_gravit: jnp.ndarray,
    iters: int = 20,
) -> EstimateBiasOut:
    """7-state KF predict + SAB Gauss-Newton update + re-fusion of the rigid
    transform with the bias information (core.cpp:349-414)."""
    # --- predict (core.cpp:355-373) ---
    F = jnp.zeros((7, 7), jnp.float32)
    F = F.at[0, 0].set(kP)
    F = F.at[1:4, 1:4].set(Rot.T)
    F = F.at[4:7, 4:7].set(jnp.eye(3, dtype=jnp.float32))

    g = X[1:4]
    GProd = jnp.array(
        [[0.0, g[2], -g[1]], [-g[2], 0.0, g[0]], [g[1], -g[0], 0.0]], jnp.float32
    )
    tan_a = jnp.tan(X[0])
    Q = jnp.zeros((7, 7), jnp.float32)
    Q = Q.at[0, 0].set(QKp / (1.0 + tan_a * tan_a))
    Q = Q.at[1:4, 1:4].set(GProd.T @ Qrot @ GProd + Qg)
    Q = Q.at[4:7, 4:7].set(Qbias)

    X = F @ X
    Pp = F @ P @ F.T + Q

    # --- nonlinear posterior (core.cpp:376-384) ---
    W_pp = linalg.chol_inverse(Pp)
    prob = SabProblem(a_v=a_v, a_s=a_s, G=g_gravit, x_p=X, Pp=Pp, W_pp=W_pp,
                      Rv=Rv, Rs=Rs, Rg=Rg)
    prob = prob._replace(W_rest=_w_rest(prob))
    if _use_pallas_sab():
        # one-launch GN solve + posterior + re-fusion (the predict above
        # stays XLA: it runs once and shares numerics with this path)
        from rebvio_tpu.ops.pallas_kernels import estimate_bias_pallas

        K_o, X_o, P_o, Xvw_o = estimate_bias_pallas(
            a_s, a_v, X, prob.W_rest, Rs, Rv, Wvw, Xvw, g_gravit,
            iters=iters)
        Xf = X_o.reshape(7)
        return EstimateBiasOut(K=K_o.reshape(()), X=Xf, P=P_o,
                               g_est=Xf[1:4], b_est=Xf[4:7],
                               Xvw=Xvw_o.reshape(6))
    X = sab_gauss_newton(prob, X, iters)
    JtJ, _ = sab_problem(prob, X)
    P = linalg.chol_inverse(JtJ)

    k = jnp.tan(X[0])
    k = jnp.where((k < 0) | ~jnp.isfinite(k), 0.0, k)
    g_est = X[1:4]
    b_est = X[4:7]

    # --- re-fuse rigid transform with bias information (core.cpp:394-405) ---
    WVBias = JtJ[4:7, 4:7]
    Wb = jnp.zeros((6, 6), jnp.float32).at[3:, 3:].set(WVBias)
    wc = Xvw[3:6] - b_est
    WXc = jnp.zeros((6,), jnp.float32).at[3:].set(WVBias @ wc)
    Xc = linalg.chol_inverse(Wb + Wvw) @ (Wvw @ Xvw + WXc)
    return EstimateBiasOut(K=k, X=X, P=P, g_est=g_est, b_est=b_est, Xvw=Xc)
