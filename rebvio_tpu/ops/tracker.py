"""Tracker core: translation LM against the distance field, 6-DoF linear
refinement, gyro-bias fusion, and the per-keyline inverse-depth EKF.

TPU-native rebuild of rebvio/src/core.cpp.  The hottest loop of the whole
reference — ``tryVel`` (core.cpp:78-148), a full pass over all keylines with
distance-field lookups and 3x3 JtJ accumulation, called 6x per frame by the
Levenberg-Marquardt driver ``minimizeVel`` (core.cpp:150-189) — becomes a
single fused masked vector pass whose JtJ/JtF reduce on the MXU via a
[K,4]^T [K,4] contraction.  All "continue" gates are masked lanes; skipped
keylines contribute the same saturation residual as the reference
(core.cpp:98-118).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rebvio_tpu import types as T
from rebvio_tpu.configs import CameraConfig, CoreConfig
from rebvio_tpu.geometry import linalg
from rebvio_tpu.ops.matching import estimate_quantile


def _use_pallas_tryvel(kmax: int) -> bool:
    """Post-gather tryVel math as one Pallas kernel on TPU (the XLA pass is
    launch-latency-bound at a dozen-plus kernels; see
    pallas_kernels.try_vel_math_pallas).  REBVIO_PALLAS_TRYVEL=0/1 overrides."""
    v = os.environ.get("REBVIO_PALLAS_TRYVEL", "auto")
    if v in ("0", "1"):
        return v == "1" and kmax % 128 == 0
    return jax.default_backend() == "tpu" and kmax % 128 == 0


class TryVelOut(NamedTuple):
    score: jnp.ndarray       # [] f32
    JtJ: jnp.ndarray         # [3,3]
    JtF: jnp.ndarray         # [3]
    residuals: jnp.ndarray   # [K]
    match_id_forward: jnp.ndarray  # [K] int32


def pack_target_fields(new: T.EdgeMap) -> jnp.ndarray:
    """[K,8] packed per-keyline fields of the distance-field map: one
    8-contiguous slice gather replaces 4 separate gathers per tryVel pass
    (TPU gather cost scales with index count, not element count)."""
    kmax = new.kmax
    z = jnp.zeros((kmax, 1), jnp.float32)
    return jnp.concatenate(
        [new.grad, new.grad_norm[:, None], new.pos, z, z, z], axis=-1
    )


def try_vel(
    old: T.EdgeMap,
    new: T.EdgeMap,
    field_ids: jnp.ndarray,
    vel: jnp.ndarray,
    sigma_rho_min: jnp.ndarray,
    residuals: jnp.ndarray,
    cfg: CoreConfig,
    cam: CameraConfig,
    new_pack: jnp.ndarray = None,
    field_f: jnp.ndarray = None,
    field_scale: int = 1,
    att_f: jnp.ndarray = None,
) -> TryVelOut:
    """One residual/Jacobian pass of the translation tracker (core.cpp:78-148).

    ``old`` is the (gyro-rotated) previous map being tracked; ``new`` is the
    map the distance field was built from (its keylines supply the matched
    gradient/position via ``calculatefJ``, core.cpp:46-76).

    Two lookup paths: with ``att_f`` (the [N,8] ROW view of the nearest-
    keyline attribute field, distance_field.att_rows) the candidate id,
    gradient and
    position resolve in ONE row gather; otherwise the id field + keyline
    table are two chained gathers.  The pass is latency-bound on that chain
    (measured: 48 us throughput vs ~175 us effective latency per pass), so
    halving the chain is the dominant win for minimizeVel.
    """
    kmax = old.kmax
    H, W = new.kl_id_img.shape
    fm = cam.fm
    R = cfg.search_range
    if att_f is None and new_pack is None:
        new_pack = pack_target_fields(new)
    if att_f is None and field_f is None:
        field_f = field_ids.astype(jnp.float32)

    # Participation gate (core.cpp:88-91); min_match_threshold is 0 in the
    # reference config so the matches-count clause never fires.
    use = old.valid & (old.sigma_rho <= sigma_rho_min)
    use = use & ((old.threshold <= 0.0) | (old.grad_norm >= old.threshold))

    weight = jnp.where(residuals > cfg.reweight_distance, cfg.reweight_distance / residuals, 1.0)

    sr_safe = jnp.where(old.sigma_rho > 0, old.sigma_rho, 1.0)
    inv_sr = 1.0 / sr_safe
    z_p = 1.0 / jnp.where(old.rho != 0, old.rho, 1e-20) + vel[2]
    front = z_p > 0.0
    rho_p = 1.0 / jnp.where(front, z_p, 1.0)
    p_x = rho_p * (vel[0] * fm - vel[2] * old.pos_img[:, 0]) + old.pos_img[:, 0]
    p_y = rho_p * (vel[1] * fm - vel[2] * old.pos_img[:, 1]) + old.pos_img[:, 1]
    p_xc = p_x + cam.cx
    p_yc = p_y + cam.cy
    x = jnp.floor(p_xc + 0.5).astype(jnp.int32)
    y = jnp.floor(p_yc + 0.5).astype(jnp.int32)
    inb = (x >= 1) & (y >= 1) & (x < W - 1) & (y < H - 1)

    lookup_ok = use & front & inb
    xs = jnp.clip(x, 0, W - 1)
    ys = jnp.clip(y, 0, H - 1)
    if field_scale > 1:  # decimated auxiliary field (configs.field_scale)
        Wf = (W + field_scale - 1) // field_scale
        fidx = (ys // field_scale) * Wf + (xs // field_scale)
    else:
        fidx = ys * W + xs
    if att_f is not None and _use_pallas_tryvel(kmax):
        # hybrid pass: XLA projection + row gather (fuses to ~2 kernels),
        # then ALL post-gather math — gates, Huber reweight, residual,
        # score, fused JtJ/JtF reduction — as ONE Pallas kernel
        # (pallas_kernels.try_vel_math_pallas; the all-XLA pass is
        # launch-latency-bound at 145 us vs a ~30 us gather).
        from rebvio_tpu.ops.pallas_kernels import try_vel_math_pallas

        row8 = att_f[fidx]
        Kr = kmax // 128
        rs = lambda a: a.reshape(Kr, 128)
        att8 = row8.T.reshape(8, Kr, 128)
        Gs, res2, mif2 = try_vel_math_pallas(
            att8, rs(p_x), rs(p_y), rs(rho_p),
            rs(lookup_ok.astype(jnp.float32)), rs(inv_sr),
            rs(old.grad[:, 0]), rs(old.grad[:, 1]),
            rs(use.astype(jnp.float32)), rs(residuals), cfg, cam,
        )
        return TryVelOut(Gs[4, 0], Gs[0:3, 0:3], Gs[0:3, 3],
                         res2.reshape(-1), mif2.reshape(-1))
    if att_f is not None:
        # single-gather path: one [K,8] attribute row per keyline
        from rebvio_tpu.ops.distance_field import (
            ATT_GN, ATT_GX, ATT_ID, ATT_POSX,
        )

        row8 = att_f[fidx]
        fid = jnp.where(lookup_ok, row8[:, ATT_ID].astype(jnp.int32), -1)
        has_df = fid >= 0
        gN = row8[:, ATT_GX:ATT_GX + 2]
        gnN = row8[:, ATT_GN]
        posN = row8[:, ATT_POSX:ATT_POSX + 2]
    else:
        # field ids gathered as exact f32 (int32 gathers hit a slow path)
        fid = jnp.where(
            lookup_ok, field_f[fidx].astype(jnp.int32), -1
        )
        has_df = fid >= 0
        # clip against the TARGET map's size (differs from old.kmax when the
        # old map's keyline axis is sharded, parallel/keyline_shard.py)
        fs = jnp.clip(fid, 0, new_pack.shape[0] - 1)
        row = new_pack[fs]  # [K,8] single slice-gather
        gN = row[:, 0:2]
        gnN = row[:, 2]
        posN = row[:, 3:5]

    # gradient similarity test (testfk, core.cpp:39-44):
    # |g_new . g_old - |g_new|^2| <= thr * |g_new|^2  (norm from new keyline)
    dot = gN[:, 0] * old.grad[:, 0] + gN[:, 1] * old.grad[:, 1]
    n2 = gnN * gnN
    sim_ok = jnp.abs(dot - n2) <= cfg.match_threshold * n2
    matched = has_df & sim_ok

    gnN_safe = jnp.where(gnN > 0, gnN, 1.0)
    gnx = gN[:, 0] / gnN_safe
    gny = gN[:, 1] / gnN_safe
    dx = p_xc - posN[:, 0]
    dy = p_yc - posN[:, 1]
    fi = dx * gnx + dy * gny

    # residual f (pre-weight): matched -> fi/sigma; else saturation R/sigma
    f0 = jnp.where(matched, fi * inv_sr, R * inv_sr)
    f = f0 * weight
    score = jnp.sum(jnp.where(use, f * f, 0.0))

    jac_on = matched
    df_dx = jnp.where(jac_on, gnx * inv_sr, 0.0)
    df_dy = jnp.where(jac_on, gny * inv_sr, 0.0)
    jx = rho_p * fm * df_dx * weight
    jy = rho_p * fm * df_dy * weight
    jz = -rho_p * (p_x * df_dx + p_y * df_dy) * weight

    m = jac_on & use
    Jm = jnp.stack(
        [
            jnp.where(m, jx, 0.0),
            jnp.where(m, jy, 0.0),
            jnp.where(m, jz, 0.0),
            jnp.where(m, f, 0.0),
        ],
        axis=-1,
    )  # [K,4]
    G = Jm.T @ Jm  # [4,4] fused JtJ (3x3) + JtF (last column) on the MXU
    JtJ = G[:3, :3]
    JtF = G[:3, 3]

    new_res = jnp.where(m, jnp.abs(fi), residuals)
    mif = jnp.where(m, fid, -1)
    return TryVelOut(score, JtJ, JtF, new_res, mif)


@partial(jax.jit, static_argnames=("cfg", "cam", "field_scale", "use_att"))
def minimize_vel(
    old: T.EdgeMap,
    new: T.EdgeMap,
    field_ids: jnp.ndarray,
    vel0: jnp.ndarray,
    cfg: CoreConfig,
    cam: CameraConfig,
    field_scale: int = 1,
    use_att: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, T.EdgeMap, jnp.ndarray]:
    """Levenberg-Marquardt translation estimation (core.cpp:150-189).

    Returns (vel, Rvel, old_map_with_forward_matches, score).  The forward
    matches / residuals reflect the *last* tryVel evaluation whether or not
    it was accepted, matching the reference's in-place updates.

    With ``use_att``, ``field_ids`` is the [8,N] attribute-plane field of
    the new map (single-gather tryVel path); otherwise the [N] id field.
    """
    sigma_rho_min = estimate_quantile(old, cfg.quantile_cutoff, cfg.quantile_num_bins)
    residuals = jnp.zeros((old.kmax,), jnp.float32)
    if use_att:
        # materialize the gatherable row form ONCE, outside the LM loop
        # (the [8,N] planes are the carried layout; see distance_field)
        att_f, new_pack, field_f = field_ids.T, None, None
    else:
        att_f, new_pack, field_f = None, pack_target_fields(new), field_ids.astype(jnp.float32)

    out = try_vel(old, new, field_ids, vel0, sigma_rho_min, residuals, cfg, cam, new_pack, field_f, field_scale, att_f)
    F, JtJ, JtF, residuals, mif = out
    vel = vel0
    u = 1e-3 * jnp.max(JtJ)
    v = jnp.float32(2.0)

    def lm_iter(_, carry):
        vel, F, JtJ, JtF, u, v, residuals, mif = carry
        ApI = JtJ + jnp.eye(3, dtype=jnp.float32) * u
        h = linalg.invert3(ApI) @ (-JtF)
        vel_new = vel + h
        o2 = try_vel(old, new, field_ids, vel_new, sigma_rho_min, residuals, cfg, cam, new_pack, field_f, field_scale, att_f)
        residuals, mif = o2.residuals, o2.match_id_forward
        gain = (F - o2.score) / (0.5 * jnp.dot(h, u * h - JtF))
        accept = gain > 0.0
        F = jnp.where(accept, o2.score, F)
        vel = jnp.where(accept, vel_new, vel)
        JtJ = jnp.where(accept, o2.JtJ, JtJ)
        JtF = jnp.where(accept, o2.JtF, JtF)
        u = jnp.where(
            accept,
            u * jnp.maximum(0.33, 1.0 - (2.0 * gain - 1.0) ** 3),
            u * v,
        )
        v = jnp.where(accept, 2.0, v * 2.0)
        return (vel, F, JtJ, JtF, u, v, residuals, mif)

    # (Measured: statically unrolling this loop changes nothing — the cost is
    # the latency of the data-dependent gather chain inside try_vel, not the
    # loop boundary.)
    vel, F, JtJ, JtF, u, v, residuals, mif = jax.lax.fori_loop(
        0, cfg.iterations, lm_iter, (vel, F, JtJ, JtF, u, v, residuals, mif)
    )

    Rvel = linalg.invert3(JtJ)
    old = old.replace(match_id_forward=mif)
    return vel, Rvel, old, F


@partial(jax.jit, static_argnames=("cfg", "cam"))
def ext_rot_vel(
    new: T.EdgeMap,
    vel: jnp.ndarray,
    cfg: CoreConfig,
    cam: CameraConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linearized 6-DoF refinement from forward matches (core.cpp:191-261).

    Builds the masked [K,6] design matrix Phi and solves the 6x6 normal
    equations via SVD backsubstitution.  Returns (X, Wx=JtJ).
    """
    fm = cam.fm
    m = new.valid & (new.match_id >= 0)

    gn_safe = jnp.where(new.grad_norm > 0, new.grad_norm, 1.0)
    u_x = new.grad[:, 0] / gn_safe
    u_y = new.grad[:, 1] / gn_safe

    rho_t = 1.0 / (1.0 / jnp.where(new.rho != 0, new.rho, 1e-20) + vel[2])
    qtx = new.match_pos_img[:, 0] + rho_t * (vel[0] * fm - vel[2] * new.match_pos_img[:, 0])
    qty = new.match_pos_img[:, 1] + rho_t * (vel[1] * fm - vel[2] * new.match_pos_img[:, 1])
    q_x = new.pos_img[:, 0]
    q_y = new.pos_img[:, 1]

    phi = jnp.stack(
        [
            u_x * rho_t * fm,
            u_y * rho_t * fm,
            u_x * (-rho_t * q_x) + u_y * (-rho_t * q_y),
            -u_x * q_x * q_y / fm - u_y * (fm + q_y * q_y / fm),
            u_y * q_x * q_y / fm + u_x * (fm + q_x * q_x / fm),
            -u_x * q_y + u_y * q_x,
        ],
        axis=-1,
    )  # [K,6]
    Y = u_x * (q_x - qtx) + u_y * (q_y - qty)

    dqvel = u_x * (vel[0] * fm - vel[2] * new.match_pos_img[:, 0]) + u_y * (
        vel[1] * fm - vel[2] * new.match_pos_img[:, 1]
    )
    s_y = jnp.sqrt(new.sigma_rho ** 2 * dqvel ** 2 + cfg.pixel_uncertainty ** 2)
    w = jnp.where(jnp.abs(Y) > cfg.reweight_distance, jnp.abs(Y) / cfg.reweight_distance, 1.0)
    scale = 1.0 / (s_y * w)
    phi = jnp.where(m[:, None], phi * scale[:, None], 0.0)
    Y = jnp.where(m, Y * scale, 0.0)

    A = jnp.concatenate([phi, Y[:, None]], axis=-1)  # [K,7]
    G = A.T @ A
    JtJ = G[:6, :6]
    JtF = G[:6, 6]
    X = linalg.sym_solve(JtJ, JtF)
    return X, JtJ


def gyro_bias_correction(
    X: jnp.ndarray,
    Wx: jnp.ndarray,
    Wb: jnp.ndarray,
    Rg: jnp.ndarray,
    Rb: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Information-form gyro-bias fusion, Eq. 27 of the 2017 paper
    (core.cpp:264-282).  Returns (X', Wx', Wb', dgbias)."""
    Wg = linalg.invert3(Rg)
    Wb1 = linalg.invert3(linalg.invert3(Wb) + Rb)
    iWgWb = linalg.invert3(Wg + Wb1)
    Wxb = Wx.at[3:, 3:].add(Wg @ (jnp.eye(3, dtype=jnp.float32) - iWgWb @ Wg))
    X1 = Wx @ X  # (the dgbias-prior term is identically zero, core.cpp:276)
    X_new = linalg.chol_inverse(Wxb) @ X1
    dgbias = iWgWb @ (Wg @ X_new[3:])
    Wb_new = Wg + Wb1
    Wx_new = Wx.at[3:, 3:].add(Wg)
    return X_new, Wx_new, Wb_new, dgbias


def regularize_and_update_depth(
    em: T.EdgeMap, vel: jnp.ndarray, threshold: float,
    cfg: CoreConfig, cam: CameraConfig,
) -> T.EdgeMap:
    """regularize_1iter + updateInverseDepthARLU as one fused stage.

    On TPU the two stages' post-gather math runs as ONE Pallas kernel
    (pallas_kernels.reg_ekf_pallas) fed by two XLA neighbor row-gathers —
    the same hybrid split as tryVel: the XLA formulation compiles to tens of
    small [K] kernels whose launch+latency dominates.  Elsewhere (or with
    REBVIO_PALLAS_REGEKF=0) it composes the two reference-shaped ops.
    """
    kmax = em.kmax
    v = os.environ.get("REBVIO_PALLAS_REGEKF", "auto")
    use_pallas = (v == "1") if v in ("0", "1") else jax.default_backend() == "tpu"
    if not (use_pallas and kmax % 128 == 0):
        from rebvio_tpu.ops.matching import regularize_1iter

        em = regularize_1iter(em, threshold)
        return update_inverse_depth(em, vel, cfg, cam)

    from rebvio_tpu.ops.pallas_kernels import reg_ekf_pallas

    has_nb = em.valid & (em.id_next >= 0) & (em.id_prev >= 0)
    nx = jnp.clip(em.id_next, 0, kmax - 1)
    pv = jnp.clip(em.id_prev, 0, kmax - 1)
    pack = jnp.concatenate(
        [em.rho[:, None], em.sigma_rho[:, None], em.grad,
         em.grad_norm[:, None], jnp.zeros((kmax, 3), jnp.float32)], axis=-1,
    )  # padded to 8 so the row gather stays on the fast slice path
    Kr = kmax // 128
    rs = lambda a: a.reshape(Kr, 128)
    # ONE [2,K]-indexed gather for both neighbors (transposed-index trick:
    # the [2,K,8] result moveaxis-reshapes into the kernel's plane layout,
    # no per-lane payload transposes, one gather kernel instead of two)
    rows2 = pack[jnp.stack([nx, pv])]                     # [2,K,8]
    t5 = jnp.moveaxis(rows2[..., :5], -1, 0).reshape(5, 2, Kr, 128)
    ekf_m = em.valid & (em.match_id >= 0)
    rho_out, sr_out = reg_ekf_pallas(
        rs(em.rho), rs(em.sigma_rho), t5[:, 0], t5[:, 1],
        rs(has_nb.astype(jnp.float32)), rs(ekf_m.astype(jnp.float32)),
        rs(em.pos_img[:, 0]), rs(em.pos_img[:, 1]),
        rs(em.match_pos_img[:, 0]), rs(em.match_pos_img[:, 1]),
        rs(em.match_grad[:, 0]), rs(em.match_grad[:, 1]),
        rs(em.match_grad_norm), vel, threshold, cfg, cam.fm,
    )
    return em.replace(rho=rho_out.reshape(-1), sigma_rho=sr_out.reshape(-1))


def update_inverse_depth(em: T.EdgeMap, vel: jnp.ndarray, cfg: CoreConfig, cam: CameraConfig) -> T.EdgeMap:
    """Per-keyline scalar inverse-depth EKF (updateInverseDepthARLU,
    core.cpp:417-456), batched over all matched keylines."""
    m = em.valid & (em.match_id >= 0)
    fm = cam.fm
    qx, qy = em.pos_img[:, 0], em.pos_img[:, 1]
    q0x, q0y = em.match_pos_img[:, 0], em.match_pos_img[:, 1]
    v_rho = em.sigma_rho * em.sigma_rho
    gn = jnp.where(em.match_grad_norm > 0, em.match_grad_norm, 1.0)
    ux = em.match_grad[:, 0] / gn
    uy = em.match_grad[:, 1] / gn
    Y = ux * (qx - q0x) + uy * (qy - q0y)
    H = ux * (vel[0] * fm - vel[2] * q0x) + uy * (vel[1] * fm - vel[2] * q0y)
    rho_safe = jnp.where(em.rho != 0, em.rho, 1e-20)
    rho_p = 1.0 / (1.0 / rho_safe + vel[2])
    F1 = 1.0 / (1.0 + em.rho * vel[2])
    F2 = F1 * F1
    p_p = F2 * v_rho * F2 + cfg.reshape_q_abs ** 2
    e = Y - H * rho_p
    S = H * p_p * H + cfg.pixel_uncertainty ** 2
    K = p_p * H / S
    rho_new = rho_p + K * e
    v_rho_new = (1.0 - K * H) * p_p
    sigma_new = jnp.sqrt(v_rho_new)

    # clamping & NaN reset (core.cpp:446-455)
    low = rho_new < T.RHO_MIN
    sigma_new = jnp.where(low, sigma_new + (T.RHO_MIN - rho_new), sigma_new)
    rho_new = jnp.clip(rho_new, T.RHO_MIN, T.RHO_MAX)
    bad = ~jnp.isfinite(rho_new) | ~jnp.isfinite(sigma_new)
    rho_new = jnp.where(bad, T.RHO_INIT, rho_new)
    sigma_new = jnp.where(bad, T.RHO_MAX, sigma_new)

    return em.replace(
        rho=jnp.where(m, rho_new, em.rho),
        sigma_rho=jnp.where(m, sigma_new, em.sigma_rho),
    )
