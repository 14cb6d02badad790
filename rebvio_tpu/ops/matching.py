"""Edge-map operations: rotation, quantile, forward/directed matching,
depth regularization.

TPU-native rebuild of rebvio/src/edge_map.cpp.  Every sequential per-keyline
loop becomes a masked vector op over the fixed [KMAX] SoA; the sequential
winner rules of forwardMatch and the first-hit rule of the epipolar search
are reproduced with scatter-max / priority-argmin reductions (see each
function's docstring for the exact correspondence).
"""

from __future__ import annotations

import math
import os as _os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from rebvio_tpu import types as T
from rebvio_tpu.configs import CameraConfig, CoreConfig, EdgeMapConfig


def _use_pallas_tube(kmax: int, n_probes: int) -> bool:
    """Post-gather tube-matcher math as one Pallas kernel on TPU
    (pallas_kernels.tube_match_pallas).  REBVIO_PALLAS_TUBE=0/1 overrides.

    An earlier formulation lost at small volumes (~11 per-lane payload
    transposes into the kernel's plane layout cost more than the replaced
    XLA chain below 64k candidates); gathering with TRANSPOSED [P,K]
    indices instead makes the payload land in plane layout, and the kernel
    now wins at every profile — measured on v5e: fast (8k x 4 probes)
    293 -> 333 fps, parity (16k x 8) 165 -> 225 fps."""
    v = _os.environ.get("REBVIO_PALLAS_TUBE", "auto")
    if v in ("0", "1"):
        return v == "1" and kmax % 128 == 0
    return jax.default_backend() == "tpu" and kmax % 128 == 0

_F32_MAX = 3.4028235e38


def rotate_keylines(em: T.EdgeMap, R: jnp.ndarray, fm: float) -> T.EdgeMap:
    """Forward-rotate keyline positions, gradients and inverse depth
    (edge_map.cpp:58-71).  gradient_norm is deliberately NOT recomputed,
    matching the reference (which keeps the stale pre-rotation norm)."""
    x = em.pos_img[:, 0] / fm
    y = em.pos_img[:, 1] / fm
    q = jnp.stack([x, y, jnp.ones_like(x)], axis=-1) @ R.T  # [K,3]
    qz = q[:, 2]
    ok = jnp.abs(qz) > 0.0
    qz_safe = jnp.where(ok, qz, 1.0)
    new_pos_img = jnp.stack([q[:, 0] / qz_safe * fm, q[:, 1] / qz_safe * fm], axis=-1)
    pos_img = jnp.where(ok[:, None], new_pos_img, em.pos_img)
    rho = jnp.where(ok, em.rho / qz_safe, em.rho)
    sigma_rho = jnp.where(ok, em.sigma_rho / qz_safe, em.sigma_rho)
    g = jnp.stack([em.grad[:, 0], em.grad[:, 1], jnp.zeros_like(x)], axis=-1) @ R.T
    grad = g[:, :2]
    return em.replace(pos_img=pos_img, rho=rho, sigma_rho=sigma_rho, grad=grad)


def estimate_quantile(em: T.EdgeMap, percentile: float, num_bins: int) -> jnp.ndarray:
    """sigma_rho histogram percentile (edge_map.cpp:39-56): returns the lower
    edge of the first bin whose *preceding* cumulative count exceeds
    percentile * size (the reference checks before accumulating the bin)."""
    span = T.RHO_MAX - T.RHO_MIN
    b = (num_bins * (em.sigma_rho - T.RHO_MIN) / span).astype(jnp.int32)
    b = jnp.clip(b, 0, num_bins - 1)
    # histogram via one-hot reduction (TPU scatter-add of 16k ints costs ~3ms)
    onehot = (b[:, None] == jnp.arange(num_bins)[None, :]) & em.valid[:, None]
    hist = jnp.sum(onehot.astype(jnp.int32), axis=0)
    csum = jnp.cumsum(hist)
    prefix = jnp.concatenate([jnp.zeros((1,), jnp.int32), csum[:-1]])
    cut = percentile * em.count.astype(jnp.float32)
    found = prefix.astype(jnp.float32) > cut
    i = jnp.argmax(found)
    val = i.astype(jnp.float32) * span / num_bins + T.RHO_MIN
    return jnp.where(jnp.any(found), val, jnp.float32(1e3))


def forward_match(old: T.EdgeMap, new: T.EdgeMap) -> Tuple[T.EdgeMap, jnp.ndarray]:
    """Propagate depth from old (rotated) keylines into the new map via the
    forward matches found by the tracker (edge_map.cpp:73-99).

    The reference's sequential overwrite rule — skip if the target is already
    matched with larger rho — selects, per target, the candidate with maximum
    rho, ties broken by the largest keyline index.  Implemented as a
    scatter-max of rho followed by a scatter-max of index among the argmax
    candidates.
    """
    kmax = new.kmax
    cand = old.valid & (old.match_id_forward >= 0)
    tgt = jnp.where(cand, old.match_id_forward, kmax)
    # Winner per target = lexicographic max of (rho, idx) among its
    # candidates.  A stable ascending argsort of rho orders exactly by
    # (rho, idx), so each keyline's RANK is its lexicographic priority and
    # ONE int32 scatter-max of rank+1 resolves every target — replacing the
    # r3 formulation's scatter-max(rho) -> gather-back -> scatter-max(idx)
    # chain, whose gather-back lowered to the ~8 ns/idx 1-D scalar path
    # (traced r4: 132 + 137 + 113 us -> 2 sorts + one scatter + row
    # gathers).  The winner's fields come from the rank-PERMUTED pack, so
    # both payload lookups are fast T(8,128) row gathers.
    order = jnp.argsort(rho_key := jnp.where(cand, old.rho, -_F32_MAX))
    rank_of = jnp.argsort(order)
    win_key = (
        jnp.zeros((kmax,), jnp.int32)
        .at[tgt]
        .max(jnp.where(cand, rank_of + 1, 0), mode="drop")
    )
    matched = win_key > 0
    # Packed winner fields, permuted into rank order; the winner's keyline
    # INDEX rides along as exact f32 (< 2^24) so no 1-D gather of `order`
    # is needed.  (int fields as exact f32: TPU int32 gathers lower to a
    # 64-bit slow path ~20x costlier than float gathers.)
    pack = jnp.concatenate(
        [old.rho[:, None], old.sigma_rho[:, None], old.pos_img, old.grad,
         old.grad_norm[:, None], old.matches.astype(jnp.float32)[:, None],
         old.match_id_keyframe.astype(jnp.float32)[:, None],
         jnp.arange(kmax, dtype=jnp.float32)[:, None]], axis=-1,
    )
    pack_sorted = pack[order]
    row = pack_sorted[jnp.clip(win_key - 1, 0, kmax - 1)]
    win = jnp.where(matched, row[:, 9].astype(jnp.int32), -1)
    new = new.replace(
        rho=jnp.where(matched, row[:, 0], new.rho),
        sigma_rho=jnp.where(matched, row[:, 1], new.sigma_rho),
        matches=jnp.where(matched, row[:, 7].astype(jnp.int32) + 1, new.matches),
        match_id=jnp.where(matched, win, new.match_id),
        match_pos_img=jnp.where(matched[:, None], row[:, 2:4], new.match_pos_img),
        match_grad=jnp.where(matched[:, None], row[:, 4:6], new.match_grad),
        match_grad_norm=jnp.where(matched, row[:, 6], new.match_grad_norm),
        match_id_keyframe=jnp.where(matched, row[:, 8].astype(jnp.int32), new.match_id_keyframe),
    )
    return new, jnp.sum(matched).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "core_cfg", "cam"))
def directed_match(
    new: T.EdgeMap,
    old: T.EdgeMap,
    vel: jnp.ndarray,
    Rvel: jnp.ndarray,
    Rback: jnp.ndarray,
    cfg: EdgeMapConfig,
    core_cfg: CoreConfig,
    cam: CameraConfig,
) -> Tuple[T.EdgeMap, jnp.ndarray]:
    """Match every new keyline back into the old map along the epipolar
    (translation-induced) direction (edge_map.cpp:101-218).

    The reference walks t outward from the predicted disparity dq_rho,
    alternating negative (tn) / positive (tp) sides, and returns the first
    candidate passing the gradient-similarity and depth-consistency gates.
    Here the walk is a static J-step enumeration of the integer-offset grid
    {dq_rho + m}, each candidate scored with the reference's visit priority
    (2k for the tn side, 2k+1 for tp); the winner is the priority-argmin of
    the surviving candidates — identical to first-hit order.
    """
    kmax = new.kmax
    H, W = old.kl_id_img.shape
    fm = cam.fm
    max_radius = core_cfg.search_range
    pum = cfg.pixel_uncertainty_match
    cang_min = math.cos(cfg.match_threshold_angle * math.pi / 180.0)
    # static walk bound: window width <= 2*(max_radius+pum)+1 (zero-vel branch)
    JMAX = int(2 * (max_radius + pum) + 4)

    vel_b = Rback @ vel
    Rvel_b = Rback @ Rvel @ Rback.T

    # --- per-keyline epipolar geometry (edge_map.cpp:106-149) ---
    p = jnp.concatenate(
        [new.pos_img, jnp.full((kmax, 1), fm, jnp.float32)], axis=-1
    ) @ Rback.T  # [K,3]
    pz = jnp.where(p[:, 2] != 0, p[:, 2], 1e-20)
    pmx = p[:, 0] * fm / pz
    pmy = p[:, 1] * fm / pz
    k_rho = new.rho * fm / pz
    pi0x = pmx + cam.cx
    pi0y = pmy + cam.cy

    t_x = -(vel_b[0] * fm - vel_b[2] * pmx)
    t_y = -(vel_b[1] * fm - vel_b[2] * pmy)
    norm_t = jnp.sqrt(t_x * t_x + t_y * t_y)

    DrDv = jnp.stack([jnp.full_like(pmx, fm), jnp.full_like(pmx, fm), -(pmx + pmy)], axis=-1)
    sigma2_t = jnp.einsum("ki,ij,kj->k", DrDv, Rvel_b, DrDv)

    main = norm_t > 1e-6
    nt_safe = jnp.where(main, norm_t, 1.0)
    # main branch
    tx_m = t_x / nt_safe
    ty_m = t_y / nt_safe
    dq_rho_m = norm_t * k_rho
    dq_min_m = jnp.maximum(0.0, norm_t * (k_rho - new.sigma_rho)) - pum
    dq_max_m = jnp.minimum(max_radius, norm_t * (k_rho + new.sigma_rho)) + pum
    over = dq_rho_m > dq_max_m
    dq_rho_m2 = jnp.where(over, 0.5 * (dq_max_m + dq_min_m), dq_rho_m)
    t_steps_m = jnp.where(
        over,
        (dq_rho_m2 + 0.5).astype(jnp.int32),
        jnp.maximum(dq_max_m - dq_rho_m2, dq_rho_m2 - dq_min_m).astype(jnp.int32),
    )
    # zero-velocity branch (edge_map.cpp:138-149)
    gn_safe = jnp.where(new.grad_norm > 0, new.grad_norm, 1.0)
    tx_z = new.grad[:, 0] / gn_safe
    ty_z = new.grad[:, 1] / gn_safe
    dq_min_z = jnp.full((kmax,), -max_radius - pum, jnp.float32)
    dq_max_z = jnp.full((kmax,), max_radius + pum, jnp.float32)

    tx = jnp.where(main, tx_m, tx_z)
    ty = jnp.where(main, ty_m, ty_z)
    nt_eff = jnp.where(main, norm_t, 1.0)
    dq_rho = jnp.where(main, dq_rho_m2, 0.0)
    dq_min = jnp.where(main, dq_min_m, dq_min_z)
    dq_max = jnp.where(main, dq_max_m, dq_max_z)
    t_steps = jnp.where(main, t_steps_m, dq_max_z.astype(jnp.int32))

    # --- two-phase enumeration of candidate t values ---
    # visited t = dq_rho + m; tn side m in (-t_steps, 0], tp side m in [1, t_steps].
    # Phase 1 probes the J_NEAR best-priority offsets m in [-8, 8] for every
    # keyline; phase 2 re-runs the full window only for the (few) keylines
    # whose admissible window extends beyond and found nothing — compacted to
    # a fixed CAP so the expensive [*, JMAX] gather volume shrinks ~6x.
    # First-hit order is preserved: every phase-1 candidate has strictly
    # better priority than any phase-2-only candidate.
    J_NEAR = 17
    CAP = 4096

    def walk(valid_q, grad_q, gn_q, tx_q, ty_q, pi0x_q, pi0y_q, dq_rho_q,
             dq_min_q, dq_max_q, t_steps_q, nt_q, s2t_q, m_start, J):
        m = m_start[:, None] + jnp.arange(J, dtype=jnp.float32)[None, :]
        t = dq_rho_q[:, None] + m
        ts_f = t_steps_q[:, None].astype(jnp.float32)
        visited = jnp.where(m <= 0, -m <= ts_f - 1.0, m <= ts_f)
        in_window = (t >= dq_min_q[:, None]) & (t <= dq_max_q[:, None])
        prio = jnp.where(m <= 0, -2.0 * m, 2.0 * m - 1.0)

        cx_pix = tx_q[:, None] * t + pi0x_q[:, None]
        cy_pix = ty_q[:, None] * t + pi0y_q[:, None]
        col = (jnp.sign(cx_pix) * jnp.floor(jnp.abs(cx_pix) + 0.5)).astype(jnp.int32)
        row = (jnp.sign(cy_pix) * jnp.floor(jnp.abs(cy_pix) + 0.5)).astype(jnp.int32)
        inb = (row >= 0) & (row < H) & (col >= 0) & (col < W)
        oid = jnp.where(inb, old.kl_id_img[jnp.clip(row, 0, H - 1), jnp.clip(col, 0, W - 1)], -1)
        has = oid >= 0
        os = jnp.clip(oid, 0, kmax - 1)

        g_old = old.grad[os]
        gn_old = old.grad_norm[os]
        gdot = g_old[..., 0] * grad_q[:, None, 0] + g_old[..., 1] * grad_q[:, None, 1]
        denom = jnp.where(gn_old * gn_q[:, None] > 0, gn_old * gn_q[:, None], 1.0)
        cang = gdot / denom
        gate_ang = cang >= cang_min
        gate_norm = jnp.abs(gn_old / jnp.where(gn_q[:, None] > 0, gn_q[:, None], 1.0) - 1.0) <= cfg.match_threshold_norm

        rho_old = old.rho[os]
        sr_old = old.sigma_rho[os]
        v_rho_dr = pum * pum + sr_old * sr_old * nt_q[:, None] ** 2 + s2t_q[:, None] * rho_old * rho_old
        resid = t - nt_q[:, None] * rho_old
        gate_depth = ~(resid * resid > v_rho_dr)  # NaN-tolerant: NaN -> pass

        ok = valid_q[:, None] & visited & in_window & has & gate_ang & gate_norm & gate_depth
        prio_masked = jnp.where(ok, prio, jnp.float32(1e9))
        best_j = jnp.argmin(prio_masked, axis=1)
        found = jnp.take_along_axis(ok, best_j[:, None], axis=1)[:, 0]
        return found, jnp.where(
            found, jnp.take_along_axis(oid, best_j[:, None], axis=1)[:, 0], -1
        )

    m0_full = jnp.ceil(dq_min - dq_rho)
    # phase 1: m in [-8, 8]
    found1, match1 = walk(
        new.valid, new.grad, new.grad_norm, tx, ty, pi0x, pi0y, dq_rho,
        dq_min, dq_max, t_steps, nt_eff, sigma2_t,
        jnp.full((kmax,), -8.0, jnp.float32), J_NEAR,
    )
    # phase 2 only where the admissible window extends beyond [-8, 8]
    lo_m = jnp.maximum(m0_full, -(t_steps.astype(jnp.float32) - 1.0))
    hi_m = jnp.minimum(jnp.floor(dq_max - dq_rho), t_steps.astype(jnp.float32))
    need2 = new.valid & (~found1) & ((lo_m < -8.0) | (hi_m > 8.0))
    sel = jnp.nonzero(need2, size=CAP, fill_value=-1)[0].astype(jnp.int32)
    sv = sel >= 0
    ss_ = jnp.clip(sel, 0, kmax - 1)
    found2s, match2s = walk(
        sv, new.grad[ss_], new.grad_norm[ss_], tx[ss_], ty[ss_],
        pi0x[ss_], pi0y[ss_], dq_rho[ss_], dq_min[ss_], dq_max[ss_],
        t_steps[ss_], nt_eff[ss_], sigma2_t[ss_], m0_full[ss_], JMAX,
    )
    scatter_to = jnp.where(sv, ss_, kmax)
    found2 = jnp.zeros((kmax,), bool).at[scatter_to].set(found2s, mode="drop")
    match2 = jnp.full((kmax,), -1, jnp.int32).at[scatter_to].set(match2s, mode="drop")

    found = found1 | found2
    match = jnp.where(found1, match1, match2)

    ms = jnp.clip(match, 0, kmax - 1)
    new = new.replace(
        rho=jnp.where(found, old.rho[ms], new.rho),
        sigma_rho=jnp.where(found, old.sigma_rho[ms], new.sigma_rho),
        match_id=jnp.where(found, match, new.match_id),
        matches=jnp.where(found, old.matches[ms] + 1, new.matches),
        match_pos_img=jnp.where(found[:, None], old.pos_img[ms], new.match_pos_img),
        match_grad=jnp.where(found[:, None], old.grad[ms], new.match_grad),
        match_grad_norm=jnp.where(found, old.grad_norm[ms], new.match_grad_norm),
        match_id_keyframe=jnp.where(found, old.match_id_keyframe[ms], new.match_id_keyframe),
    )
    return new, jnp.sum(found).astype(jnp.int32)


def directed_match_tube(
    new: T.EdgeMap,
    old: T.EdgeMap,
    vel: jnp.ndarray,
    Rvel: jnp.ndarray,
    Rback: jnp.ndarray,
    cfg: EdgeMapConfig,
    core_cfg: CoreConfig,
    cam: CameraConfig,
    n_probes: int = 0,
    field_scale: int = 1,
    grad_rot2: jnp.ndarray = None,
    use_pallas: bool = None,
) -> Tuple[T.EdgeMap, jnp.ndarray]:
    """Resolve the XLA-vs-Pallas path OUTSIDE the jit cache (use_pallas=None
    re-reads REBVIO_PALLAS_TUBE on every call; a jit-cached trace would bake
    the first call's env value in forever), then dispatch to the per-path
    compiled implementation.  See _directed_match_tube_impl for semantics.

    Limitation (ADVICE r4): this env re-read only helps EAGER callers.  When
    this function is traced inside a larger jit (pipeline.step), the flag is
    resolved once at trace time and baked into that outer jit cache; to switch
    paths there, set the env var before the pipeline's first call (or pass
    use_pallas explicitly from outside the jit boundary)."""
    if use_pallas is None:
        use_pallas = _use_pallas_tube(new.kmax, n_probes or cfg.tube_probes)
    return _directed_match_tube_impl(
        new, old, vel, Rvel, Rback, cfg, core_cfg, cam, n_probes,
        field_scale, grad_rot2, use_pallas)


@partial(jax.jit, static_argnames=("cfg", "core_cfg", "cam", "n_probes",
                                   "field_scale", "use_pallas"))
def _directed_match_tube_impl(
    new: T.EdgeMap,
    old: T.EdgeMap,
    vel: jnp.ndarray,
    Rvel: jnp.ndarray,
    Rback: jnp.ndarray,
    cfg: EdgeMapConfig,
    core_cfg: CoreConfig,
    cam: CameraConfig,
    n_probes: int = 0,
    field_scale: int = 1,
    grad_rot2: jnp.ndarray = None,
    use_pallas: bool = False,
) -> Tuple[T.EdgeMap, jnp.ndarray]:
    """Epipolar matching via the dense nearest-keyline field (TPU-first
    redesign of searchMatch's pixel walk, edge_map.cpp:101-184).

    ``grad_rot2``: the exact 2x2 gradient-rotation replay matrix for the old
    map.  rotate_keylines drops the z component at every stage, so a
    two-stage rotation chain R1 then R2 rotates gradients by
    R2[:2,:2] @ R1[:2,:2] — NOT (R2 @ R1)[:2,:2]; the pipeline passes the
    exact product.  Defaults to Rback.T[:2,:2], which is exact for a map
    rotated once by Rback.T (positions always compose exactly, so they
    replay from Rback.T directly).

    Instead of rasterizing up to 88 pixels along the translation direction
    and probing a sparse detection mask, a handful of probes sample the old
    map's JFA nearest-attribute field (``old.att_img`` planes, row view\n    via one transpose); each candidate is gated by
    (a) perpendicular distance to the epipolar line <= pixel uncertainty (the
    'tube' — the walk implicitly enforced this by stepping on the line),
    (b) its effective disparity t = (seed - p0) . dir inside the same
    [dq_min, dq_max] window, and (c) the reference's gradient and
    depth-consistency gates; the candidate closest to the predicted
    disparity wins (the walk's first-hit order expands outward from the same
    prediction).  Gather volume drops from ~1.4M to ~0.2M lanes.
    """
    kmax = new.kmax
    H, W = old.kl_id_img.shape
    fm = cam.fm
    max_radius = core_cfg.search_range
    pum = cfg.pixel_uncertainty_match
    cang_min = math.cos(cfg.match_threshold_angle * math.pi / 180.0)
    if not n_probes:
        n_probes = cfg.tube_probes

    vel_b = Rback @ vel
    Rvel_b = Rback @ Rvel @ Rback.T

    p = jnp.concatenate(
        [new.pos_img, jnp.full((kmax, 1), fm, jnp.float32)], axis=-1
    ) @ Rback.T
    pz = jnp.where(p[:, 2] != 0, p[:, 2], 1e-20)
    pmx = p[:, 0] * fm / pz
    pmy = p[:, 1] * fm / pz
    k_rho = new.rho * fm / pz
    pi0x = pmx + cam.cx
    pi0y = pmy + cam.cy

    t_x = -(vel_b[0] * fm - vel_b[2] * pmx)
    t_y = -(vel_b[1] * fm - vel_b[2] * pmy)
    norm_t = jnp.sqrt(t_x * t_x + t_y * t_y)
    DrDv = jnp.stack([jnp.full_like(pmx, fm), jnp.full_like(pmx, fm), -(pmx + pmy)], axis=-1)
    sigma2_t = jnp.einsum("ki,ij,kj->k", DrDv, Rvel_b, DrDv)

    main = norm_t > 1e-6
    nt_safe = jnp.where(main, norm_t, 1.0)
    tx_m = t_x / nt_safe
    ty_m = t_y / nt_safe
    dq_rho_m = norm_t * k_rho
    dq_min_m = jnp.maximum(0.0, norm_t * (k_rho - new.sigma_rho)) - pum
    dq_max_m = jnp.minimum(max_radius, norm_t * (k_rho + new.sigma_rho)) + pum
    over = dq_rho_m > dq_max_m
    dq_rho_m2 = jnp.where(over, 0.5 * (dq_max_m + dq_min_m), dq_rho_m)
    gn_safe = jnp.where(new.grad_norm > 0, new.grad_norm, 1.0)
    tx = jnp.where(main, tx_m, new.grad[:, 0] / gn_safe)
    ty = jnp.where(main, ty_m, new.grad[:, 1] / gn_safe)
    nt_eff = jnp.where(main, norm_t, 1.0)
    dq_rho = jnp.where(main, dq_rho_m2, 0.0)
    dq_min = jnp.where(main, dq_min_m, -max_radius - pum)
    dq_max = jnp.where(main, dq_max_m, max_radius + pum)

    # probe positions spread over the admissible window
    lam = jnp.arange(n_probes, dtype=jnp.float32)[None, :] / (n_probes - 1)
    t_probe = dq_min[:, None] + (dq_max - dq_min)[:, None] * lam  # [K,P]
    px_pix = tx[:, None] * t_probe + pi0x[:, None]
    py_pix = ty[:, None] * t_probe + pi0y[:, None]
    col = jnp.clip(jnp.floor(px_pix + 0.5).astype(jnp.int32), 0, W - 1)
    row = jnp.clip(jnp.floor(py_pix + 0.5).astype(jnp.int32), 0, H - 1)
    inb = (px_pix >= -0.5) & (px_pix < W - 0.5) & (py_pix >= -0.5) & (py_pix < H - 0.5)
    if field_scale > 1:  # decimated auxiliary field (configs.field_scale)
        Wf = (W + field_scale - 1) // field_scale
        pidx = (row // field_scale) * Wf + (col // field_scale)
    else:
        pidx = row * W + col

    # Level 1: ONE [K,P,8] row gather from the old map's attribute field —
    # yields candidate id + its detection-time statics (seed pos, gradient,
    # stale grad norm) in the same gather that the id lookup used to need.
    # Level 2: only the DYNAMIC per-keyline pair (rho, sigma_rho — evolved by
    # the depth EKF and the in-flight rotations) from a [K,2] table.  The
    # old map's rotated gradient / pos_img are NOT gathered: rotate_keylines
    # was applied twice (R_prior then R0gva, rebvio.cpp:165,223), and the
    # composite is exactly Rback.T, so they replay analytically from the
    # att statics: grad' = R[:2,:2] @ grad0 (rotation chains drop the z
    # component each step), pos_img' = persp(R @ [x0/fm, y0/fm, 1]) * fm.
    from rebvio_tpu.ops.distance_field import (
        ATT_GN, ATT_GX, ATT_ID, ATT_POSX,
    )

    R_tot = Rback.T
    M2 = R_tot[:2, :2] if grad_rot2 is None else grad_rot2

    # [K,4] dynamic row: depth pair (EKF-evolved) + the two int counters as
    # exact f32 (values < 2^24).  Folding the counters in here removes the
    # post-winner cnt_pack[ws] gather — one fewer dependent-gather kernel on
    # the matcher's latency chain.
    dyn = jnp.stack(
        [old.rho, old.sigma_rho,
         old.matches.astype(jnp.float32),
         old.match_id_keyframe.astype(jnp.float32)], axis=-1,
    )

    att_rows_tbl = old.att_img.T   # [N,8] row view of the [8,N] planes
    if use_pallas and kmax % 128 == 0:
        # Hybrid split (same as tracker.try_vel): XLA projects + gathers;
        # every post-gather gate, the priority argmin, and the winner
        # payload selection run as ONE Pallas kernel
        # (pallas_kernels.tube_match_pallas) instead of a chain of [K,P]
        # select/argmin/take kernels.  The gathers use TRANSPOSED indices
        # ([P,K] — transposing the 4-byte index plane, not the gathered
        # payload) so the [P,K,*] results reshape to the kernel's
        # [*,P,Kr,128] plane layout with a single moveaxis each instead of
        # per-lane payload transposes.
        from rebvio_tpu.ops.pallas_kernels import tube_match_pallas

        Kr = kmax // 128
        P = n_probes
        pidx_T = pidx.T
        # PER-PROBE gathers: XLA's TPU row gather falls off a cost cliff
        # above ~16k indices per op (measured r4, tools/stage_bench thresh:
        # 2.0 ns/idx at <=16k vs 8.6 ns/idx at 128k — 4.3x on the whole
        # [P,K] probe volume), so the [P*K]-index gather is split into P
        # [K]-index gathers; jnp.stack rebuilds the [P,K,*] layout with one
        # cheap concat.
        rowp_t = jnp.stack([att_rows_tbl[pidx_T[p]] for p in range(P)])
        inb_tb = inb.T                                     # [P,K]
        idf_t = rowp_t[..., ATT_ID]
        os_t = jnp.clip(
            jnp.where(inb_tb, idf_t.astype(jnp.int32), -1), 0, kmax - 1)
        drow_t = jnp.stack([dyn[os_t[p]] for p in range(P)])  # [P,K,4]
        att_pk = jnp.moveaxis(rowp_t, -1, 0)               # [8,P,K]
        gxr = att_pk[ATT_GX] * M2[0, 0] + att_pk[ATT_GX + 1] * M2[0, 1]
        gyr = att_pk[ATT_GX] * M2[1, 0] + att_pk[ATT_GX + 1] * M2[1, 1]
        att_t = jnp.stack([att_pk[ATT_ID], att_pk[ATT_GN],
                           att_pk[ATT_POSX], att_pk[ATT_POSX + 1]]
                          ).reshape(4, P, Kr, 128)
        grot_t = jnp.stack([gxr, gyr]).reshape(2, P, Kr, 128)
        dyn_t = jnp.moveaxis(drow_t, -1, 0).reshape(4, P, Kr, 128)
        inb_t = inb_tb.astype(jnp.float32).reshape(P, Kr, 128)
        r1 = lambda a: a.reshape(Kr, 128)
        kl = jnp.stack([r1(tx), r1(ty), r1(pi0x), r1(pi0y), r1(dq_min),
                        r1(dq_max), r1(dq_rho), r1(nt_eff), r1(sigma2_t),
                        r1(new.grad[:, 0]), r1(new.grad[:, 1]),
                        r1(new.grad_norm), r1(new.sigma_rho),
                        r1(new.valid.astype(jnp.float32))])
        o = tube_match_pallas(att_t, grot_t, dyn_t, inb_t, kl, cfg, core_cfg).reshape(12, kmax)
        found = o[0] > 0.5
        match = jnp.where(found, o[1].astype(jnp.int32), -1)
        w_rho, w_sigma_rho = o[2], o[3]
        w_grad = jnp.stack([o[4], o[5]], axis=-1)
        w_grad_norm = o[6]
        w_seed = jnp.stack([o[7], o[8]], axis=-1)
        wcnt = jnp.stack([o[9], o[10]], axis=-1)
    else:
        # per-probe gathers: see the Pallas branch (same >16k-index cliff)
        rowp = jnp.stack([att_rows_tbl[pidx[:, p]] for p in range(n_probes)],
                         axis=1)                  # [K,P,8]
        oid = jnp.where(inb, rowp[..., ATT_ID].astype(jnp.int32), -1)
        has = oid >= 0
        os = jnp.clip(oid, 0, kmax - 1)
        drow = jnp.stack([dyn[os[:, p]] for p in range(n_probes)],
                         axis=1)                   # [K,P,4] level-2 gather
        seed = rowp[..., ATT_POSX:ATT_POSX + 2]   # (x, y) detection pixel coords
        dxs = seed[..., 0] - pi0x[:, None]
        dys = seed[..., 1] - pi0y[:, None]
        t_eff = dxs * tx[:, None] + dys * ty[:, None]
        perp = jnp.abs(-dxs * ty[:, None] + dys * tx[:, None])
        gate_tube = perp <= pum
        gate_window = (t_eff >= dq_min[:, None]) & (t_eff <= dq_max[:, None])

        g0 = rowp[..., ATT_GX:ATT_GX + 2]
        g_old = g0 @ M2.T                          # rotated old gradient (replay)
        gn_old = rowp[..., ATT_GN]                 # stale detection-time norm
        gdot = g_old[..., 0] * new.grad[:, None, 0] + g_old[..., 1] * new.grad[:, None, 1]
        denom = jnp.where(gn_old * new.grad_norm[:, None] > 0, gn_old * new.grad_norm[:, None], 1.0)
        gate_ang = gdot / denom >= cang_min
        gate_norm = jnp.abs(gn_old / jnp.where(new.grad_norm[:, None] > 0, new.grad_norm[:, None], 1.0) - 1.0) <= cfg.match_threshold_norm

        rho_old = drow[..., 0]
        sr_old = drow[..., 1]
        v_rho_dr = pum * pum + sr_old * sr_old * nt_eff[:, None] ** 2 + sigma2_t[:, None] * rho_old * rho_old
        resid = t_eff - nt_eff[:, None] * rho_old
        gate_depth = ~(resid * resid > v_rho_dr)

        ok = new.valid[:, None] & has & gate_tube & gate_window & gate_ang & gate_norm & gate_depth
        prio = jnp.where(ok, jnp.abs(t_eff - dq_rho[:, None]), jnp.float32(1e9))
        best = jnp.argmin(prio, axis=1)

        # Winner fields: everything the winner resolve needs is already in
        # registers ([K,P,*] candidate planes), so pack it into one [K,P,11]
        # tensor and do a SINGLE take_along_axis instead of seven — one winner
        # kernel instead of a chain of small dependent gathers.
        cand = jnp.concatenate(
            [prio[..., None], oid.astype(jnp.float32)[..., None],
             rho_old[..., None], sr_old[..., None], g_old, gn_old[..., None],
             seed, drow[..., 2:4]], axis=-1,
        )                                          # [K,P,11]
        win = jnp.take_along_axis(cand, best[:, None, None], axis=1)[:, 0, :]
        found = win[:, 0] < 1e9
        match = jnp.where(found, win[:, 1].astype(jnp.int32), -1)
        w_rho = win[:, 2]
        w_sigma_rho = win[:, 3]
        w_grad = win[:, 4:6]
        w_grad_norm = win[:, 6]
        w_seed = win[:, 7:9]
        wcnt = win[:, 9:11]
    p0 = jnp.concatenate(
        [(w_seed - jnp.asarray([cam.cx, cam.cy], jnp.float32)) / fm,
         jnp.ones((kmax, 1), jnp.float32)], axis=-1,
    ) @ R_tot.T
    p0z = jnp.where(p0[:, 2] != 0, p0[:, 2], 1e-20)
    w_pos_img = p0[:, :2] * (fm / p0z)[:, None]

    new = new.replace(
        rho=jnp.where(found, w_rho, new.rho),
        sigma_rho=jnp.where(found, w_sigma_rho, new.sigma_rho),
        match_id=jnp.where(found, match, new.match_id),
        matches=jnp.where(found, wcnt[:, 0].astype(jnp.int32) + 1, new.matches),
        match_pos_img=jnp.where(found[:, None], w_pos_img, new.match_pos_img),
        match_grad=jnp.where(found[:, None], w_grad, new.match_grad),
        match_grad_norm=jnp.where(found, w_grad_norm, new.match_grad_norm),
        match_id_keyframe=jnp.where(found, wcnt[:, 1].astype(jnp.int32), new.match_id_keyframe),
    )
    return new, jnp.sum(found).astype(jnp.int32)


def regularize_1iter(em: T.EdgeMap, threshold: float) -> T.EdgeMap:
    """One Jacobi-style depth regularization pass (edge_map.cpp:220-259).

    The reference computes all updates from the pre-pass values and applies
    them afterwards (two-phase), which is exactly a parallel masked update.
    """
    kmax = em.kmax
    has_nb = em.valid & (em.id_next >= 0) & (em.id_prev >= 0)
    nx = jnp.clip(em.id_next, 0, kmax - 1)
    pv = jnp.clip(em.id_prev, 0, kmax - 1)
    # One packed slice-gather per neighbor (8 scalar gathers -> 2 row
    # gathers; scalar int-indexed gathers are the hot path here).
    pack = jnp.concatenate(
        [em.rho[:, None], em.sigma_rho[:, None], em.grad,
         em.grad_norm[:, None], jnp.zeros((kmax, 3), jnp.float32)], axis=-1,
    )
    row_n = pack[nx]
    row_p = pack[pv]
    rn, rp = row_n[:, 0], row_p[:, 0]
    sn, sp = row_n[:, 1], row_p[:, 1]
    test1 = (rn - rp) ** 2 <= (sn * sn + sp * sp)
    gn_, gp_ = row_n[:, 2:4], row_p[:, 2:4]
    gnn, gnp_ = row_n[:, 4], row_p[:, 4]
    denom = jnp.where(gnn * gnp_ > 0, gnn * gnp_, 1.0)
    alpha = (gn_[:, 0] * gp_[:, 0] + gn_[:, 1] * gp_[:, 1]) / denom
    test2 = alpha >= threshold
    apply = has_nb & test1 & test2

    alpha2 = (alpha - threshold) / (1.0 - threshold)
    alpha2 = alpha2 / (jnp.abs(rn - rp) / jnp.where(sn + sp > 0, sn + sp, 1.0) + 1.0)
    sr_safe = jnp.where(em.sigma_rho > 0, em.sigma_rho, 1.0)
    wr = 1.0 / (sr_safe * sr_safe)
    wrn = alpha2 / jnp.where(sn > 0, sn * sn, 1.0)
    wrp = alpha2 / jnp.where(sp > 0, sp * sp, 1.0)
    wsum = wr + wrn + wrp
    r_new = (em.rho * wr + rn * wrn + rp * wrp) / wsum
    s_new = (em.sigma_rho * wr + sn * wrn + sp * wrp) / wsum
    return em.replace(
        rho=jnp.where(apply, r_new, em.rho),
        sigma_rho=jnp.where(apply, s_new, em.sigma_rho),
    )
