"""Pallas TPU kernels for the hot irregular ops.

First kernel: the jump-flood nearest-keyline field.  The XLA formulation
(ops/distance_field.py::build_nn_field) runs ~64 roll/compare passes, each a
full HBM round trip over 4 [H,W] planes; this kernel keeps all planes in
VMEM for the whole schedule, so the only HBM traffic is one load and one
store per plane.  Shifts use pltpu.roll; wrapped candidates are rejected by
the absolute-coordinate distance metric exactly as in the XLA version.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rebvio_tpu import types as T


def _auto_interpret(interpret: bool) -> bool:
    """Compiled Mosaic on TPU; interpreter everywhere else (lets the CPU test
    suite exercise the exact kernel bodies by forcing REBVIO_PALLAS_*=1)."""
    return interpret or jax.default_backend() != "tpu"


def _jfa_schedule(search_range: int):
    steps = []
    s = 1
    while 2 * s < search_range:  # see distance_field.build_nn_field
        s *= 2
    while s >= 1:
        steps.append(s)
        s //= 2
    steps.append(1)
    sched = []
    for s in steps:
        for dy in (-s, 0, s):
            for dx in (-s, 0, s):
                if dy == 0 and dx == 0:
                    continue
                sched.append((dy, dx))
    return sched


@partial(jax.jit, static_argnames=("search_range", "rows", "cols", "interpret"))
def nn_field_pallas(
    em: T.EdgeMap, search_range: int, rows: int, cols: int, interpret: bool = False
) -> jnp.ndarray:
    """Drop-in replacement for distance_field.build_nn_field (same contract:
    [rows*cols] int32 nearest-keyline id, -1 beyond search_range)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kmax = em.kmax
    use = em.valid & ((em.threshold <= 0.0) | (em.grad_norm >= em.threshold))
    col = jnp.floor(em.pos[:, 0] + 0.5).astype(jnp.int32)
    row = jnp.floor(em.pos[:, 1] + 0.5).astype(jnp.int32)
    inb = use & (row >= 0) & (row < rows) & (col >= 0) & (col < cols)
    flat = jnp.where(inb, row * cols + col, rows * cols)

    BIG = jnp.float32(1e9)
    sid0 = jnp.full((rows * cols,), -1, jnp.int32).at[flat].set(
        jnp.arange(kmax, dtype=jnp.int32), mode="drop"
    ).reshape(rows, cols)
    sy0 = jnp.full((rows * cols,), BIG, jnp.float32).at[flat].set(
        em.pos[:, 1], mode="drop"
    ).reshape(rows, cols)
    sx0 = jnp.full((rows * cols,), BIG, jnp.float32).at[flat].set(
        em.pos[:, 0], mode="drop"
    ).reshape(rows, cols)

    sched = _jfa_schedule(search_range)
    r2 = float(search_range * search_range)

    def kernel(sid_ref, sy_ref, sx_ref, out_ref):
        yy = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0).astype(jnp.float32)
        xx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1).astype(jnp.float32)
        sid = sid_ref[:]
        sy = sy_ref[:]
        sx = sx_ref[:]
        big = jnp.float32(1e9)
        best = jnp.where(sid >= 0, (yy - sy) ** 2 + (xx - sx) ** 2, big)
        for dy, dx in sched:
            sy_sh = dy % rows   # pltpu.roll requires non-negative shifts
            sx_sh = dx % cols
            cid, csy, csx = sid, sy, sx
            if sy_sh:
                cid = pltpu.roll(cid, sy_sh, 0)
                csy = pltpu.roll(csy, sy_sh, 0)
                csx = pltpu.roll(csx, sy_sh, 0)
            if sx_sh:
                cid = pltpu.roll(cid, sx_sh, 1)
                csy = pltpu.roll(csy, sx_sh, 1)
                csx = pltpu.roll(csx, sx_sh, 1)
            cd2 = jnp.where(cid >= 0, (yy - csy) ** 2 + (xx - csx) ** 2, big)
            better = cd2 < best
            sid = jnp.where(better, cid, sid)
            sy = jnp.where(better, csy, sy)
            sx = jnp.where(better, csx, sx)
            best = jnp.where(better, cd2, best)
        out_ref[:] = jnp.where(best <= r2, sid, -1)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_auto_interpret(interpret),
    )(sid0, sy0, sx0)
    return out.reshape(-1)


@partial(jax.jit, static_argnames=("search_range", "rows", "cols", "scale", "interpret"))
def att_field_pallas(
    em: T.EdgeMap, search_range: int, rows: int, cols: int, scale: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for distance_field.build_att_field: [8, N]
    PLANES of (0, d2, id, grad_x, grad_y, grad_norm, pos_x, pos_y), id = -1
    beyond ``search_range``.

    The whole jump flood runs in ONE kernel with every plane VMEM-resident:
    the only HBM traffic is one load and one store per plane, vs the XLA
    formulation's ~48 roll/select round trips.  Seed coordinates propagate
    as two exact f32 planes (no fixed-point packing, so no quantization);
    the payload is (id, gx, gy) — pos IS the seed coordinate and
    grad_norm = |(gx, gy)| is recomputed once at the end (detect computes it
    with the same formula, edge_detect.py).

    Layout: the flood is op-LATENCY-bound (r3 bench: 1.7 % of the HBM
    ceiling), so the kernel minimizes op COUNT.  All five planes live in ONE
    row-stacked [5*(rows+PAD), cols] buffer with PAD >= max jump step of
    sentinel rows between regions: each of the 8 candidate directions is
    then 1 roll of the stack (2 hoisted dy-rolls + 6 dx-rolls = 8 rolls/step
    instead of the 40/step of the per-plane form), and the winner select is
    1 select of the stack with a tiled mask.  Row-rolls never leak data
    across regions (the pad rows that cross a boundary are sentinels, and
    the select mask pins pad rows to sentinel forever); column-roll
    wraparound carries absolute far-edge coordinates that the distance
    metric rejects, exactly like the per-plane form.  (A [5,rows,cols] 3-D
    roll would be 1 op too, but Mosaic hangs compiling 3-D rolls of that
    shape — the row-stacked 2-D form lowers fine.)
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kmax = em.kmax
    if scale > 1:
        rows = (rows + scale - 1) // scale
        cols = (cols + scale - 1) // scale
        search_range = max(1, round(search_range / scale))
    inv_s = jnp.float32(1.0 / scale)
    pos_x = em.pos[:, 0] * inv_s
    pos_y = em.pos[:, 1] * inv_s

    use = em.valid & ((em.threshold <= 0.0) | (em.grad_norm >= em.threshold))
    col = jnp.floor(pos_x + 0.5).astype(jnp.int32)
    row = jnp.floor(pos_y + 0.5).astype(jnp.int32)
    inb = use & (row >= 0) & (row < rows) & (col >= 0) & (col < cols)

    PAD = _flood_pad(search_range)
    Rp = rows + PAD
    BIG = jnp.float32(1e9)
    n = rows * cols

    # ONE row-window scatter seeds all five planes (sy, sx, id, gx, gy):
    # [K] indices with an 8-lane update window.  Measured on v5e at parity
    # geometry: 0.17 ms vs 0.55 ms for the flat [5K]-value scatter (TPU
    # scatter cost scales with INDEX count, not element count) and vs
    # 1.5 ms for a dense strided-slice reduce from the detector planes.
    # Pad rows keep their sentinel fill (BIG coords -> the distance metric
    # rejects any pad candidate, so no empty/id gate is needed).
    zeros_k = jnp.zeros((kmax,), jnp.float32)
    vals = jnp.stack([
        pos_y, pos_x, jnp.arange(kmax, dtype=jnp.float32),
        em.grad[:, 0], em.grad[:, 1], zeros_k, zeros_k, zeros_k,
    ], axis=-1)                                              # [K,8]
    flat = jnp.where(inb, row * cols + col, n)
    fill8 = jnp.asarray([BIG, BIG, -1.0, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32)
    tbl = jnp.broadcast_to(fill8, (n + 1, 8)).at[flat].set(vals, mode="drop")
    planes = tbl[:n].T.reshape(8, rows, cols)                # [8,rows,cols]
    padr = jnp.zeros((PAD, cols), jnp.float32)
    stack0 = jnp.concatenate([
        planes[0], padr + BIG, planes[1], padr + BIG,
        planes[2], padr - 1.0, planes[3], padr, planes[4], padr,
    ], axis=0)                                               # [5*Rp, cols]
    return _att_flood(stack0, search_range, rows, cols, scale, interpret)


def _flood_pad(search_range: int) -> int:
    """Pad rows between stacked regions: the largest jump step, rounded up
    to sublane alignment."""
    s = 1
    while 2 * s < search_range:
        s *= 2
    return -(-s // 8) * 8


@partial(jax.jit, static_argnames=("search_range", "rows", "cols", "scale", "interpret"))
def _att_flood(
    stack0: jnp.ndarray,     # [5*(rows+PAD), cols] seeded region stack
    search_range: int, rows: int, cols: int, scale: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """The jump flood proper over a pre-seeded region stack (see
    att_field_pallas for layout and semantics).  rows/cols/search_range are
    in FIELD units (already divided by scale)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps = []
    s = 1
    while 2 * s < search_range:
        s *= 2
    while s >= 1:
        steps.append(s)
        s //= 2
    steps.append(1)
    r2 = float(search_range * search_range)
    fscale = float(scale)
    PAD = _flood_pad(search_range)
    Rp = rows + PAD
    n = rows * cols
    SR = 5 * Rp

    def kernel(p_ref, out_ref):
        # The mask / d2 planes run at full REGION height [Rp, cols]: on pad
        # rows both candidate and best coords are the BIG sentinel, so
        # cd2 == best_d2 there and `better` is naturally false — pads stay
        # sentinel forever without any explicit pad handling.
        yy_i = jax.lax.broadcasted_iota(jnp.int32, (Rp, cols), 0)
        yy = yy_i.astype(jnp.float32)
        xx = jax.lax.broadcasted_iota(jnp.int32, (Rp, cols), 1).astype(jnp.float32)
        # pins pad rows: a roll can move DATA rows into a pad row, where they
        # must never be accepted (a later roll would carry them into the
        # wrong region) — the accept mask is forced false there
        row_ok = yy_i < rows

        def d2_of(stk):
            sy = stk[0:Rp, :]
            sx = stk[Rp:2 * Rp, :]
            return (yy - sy) ** 2 + (xx - sx) ** 2

        def tile5(m):
            # broadcast the [Rp, cols] region mask to all 5 regions (no
            # concat: Mosaic rejects concats of pieces with mixed layout
            # offsets; broadcast+collapse lowers fine)
            return jnp.broadcast_to(m[None], (5, Rp, cols)).reshape(SR, cols)

        st = p_ref[:]
        bd2 = d2_of(st)
        for s in steps:
            best, best_d2 = st, bd2
            for dy in (-s, 0, s):
                ry = pltpu.roll(st, dy % SR, 0) if dy else st
                for dx in (-s, 0, s):
                    if dy == 0 and dx == 0:
                        continue
                    cand = pltpu.roll(ry, dx % cols, 1) if dx else ry
                    cd2 = d2_of(cand)
                    better = (cd2 < best_d2) & row_ok
                    best = jnp.where(tile5(better), cand, best)
                    best_d2 = jnp.where(better, cd2, best_d2)
            st, bd2 = best, best_d2
        idf = st[2 * Rp:2 * Rp + rows, :]
        gx = st[3 * Rp:3 * Rp + rows, :]
        gy = st[4 * Rp:4 * Rp + rows, :]
        bd2r = bd2[0:rows, :]
        in_range = bd2r <= r2
        out_ref[0, :, :] = jnp.zeros((rows, cols), jnp.float32)
        out_ref[1, :, :] = bd2r
        out_ref[2, :, :] = jnp.where(in_range, idf, -1.0)
        out_ref[3, :, :] = gx
        out_ref[4, :, :] = gy
        out_ref[5, :, :] = jnp.sqrt(gx * gx + gy * gy)
        out_ref[6, :, :] = st[Rp:Rp + rows, :] * fscale
        out_ref[7, :, :] = st[0:rows, :] * fscale

    # Explicit full-array blocks (not bare memory_space specs): under
    # jax.vmap a block-less spec loads the WHOLE batched operand into VMEM
    # — at B=8 full-res that is 15.4 MB of seed stacks and blows the 16 MB
    # scoped-vmem limit (caught by the r5 real-chip batch sweep).  With a
    # block shape, the batching rule prepends a size-1 batch block and each
    # grid instance stays at the single-sequence footprint.
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        out_shape=jax.ShapeDtypeStruct((8, rows, cols), jnp.float32),
        in_specs=[pl.BlockSpec((SR, cols), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, rows, cols), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        # v5e has 128 MB of physical VMEM; the compiler's default 16 MB
        # scoped limit rejects the BATCHED flood (jax.vmap at B = 8 keeps
        # the full seed-stack operand resident) even though it fits — raise
        # the cap for this kernel (caught by the r5 real-chip batch sweep)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=_auto_interpret(interpret),
    )(stack0)
    # PLANE-major [8, N] output (minor dim N -> compact, no lane padding):
    # the scan carry of the att field stays at its live 2.9 MB instead of
    # the [N,8] row form's 16x lane-padded 46 MB (traced r5: a 70 us
    # carry copy per frame).  Consumers needing row gathers transpose once
    # per step (distance_field.att_rows).
    return out.reshape(8, n)


def try_vel_math_pallas(
    att8,          # [8, Kr, 128] gathered attribute rows, transposed
    p_x, p_y,      # [Kr, 128] projected coords (principal-point-centered)
    rho_p,         # [Kr, 128]
    ok,            # [Kr, 128] f32 lookup-ok mask
    inv_sr,        # [Kr, 128]
    gxo, gyo,      # [Kr, 128] old-map gradient
    use,           # [Kr, 128] f32 participation mask
    residuals,     # [Kr, 128] previous-pass residuals (Huber reweight source)
    cfg,
    cam,
    interpret: bool = False,
):
    """Post-gather half of a tryVel pass as ONE Pallas kernel.

    The XLA formulation of try_vel (ops/tracker.py) compiles to a dozen-plus
    kernels per pass (stacks, selects, the [K,4]^T[K,4] matmul, small
    reductions), and the LM loop runs 6 dependent passes — at ~7 us of
    launch+latency per kernel that is ~115 us/pass of pure overhead on top
    of the ~30 us row gather (tools/micro_bench.py: 145 us/pass at 8k
    keylines).  Mosaic cannot lower the data-dependent row gather itself
    (see try_vel_pallas below), so the split is: XLA computes the projection
    + gathers the [K,8] attribute rows (one fusion + one gather kernel), and
    this kernel does every op after the gather — gates, Huber reweight,
    residual, score, and the fused JtJ/JtF reduction — in one launch.

    Returns (Gs [8,128] with G[0:4,0:4] and score at [4,0], residuals_out,
    mif int32).  Reference semantics: core.cpp:78-148 (see tracker.try_vel).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = float(cfg.search_range)
    rw = float(cfg.reweight_distance)
    mthr = float(cfg.match_threshold)
    fm = float(cam.fm)
    cx = float(cam.cx)
    cy = float(cam.cy)

    def kernel(att_ref, px_ref, py_ref, rhop_ref, ok_ref, isr_ref,
               gxo_ref, gyo_ref, use_ref, res_ref, gs_ref, rout_ref, mif_ref):
        idf = att_ref[2]
        gNx, gNy, gnN = att_ref[3], att_ref[4], att_ref[5]
        posNx, posNy = att_ref[6], att_ref[7]
        ok_m = ok_ref[:] > 0.5
        use_m = use_ref[:] > 0.5
        inv_sr_ = isr_ref[:]
        p_x = px_ref[:]
        p_y = py_ref[:]
        p_xc_ = p_x + cx
        p_yc_ = p_y + cy
        rho_p_ = rhop_ref[:]

        fid_ok = ok_m & (idf >= 0)
        dot = gNx * gxo_ref[:] + gNy * gyo_ref[:]
        n2 = gnN * gnN
        sim_ok = jnp.abs(dot - n2) <= mthr * n2
        matched = fid_ok & sim_ok

        res_in = res_ref[:]
        weight = jnp.where(res_in > rw, rw / res_in, 1.0)
        gnN_safe = jnp.where(gnN > 0, gnN, 1.0)
        ux = gNx / gnN_safe
        uy = gNy / gnN_safe
        fi = (p_xc_ - posNx) * ux + (p_yc_ - posNy) * uy
        f0 = jnp.where(matched, fi * inv_sr_, R * inv_sr_)
        f = f0 * weight
        score = jnp.sum(jnp.where(use_m, f * f, 0.0))

        m = matched & use_m
        df_dx = jnp.where(m, ux * inv_sr_, 0.0)
        df_dy = jnp.where(m, uy * inv_sr_, 0.0)
        jx = rho_p_ * fm * df_dx * weight
        jy = rho_p_ * fm * df_dy * weight
        jz = -rho_p_ * (p_x * df_dx + p_y * df_dy) * weight
        fmk = jnp.where(m, f, 0.0)

        # Scatter/stack of scalars does not lower in Mosaic; place the 16
        # Gram entries + score into the [8,128] output via iota masks.
        cols4 = (jx, jy, jz, fmk)
        ri = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        out = jnp.where((ri == 4) & (ci == 0), score, 0.0)
        for a in range(4):
            for b in range(a, 4):
                v = jnp.sum(cols4[a] * cols4[b])
                out = out + jnp.where((ri == a) & (ci == b), v, 0.0)
                if a != b:
                    out = out + jnp.where((ri == b) & (ci == a), v, 0.0)
        gs_ref[:, :] = out
        rout_ref[:, :] = jnp.where(m, jnp.abs(fi), res_in)
        mif_ref[:, :] = jnp.where(m, idf, -1.0).astype(jnp.int32)

    Kr = p_x.shape[0]
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((Kr, 128), jnp.float32),
            jax.ShapeDtypeStruct((Kr, 128), jnp.int32),
        ],
        in_specs=[vspec] * 10,
        out_specs=[vspec] * 3,
        interpret=_auto_interpret(interpret),
    )(att8, p_x, p_y, rho_p, ok, inv_sr, gxo, gyo, use, residuals)


def reg_ekf_pallas(
    rho, sigma_rho,        # [Kr,128] pre-pass depth state
    row_n, row_p,          # [5, Kr, 128] gathered neighbor packs
                           #   (rho, sigma_rho, gx, gy, gnorm), transposed
    has_nb,                # [Kr,128] f32: valid & id_next>=0 & id_prev>=0
    ekf_m,                 # [Kr,128] f32: valid & match_id>=0
    qx, qy,                # [Kr,128] pos_img
    q0x, q0y,              # [Kr,128] match_pos_img
    mux, muy,              # [Kr,128] match_grad
    mgn,                   # [Kr,128] match_grad_norm
    vel,                   # [3]
    threshold: float,
    cfg,
    fm: float,
    interpret: bool = False,
):
    """Depth regularization + inverse-depth EKF as ONE kernel.

    The two stages (edge_map.cpp:220-259 then core.cpp:417-456) are pure
    per-keyline math once the two neighbor row-gathers are done; in XLA they
    compile to tens of small [K] kernels whose launch+latency dominates at
    ~7 us each.  Split like the hybrid tryVel: XLA packs + gathers the
    neighbor rows (3 kernels), this kernel runs regularize's tests/blend and
    then the scalar EKF on the blended depth (the exact sequential
    composition of the pipeline, pipeline.py).

    Returns (rho_out, sigma_out)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rw_thr = float(threshold)
    q_abs = float(cfg.reshape_q_abs)
    pu2 = float(cfg.pixel_uncertainty) ** 2
    RHO_MIN, RHO_MAX, RHO_INIT = T.RHO_MIN, T.RHO_MAX, T.RHO_INIT
    FM = float(fm)

    def kernel(rho_ref, sr_ref, rn_ref, rp_ref, hn_ref, em_ref,
               qx_ref, qy_ref, q0x_ref, q0y_ref, mux_ref, muy_ref,
               mgn_ref, vel_ref, rho_out_ref, sr_out_ref):
        # vel arrives as a [3,128] lane-broadcast VMEM tile (NOT SMEM: an
        # SMEM operand cannot be batched, which broke jax.vmap of the whole
        # step on real TPU hardware — parallel/batch.py at B >= 2, caught
        # by the r5 batch-sweep; [1,128] rows broadcast natively against
        # the [Kr,128] planes, while [1,1] tiles crash the Mosaic
        # multiplier)
        rho0 = rho_ref[:]
        sr0 = sr_ref[:]
        rn, sn = rn_ref[0], rn_ref[1]
        gnx, gny, gnn = rn_ref[2], rn_ref[3], rn_ref[4]
        rp, sp = rp_ref[0], rp_ref[1]
        gpx, gpy, gnp_ = rp_ref[2], rp_ref[3], rp_ref[4]
        has_nb_ = hn_ref[:] > 0.5

        # --- regularize_1iter (edge_map.cpp:220-259) ---
        test1 = (rn - rp) ** 2 <= (sn * sn + sp * sp)
        denom = jnp.where(gnn * gnp_ > 0, gnn * gnp_, 1.0)
        alpha = (gnx * gpx + gny * gpy) / denom
        test2 = alpha >= rw_thr
        apply = has_nb_ & test1 & test2
        alpha2 = (alpha - rw_thr) / (1.0 - rw_thr)
        alpha2 = alpha2 / (jnp.abs(rn - rp) / jnp.where(sn + sp > 0, sn + sp, 1.0) + 1.0)
        sr_safe = jnp.where(sr0 > 0, sr0, 1.0)
        wr = 1.0 / (sr_safe * sr_safe)
        wrn = alpha2 / jnp.where(sn > 0, sn * sn, 1.0)
        wrp = alpha2 / jnp.where(sp > 0, sp * sp, 1.0)
        wsum = wr + wrn + wrp
        rho1 = jnp.where(apply, (rho0 * wr + rn * wrn + rp * wrp) / wsum, rho0)
        sr1 = jnp.where(apply, (sr0 * wr + sn * wrn + sp * wrp) / wsum, sr0)

        # --- updateInverseDepthARLU (core.cpp:417-456) on the blend ---
        v0 = vel_ref[0:1, :]
        v1 = vel_ref[1:2, :]
        v2 = vel_ref[2:3, :]
        m = em_ref[:] > 0.5
        gn = jnp.where(mgn_ref[:] > 0, mgn_ref[:], 1.0)
        ux = mux_ref[:] / gn
        uy = muy_ref[:] / gn
        qx_, qy_ = qx_ref[:], qy_ref[:]
        q0x_, q0y_ = q0x_ref[:], q0y_ref[:]
        Y = ux * (qx_ - q0x_) + uy * (qy_ - q0y_)
        Hm = ux * (v0 * FM - v2 * q0x_) + uy * (v1 * FM - v2 * q0y_)
        v_rho = sr1 * sr1
        rho_safe = jnp.where(rho1 != 0, rho1, 1e-20)
        rho_p = 1.0 / (1.0 / rho_safe + v2)
        F1 = 1.0 / (1.0 + rho1 * v2)
        F2 = F1 * F1
        p_p = F2 * v_rho * F2 + q_abs * q_abs
        e = Y - Hm * rho_p
        S = Hm * p_p * Hm + pu2
        Kk = p_p * Hm / S
        rho_new = rho_p + Kk * e
        v_rho_new = (1.0 - Kk * Hm) * p_p
        sigma_new = jnp.sqrt(v_rho_new)
        low = rho_new < RHO_MIN
        sigma_new = jnp.where(low, sigma_new + (RHO_MIN - rho_new), sigma_new)
        rho_new = jnp.clip(rho_new, RHO_MIN, RHO_MAX)
        bad = ~jnp.isfinite(rho_new) | ~jnp.isfinite(sigma_new)
        rho_new = jnp.where(bad, RHO_INIT, rho_new)
        sigma_new = jnp.where(bad, RHO_MAX, sigma_new)

        rho_out_ref[:] = jnp.where(m, rho_new, rho1)
        sr_out_ref[:] = jnp.where(m, sigma_new, sr1)

    Kr = rho.shape[0]
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((Kr, 128), jnp.float32),
            jax.ShapeDtypeStruct((Kr, 128), jnp.float32),
        ],
        in_specs=[vspec] * 14,
        out_specs=[vspec] * 2,
        interpret=_auto_interpret(interpret),
    )(rho, sigma_rho, row_n, row_p, has_nb, ekf_m,
      qx, qy, q0x, q0y, mux, muy, mgn,
      jnp.broadcast_to(vel.reshape(3, 1), (3, 128)))


def try_vel_pallas(
    old: T.EdgeMap,
    att: jnp.ndarray,           # [N,8] attribute ROW view (distance_field.att_rows)
    vel: jnp.ndarray,           # [3]
    sigma_rho_min: jnp.ndarray,  # []
    residuals: jnp.ndarray,     # [K]
    cfg,
    cam,
    field_scale: int = 1,
    block: int = 1024,
    interpret: bool = False,
):
    """Fused tryVel pass as one Pallas kernel (north-star attempt).

    The XLA formulation measures AT the dependent row-gather chain latency
    (tools/roofline.py: 175 us pass vs 182 us bare gather chain at 16k
    keylines), so the only possible win is making the gather itself faster
    by pinning the attribute table in VMEM and using an in-kernel vector
    gather.  This kernel expresses exactly that: per keyline block, the
    projection/gates/JtJ math runs in VMEM with the [N,8] table resident,
    and the candidate row is fetched with a per-lane `jnp.take`.

    Outcome on v5e (jax 0.9 Mosaic): the kernel does NOT compile — there is
    no vector-gather unit, and Mosaic's only gather lowering is a same-size
    per-element shuffle.  Two formulations were attempted and rejected at
    lowering time:
      * [B] indices -> [B,8] row gather (jnp.take, axis=0):
        "ValueError: Shape mismatch in input, indices and output"
        (_gather_lowering_rule, mosaic/lowering.py:2484)
      * [8,B] take_along_axis on the transposed [8,N] table:
        "assert indices_aval.shape == in_aval.shape + (1,)"
        (mosaic/lowering.py:2493 — indices must have the OPERAND's shape,
        i.e. only full same-shape shuffles lower).
    So XLA's gather lowering is the ceiling for this access pattern — which
    tools/roofline.py already demonstrates directly: the XLA tryVel pass
    runs at ~100% of the bare dependent row-gather chain latency.  Kept as
    the interpret-mode-verified artifact of the fused formulation (see
    tests/test_tracker.py::test_pallas_try_vel_matches_xla).

    Returns (score[1,1] per block summed, JtJ[4,4], residuals, mif) like
    tracker.try_vel's TryVelOut fields (JtJ packed with JtF as G[4,4]).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = old.kmax
    H, W = old.kl_id_img.shape
    fm, cx, cy = cam.fm, cam.cx, cam.cy
    R = cfg.search_range
    Wf = (W + field_scale - 1) // field_scale
    n_blocks = (K + block - 1) // block
    assert K % block == 0

    def kernel(pos_img_ref, rho_ref, sr_ref, grad_ref, gn_ref, use_ref,
               res_in_ref, vel_ref, att_ref, G_ref, res_ref, mif_ref):
        b = pl.program_id(0)
        vel0, vel1, vel2 = vel_ref[0], vel_ref[1], vel_ref[2]
        use = use_ref[:] > 0.5
        sr = sr_ref[:]
        sr_safe = jnp.where(sr > 0, sr, 1.0)
        inv_sr = 1.0 / sr_safe
        residuals_b = res_in_ref[:]
        weight = jnp.where(residuals_b > cfg.reweight_distance,
                           cfg.reweight_distance / residuals_b, 1.0)
        rho = rho_ref[:]
        z_p = 1.0 / jnp.where(rho != 0, rho, 1e-20) + vel2
        front = z_p > 0.0
        rho_p = 1.0 / jnp.where(front, z_p, 1.0)
        px_i = pos_img_ref[:, 0]
        py_i = pos_img_ref[:, 1]
        p_x = rho_p * (vel0 * fm - vel2 * px_i) + px_i
        p_y = rho_p * (vel1 * fm - vel2 * py_i) + py_i
        p_xc = p_x + cx
        p_yc = p_y + cy
        x = jnp.floor(p_xc + 0.5).astype(jnp.int32)
        y = jnp.floor(p_yc + 0.5).astype(jnp.int32)
        inb = (x >= 1) & (y >= 1) & (x < W - 1) & (y < H - 1)
        lookup_ok = use & front & inb
        xs = jnp.clip(x, 0, W - 1)
        ys = jnp.clip(y, 0, H - 1)
        if field_scale > 1:
            fidx = (ys // field_scale) * Wf + (xs // field_scale)
        else:
            fidx = ys * W + xs

        # Mosaic's gather lowering only accepts same-shape gathers
        # (indices.shape == output.shape), so the [B]->[B,8] row gather is
        # expressed as take_along_axis on the transposed [8,N] table with
        # the indices broadcast to [8,B].
        idx2 = jnp.broadcast_to(fidx[None, :], (8, fidx.shape[0]))
        row8t = jnp.take_along_axis(att_ref[:], idx2, axis=1)  # [8,B]

        fid = jnp.where(lookup_ok, row8t[2, :].astype(jnp.int32), -1)
        has_df = fid >= 0
        gNx, gNy = row8t[3, :], row8t[4, :]
        gnN = row8t[5, :]
        posNx, posNy = row8t[6, :], row8t[7, :]
        gx, gy = grad_ref[:, 0], grad_ref[:, 1]
        dot = gNx * gx + gNy * gy
        n2 = gnN * gnN
        sim_ok = jnp.abs(dot - n2) <= cfg.match_threshold * n2
        matched = has_df & sim_ok

        gnN_safe = jnp.where(gnN > 0, gnN, 1.0)
        ux = gNx / gnN_safe
        uy = gNy / gnN_safe
        dx = p_xc - posNx
        dy = p_yc - posNy
        fi = dx * ux + dy * uy
        f0 = jnp.where(matched, fi * inv_sr, R * inv_sr)
        f = f0 * weight
        score = jnp.sum(jnp.where(use, f * f, 0.0))

        m = matched & use
        df_dx = jnp.where(m, ux * inv_sr, 0.0)
        df_dy = jnp.where(m, uy * inv_sr, 0.0)
        jx = rho_p * fm * df_dx * weight
        jy = rho_p * fm * df_dy * weight
        jz = -rho_p * (p_x * df_dx + p_y * df_dy) * weight
        Jm = jnp.stack([jx, jy, jz, jnp.where(m, f, 0.0)], axis=-1)
        G = jnp.dot(Jm.T, Jm, preferred_element_type=jnp.float32)
        # score + G packed into one (8,128)-tile output block (TPU block
        # shapes must tile to (8,128) or match the array)
        out = jnp.zeros((8, 128), jnp.float32)
        out = out.at[0:4, 0:4].set(G).at[4, 0].set(score)
        G_ref[0, :, :] = out
        res_ref[:] = jnp.where(m, jnp.abs(fi), residuals_b)
        mif_ref[:] = jnp.where(m, fid, -1)

    use_f = (old.valid & (old.sigma_rho <= sigma_rho_min)
             & ((old.threshold <= 0.0) | (old.grad_norm >= old.threshold))
             ).astype(jnp.float32)

    bspec = lambda *shape: pl.BlockSpec(
        shape, lambda b: tuple(b if i == 0 else 0 for i in range(len(shape))),
        memory_space=pltpu.VMEM)
    G, res, mif = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            bspec(block, 2),                 # pos_img
            bspec(block,), bspec(block,),    # rho, sigma_rho
            bspec(block, 2), bspec(block,),  # grad, grad_norm
            bspec(block,), bspec(block,),    # use, residuals_in
            pl.BlockSpec(memory_space=pltpu.SMEM),  # vel [3]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # att table [8,N] (full)
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            bspec(block,), bspec(block,),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((K,), jnp.float32),
            jax.ShapeDtypeStruct((K,), jnp.int32),
        ],
        interpret=_auto_interpret(interpret),
    )(old.pos_img, old.rho, old.sigma_rho, old.grad, old.grad_norm,
      use_f, residuals, vel, att.T)
    Gp = G.sum(axis=0)
    return Gp[4, 0], Gp[0:4, 0:4], res, mif


def _gj_inverse_mosaic(m: jnp.ndarray) -> jnp.ndarray:
    """linalg.gj_inverse with the pivot division restated as a 0-d scalar
    multiply: Mosaic broadcasts 0-d scalars natively but CRASHES on [1,1]
    tile broadcasts ([1,2n] / [1,1])."""
    n = m.shape[-1]
    a = jnp.concatenate([m, jnp.eye(n, dtype=m.dtype)], axis=-1)  # [n,2n]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 2 * n), 0)
    for i in range(n):
        piv = jnp.sum(a[i:i + 1, i:i + 1])               # 0-d scalar
        piv_row = a[i:i + 1, :] * (1.0 / piv)            # [1,2n]
        fac = a[:, i:i + 1]                              # [n,1]
        a = a - jnp.dot(fac, piv_row, preferred_element_type=m.dtype)
        a = jnp.where(rows == i, piv_row, a)             # restore pivot row
    return a[:, n:]


def estimate_bias_pallas(
    a_s, a_v,            # [3] visual / gravity-corrected accelerations
    x_p,                 # [7] PREDICTED prior state (post KF predict)
    W_rest,              # [8,11] constant residual-weight bottom block
    Rs, Rv,              # [3,3] measurement noises
    Wvw, Xvw,            # [6,6], [6] rigid-transform info/state
    g_gravit,            # [] gravity norm
    iters: int = 20,
    interpret: bool = False,
):
    """The SAB Gauss-Newton solve + posterior + rigid-transform re-fusion
    (sab.sab_gauss_newton + the tail of sab.estimate_bias,
    core.cpp:376-405 / sab_estimator.cpp:21-165) as ONE Mosaic kernel.
    The KF predict stays in XLA (it runs once per frame and is a handful
    of ops); the ``iters``-deep GN loop — ~400 tiny XLA kernels whose
    launch overhead made the block ~220 us of the parity step
    (PROFILE_r04: 'needs a Mosaic mega-kernel') — runs entirely in one
    launch with every matrix a single-tile value.

    Mosaic findings baked in: scalars must be 0-d (reduced via jnp.sum)
    — [1,1] tile broadcasts crash the Mosaic multiplier; atan2 does not
    lower (angle wrap is a - 2pi*round(a/2pi)); inverses use the
    pivot-free Gauss-Jordan (_gj_inverse_mosaic) instead of the unrolled
    Cholesky — same inverse, different rounding, measured benign
    (test_sab.py::test_pallas_estimate_bias_matches_xla).

    Returns (K [1,1], X [7,1], P [7,7], Xvw [6,1])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    BIAS_SAT = 5e-1 / 25  # sab_estimator.cpp:34
    TWO_PI = float(2.0 * np.pi)
    PI = float(np.pi)

    def kernel(as_ref, av_ref, xp_ref, wrest_ref, rs_ref, rv_ref,
               wvw_ref, xvw_ref, misc_ref,
               k_ref, x_out_ref, p_out_ref, xvw_out_ref):
        ri3 = jax.lax.broadcasted_iota(jnp.int32, (3, 3), 0)
        ci3 = jax.lax.broadcasted_iota(jnp.int32, (3, 3), 1)
        eye3 = (ri3 == ci3).astype(f32)
        one11 = jnp.ones((1, 1), f32)

        def E(r, c):
            return ((ri3 == r) & (ci3 == c)).astype(f32)

        def sc(x, r):  # [n,1] tile -> 0-d scalar at row r
            return jnp.sum(x[r:r + 1, 0:1])

        def skew_s(wx, wy, wz):  # 0-d components -> [3,3]
            return (wz * (E(1, 0) - E(0, 1)) + wy * (E(0, 2) - E(2, 0))
                    + wx * (E(2, 1) - E(1, 2)))

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=f32)

        def exp3(w):  # [3,1] -> [3,3] Rodrigues (so3.exp semantics)
            t2 = jnp.sum(w * w)            # 0-d
            t = jnp.sqrt(t2)
            small = t2 < 1e-8
            ts = jnp.where(small, 1.0, t)
            a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / ts)
            b = jnp.where(small, 0.5 - t2 / 24.0,
                          (1.0 - jnp.cos(t)) / jnp.where(small, 1.0, t2))
            W = skew_s(sc(w, 0), sc(w, 1), sc(w, 2))
            return eye3 + a * W + b * dot(W, W)

        def z(r, c):
            return jnp.zeros((r, c), f32)

        G_ = jnp.sum(misc_ref[0:1, 0:1])   # 0-d gravity norm

        a_s_ = as_ref[:]      # [3,1]
        a_v_ = av_ref[:]
        Xp = xp_ref[:]        # [7,1]
        W_rest_ = wrest_ref[:]
        Wvw_ = wvw_ref[:]
        Xvw_ = xvw_ref[:]     # [6,1]
        Rs_ = rs_ref[:]
        Rv_ = rv_ref[:]
        xp0 = sc(Xp, 0)

        def sab_problem(Xc):
            a_ = sc(Xc, 0)                 # 0-d
            g_ = Xc[1:4, 0:1]
            b_ = Xc[4:7, 0:1]
            sa = jnp.sin(a_)
            ca = jnp.cos(a_)
            da = a_ - xp0
            da = jnp.where(da > PI, da - TWO_PI,
                           jnp.where(da < -PI, da + TWO_PI, da))
            Rb = exp3(b_)
            Rg_vec = dot(Rb, g_)          # [3,1]
            F0 = (a_s_ + g_) * ca - a_v_ * sa
            F = jnp.concatenate([
                F0,
                (jnp.sum(g_ * g_) - G_ * G_) * one11,
                da * one11,
                Rg_vec - Xp[1:4, 0:1],
                b_ - Xp[4:7, 0:1]], axis=0)             # [11,1]
            dFda0 = -(a_s_ + g_) * sa - a_v_ * ca
            dFda = jnp.concatenate([
                dFda0, z(1, 1), one11, z(6, 1)], axis=0)
            Gx = -skew_s(sc(Rg_vec, 0), sc(Rg_vec, 1), sc(Rg_vec, 2))
            dFdx1 = jnp.concatenate([
                jnp.concatenate([eye3 * ca, z(3, 3)], axis=1),
                jnp.concatenate([2.0 * g_.T, z(1, 3)], axis=1),
                z(1, 6),
                jnp.concatenate([Rb, Gx], axis=1),
                jnp.concatenate([z(3, 3), eye3], axis=1)], axis=0)  # [11,6]

            Pz = sa * sa * Rv_ + ca * ca * Rs_
            W0 = _gj_inverse_mosaic(Pz)
            W = jnp.concatenate([
                jnp.concatenate([W0, z(3, 8)], axis=1), W_rest_], axis=0)

            dP0 = (2.0 * sa * ca) * (Rv_ - Rs_)
            dWda0 = -dot(dot(W0, dP0), W0)
            dWPdW0 = dot(dot(dWda0, Pz), dWda0)
            F0v = F[0:3, 0:1]
            dFda0v = dFda[0:3, 0:1]

            WF = dot(W, F)
            WdFda = dot(W, dFda)
            j00 = (0.25 * dot(F0v.T, dot(dWPdW0, F0v))
                   + dot(dFda0v.T, dot(dWda0, F0v))
                   + dot(dFda.T, WdFda))                 # [1,1]
            dWdaF_pad = jnp.concatenate([dot(dWda0, F0v), z(8, 1)], axis=0)
            col = dot(dFdx1.T, 0.5 * dWdaF_pad + WdFda)  # [6,1]
            blk = dot(dFdx1.T, dot(W, dFdx1))            # [6,6]
            JtJ = jnp.concatenate([
                jnp.concatenate([j00, col.T], axis=1),
                jnp.concatenate([col, blk], axis=1)], axis=0)
            JtF = jnp.concatenate([
                0.5 * dot(F0v.T, dot(dWda0, F0v)) + dot(dFda.T, WF),
                dot(dFdx1.T, WF)], axis=0)               # [7,1]
            return JtJ, JtF

        # --- Gauss-Newton with wrap + saturation (sab_gauss_newton) ---
        Xc = Xp
        for _ in range(iters):
            JtJ, JtF = sab_problem(Xc)
            hx = dot(_gj_inverse_mosaic(JtJ), -JtF)      # [7,1]
            fin = jnp.all(jnp.isfinite(JtJ)) & jnp.all(jnp.isfinite(JtF))
            hx = jnp.where(fin & ~jnp.all(jnp.isfinite(hx)),
                           jnp.zeros_like(hx), hx)       # gj_solve semantics
            Xc = Xc + hx
            a_new = sc(Xc, 0)
            # angle wrap to (-pi, pi] without atan2 (unimplemented in
            # Mosaic): a - 2*pi*round(a / 2*pi) == arctan2(sin a, cos a)
            # except at the measure-zero a = -pi edge
            a_new = a_new - TWO_PI * jnp.round(a_new * (1.0 / TWO_PI))
            bsat = jnp.clip(Xc[4:7, 0:1], -BIAS_SAT, BIAS_SAT)
            Xc = jnp.concatenate([a_new * one11, Xc[1:4, 0:1], bsat], axis=0)

        JtJ, _ = sab_problem(Xc)
        Pn = _gj_inverse_mosaic(JtJ)

        af = sc(Xc, 0)
        k_val = jnp.sin(af) / jnp.cos(af)                # 0-d
        k_val = jnp.where((k_val < 0) | ~jnp.isfinite(k_val), 0.0, k_val)

        # --- re-fuse rigid transform with bias info (core.cpp:394-405) ---
        # extracted/placed via SELECTOR-MATRIX dots: lane-offset slices
        # like JtJ[4:7, 4:7] cannot feed Mosaic concats (mixed layout
        # offsets), but a dot re-materializes them offset-free
        s47r = jax.lax.broadcasted_iota(jnp.int32, (3, 7), 0)
        s47c = jax.lax.broadcasted_iota(jnp.int32, (3, 7), 1)
        Sel47 = (s47c == s47r + 4).astype(f32)   # [3,7] rows 4..6 of a 7-vec
        s36r = jax.lax.broadcasted_iota(jnp.int32, (3, 6), 0)
        s36c = jax.lax.broadcasted_iota(jnp.int32, (3, 6), 1)
        Sel36 = (s36c == s36r + 3).astype(f32)   # [3,6] rows 3..5 of a 6-vec
        WVBias = dot(Sel47, dot(JtJ, Sel47.T))   # [3,3]
        Wb = dot(Sel36.T, dot(WVBias, Sel36))    # [6,6] bottom-right block
        wc = dot(Sel36, Xvw_) - dot(Sel47, Xc)   # [3,1]
        WXc = dot(Sel36.T, dot(WVBias, wc))      # [6,1]
        Xcor = dot(_gj_inverse_mosaic(Wb + Wvw_), dot(Wvw_, Xvw_) + WXc)

        k_ref[:, :] = k_val * one11
        x_out_ref[:, :] = Xc
        p_out_ref[:, :] = Pn
        xvw_out_ref[:, :] = Xcor

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    misc = jnp.asarray(g_gravit, f32).reshape(1, 1)
    K_o, X_o, P_o, Xvw_o = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), f32),
            jax.ShapeDtypeStruct((7, 1), f32),
            jax.ShapeDtypeStruct((7, 7), f32),
            jax.ShapeDtypeStruct((6, 1), f32),
        ],
        in_specs=[vspec] * 9,
        out_specs=[vspec] * 4,
        interpret=_auto_interpret(interpret),
    )(a_s.reshape(3, 1), a_v.reshape(3, 1), x_p.reshape(7, 1), W_rest,
      Rs, Rv, Wvw, Xvw.reshape(6, 1), misc)
    return K_o, X_o, P_o, Xvw_o


def tube_match_pallas(
    att_t,         # [4, P, Kr, 128] (id, gn_old, posx, posy) att planes
    grot_t,        # [2, P, Kr, 128] rotated old gradient (M2 applied in XLA)
    dyn_t,         # [4, P, Kr, 128] (rho, sigma_rho, matches_f, kf_f)
    inb_t,         # [P, Kr, 128] f32 in-bounds probe mask
    kl,            # [14, Kr, 128] per-keyline planes: tx, ty, pi0x, pi0y,
                   #   dq_min, dq_max, dq_rho, nt_eff, sigma2_t,
                   #   ngx, ngy, ngn, nsr(unused), valid_f
    cfg_edge,
    cfg_core,
    interpret: bool = False,
):
    """Post-gather half of the tube matcher as ONE Pallas kernel.

    The XLA formulation of directed_match_tube (ops/matching.py) is, after
    its two row gathers, a chain of [K,P] gate/select/argmin/take kernels
    whose launch+latency dominates (~0.5 ms of the parity profile's 1.2 ms
    stage).  Same hybrid split as try_vel_math_pallas: XLA projects the
    probes and gathers the candidate rows; this kernel evaluates every gate
    (tube, window, angle, norm, depth consistency — edge_map.cpp:153-181),
    the priority argmin, and the winner payload selection with running
    selects, in one launch.  Ties keep the lowest probe index, matching
    jnp.argmin.  Returns [12, Kr, 128]: (found, match_id, rho, sigma_rho,
    grad_x, grad_y, grad_norm, seed_x, seed_y, matches, kf, prio).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = att_t.shape[1]
    Kr = att_t.shape[2]
    pum = float(cfg_edge.pixel_uncertainty_match)
    cang_min = float(np.cos(cfg_edge.match_threshold_angle * np.pi / 180.0))
    norm_thr = float(cfg_edge.match_threshold_norm)
    BIG = 1e9  # python float: Mosaic kernels may not capture traced constants

    def kernel(att_ref, grot_ref, dyn_ref, inb_ref, kl_ref, out_ref):
        tx = kl_ref[0]
        ty = kl_ref[1]
        pi0x = kl_ref[2]
        pi0y = kl_ref[3]
        dq_min = kl_ref[4]
        dq_max = kl_ref[5]
        dq_rho = kl_ref[6]
        nt_eff = kl_ref[7]
        sigma2_t = kl_ref[8]
        ngx = kl_ref[9]
        ngy = kl_ref[10]
        ngn = kl_ref[11]
        valid = kl_ref[13] > 0.5

        zero = jnp.zeros((Kr, 128), jnp.float32)
        best_prio = jnp.full((Kr, 128), BIG, jnp.float32)
        best = [zero] * 10  # id, rho, sr, gx, gy, gn, seedx, seedy, m, kf

        denom_n = jnp.where(ngn > 0, ngn, 1.0)
        nt2 = nt_eff * nt_eff
        pum2 = pum * pum

        for p in range(P):
            oid = att_ref[0, p]
            gn_old = att_ref[1, p]
            sx = att_ref[2, p]
            sy = att_ref[3, p]
            gx_r = grot_ref[0, p]
            gy_r = grot_ref[1, p]
            rho_o = dyn_ref[0, p]
            sr_o = dyn_ref[1, p]
            m_o = dyn_ref[2, p]
            kf_o = dyn_ref[3, p]
            has = (inb_ref[p] > 0.5) & (oid >= 0)

            dxs = sx - pi0x
            dys = sy - pi0y
            t_eff = dxs * tx + dys * ty
            perp = jnp.abs(-dxs * ty + dys * tx)
            g_tube = perp <= pum
            g_win = (t_eff >= dq_min) & (t_eff <= dq_max)
            gdot = gx_r * ngx + gy_r * ngy
            den = jnp.where(gn_old * ngn > 0, gn_old * ngn, 1.0)
            g_ang = gdot / den >= cang_min
            g_norm = jnp.abs(gn_old / denom_n - 1.0) <= norm_thr
            v_rho_dr = pum2 + sr_o * sr_o * nt2 + sigma2_t * rho_o * rho_o
            resid = t_eff - nt_eff * rho_o
            g_depth = jnp.logical_not(resid * resid > v_rho_dr)

            ok = valid & has & g_tube & g_win & g_ang & g_norm & g_depth
            prio = jnp.where(ok, jnp.abs(t_eff - dq_rho), BIG)
            upd = prio < best_prio      # strict: first probe wins ties
            best_prio = jnp.where(upd, prio, best_prio)
            payload = (oid, rho_o, sr_o, gx_r, gy_r, gn_old, sx, sy, m_o, kf_o)
            best = [jnp.where(upd, v, b) for v, b in zip(payload, best)]

        found = best_prio < BIG
        out_ref[0] = found.astype(jnp.float32)
        out_ref[1] = jnp.where(found, best[0], -1.0)
        for j in range(1, 10):
            out_ref[j + 1] = best[j]
        out_ref[11] = best_prio

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((12, Kr, 128), jnp.float32),
        in_specs=[vspec] * 5,
        out_specs=vspec,
        interpret=_auto_interpret(interpret),
    )(att_t, grot_t, dyn_t, inb_t, kl)
