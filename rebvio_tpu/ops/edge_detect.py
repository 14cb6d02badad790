"""Keyline (edge) detection: fused gates + 5x5 plane fit + compaction.

TPU-native rebuild of the reference detector (rebvio/src/edge_detector.cpp):
the reference walks every pixel sequentially, applying a gradient-magnitude
gate, a DoG positive/negative balance gate over a 5x5 window, a least-squares
plane fit ``theta = Pinv * Y`` with a precomputed 3x25 pseudo-inverse, a
subpixel zero-crossing gate, and a gradient-norm gate, emitting keylines in
raster order capped at ``keylines_max`` (edge_detector.cpp:45-123).

Here all gates evaluate as dense masked image ops.  The symmetric window makes
Phi^T Phi diagonal (sum x = sum y = sum xy = 0), so the plane fit collapses to
three separable correlations: theta = (sum x*dog / Sxx, sum y*dog / Syy,
mean dog), evaluated as banded-matrix sandwiches on the MXU (see
scale_space.FrontendMatrices) — the same formulation as the blur cascade.
Raster-order compaction to the fixed [KMAX] SoA uses jnp.nonzero with a static
size — which reproduces both the raster ordering and the keylines_max cutoff
of the sequential emplace_back loop (edge_detector.cpp:110-119).

Edge joining (edge_detector.cpp:125-165) becomes 3-neighbor gathers on the
dense keyline-id image; the histogram auto-threshold (tuneThreshold,
edge_detector.cpp:167-186) is reproduced including its skip-bin-0 loop quirk
(documented in SURVEY.md section 7).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from rebvio_tpu import types as T
from rebvio_tpu.configs import CameraConfig, EdgeDetectorConfig
from rebvio_tpu.ops.scale_space import FrontendMatrices, _mxu_dot, build_scale_space


@partial(jax.jit, static_argnames=("cfg", "cam", "field_scale"))
def detect(
    image: jnp.ndarray,
    threshold: jnp.ndarray,
    mats: FrontendMatrices,
    cfg: EdgeDetectorConfig,
    cam: CameraConfig,
    field_scale: int = 1,
) -> T.EdgeMap:
    """Detect keylines in a (already undistorted, gain-applied) float image.

    ``threshold`` is the auto-gained detection threshold carried in VioState
    (the auto-gain update itself happens in the pipeline, mirroring
    edge_detector.cpp:33-36).
    """
    em, _aux = _detect_core(image, threshold, mats, cfg, cam, field_scale)
    return em


@partial(jax.jit, static_argnames=("cfg", "cam", "field_scale", "search_range"))
def detect_with_seeds(
    image: jnp.ndarray,
    threshold: jnp.ndarray,
    mats: FrontendMatrices,
    cfg: EdgeDetectorConfig,
    cam: CameraConfig,
    field_scale: int,
    search_range: int,
):
    """detect() plus the att-field seed stack built DENSELY from the
    detector's own per-pixel planes (distance_field.seed_stack_dense) —
    the fast path for the JFA attribute field: no [K]->[n,8] scatter, no
    lane-padded table init/transpose (traced r4: ~375 us of a 2935 us
    parity step).  Returns (EdgeMap, seed_stack); feed the stack to
    build_att_field(..., seed_stack=...)."""
    from rebvio_tpu.ops import distance_field as DF

    em, (xs, ys, t0, t1) = _detect_core(image, threshold, mats, cfg, cam,
                                        field_scale)
    H, W = image.shape
    stack = DF.seed_stack_dense(
        em.kl_id_img, xs, ys, t0, t1, em.threshold,
        search_range, H, W, field_scale)
    return em, stack


def _detect_core(
    image: jnp.ndarray,
    threshold: jnp.ndarray,
    mats: FrontendMatrices,
    cfg: EdgeDetectorConfig,
    cam: CameraConfig,
    field_scale: int = 1,
):
    H, W = image.shape
    pfs = cfg.plane_fit_size
    kmax = cfg.keylines_max

    bf16 = getattr(cfg, "frontend_bf16", False)
    s0, dog, mag = build_scale_space(image, mats, bf16=bf16)

    # --- dense gates (edge_detector.cpp:69-107) ---
    n_win = (2 * pfs + 1) ** 2
    pn_threshold = float(n_win) * cfg.pos_neg_threshold
    gthr = threshold * cfg.max_image_value * cfg.dog_threshold
    gradient_threshold_sq = gthr * gthr
    mthr = threshold * cfg.max_image_value
    mag_threshold = mthr * mthr

    # positive/negative balance + plane fit theta = (gx, gy, c): all four
    # window reductions fused into 4 matmuls via concatenation (pn and t2
    # share S5H/S5W sandwiches; t0/t1 use the x/y ramp bands).
    # Sxx = Syy = 50, area = 25 for the 5x5 window.
    sxx = float((2 * pfs + 1) * sum(i * i for i in range(-pfs, pfs + 1)))
    sign_map = jnp.where(dog > 0.0, 1.0, -1.0)
    dogXW = _mxu_dot(dog, mats.XW, bf16)
    lcat = _mxu_dot(mats.S5H,
                    jnp.concatenate([sign_map, dog, dogXW], axis=1), bf16)  # [H,3W]
    S5Hsign = lcat[:, :W]
    S5Hdog = lcat[:, W:2 * W]
    t0 = lcat[:, 2 * W:] / sxx
    YHdog = _mxu_dot(mats.YH, dog, bf16)
    rcat = _mxu_dot(jnp.concatenate([S5Hsign, S5Hdog, YHdog], axis=0),
                    mats.S5W, bf16)  # [3H,W]
    pn = rcat[:H]
    t2 = rcat[H:2 * H] / float(n_win)
    t1 = rcat[2 * H:] / sxx
    g2 = t0 * t0 + t1 * t1
    tmp = t2 / jnp.where(g2 > 0, g2, 1.0)
    xs = -t0 * tmp
    ys = -t1 * tmp

    rr = jnp.arange(H, dtype=jnp.int32)[:, None]
    cc = jnp.arange(W, dtype=jnp.int32)[None, :]
    interior = (rr >= pfs) & (rr < H - pfs) & (cc >= pfs) & (cc < W - pfs)

    cand = (
        interior
        & (mag >= mag_threshold)
        & (jnp.abs(pn) <= pn_threshold)
        & (jnp.abs(xs) <= 0.5)
        & (jnp.abs(ys) <= 0.5)
        & (g2 >= gradient_threshold_sq)
        & (g2 > 0)
    )

    # --- raster-order compaction with keylines_max cutoff ---
    # slot s takes the (s+1)-th candidate in raster order, via a SEGMENTED
    # sort: the image splits into S raster-contiguous segments, each sorts
    # independently (one batched lax.sort call — TPU sort cost scales with
    # sort LENGTH, so [96,3760] runs at 58 us vs 353 us for the flat
    # [360960] sort, traced r4), per-segment candidate counts place each
    # output slot at (segment, local rank) with a cheap one-hot searchsorted
    # (no serial scalar gathers), and the value comes back through an
    # 8-lane row gather + lane select (XLA's 1-D gather lowers to a
    # ~6.6 ns/idx scalar loop regardless of index count; the row path runs
    # at ~1.4 ns/row).  Exactness: segments are raster-contiguous, so
    # per-segment ascending index order concatenated in segment order IS
    # global raster order, including the keylines_max cutoff.
    cand_flat = cand.reshape(-1)
    NSEG = next(n for n in (96, 64, 48, 32, 24, 16, 12, 8, 6, 4, 2, 1)
                if (H * W) % n == 0)
    SEG = H * W // NSEG
    assert (H * W) % 8 == 0  # for the 8-lane row view of the sorted array
    total = jnp.sum(cand_flat.astype(jnp.float32))
    count = jnp.minimum(total, kmax).astype(jnp.int32)
    big_i = jnp.int32(2 ** 30)
    keys = jnp.where(cand_flat, jnp.arange(H * W, dtype=jnp.int32), big_i)
    sseg = jax.lax.sort(keys.reshape(NSEG, SEG), dimension=1, is_stable=False)
    counts = jnp.sum(cand.reshape(NSEG, SEG), axis=1).astype(jnp.int32)
    ends = jnp.cumsum(counts)                     # [NSEG]
    starts = ends - counts
    slots_i = jnp.arange(kmax, dtype=jnp.int32)
    seg_of = jnp.sum((slots_i[:, None] >= ends[None, :]).astype(jnp.int32), 1)
    seg_oh = (jnp.arange(NSEG, dtype=jnp.int32)[None, :] == seg_of[:, None])
    start_of = jnp.sum(jnp.where(seg_oh, starts[None, :], 0), axis=1)
    flat_pos = seg_of * SEG + (slots_i - start_of)
    rows8 = sseg.reshape(H * W // 8, 8)[jnp.clip(flat_pos, 0, H * W - 1) // 8]
    lane_oh = (jnp.arange(8, dtype=jnp.int32)[None, :] == (flat_pos % 8)[:, None])
    slot_val = jnp.sum(jnp.where(lane_oh, rows8, 0), axis=1)
    valid = slots_i.astype(jnp.float32) < total
    safe_idx = jnp.where(valid, slot_val, 0)
    prow = (safe_idx // W).astype(jnp.float32)
    pcol = (safe_idx % W).astype(jnp.float32)
    # one packed row-gather for the 4 per-pixel fields (a 2-pixels-per-8-
    # lane-row variant re-traced r4 at a 509 us layout copy+reshape — the
    # column-major 4-lane gather at ~5 ns/row is the cheaper total here)
    planes = jnp.stack([xs, ys, t0, t1], axis=-1).reshape(H * W, 4)
    rowk = planes[safe_idx]
    xs_k, ys_k, g0_k, g1_k = rowk[:, 0], rowk[:, 1], rowk[:, 2], rowk[:, 3]

    pos = jnp.stack([pcol + xs_k, prow + ys_k], axis=-1)
    pos = jnp.where(valid[:, None], pos, 0.0)
    grad = jnp.where(valid[:, None], jnp.stack([g0_k, g1_k], axis=-1), 0.0)
    grad_norm = jnp.sqrt(jnp.sum(grad * grad, axis=-1))
    pos_img = pos - jnp.array([cam.cx, cam.cy], jnp.float32)
    pos_img = jnp.where(valid[:, None], pos_img, 0.0)

    # dense id image (detector's keylines_mask_, edge_detector.hpp:86).
    # Kept as the [K]-index scatter: slot ids are raster-order candidate
    # ranks, and a dense two-level prefix-sum form (within-segment cumsum +
    # the per-segment starts above) was built and A/B-measured r5 — 37.7 us
    # standalone vs the scatter's 96 us, but inside the lax.scan chunk body
    # its reduce-window lowers to a 153 us/frame op and the bench LOSES
    # ~12 fps (360.8 -> 349.0).  Scatter wins in the shipping path.
    scatter_idx = jnp.where(valid, safe_idx, H * W)  # out-of-range -> dropped
    kl_id_img = (
        jnp.full((H * W,), -1, jnp.int32)
        .at[scatter_idx]
        .set(jnp.arange(kmax, dtype=jnp.int32), mode="drop")
        .reshape(H, W)
    )

    # --- edge joining (edge_detector.cpp:125-165) ---
    id_next, id_prev = _join_edges(pos, grad, valid, kl_id_img)

    # --- auto-threshold from gradient-norm histogram (tuneThreshold) ---
    map_threshold = _tune_threshold(grad_norm, valid, count, cfg)

    em = T.empty_edge_map(kmax, H, W, field_scale)
    em = em.replace(
        pos=pos, pos_img=pos_img, match_pos_img=pos_img,
        grad=grad, grad_norm=grad_norm,
        rho=jnp.full((kmax,), T.RHO_INIT, jnp.float32),
        sigma_rho=jnp.full((kmax,), T.SIGMA_RHO_INIT, jnp.float32),
        id_prev=id_prev, id_next=id_next,
        valid=valid, count=count, kl_id_img=kl_id_img,
        threshold=map_threshold,
    )
    # dense per-pixel planes for seed_stack_dense (dead-code-eliminated by
    # XLA when the caller only uses the EdgeMap)
    return em, (xs, ys, t0, t1)


def _join_edges(pos, grad, valid, kl_id_img) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Link keylines along the edge tangent (perpendicular to gradient) by
    probing 3 neighbors in the reference's priority order
    (edge_detector.cpp:138-165)."""
    H, W = kl_id_img.shape
    kmax = pos.shape[0]
    x = (pos[:, 0] + 0.5).astype(jnp.int32)
    y = (pos[:, 1] + 0.5).astype(jnp.int32)
    tx = -grad[:, 1]
    ty = grad[:, 0]

    # The 3 probe offsets per keyline depend only on the tangent quadrant
    # (edge_detector.cpp:148-156), so gather the 3 candidate ids DIRECTLY
    # from the padded id image at computed indices — three independent [K]
    # scalar gathers from a ~1.4 MB (VMEM-resident) table.  This replaces
    # the earlier 8-neighbor stack (an 11.5 MB HBM table + [K,8] row gather,
    # ~0.3 ms at 16k keylines).  ids gather as exact f32 (< 2^24); the -1
    # pad reproduces "no keyline" outside the frame (detections are
    # >= pfs >= 1 pixels interior, so probes stay within the padded image).
    kl_f = kl_id_img.astype(jnp.float32)
    pad = jnp.pad(kl_f, 1, constant_values=-1.0)
    Wp = W + 2

    # Neighbor offsets per quadrant of the tangent direction.
    # ty>0: probes (0,sx), (1,0), (1,sx); ty<=0: (0,sx'), (-1,0), (-1,sx')
    # where for ty<=0 the x sign logic flips: tx<0 -> -1 else +1.
    sx = jnp.where(tx > 0, 1, -1)
    sx_neg = jnp.where(tx < 0, -1, 1)
    px = jnp.where(ty > 0, sx, sx_neg)
    py = jnp.where(ty > 0, 1, -1)
    # Per-probe 1-D lookups through the 8-lane ROW path: XLA's 1-D gather
    # lowers to a ~6.6 ns/idx scalar loop REGARDLESS of index count (traced
    # r4: 106 us per [K] probe), while an 8-lane T(8,128) row gather runs at
    # ~1.4 ns/row — so the padded image is viewed as [*,8] rows and each
    # probe is one row gather + a one-hot lane select.
    npad8 = -(-(Hp := H + 2) * Wp // 8) * 8
    rows8 = jnp.concatenate(
        [pad.reshape(-1), jnp.full((npad8 - Hp * Wp,), -1.0, jnp.float32)]
    ).reshape(-1, 8)
    base = (y + 1) * Wp + (x + 1)
    lanes8 = jnp.arange(8, dtype=jnp.int32)[None, :]

    def probe(off):
        f = base + off
        r = rows8[f // 8]
        oh = (lanes8 == (f % 8)[:, None]).astype(jnp.float32)
        return jnp.sum(r * oh, axis=1)

    c1 = probe(px)
    c2 = probe(py * Wp)
    c3 = probe(py * Wp + px)
    id_next_f = jnp.where(c1 >= 0, c1, jnp.where(c2 >= 0, c2, c3))
    id_next = jnp.where(valid, id_next_f.astype(jnp.int32), -1)

    # id_prev[target] = max idx with id_next[idx] == target (later idx wins,
    # matching the sequential overwrite in joinEdges, edge_detector.cpp:133)
    # — the direct inverse as one scatter-max.
    tgt = jnp.where(valid & (id_next >= 0), id_next, kmax)
    id_prev = jnp.full((kmax,), -1, jnp.int32).at[tgt].max(
        jnp.arange(kmax, dtype=jnp.int32), mode="drop"
    )
    return id_next, id_prev


def _tune_threshold(grad_norm, valid, count, cfg: EdgeDetectorConfig) -> jnp.ndarray:
    """Histogram auto-threshold over keyline gradient norms.

    Reproduces tuneThreshold (edge_detector.cpp:167-186) including the loop
    quirk in which bin 0 is never accumulated (the increment clause advances
    ``i`` before adding ``histogram[i]``): the selected bin index is
    i* = min(num_bins, first i >= 1 with sum(hist[1..i]) >= keylines_max),
    and the returned threshold is max_dog - i* * (max_dog - min_dog) / bins.
    """
    nb = cfg.num_bins
    big = jnp.float32(3.4e38)
    gn = jnp.where(valid, grad_norm, -big)
    max_dog = jnp.max(gn)
    gn2 = jnp.where(valid, grad_norm, big)
    min_dog = jnp.min(gn2)
    rng = jnp.where(max_dog > min_dog, max_dog - min_dog, 1.0)
    bins = (nb * (max_dog - grad_norm) / rng).astype(jnp.int32)
    bins = jnp.clip(bins, 0, nb - 1)
    # histogram via one-hot reduction (TPU scatter-add of 16k ints costs ~3ms)
    onehot = (bins[:, None] == jnp.arange(nb)[None, :]) & valid[:, None]
    hist = jnp.sum(onehot.astype(jnp.int32), axis=0)
    # cumulative over bins 1..i (bin 0 skipped by the reference's quirk)
    csum = jnp.cumsum(hist.at[0].set(0))
    reached = csum >= cfg.keylines_max
    first = jnp.argmax(reached)  # 0 if none reached
    i_star = jnp.where(jnp.any(reached), first, nb).astype(jnp.float32)
    return max_dog - i_star * (max_dog - min_dog) / jnp.float32(nb)


def autogain_threshold(threshold, keylines_count, cfg: EdgeDetectorConfig):
    """Proportional threshold controller toward keylines_ref
    (edge_detector.cpp:33-36), as carried scalar state."""
    if cfg.gain <= 0:
        return threshold
    t = threshold - cfg.gain * (cfg.keylines_ref - keylines_count.astype(jnp.float32))
    return jnp.clip(t, cfg.min_threshold, cfg.max_threshold)
