"""Auxiliary distance field: nearest-keyline rasterization as scatter-min.

TPU-native rebuild of ``DistanceField::build`` (rebvio/include/rebvio/
core.hpp:37-59): the reference walks each keyline and rasterizes
2*search_range steps along its unit gradient, writing (keyline id, |r|) into
a dense row-major field, keeping the nearest keyline per pixel with
last-writer-wins on distance ties.

Here all K x 2R sample positions are computed at once and resolved with a
single scatter-min over packed int32 keys ``distance * KMAX + (KMAX-1-idx)``:
minimizing the packed key selects the smallest distance, and on equal
distance the largest keyline index — exactly the sequential loop's
last-writer-wins tie order.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from rebvio_tpu import types as T


def _use_pallas_jfa() -> bool:
    """Pallas JFA kernel on TPU (REBVIO_PALLAS_JFA=0/1 overrides; default
    auto).  Measured 2.3x faster than the XLA roll/select formulation at the
    half-res field geometry (tools/jfa_ab.py) — the whole flood runs in one
    kernel with every plane VMEM-resident."""
    v = os.environ.get("REBVIO_PALLAS_JFA", "auto")
    if v in ("0", "1"):
        return v == "1"
    return jax.default_backend() == "tpu"


def _round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """std::round semantics (half away from zero), unlike jnp.round's
    bankers rounding; used by the reference's getIndex (core.hpp:66-71)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


@partial(jax.jit, static_argnames=("search_range", "rows", "cols"))
def build_distance_field(
    em: T.EdgeMap, search_range: int, rows: int, cols: int
) -> jnp.ndarray:
    """Returns a packed [rows*cols] int32 field.

    Entry < 0 means empty; otherwise id = KMAX-1 - (entry % KMAX) and
    distance = entry // KMAX.
    """
    kmax = em.kmax
    use = em.valid & ((em.threshold <= 0.0) | (em.grad_norm >= em.threshold))

    gn = jnp.where(em.grad_norm > 0, em.grad_norm, 1.0)
    ux = em.grad[:, 0] / gn
    uy = em.grad[:, 1] / gn

    r = jnp.arange(-search_range, search_range, dtype=jnp.float32)  # [2R]
    px = ux[:, None] * r[None, :] + em.pos[:, 0:1]  # [K,2R]
    py = uy[:, None] * r[None, :] + em.pos[:, 1:2]
    col = _round_half_away(px).astype(jnp.int32)
    row = _round_half_away(py).astype(jnp.int32)
    inb = (row >= 0) & (row < rows) & (col >= 0) & (col < cols) & use[:, None]

    flat = row * cols + col
    flat = jnp.where(inb, flat, rows * cols)  # out-of-range -> dropped
    dist = jnp.abs(r).astype(jnp.int32)[None, :]
    idx = jnp.arange(kmax, dtype=jnp.int32)[:, None]
    key = dist * kmax + (kmax - 1 - idx)
    key = jnp.broadcast_to(key, flat.shape)

    init = jnp.full((rows * cols,), jnp.iinfo(jnp.int32).max, jnp.int32)
    field = init.at[flat.reshape(-1)].min(key.reshape(-1), mode="drop")
    # Empty pixels -> -1 sentinel
    return jnp.where(field == jnp.iinfo(jnp.int32).max, -1, field)


def field_id(field: jnp.ndarray, kmax: int) -> jnp.ndarray:
    """Decode keyline id from a packed field (or lookup result); -1 if empty."""
    return jnp.where(field < 0, -1, kmax - 1 - (field % kmax))


# Lane layout of the attribute field rows (build_att_field)
ATT_PACKED, ATT_D2, ATT_ID, ATT_GX, ATT_GY, ATT_GN, ATT_POSX, ATT_POSY = range(8)


def att_rows(att_planes):
    """[8, N] attribute planes -> [N, 8] gatherable rows.

    One lane-padding transpose per step (~33 us at full res); the row form
    is what TPU row gathers need, the plane form is what the scan carry and
    the flood kernel want — materialize rows exactly once per consumer
    step, never carry them."""
    return att_planes.T


def _jfa_state(
    em: T.EdgeMap, search_range: int, rows: int, cols: int, scale: int,
    payload: list,
):
    """Shared jump-flood core.

    Runs the JFA over a [2 + P, rows/scale, cols/scale] plane stack —
    plane 0: seed coordinates as packed fixed-point (one f32, exact),
    plane 1: best squared distance, planes 2..: per-keyline payload values
    (id, and optionally the keyline's static attributes) that ride along
    with the winning seed.  Each propagation pass is a SINGLE jnp.roll of
    the whole stack + one compare/select: the loop is op-latency-bound, so
    plane count is nearly free while op count is not.
    """
    kmax = em.kmax
    use = em.valid & ((em.threshold <= 0.0) | (em.grad_norm >= em.threshold))
    if scale > 1:
        rows = (rows + scale - 1) // scale
        cols = (cols + scale - 1) // scale
        search_range = max(1, round(search_range / scale))
    inv_s = jnp.float32(1.0 / scale)
    pos_x = em.pos[:, 0] * inv_s
    pos_y = em.pos[:, 1] * inv_s

    col = jnp.floor(pos_x + 0.5).astype(jnp.int32)
    row = jnp.floor(pos_y + 0.5).astype(jnp.int32)
    inb = use & (row >= 0) & (row < rows) & (col >= 0) & (col < cols)
    flat = jnp.where(inb, row * cols + col, rows * cols)

    BIG = jnp.float32(1e9)

    # Seed coordinates live in ONE f32 plane as exact fixed-point integers:
    # q steps per (scaled) pixel, packed as qy * QXP + qx with QXP a power of
    # two, so each propagation pass is a SINGLE jnp.roll of the plane stack +
    # compare + select instead of per-coordinate rolls and selects — the loop
    # is op-latency-bound, not bandwidth-bound.  Quantization (<= 1/(2q) px,
    # q >= 4) only perturbs which nearly-equidistant keyline is *proposed*;
    # every consumer re-gates with the exact keyline fields.
    q = 4
    while ((rows + 2) * 2 * q) * _next_pow2((cols + 2) * 2 * q) <= (1 << 24):
        q *= 2
    QXP = _next_pow2((cols + 2) * q)

    def quantize(p_f, p_i):
        # no clamp needed: the id rides as its own payload plane, so the
        # seed pixel never has to be recovered from the coords — rounding
        # error is <= 1/(2q) px
        off = jnp.round((p_f - p_i.astype(jnp.float32)) * q)
        return (p_i + 1).astype(jnp.float32) * q + off

    qy = quantize(pos_y, row)
    qx = quantize(pos_x, col)
    packed = qy * QXP + qx  # exact: < 2^24

    P = len(payload)
    seed_rows = jnp.stack([packed, jnp.zeros((kmax,), jnp.float32)] + payload,
                          axis=-1)  # [K, 2+P]
    init = jnp.concatenate(
        [jnp.zeros((rows * cols, 1), jnp.float32),      # packed 0 = empty
         jnp.full((rows * cols, 1), BIG, jnp.float32),   # d2
         jnp.full((rows * cols, P), -1.0, jnp.float32)], axis=-1,
    )
    planes0 = init.at[flat].set(seed_rows, mode="drop")

    yy = jnp.arange(rows, dtype=jnp.float32)[:, None]
    xx = jnp.arange(cols, dtype=jnp.float32)[None, :]

    def d2_of(packed_):
        qy_ = jnp.floor(packed_ * (1.0 / QXP))  # exact: QXP is a power of two
        qx_ = packed_ - qy_ * QXP
        sy_ = qy_ * (1.0 / q) - 1.0
        sx_ = qx_ * (1.0 / q) - 1.0
        return (yy - sy_) ** 2 + (xx - sx_) ** 2

    state = planes0.T.reshape(2 + P, rows, cols)
    pk = state[0]
    state = state.at[1].set(jnp.where(pk > 0, d2_of(pk), BIG))

    steps = []
    s = 1
    # start at the smallest power of two >= search_range/2: the radius gate
    # discards seeds beyond search_range, and steps [s, s/2, .., 1] reach any
    # offset <= 2s-1 >= search_range, so the larger start only added passes
    while 2 * s < search_range:
        s *= 2
    while s >= 1:
        steps.append(s)
        s //= 2
    steps.append(1)  # extra refinement pass (JFA+1)

    # Textbook parallel-direction JFA: within a step, all 8 candidate rolls
    # read the SAME input state and a best-of-9 select writes the output, so
    # the dependent chain is len(steps) (~6) deep instead of 8x that — the
    # loop is op-LATENCY-bound, and the rolls of one step pipeline freely.
    # Static shifts keep each roll a pure slice+concat the scheduler can
    # fuse into the select chain.  jnp.roll wraps around, but wrapped
    # candidates carry their *absolute* seed coordinates from the far edge,
    # so the distance metric rejects them automatically — no border fill.
    for s in steps:
        best = state
        for dy in (-s, 0, s):
            for dx in (-s, 0, s):
                if dy == 0 and dx == 0:
                    continue
                cand = jnp.roll(state, (dy, dx), (1, 2))
                cd2 = jnp.where(cand[0] > 0, d2_of(cand[0]), BIG)
                better = cd2 < best[1]
                cand = cand.at[1].set(cd2)
                best = jnp.where(better[None], cand, best)
        state = best
    return state


@partial(jax.jit, static_argnames=("search_range", "rows", "cols", "scale"))
def build_nn_field(
    em: T.EdgeMap, search_range: int, rows: int, cols: int, scale: int = 1
) -> jnp.ndarray:
    """Dense nearest-keyline id field via jump flooding (JFA).

    TPU-first alternative to the rasterized auxiliary field (core.hpp:37-59):
    instead of 16k x 80 scattered writes, O(log R) dense passes of statically
    shifted compare/selects produce, for every pixel, the id of the nearest
    keyline within ``search_range``.  The reference's field approximates
    exactly this nearest-edge lookup but only rasterizes along each keyline's
    gradient ray; the JFA field covers all directions, so the tracker finds
    at least as many candidates (the gradient-similarity gate in calculatefJ,
    core.cpp:56, still applies).

    Returns an [ceil(rows/scale)*ceil(cols/scale)] int32 id image (-1 = no
    keyline within range).  ``scale`` > 1 builds the field on a decimated
    grid (coordinates and search_range in scaled units): 1/scale^2 the
    traffic; consumers index it with pixel//scale.
    """
    sr = search_range if scale == 1 else max(1, round(search_range / scale))
    payload = [jnp.arange(em.kmax, dtype=jnp.float32)]
    state = _jfa_state(em, search_range, rows, cols, scale, payload)
    sid = jnp.where(state[1] <= jnp.float32(sr * sr),
                    state[2].astype(jnp.int32), -1)
    return sid.reshape(-1)


@partial(jax.jit, static_argnames=("search_range", "rows", "cols", "scale"))
def build_att_field(
    em: T.EdgeMap, search_range: int, rows: int, cols: int, scale: int = 1,
    seed_stack: jnp.ndarray = None,
) -> jnp.ndarray:
    """Dense nearest-keyline ATTRIBUTE field: [8, N] PLANES of
    (packed, d2, id, grad_x, grad_y, grad_norm, pos_x, pos_y).

    PLANE-major layout: the minor dim is the cell index N, so the array is
    lane-compact (an [N, 8] row form is lane-padded 8 -> 128 by the TPU
    tile layout, 16x the live bytes — traced r5: a 70 us scan-carry copy
    per frame just to re-materialize the padding).  Row-gather consumers
    (tryVel, the tube matcher) transpose once per step via ``att_rows``.

    Same jump flood as build_nn_field, but the winning seed carries the
    keyline's detection-time attributes as payload planes, so a consumer
    resolves candidate id + gates + residual geometry with ONE row gather
    instead of the two chained gathers (id image, then keyline table) —
    halving the data-dependent latency chain of every tryVel pass
    (core.cpp:78-148) and the tube matcher's probe loop.  Attributes are
    detection-time constants (grad/pos never change; consumers needing
    rotated values replay the rotation analytically).  id lane is -1 outside
    ``search_range``.
    """
    if _use_pallas_jfa():
        from rebvio_tpu.ops.pallas_kernels import _att_flood, att_field_pallas

        if seed_stack is not None:
            # pre-seeded region stack from the detector's dense planes
            # (seed_stack_dense) — skips the scatter/init/transpose pipeline
            sr = (search_range if scale == 1
                  else max(1, round(search_range / scale)))
            frows = (rows + scale - 1) // scale
            fcols = (cols + scale - 1) // scale
            return _att_flood(seed_stack, sr, frows, fcols, scale)
        return att_field_pallas(em, search_range, rows, cols, scale)
    sr = search_range if scale == 1 else max(1, round(search_range / scale))
    payload = [
        jnp.arange(em.kmax, dtype=jnp.float32),
        em.grad[:, 0], em.grad[:, 1], em.grad_norm,
        em.pos[:, 0], em.pos[:, 1],
    ]
    state = _jfa_state(em, search_range, rows, cols, scale, payload)
    in_range = state[1] <= jnp.float32(sr * sr)
    state = state.at[2].set(jnp.where(in_range, state[2], -1.0))
    n = state.shape[1] * state.shape[2]
    return state.reshape(8, n)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@partial(jax.jit, static_argnames=("search_range", "rows", "cols", "scale"))
def seed_stack_dense(
    kl_id_img: jnp.ndarray,   # [H,W] int32 compacted keyline id (-1 = none)
    sub_x: jnp.ndarray,       # [H,W] f32 subpixel x offset (detector xs)
    sub_y: jnp.ndarray,       # [H,W] f32 subpixel y offset (detector ys)
    gx: jnp.ndarray,          # [H,W] f32 DoG gradient x (detector t0)
    gy: jnp.ndarray,          # [H,W] f32 DoG gradient y (detector t1)
    threshold: jnp.ndarray,   # [] f32 map threshold (tuneThreshold output)
    search_range: int, rows: int, cols: int, scale: int,
) -> jnp.ndarray:
    """Build the flood kernel's seeded region stack [5*Rp, fcols] DENSELY
    from the detector's per-pixel planes — no scatter.

    The scatter formulation (att_field_pallas) pays for an [n,8]-shaped
    table whose minor dim of 8 is lane-padded to 128 by the TPU layout, so
    its init + scatter + transpose process ~16x the live bytes (traced r4:
    242 + 71 + 62 us of a 2935 us parity step).  Every seed, however, is
    already sitting in a DENSE detector plane: a pixel seeds field cell
    (floor((r+sub_y)/scale+0.5), floor((c+sub_x)/scale+0.5)), which is
    always within the 3x3 full-res neighborhood of (scale*m, scale*n), so
    one 9-tap shifted-select reduce at stride ``scale`` reproduces the
    scatter exactly: keyline ids are assigned in raster order, so "max id
    wins" equals the scatter's last-update-wins collision rule.  (NOT
    separable into per-axis passes: two pixels sharing a row and field
    column can map to different field rows via their sub_y signs, so a
    column-only pass would discard one of them.)

    Output layout matches att_field_pallas's stack0 (regions sy, sx, id,
    gx, gy in FIELD units with _flood_pad sentinel rows); feed directly to
    _att_flood."""
    from rebvio_tpu.ops.pallas_kernels import _flood_pad

    H, W = kl_id_img.shape
    s = scale
    frows = (rows + s - 1) // s
    fcols = (cols + s - 1) // s
    sr = search_range if s == 1 else max(1, round(search_range / s))

    g2 = gx * gx + gy * gy
    use = (kl_id_img >= 0) & jnp.where(threshold > 0.0,
                                       g2 >= threshold * threshold, True)
    idm = jnp.where(use, kl_id_img, -1).astype(jnp.float32)
    inv_s = jnp.float32(1.0 / s)
    rr = jnp.arange(H, dtype=jnp.float32)[:, None]
    cc = jnp.arange(W, dtype=jnp.float32)[None, :]
    py = (rr + sub_y) * inv_s          # seed coords in field units
    px = (cc + sub_x) * inv_s
    fr = jnp.floor(py + 0.5)           # destination field cell (kept f32:
    fc = jnp.floor(px + 0.5)           # exact for coords < 2^24)

    miota = jnp.arange(frows, dtype=jnp.float32)[:, None]
    niota = jnp.arange(fcols, dtype=jnp.float32)[None, :]

    # The 9 taps need stride-s slices of the full-res planes.  Strided
    # slicing on the minor (lane) dimension is a scalar-loop path on TPU
    # (traced r5: a fused 9-tap stride-2 reduce over 7 planes ran at 55 ms
    # vs the ~0.1 ms of dense work it does), so for the s == 2 case the
    # stride is removed by a PARITY DECOMPOSITION: row parity via a free
    # major-dim reshape, column parity via transpose + major-dim reshape +
    # transpose back (all layout-friendly ops), after which every tap is a
    # whole-element shift of a [frows, fcols] parity plane.  A uniform -1
    # fill is safe everywhere: key = -1 rejects the candidate before the
    # fr/fc comparison matters.
    planes7 = jnp.stack([idm, fr, fc, py, px, gx, gy])  # [7,H,W]
    if s > 1:
        # general-s parity decomposition (s == 2 was the r5 original; the
        # same construction works for any stride): phase plane (ry, cx)
        # holds pixels (s*m + ry, s*n + cx), so tap (dy, dx) with
        # |dy|,|dx| <= 1 < s is phase (dy mod s, dx mod s), shifted one
        # whole CELL toward the origin when the offset is negative.
        Hp, Wp = -(-H // s) * s, -(-W // s) * s
        p7 = jnp.pad(planes7, ((0, 0), (0, Hp - H), (0, Wp - W)),
                     constant_values=-1.0)
        rows_s = p7.reshape(7, Hp // s, s, Wp)
        par = {}
        for ry in range(s):
            q = rows_s[:, :, ry, :]                      # [7, Hp/s, Wp]
            qt = q.transpose(0, 2, 1)                    # [7, Wp, Hp/s]
            cols_s = qt.reshape(7, Wp // s, s, Hp // s)
            for cx in range(s):
                par[(ry, cx)] = cols_s[:, :, cx, :].transpose(0, 2, 1)

        def tap7(dy, dx):
            q = par[(dy % s, dx % s)]
            if dy < 0:
                q = jnp.pad(q, ((0, 0), (1, 0), (0, 0)),
                            constant_values=-1.0)[:, :-1, :]
            if dx < 0:
                q = jnp.pad(q, ((0, 0), (0, 0), (1, 0)),
                            constant_values=-1.0)[:, :, :-1]
            return q
    else:
        def tap7(dy, dx):
            pp = jnp.pad(planes7, ((0, 0), (1, s), (1, s)),
                         constant_values=-1.0)
            return pp[:, 1 + dy: 1 + dy + s * frows: s,
                      1 + dx: 1 + dx + s * fcols: s]

    best_key = None
    best = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            t7 = tap7(dy, dx)
            ck = t7[0]
            ok = (t7[1] == miota) & (t7[2] == niota)
            ck = jnp.where(ok, ck, -1.0)
            cand = [t7[i] for i in (3, 4, 5, 6)]
            if best_key is None:
                best_key, best = ck, cand
            else:
                upd = ck > best_key
                best_key = jnp.where(upd, ck, best_key)
                best = [jnp.where(upd, c, b) for c, b in zip(cand, best)]
    py2, px2, gx2, gy2 = best

    BIG = jnp.float32(1e9)
    found = best_key >= 0.0
    syp = jnp.where(found, py2, BIG)
    sxp = jnp.where(found, px2, BIG)
    idp = jnp.where(found, best_key, -1.0)
    gxp = jnp.where(found, gx2, 0.0)
    gyp = jnp.where(found, gy2, 0.0)
    PAD = _flood_pad(sr)
    padr = jnp.zeros((PAD, fcols), jnp.float32)
    return jnp.concatenate([
        syp, padr + BIG, sxp, padr + BIG,
        idp, padr - 1.0, gxp, padr, gyp, padr,
    ], axis=0)
