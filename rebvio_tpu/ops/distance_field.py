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

from functools import partial

import jax
import jax.numpy as jnp

from rebvio_tpu import types as T


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


@partial(jax.jit, static_argnames=("search_range", "rows", "cols", "scale"))
def build_nn_field(
    em: T.EdgeMap, search_range: int, rows: int, cols: int, scale: int = 1
) -> jnp.ndarray:
    """Dense nearest-keyline id field via jump flooding (JFA).

    TPU-first alternative to the rasterized auxiliary field (core.hpp:37-59):
    instead of 16k x 80 scattered writes, O(log R) dense passes of statically
    shifted compare/selects produce, for every pixel, the id of the nearest
    keyline (subpixel position metric) within ``search_range``.  The
    reference's field approximates exactly this nearest-edge lookup but only
    rasterizes along each keyline's gradient ray; the JFA field covers all
    directions, so the tracker finds at least as many candidates (the
    gradient-similarity gate in calculatefJ, core.cpp:56, still applies).

    Returns an [ceil(rows/scale)*ceil(cols/scale)] int32 id image (-1 = no
    keyline within range).  ``scale`` > 1 builds the field on a decimated
    grid (coordinates and search_range in scaled units): 1/scale^2 the
    traffic; consumers index it with pixel//scale.
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
    # one packed row scatter for the three seed planes (id as exact f32)
    seed_rows = jnp.stack(
        [jnp.arange(kmax, dtype=jnp.float32), pos_y, pos_x], axis=-1
    )
    init = jnp.stack(
        [jnp.full((rows * cols,), -1.0, jnp.float32),
         jnp.full((rows * cols,), BIG, jnp.float32),
         jnp.full((rows * cols,), BIG, jnp.float32)], axis=-1,
    )
    planes = init.at[flat].set(seed_rows, mode="drop")
    sid = planes[:, 0].astype(jnp.int32).reshape(rows, cols)
    sy = planes[:, 1].reshape(rows, cols)
    sx = planes[:, 2].reshape(rows, cols)

    yy = jnp.arange(rows, dtype=jnp.float32)[:, None]
    xx = jnp.arange(cols, dtype=jnp.float32)[None, :]

    def d2_of(sy_, sx_):
        return (yy - sy_) ** 2 + (xx - sx_) ** 2

    best_d2 = jnp.where(sid >= 0, d2_of(sy, sx), BIG)

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

    # One roll-compare-select body driven by a (dy, dx) schedule keeps the
    # compiled graph small (a fori_loop instead of 50+ unrolled passes).
    # jnp.roll wraps around, but wrapped candidates carry their *absolute*
    # seed coordinates from the far edge, so the distance metric rejects
    # them automatically — no border fill needed.
    sched = []
    for s in steps:
        for dy in (-s, 0, s):
            for dx in (-s, 0, s):
                if dy == 0 and dx == 0:
                    continue
                sched.append((dy, dx))
    dys = jnp.asarray([d[0] for d in sched], jnp.int32)
    dxs = jnp.asarray([d[1] for d in sched], jnp.int32)

    def body(i, carry):
        sid, sy, sx, best_d2 = carry
        dy, dx = dys[i], dxs[i]
        cid = jnp.roll(sid, (dy, dx), (0, 1))
        csy = jnp.roll(sy, (dy, dx), (0, 1))
        csx = jnp.roll(sx, (dy, dx), (0, 1))
        cd2 = jnp.where(cid >= 0, d2_of(csy, csx), BIG)
        better = cd2 < best_d2
        return (
            jnp.where(better, cid, sid),
            jnp.where(better, csy, sy),
            jnp.where(better, csx, sx),
            jnp.where(better, cd2, best_d2),
        )

    sid, sy, sx, best_d2 = jax.lax.fori_loop(
        0, len(sched), body, (sid, sy, sx, best_d2)
    )

    sid = jnp.where(best_d2 <= jnp.float32(search_range * search_range), sid, -1)
    return sid.reshape(-1)
