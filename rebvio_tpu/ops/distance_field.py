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
