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
        interpret=interpret,
    )(sid0, sy0, sx0)
    return out.reshape(-1)
