"""Batched multi-sequence VIO: vmap over sequences, sharded over a device mesh.

The reference is a single-process, single-sequence estimator (SURVEY.md
section 2: no parallelism of any kind).  This module provides the first
greenfield scale-out axis from BASELINE.json's configs: N independent
sequences stepped in lockstep, vmapped into one program and sharded over the
``seq`` axis of a jax.sharding.Mesh, so XLA partitions every kernel
(frontend, distance field, tracker, filters) across chips with zero
collectives on the critical path (pure data parallelism over sequences).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rebvio_tpu import types as T
from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.pipeline import step


def init_batched_state(config: PipelineConfig, batch: int) -> T.VioState:
    one = T.init_vio_state(config)
    return jax.tree.map(lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), one)


@partial(jax.jit, static_argnames=("config",))
def batched_step(
    states: T.VioState,
    frames: jnp.ndarray,          # [B,H,W]
    imu: T.ImuFrameData,          # batched leaves [B,...]
    frame_dt: jnp.ndarray,        # [B]
    config: PipelineConfig,
) -> Tuple[T.VioState, T.Odometry]:
    mats = __import__("rebvio_tpu.pipeline", fromlist=["frontend_matrices"]).frontend_matrices(config)
    return jax.vmap(lambda s, f, i, d: step(s, f, i, d, config, mats))(
        states, frames, imu, frame_dt
    )


def make_seq_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), axis_names=("seq",))


def shard_batch(tree, mesh: Mesh):
    """Place a batched pytree with the leading axis sharded over ``seq``."""
    def put(x):
        spec = P("seq") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def sharded_step_fn(mesh: Mesh, config: PipelineConfig):
    """jit-compiled batched step with explicit seq-sharded in/out shardings."""
    def fn(states, frames, imu, frame_dt):
        return batched_step(states, frames, imu, frame_dt, config)

    def spec_of(x):
        return NamedSharding(mesh, P("seq") if getattr(x, "ndim", 0) >= 1 else P())

    return fn, spec_of
