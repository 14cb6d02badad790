import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rebvio_tpu import types as T
from rebvio_tpu.configs import PipelineConfig, CameraConfig, EdgeDetectorConfig, CoreConfig, ImuConfig
from rebvio_tpu.parallel import batch as B


def _tiny():
    cam = CameraConfig(rows=48, cols=64, cx=32, cy=24, fx=60, fy=60,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    det = EdgeDetectorConfig(keylines_max=256, keylines_ref=128)
    core = CoreConfig(search_range=8, global_min_matches_threshold=5)
    return PipelineConfig(camera=cam, detector=det, core=core,
                          imu=ImuConfig(sample_max=8), use_imu=True)


def test_batched_step_runs_and_matches_single():
    cfg = _tiny()
    Bsz = 3
    rng = np.random.RandomState(0)
    frames = jnp.asarray((rng.rand(Bsz, 48, 64) * 255).astype(np.float32))
    states = B.init_batched_state(cfg, Bsz)
    imu = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (Bsz,) + x.shape), T.empty_imu_frame(8)
    )
    dts = jnp.full((Bsz,), 0.05, jnp.float32)
    out_state, odo = B.batched_step(states, frames, imu, dts, cfg)
    assert odo.position.shape == (Bsz, 3)

    # batched lane 0 must equal a single-sequence run on the same frame
    from rebvio_tpu.pipeline import step, frontend_matrices

    mats = frontend_matrices(cfg)
    s1, o1 = step(T.init_vio_state(cfg), frames[0], T.empty_imu_frame(8),
                  jnp.float32(0.05), cfg, mats)
    assert int(out_state.edge_map.count[0]) == int(s1.edge_map.count)
    np.testing.assert_allclose(
        np.asarray(odo.position[0]), np.asarray(o1.position), atol=1e-6
    )


def test_batched_sharded_over_mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = _tiny()
    Bsz = 4
    mesh = B.make_seq_mesh(4)
    rng = np.random.RandomState(1)
    frames = jnp.asarray((rng.rand(Bsz, 48, 64) * 255).astype(np.float32))
    states = B.init_batched_state(cfg, Bsz)
    imu = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (Bsz,) + x.shape), T.empty_imu_frame(8)
    )
    dts = jnp.full((Bsz,), 0.05, jnp.float32)
    with mesh:
        states = B.shard_batch(states, mesh)
        frames = B.shard_batch(frames, mesh)
        imu = B.shard_batch(imu, mesh)
        dts = B.shard_batch(dts, mesh)
        out_state, odo = B.batched_step(states, frames, imu, dts, cfg)
        jax.block_until_ready(odo.position)
    assert odo.position.shape == (Bsz, 3)
    # outputs keep the seq sharding
    shard_devs = {s.device for s in out_state.edge_map.rho.addressable_shards}
    assert len(shard_devs) == 4
