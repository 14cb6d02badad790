"""step_chunk (lax.scan over N frames in one dispatch) must be semantically
identical to N sequential step() calls — the offline/dataset fast path."""

import jax
import jax.numpy as jnp
import numpy as np

from rebvio_tpu import types as T
from rebvio_tpu.configs import PipelineConfig, CameraConfig, EdgeDetectorConfig, CoreConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.ops.imu import pack_imu_window
from rebvio_tpu.pipeline import (
    frontend_matrices, step, step_chunk, step_chunk_pipelined,
)


def _cfg() -> PipelineConfig:
    cam = CameraConfig(rows=240, cols=376, fx=229.3, fy=228.6, cx=183.6, cy=124.2,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    det = EdgeDetectorConfig(keylines_max=4096, keylines_ref=3000)
    core = CoreConfig(search_range=20, global_min_matches_threshold=200)
    return PipelineConfig(camera=cam, detector=det, core=core, use_imu=True)


def test_scan_chunk_matches_sequential_steps():
    cfg = _cfg()
    n = 6
    seq = synthetic.generate(cfg.camera, n_frames=n, seed=0)
    mats = frontend_matrices(cfg)

    frames = jnp.asarray(
        np.stack([seq.images[i] * cfg.image_gain for i in range(n)]).astype(np.float32)
    )
    windows = []
    cursor = 0
    for i in range(n):
        j = cursor
        while j < len(seq.imu_ts_us) and seq.imu_ts_us[j] <= seq.ts_us[i]:
            j += 1
        windows.append(
            pack_imu_window(seq.imu_gyro[cursor:j], seq.imu_acc[cursor:j],
                            seq.imu_ts_us[cursor:j], cfg.imu.sample_max)
        )
        cursor = j
    imu_b = jax.tree.map(lambda *xs: jnp.stack(xs), *windows)
    dts = jnp.full((n,), 0.05, jnp.float32)

    s_seq = T.init_vio_state(cfg)
    odos = []
    for i in range(n):
        s_seq, odo = step(s_seq, frames[i],
                          jax.tree.map(lambda x: x[i], imu_b), dts[i], cfg, mats)
        odos.append(odo)

    s_chunk, odo_chunk = step_chunk(T.init_vio_state(cfg), frames, imu_b, dts, cfg, mats)

    np.testing.assert_allclose(
        np.asarray(odo_chunk.position),
        np.stack([np.asarray(o.position) for o in odos]), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(odo_chunk.num_matches),
        np.asarray([int(o.num_matches) for o in odos]),
    )
    np.testing.assert_allclose(
        np.asarray(s_chunk.Pos), np.asarray(s_seq.Pos), rtol=1e-5, atol=1e-6
    )
    assert bool(s_chunk.run_ok) == bool(s_seq.run_ok)

    # pipelined variant (batched frontend, chunk-held threshold): same
    # trajectory within the tolerance of the once-per-chunk autogain update
    s_pipe, odo_pipe = step_chunk_pipelined(
        T.init_vio_state(cfg), frames, imu_b, dts, cfg, mats
    )
    np.testing.assert_allclose(
        np.asarray(odo_pipe.position),
        np.asarray(odo_chunk.position), rtol=1e-3, atol=1e-3,
    )
    nm_a = np.asarray(odo_chunk.num_matches)[1:]
    nm_b = np.asarray(odo_pipe.num_matches)[1:]
    assert (np.abs(nm_a - nm_b) <= 0.02 * np.maximum(nm_a, 1)).all(), (nm_a, nm_b)
    assert bool(s_pipe.run_ok)
