"""The fast profile (8k keylines, 4-probe matcher) must track the synthetic
regression within the same ATE band as the default EuRoC-parity profile."""

import numpy as np

from rebvio_tpu import eval as ev
from rebvio_tpu.configs import PipelineConfig, fast_profile
from rebvio_tpu.data import synthetic
from rebvio_tpu.runner import VioRunner


def _run(cfg, seq):
    r = VioRunner(cfg, undistort=False)
    return r.run(seq)


def test_fast_profile_matches_default_ate():
    n = 16
    default = PipelineConfig(use_imu=False)
    fast = fast_profile(use_imu=False)
    seq = synthetic.generate(default.camera, n_frames=n, seed=0)

    res_d = _run(default, seq)
    res_f = _run(fast, seq)
    assert res_d.run_ok.all() and res_f.run_ok.all()
    assert res_f.num_matches[2:].min() > 500

    span = np.linalg.norm(seq.gt_pos[-1] - seq.gt_pos[0])
    ate_d = ev.ate_rmse(res_d.position, seq.gt_pos, align=True, with_scale=True)
    ate_f = ev.ate_rmse(res_f.position, seq.gt_pos, align=True, with_scale=True)
    # fast profile stays within the default's ATE band (+50% headroom)
    assert ate_f < max(1.5 * ate_d, 0.05 * span), (ate_f, ate_d, span)


def test_fast_profile_vio_scale_recovery():
    # full VIO path with 10 SAB iterations + half-res field still recovers
    # metric scale (compare tests/test_e2e.py::test_vio_recovers_scale...)
    from rebvio_tpu.configs import (
        CameraConfig, CoreConfig, EdgeDetectorConfig, EdgeMapConfig, ImuConfig,
    )

    cam = CameraConfig(rows=240, cols=376, fx=229.3, fy=228.6, cx=183.6, cy=124.2,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    cfg = PipelineConfig(
        camera=cam,
        detector=EdgeDetectorConfig(keylines_max=4096, keylines_ref=3000),
        core=CoreConfig(search_range=20, global_min_matches_threshold=200),
        edge_map=EdgeMapConfig(tube_probes=4),
        imu=ImuConfig(sab_iterations=10),
        field_scale=2,
        use_imu=True,
    )
    seq = synthetic.generate(cfg.camera, n_frames=100, seed=0)
    r = VioRunner(cfg, undistort=False)
    res = r.run(seq)
    assert res.run_ok.all()
    K = float(r.state.K)
    assert 2.0 < K < 14.0, K
