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
