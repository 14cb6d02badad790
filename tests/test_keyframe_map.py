import numpy as np
import jax.numpy as jnp

from rebvio_tpu.ba import problem as bap
from rebvio_tpu.ba.keyframe_map import KeyframeMapBuilder
from rebvio_tpu.configs import PipelineConfig, CameraConfig, EdgeDetectorConfig, CoreConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.runner import VioRunner


def _cfg():
    cam = CameraConfig(rows=240, cols=376, fx=229.3, fy=228.6, cx=183.6, cy=124.2,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    det = EdgeDetectorConfig(keylines_max=4096, keylines_ref=3000)
    core = CoreConfig(search_range=20, global_min_matches_threshold=200)
    return PipelineConfig(camera=cam, detector=det, core=core, use_imu=False)


def test_keyframe_map_build_and_refine():
    cfg = _cfg()
    seq = synthetic.generate(cfg.camera, n_frames=36, seed=0)
    r = VioRunner(cfg, undistort=False)
    builder = KeyframeMapBuilder(cfg, kf_every=4)
    for i in range(len(seq.images)):
        odo = r.process_frame(seq.images[i], int(seq.ts_us[i]),
                              seq.imu_ts_us, seq.imu_gyro, seq.imu_acc)
        builder.add_frame(r.state.edge_map, np.asarray(odo.orientation),
                          np.asarray(odo.position), K_scale=float(r.state.K))
    assert builder.n_keyframes() == 9

    p = builder.build_problem(min_obs=2)
    assert p is not None
    L = int(np.asarray(p.lm_valid).sum())
    O = int(np.asarray(p.obs_valid).sum())
    assert L > 200, L
    assert O > 400, O

    # pose-convention sanity: initial mean reprojection residual must be
    # small (a few px), which fails loudly if R_wc/t_wc conventions are wrong
    terms = bap.accumulate_terms(p)
    rms0 = float(np.sqrt(np.asarray(terms.cost) / max(int(terms.n_obs), 1)))
    assert rms0 < 10.0, f"initial rms {rms0:.2f}px -> pose convention broken"

    p_opt, hist = bap.optimize(p, iters=8, huber_delta=3.0)
    hist = np.asarray(hist)
    assert hist[-1] < hist[0], hist
    terms1 = bap.accumulate_terms(p_opt)
    rms1 = float(np.sqrt(np.asarray(terms1.cost) / max(int(terms1.n_obs), 1)))
    assert rms1 < rms0, (rms0, rms1)
