"""Full-pipeline sequential-oracle regression (VERDICT.md round-1 item 6).

The per-kernel oracle tests can't catch *sequencing* divergences — a stage
run out of order, a field propagated from the wrong map, a gate applied to
the wrong side (the reference's master-loop ordering, rebvio.cpp:119-292).
Here the composed numpy oracle (tests/oracle.py::oracle_step) runs the whole
vision-only estimation loop frame by frame and the jitted pipeline must
reproduce its trajectory.

Both sides run the reference-semantics configuration (raster distance field
+ pixel-walk matcher, no IMU) on the same synthetic frames; the oracle
consumes the production scale-space outputs (already kernel-tested against
oracle.smooth/grad_mag) so the comparison isolates detection + estimation
sequencing.  Float32-vs-float64 drift compounds through the depth filters,
so the contract is trajectory-level (ATE between implementations well under
the motion span) plus per-frame match-count agreement.
"""

import numpy as np
import jax.numpy as jnp

from rebvio_tpu import eval as ev
from rebvio_tpu.configs import (
    CameraConfig, CoreConfig, EdgeDetectorConfig, PipelineConfig,
)
from rebvio_tpu.data import synthetic
from rebvio_tpu.ops.scale_space import build_scale_space
from rebvio_tpu.pipeline import frontend_matrices
from rebvio_tpu.runner import VioRunner
from tests import oracle

N_FRAMES = 12


def test_pipeline_matches_composed_oracle():
    cam = CameraConfig(rows=120, cols=188, fx=114.6, fy=114.3, cx=91.8, cy=62.1,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    det = EdgeDetectorConfig(keylines_max=2048, keylines_ref=1200)
    core = CoreConfig(search_range=10, global_min_matches_threshold=100)
    cfg = PipelineConfig(camera=cam, detector=det, core=core, use_imu=False,
                         df_mode="raster", matcher="walk")
    seq = synthetic.generate(cam, n_frames=N_FRAMES, seed=0)

    # --- jitted pipeline ---
    r = VioRunner(cfg, undistort=False)
    res = r.run(seq)
    assert res.run_ok.all()

    # --- composed numpy oracle on the same frames ---
    cfg_det = dict(plane_fit_size=det.plane_fit_size,
                   pos_neg_threshold=det.pos_neg_threshold,
                   max_image_value=det.max_image_value,
                   dog_threshold=det.dog_threshold,
                   keylines_max=det.keylines_max,
                   keylines_ref=det.keylines_ref, gain=det.gain,
                   min_threshold=det.min_threshold,
                   max_threshold=det.max_threshold)
    cfg_core = dict(search_range=core.search_range,
                    reweight_distance=core.reweight_distance,
                    match_threshold=core.match_threshold,
                    iterations=core.iterations,
                    quantile_cutoff=core.quantile_cutoff,
                    pixel_uncertainty=core.pixel_uncertainty,
                    reshape_q_abs=core.reshape_q_abs,
                    global_min_matches_threshold=core.global_min_matches_threshold)
    em = cfg.edge_map
    cfg_em = dict(pixel_uncertainty_match=em.pixel_uncertainty_match,
                  match_threshold_norm=em.match_threshold_norm,
                  match_threshold_angle=em.match_threshold_angle,
                  regularization_threshold=em.regularization_threshold)
    cam_d = dict(rows=cam.rows, cols=cam.cols, fm=cam.fm, cx=cam.cx, cy=cam.cy)

    mats = frontend_matrices(cfg)
    st = dict(map=None, threshold=det.threshold, keylines_count=0,
              R_global=np.eye(3), Pos=np.zeros(3), run_ok=True)
    pos_o, nm_o = [], []
    for i in range(N_FRAMES):
        img = jnp.asarray(seq.images[i] * cfg.image_gain)
        s0, dog, mag = build_scale_space(img, mats)
        st, odo = oracle.oracle_step(
            st, np.asarray(dog, np.float64), np.asarray(mag, np.float64),
            cfg_det, cfg_core, cfg_em, cam_d)
        pos_o.append(odo["position"])
        nm_o.append(odo["num_matches"])
        assert odo["run_ok"], i
    pos_o = np.stack(pos_o)
    nm_o = np.asarray(nm_o)

    # per-frame match counts agree (sequencing-sensitive; counts are O(1000))
    nm_p = res.num_matches
    for i in range(2, N_FRAMES):
        assert abs(int(nm_p[i]) - int(nm_o[i])) <= 0.05 * max(nm_o[i], 1), \
            (i, nm_p[i], nm_o[i])

    # trajectories agree far tighter than either moves
    span = float(np.linalg.norm(seq.gt_pos[:N_FRAMES].max(0)
                                - seq.gt_pos[:N_FRAMES].min(0)))
    drift = ev.ate_rmse(res.position, pos_o, align=False)
    assert drift < 0.05 * span, (drift, span)
