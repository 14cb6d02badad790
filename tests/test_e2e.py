"""End-to-end regression on synthetic sequences (SURVEY.md section 4: the
TPU-native analogue of the reference's rosbag regression test, graded by ATE
bound instead of bitwise equality)."""

import numpy as np
import pytest

from rebvio_tpu.configs import PipelineConfig, CameraConfig, EdgeDetectorConfig, CoreConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.runner import VioRunner
from rebvio_tpu import eval as ev


def _small_cfg(use_imu: bool) -> PipelineConfig:
    cam = CameraConfig(rows=240, cols=376, fx=229.3, fy=228.6, cx=183.6, cy=124.2,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    det = EdgeDetectorConfig(keylines_max=4096, keylines_ref=3000)
    core = CoreConfig(search_range=20, global_min_matches_threshold=200)
    return PipelineConfig(camera=cam, detector=det, core=core, use_imu=use_imu)


def test_vision_only_tracks_synthetic_trajectory():
    cfg = _small_cfg(use_imu=False)
    seq = synthetic.generate(cfg.camera, n_frames=40, seed=0)
    r = VioRunner(cfg, undistort=False)
    res = r.run(seq)
    assert res.run_ok.all()
    assert res.num_matches[2:].min() > 500
    span = np.linalg.norm(seq.gt_pos[-1] - seq.gt_pos[0])
    ate = ev.ate_rmse(res.position, seq.gt_pos, align=True, with_scale=True)
    # measured 0.065 of span (vision-only, R=I prior, 40 frames — chaotic to
    # ~10% under equally-valid nearest-keyline proposal orderings; the JFA
    # fixed-point packing moved it 0.060 -> 0.065).  Bound = measured + ~25%.
    # The precision regression lives in test_reference_anchor.py, which pins
    # the full-resolution VIO trajectory to the real reference implementation
    # at ~1% of span.
    assert ate < 0.11 * span, (ate, span)


def test_vio_recovers_scale_and_gravity():
    cfg = _small_cfg(use_imu=True)
    seq = synthetic.generate(cfg.camera, n_frames=100, seed=0)
    r = VioRunner(cfg, undistort=False)
    res = r.run(seq)
    assert res.run_ok.all()
    # metric scale: true visual scale is ~5 (mean scene depth / rho_init);
    # the SAB filter must be converging toward it by frame 100 (monocular
    # visual scale also drifts slowly, which K tracks by design)
    K = float(r.state.K)
    assert 2.0 < K < 14.0, K
    g = np.asarray(r.state.sab_state.g_est)
    assert 9.0 < np.linalg.norm(g) < 10.6, g
    # gravity direction: world -y in camera coords at the final pose
    g_dir = g / np.linalg.norm(g)
    assert g_dir[1] < -0.9, g_dir
    # trajectory shape (scale-aligned; the metric transient is excluded by sim3)
    span = np.linalg.norm(seq.gt_pos[-1] - seq.gt_pos[0])
    ate = ev.ate_rmse(res.position, seq.gt_pos, align=True, with_scale=True)
    assert ate < 0.2 * span, (ate, span)


def test_failure_latch_on_blank_frames():
    """Blank frames -> no keylines -> match failure latches run_ok=False and
    freezes the output pose (the reference's run_=false semantics,
    rebvio.cpp:247-252)."""
    cfg = _small_cfg(use_imu=False)
    seq = synthetic.generate(cfg.camera, n_frames=8, seed=1)
    seq.images[4:] = 25.0  # blank
    r = VioRunner(cfg, undistort=False)
    res = r.run(seq)
    assert not res.run_ok[-1]
    # pose frozen after failure
    i_fail = int(np.argmin(res.run_ok))
    assert np.allclose(res.position[i_fail:], res.position[i_fail])


def test_elastic_recovery_resumes_tracking():
    """With recover_on_failure, blank frames do not permanently kill the run
    (greenfield extension; the reference latches forever)."""
    import dataclasses

    cfg = dataclasses.replace(_small_cfg(use_imu=False), recover_on_failure=True)
    seq = synthetic.generate(cfg.camera, n_frames=16, seed=1)
    seq.images[5:8] = 25.0  # blank gap
    r = VioRunner(cfg, undistort=False)
    res = r.run(seq)
    assert not res.run_ok[6]       # failure observed during the gap
    assert res.run_ok[-1]          # ...but tracking resumed
    assert res.num_matches[-1] > 500


def _corrupt_burst(images, lo, hi, seed=7):
    """Severe imaging burst (sensor dropout / gross over-gain analogue):
    scene contrast collapses to 15 % and heavy per-frame-independent read
    noise dominates, so detections are noise edges that cannot match across
    frames.  Harsher than the anchor DEGRADE_PRESETS, which are
    deliberately tuned so the reference binary still tracks — this burst
    drops matches below the 500-match latch threshold."""
    rng = np.random.RandomState(seed)
    H, W = images.shape[1:]
    for k in range(lo, hi):
        images[k] = np.clip(
            images[k] * 0.15 + 30.0 + rng.randn(H, W) * 25.0, 0, 255)


def test_recovery_beyond_reference_envelope():
    """VERDICT r4 item 6: a degradation burst HARSHER than the anchor
    presets (those are tuned so the reference still tracks).  Under
    reference semantics the <500-match latch fires and the pose freezes
    FOREVER (rebvio.cpp:236-252) — confirmed here by the recover_on_failure
    =False run.  With elastic recovery the pipeline re-seeds after the
    burst, re-locks, and the post-recovery trajectory stays accurate
    (measured at authoring: post-burst ATE 0.038 of the post-burst span)."""
    import dataclasses

    cfg = _small_cfg(use_imu=False)
    n = 48
    lo, hi = 16, 22
    seq = synthetic.generate(cfg.camera, n_frames=n, seed=3)
    _corrupt_burst(seq.images, lo, hi)

    # reference semantics: burst latches, pose frozen to the end
    r0 = VioRunner(cfg, undistort=False)
    res0 = r0.run(seq)
    assert not res0.run_ok[hi - 1]
    assert not res0.run_ok[-1]           # latched forever
    i_fail = int(np.argmin(res0.run_ok))
    assert np.allclose(res0.position[i_fail:], res0.position[i_fail])

    # elastic recovery: re-seeds during/after the burst and re-locks
    cfg_r = dataclasses.replace(cfg, recover_on_failure=True)
    r1 = VioRunner(cfg_r, undistort=False)
    res1 = r1.run(seq)
    assert not res1.run_ok[lo]           # the burst still kills tracking...
    assert res1.run_ok[-1]               # ...but it re-locks
    assert res1.num_matches[-1] > 500

    # post-recovery accuracy: the re-locked segment tracks the ground-truth
    # trajectory shape (sim3-aligned on that segment — recovery restarts
    # visual scale, exactly like a fresh monocular start)
    k = hi + 4                            # allow a few re-seed frames
    assert res1.run_ok[k:].all()
    seg_gt = seq.gt_pos[k:]
    span = float(np.linalg.norm(seg_gt.max(0) - seg_gt.min(0)))
    ate = ev.ate_rmse(res1.position[k:], seg_gt, align=True, with_scale=True)
    assert ate < 0.12 * span, (ate, span)


def test_reference_parity_mode_walk_raster():
    """The reference-semantics path (raster distance field + pixel-walk
    matcher) also tracks end to end."""
    import dataclasses

    cfg = dataclasses.replace(_small_cfg(use_imu=False), df_mode="raster", matcher="walk")
    seq = synthetic.generate(cfg.camera, n_frames=24, seed=0)
    r = VioRunner(cfg, undistort=False)
    res = r.run(seq)
    assert res.run_ok.all()
    span = np.linalg.norm(seq.gt_pos[-1] - seq.gt_pos[0])
    ate = ev.ate_rmse(res.position, seq.gt_pos, align=True, with_scale=True)
    assert ate < 0.08 * span, (ate, span)


def test_vio_long_loopy_sequence():
    """300-frame (15 s) oscillating trajectory at half resolution — the
    long-horizon drift gate VERDICT.md round-1 item 7 asked for.  Bounds are
    measured values + headroom (measured at calibration time: ATE 0.105 of
    span, |g| 9.7, g_dir_y -0.98, all-frames run_ok) so later perf work
    cannot silently degrade long-run accuracy.  Uses the scan-chunk offline
    path (8 frames/dispatch), which doubles as its regression test at this
    length."""
    cfg = _small_cfg(use_imu=True)
    seq = synthetic.generate(cfg.camera, n_frames=300, seed=2, speed=0.15)
    r = VioRunner(cfg, undistort=False)
    res = r.run(seq, chunk=8)
    assert res.run_ok.all()
    assert res.num_matches[3:].min() > 500

    span = float(np.linalg.norm(seq.gt_pos.max(0) - seq.gt_pos.min(0)))
    ate = ev.ate_rmse(res.position, seq.gt_pos, align=True, with_scale=True)
    assert ate < 0.15 * span, (ate, span)  # measured 0.105

    g = np.asarray(r.state.sab_state.g_est)
    assert 9.0 < np.linalg.norm(g) < 10.6, g
    assert g[1] / np.linalg.norm(g) < -0.9, g
    assert np.isfinite(float(r.state.K)) and float(r.state.K) > 1.0


def test_realtime_keepup_and_drop_semantics():
    """run_realtime (the reference's paced player + bounded queues,
    ros_rebvio.cpp:89-126): at a generously slow playback speed every frame
    is processed with zero drops; at an impossibly fast speed frames are
    dropped, accounting stays exact, frame order stays monotonic, and the
    estimator keeps tracking across the gaps (IMU of dropped frames is
    consumed by the next processed frame)."""
    cfg = _small_cfg(use_imu=True)
    seq = synthetic.generate(cfg.camera, n_frames=10, seed=0)
    runner = VioRunner(cfg, undistort=False)
    runner.run(seq)  # warm the jit
    runner.reset()

    # slow: 20 Hz x 0.05 = 1 frame/s delivery -> zero drops on CPU
    rt = runner.run_realtime(seq, speed=0.05)
    assert rt.processed == 10 and rt.dropped == 0
    assert rt.result.run_ok.all()
    assert rt.worst_latency_s < 5.0

    # fast: 20 Hz x 1000 -> all frames due immediately; queue of 1 forces
    # drops, accounting exact, indices strictly increasing
    runner.reset()
    rt2 = runner.run_realtime(seq, speed=1000.0, queue_size=1)
    assert rt2.processed + rt2.dropped == 10
    assert rt2.dropped > 0
    assert (np.diff(rt2.frame_idx) > 0).all()
    assert rt2.processed >= 2  # first + at least one tracked frame
