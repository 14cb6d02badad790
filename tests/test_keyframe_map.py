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


def test_run_mapped_matches_per_frame_builder():
    """The chunked mapping path (VioRunner.run_mapped + step_chunk_traced:
    one batched trace readback per chunk, device-map snapshots only at
    chunk boundaries) must build the IDENTICAL keyframe map as the
    per-frame add_frame loop with the same keyframe schedule."""
    cfg = _cfg()
    N, kf_every = 20, 4
    seq = synthetic.generate(cfg.camera, n_frames=N, seed=1)

    # reference: per-frame loop, same phase as the chunked path
    r1 = VioRunner(cfg, undistort=False)
    b1 = KeyframeMapBuilder(cfg, kf_every=kf_every, kf_phase=kf_every - 1,
                            store_maps=True)
    for i in range(N):
        odo = r1.process_frame(seq.images[i], int(seq.ts_us[i]),
                               seq.imu_ts_us, seq.imu_gyro, seq.imu_acc)
        b1.add_frame(r1.state.edge_map, np.asarray(odo.orientation),
                     np.asarray(odo.position), K_scale=float(r1.state.K))

    r2 = VioRunner(cfg, undistort=False)
    b2 = KeyframeMapBuilder(cfg, kf_every=kf_every, kf_phase=kf_every - 1,
                            store_maps=True)
    res2 = r2.run_mapped(seq, b2, chunk=kf_every)

    assert b1.n_keyframes() == b2.n_keyframes() > 0
    assert len(b2.kf_maps) == b2.n_keyframes()  # every KF has a device map
    for k1, k2 in zip(b1.keyframes, b2.keyframes):
        assert k1.index == k2.index
        np.testing.assert_array_equal(k1.obs_tracks, k2.obs_tracks)
        np.testing.assert_allclose(k1.obs_uv, k2.obs_uv, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(k1.t_wc, k2.t_wc, rtol=1e-6, atol=1e-7)
    # the device-resident KF snapshots are the true boundary maps
    np.testing.assert_array_equal(np.asarray(b1.kf_maps[-1].match_id),
                                  np.asarray(b2.kf_maps[-1].match_id))
    assert res2.run_ok.all()
