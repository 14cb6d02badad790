"""Loop-closure registration + pose-graph product path (VERDICT.md round-2
item 5): the tracker-based keyframe registration (ba/loop_closure.py), the
drifted-trajectory refinement it enables, and the run.py --pose-graph wiring.
"""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from rebvio_tpu import eval as ev
from rebvio_tpu.ba import loop_closure as lc
from rebvio_tpu.ba import pose_graph as pgm
from rebvio_tpu.ba.keyframe_map import KeyframeMapBuilder
from rebvio_tpu.configs import (
    CameraConfig, CoreConfig, EdgeDetectorConfig, PipelineConfig,
)
from rebvio_tpu.data import synthetic
from rebvio_tpu.geometry import so3
from rebvio_tpu.runner import VioRunner


def _small_config():
    cam = CameraConfig(rows=120, cols=188, fx=114.6, fy=114.3, cx=91.8,
                       cy=62.1, k1=0, k2=0, k3=0, p1=0, p2=0)
    det = EdgeDetectorConfig(keylines_max=2048, keylines_ref=1200)
    core = CoreConfig(search_range=10, global_min_matches_threshold=100)
    return PipelineConfig(camera=cam, detector=det, core=core, use_imu=False)


@pytest.fixture(scope="module")
def kf_run():
    """A small VO run with stored keyframe maps."""
    cfg = _small_config()
    seq = synthetic.generate(cfg.camera, n_frames=36, seed=0)
    runner = VioRunner(cfg, undistort=False)
    builder = KeyframeMapBuilder(cfg, kf_every=3, store_maps=True)
    for i in range(len(seq.images)):
        odo = runner.process_frame(
            seq.images[i], int(seq.ts_us[i]), seq.imu_ts_us, seq.imu_gyro,
            seq.imu_acc,
        )
        builder.add_frame(runner.state.edge_map, np.asarray(odo.orientation),
                          np.asarray(odo.position),
                          K_scale=float(runner.state.K))
    assert bool(runner.state.run_ok)
    return cfg, seq, builder


def _angle_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def test_register_pair_corrects_perturbed_prior(kf_run):
    """Registration measures the relative pose from the edge images: given a
    rotation prior perturbed within the capture basin (~0.5 deg — direct
    edge association is valid while the reprojection error stays below the
    inter-edge spacing, see register_pair's docstring), the measured rotation
    must move substantially back toward the VIO chain's relative rotation
    (the keyframes are 0.45 s apart, so chain drift between them is
    negligible at this magnitude)."""
    cfg, seq, builder = kf_run
    kf_R = np.stack([k.R_wc for k in builder.keyframes])
    i, j = 2, 5
    R_chain = kf_R[i].T @ kf_R[j]
    perturb = np.asarray(so3.exp(jnp.asarray([0.0, 0.008, 0.0027], jnp.float32)))
    R_prior = (R_chain @ perturb).astype(np.float32)
    err_prior = _angle_deg(R_prior, R_chain)

    R_m, V, nfm, _ = lc.register_pair(
        builder.kf_maps[i], builder.kf_maps[j], jnp.asarray(R_prior), cfg)
    R_m = np.asarray(R_m)
    assert int(nfm) > 200
    err_meas = _angle_deg(R_m, R_chain)
    # measured 0.483 -> 0.198 deg at authoring time; generous margin
    assert err_meas < 0.6 * err_prior, (err_meas, err_prior)


def test_pose_graph_refines_drifted_trajectory(kf_run):
    """Inject a pose jump mid-trajectory (simulated accumulated drift): the
    sequential chain carries the bad link; loop closures spanning it (here
    synthetic — what a perfect place recognition would measure, per
    SURVEY.md's test prescription; the registration-derived path is
    characterized separately above and in the CLI test) contradict it, and
    the optimizer pulls the trajectory back toward the undrifted estimate."""
    cfg, seq, builder = kf_run
    kf_R = np.stack([k.R_wc for k in builder.keyframes])
    kf_t = np.stack([k.t_wc for k in builder.keyframes])
    F = len(kf_t)

    # drift: rotate + shift everything from keyframe k0 on (about the pose
    # of k0, like an instantaneous estimation error that then propagates)
    k0 = F // 2
    dR = np.asarray(so3.exp(jnp.asarray([0.0, 0.04, 0.012], jnp.float32)))
    dt = np.array([0.06, 0.0, 0.03])
    pivot = kf_t[k0].copy()
    kf_R_d = kf_R.copy()
    kf_t_d = kf_t.copy()
    for k in range(k0, F):
        kf_R_d[k] = dR @ kf_R[k]
        kf_t_d[k] = dR @ (kf_t[k] - pivot) + pivot + dt

    err_before = float(np.sqrt(((kf_t_d - kf_t) ** 2).sum(-1).mean()))

    # sequential factors from the DRIFTED chain + synthetic loop closures
    # spanning the break, measured from the undrifted estimate
    fi, fj, Rij, tij, fw = pgm.factors_from_trajectory(kf_R_d, kf_t_d, w=1.0)
    fwt = fw.copy()
    loops = [(a, b) for a in range(k0 - 3, k0) for b in range(k0, min(k0 + 3, F))]
    for (a, b) in loops:
        fi = np.concatenate([fi, [a]]).astype(np.int32)
        fj = np.concatenate([fj, [b]]).astype(np.int32)
        Rij = np.concatenate([Rij, (kf_R[a].T @ kf_R[b])[None].astype(np.float32)])
        tij = np.concatenate(
            [tij, (kf_R[a].T @ (kf_t[b] - kf_t[a]))[None].astype(np.float32)])
        fw = np.concatenate([fw, [1.0]]).astype(np.float32)
        fwt = np.concatenate([fwt, [1.0]]).astype(np.float32)
    g = pgm.PoseGraph(
        R=jnp.asarray(kf_R_d, jnp.float32), t=jnp.asarray(kf_t_d, jnp.float32),
        f_i=jnp.asarray(fi), f_j=jnp.asarray(fj),
        f_Rij=jnp.asarray(Rij), f_tij=jnp.asarray(tij),
        f_w=jnp.asarray(fw), f_valid=jnp.ones(len(fi), bool),
        f_wt=jnp.asarray(fwt),
    )

    g_opt, hist = pgm.optimize(g, iters=15)
    hist = np.asarray(hist)
    assert hist[-1] < hist[0], hist
    err_after = float(np.sqrt(
        ((np.asarray(g_opt.t) - kf_t) ** 2).sum(-1).mean()))
    assert err_after < 0.5 * err_before, (err_before, err_after)


def test_run_cli_pose_graph(capsys):
    """Product wiring: run.py --pose-graph reports the pose-graph block."""
    from rebvio_tpu import run as run_mod

    rc = run_mod.main([
        "--dataset", "synthetic", "--mode", "vo", "--frames", "30",
        "--preset", "small", "--pose-graph", "--kf-every", "3",
        "--platform", "cpu",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["run_ok"]
    assert out["pg_keyframes"] >= 3
    assert "pg_loop_factors" in out
    assert out["pg_cost_after"] <= out["pg_cost_before"]
    assert np.isfinite(out["pg_ate_sim3"])


def test_coarse_align_recovers_multi_degree_drift(kf_run):
    """VERDICT r4 item 6: a prior drifted ~4 deg — far beyond the LM
    registration's ~1-deg direct-association basin — must be recovered by
    the coarse rotation sweep + registration, where registration alone
    fails (its 'correction' stays near zero because the aliased
    associations pull nowhere)."""
    cfg, seq, builder = kf_run
    kf_R = np.stack([k.R_wc for k in builder.keyframes])
    i, j = 2, 5
    R_chain = kf_R[i].T @ kf_R[j]
    up = np.array([0.0, 1.0, 0.0])
    axis_i = kf_R[i].T @ up
    drift = np.asarray(so3.exp(jnp.asarray(axis_i * np.radians(4.0), jnp.float32)))
    R_prior_bad = (drift @ R_chain).astype(np.float32)
    assert _angle_deg(R_prior_bad, R_chain) > 3.5

    # registration alone: stuck outside the basin
    R_direct, _, _, _ = lc.register_pair(
        builder.kf_maps[i], builder.kf_maps[j], jnp.asarray(R_prior_bad), cfg)
    err_direct = _angle_deg(np.asarray(R_direct), R_chain)

    # coarse sweep re-seeds the prior, then registration refines
    R_al, off, cnt = lc.coarse_align(
        builder.kf_maps[i], builder.kf_maps[j], jnp.asarray(R_prior_bad),
        cfg, axis_i, sweep_deg=8.0, steps=17)
    assert abs(np.degrees(off) + 4.0) <= 1.01, off  # sweep finds ~-4 deg
    R_m, V, nfm, _ = lc.register_pair(
        builder.kf_maps[i], builder.kf_maps[j], R_al, cfg)
    err_coarse = _angle_deg(np.asarray(R_m), R_chain)
    assert int(nfm) > 200
    assert err_coarse < 0.5, (err_coarse, err_direct)
    assert err_coarse < 0.25 * max(err_direct, 1e-9), (err_coarse, err_direct)


def test_coarse_align_recovers_off_axis_drift(kf_run):
    """VERDICT r4 item 5: drift with a significant ROLL component (about the
    optical axis) on top of yaw — beyond the registration basin on BOTH
    axes — aliases on the gravity-only 1-D sweep; the 2-D yaw x roll sweep
    (axis2_i = camera optical axis) plus registration must recover it."""
    cfg, seq, builder = kf_run
    kf_R = np.stack([k.R_wc for k in builder.keyframes])
    i, j = 2, 5
    R_chain = kf_R[i].T @ kf_R[j]
    up = np.array([0.0, 1.0, 0.0])
    axis_i = kf_R[i].T @ up
    axis2_i = np.array([0.0, 0.0, 1.0])  # camera-i optical axis (roll)
    drift = (np.asarray(so3.exp(jnp.asarray(axis_i * np.radians(3.0), jnp.float32)))
             @ np.asarray(so3.exp(jnp.asarray(axis2_i * np.radians(2.5), jnp.float32))))
    R_prior_bad = (drift @ R_chain).astype(np.float32)
    assert _angle_deg(R_prior_bad, R_chain) > 3.0

    def register_from(R_seed):
        R_m, _, nfm, _ = lc.register_pair(
            builder.kf_maps[i], builder.kf_maps[j], jnp.asarray(R_seed), cfg)
        return _angle_deg(np.asarray(R_m), R_chain), int(nfm)

    # 1-D gravity sweep: the 2.5-deg roll component stays outside every
    # candidate's basin, so the registration cannot fully recover
    R_1d, _, cnt_1d = lc.coarse_align(
        builder.kf_maps[i], builder.kf_maps[j], jnp.asarray(R_prior_bad),
        cfg, axis_i, sweep_deg=8.0, steps=17)
    err_1d, _ = register_from(R_1d)

    # 2-D yaw x roll sweep (0.5-deg roll spacing)
    R_2d, _, cnt_2d = lc.coarse_align(
        builder.kf_maps[i], builder.kf_maps[j], jnp.asarray(R_prior_bad),
        cfg, axis_i, sweep_deg=8.0, steps=17,
        axis2_i=axis2_i, sweep2_deg=3.0, steps2=13)
    err_2d, nfm_2d = register_from(R_2d)

    # measured at authoring: err_1d 1.48 deg (the roll component is outside
    # every 1-D candidate's basin), err_2d 0.60 deg
    assert cnt_2d >= cnt_1d, (cnt_1d, cnt_2d)
    assert nfm_2d > 200
    assert err_2d < 0.75, (err_2d, err_1d)
    assert err_2d < 0.55 * max(err_1d, 1e-9), (err_2d, err_1d)


def test_graph_with_coarse_alignment_fixes_drifted_loop(kf_run):
    """End-to-end: inject a 3.5-deg yaw drift into the keyframe chain, then
    build the pose graph from the REAL stored maps.  Without the coarse
    stage no loop factor survives (priors beyond the basin are dropped by
    the max_correction gate); with it, loop factors register and the
    optimized trajectory moves back toward the undrifted estimate."""
    cfg, seq, builder = kf_run
    kf_R = np.stack([k.R_wc for k in builder.keyframes])
    kf_t = np.stack([k.t_wc for k in builder.keyframes])
    F = len(kf_t)
    k0 = F // 2
    up = np.array([0.0, 1.0, 0.0])
    dR = np.asarray(so3.exp(jnp.asarray(up * np.radians(3.5), jnp.float32)))
    pivot = kf_t[k0].copy()
    kf_R_d, kf_t_d = kf_R.copy(), kf_t.copy()
    for k in range(k0, F):
        kf_R_d[k] = dR @ kf_R[k]
        kf_t_d[k] = dR @ (kf_t[k] - pivot) + pivot

    kw = dict(config=cfg, K_scale=1.0, min_gap=6, radius=10.0,
              min_matches=100, w_loop=2.0)
    g0, n0 = lc.build_graph_from_run(kf_R_d, kf_t_d, builder.kf_maps,
                                     coarse_sweep_deg=0.0, **kw)
    g1, n1 = lc.build_graph_from_run(kf_R_d, kf_t_d, builder.kf_maps,
                                     coarse_sweep_deg=8.0, **kw)
    assert n1 >= 2

    # factor accuracy vs the true (undrifted) relative rotations: without
    # the coarse stage, registrations from the 3.5-deg prior are STUCK —
    # they return the drifted prior as the "measurement" (correction ~0
    # passes the basin gate), so their error is ~the injected drift; with
    # the sweep they measure the true relative rotation.
    def loop_errs(g, n):
        F_seq = len(np.asarray(g.f_i)) - n
        errs = []
        for a, b, Rm in zip(np.asarray(g.f_i)[F_seq:], np.asarray(g.f_j)[F_seq:],
                            np.asarray(g.f_Rij)[F_seq:]):
            errs.append(_angle_deg(Rm, kf_R[a].T @ kf_R[b]))
        return np.asarray(errs)

    e0 = loop_errs(g0, n0)
    e1 = loop_errs(g1, n1)
    # measured at authoring: e0 ~3.58 deg (the injected drift, confirmed
    # verbatim by stuck registrations) vs e1 ~1.0 deg (the registration's
    # own residual at these 0.9-1.65 s keyframe baselines; finer sweeps
    # don't reduce it — it is not sweep granularity)
    assert e1.mean() < 1.8, e1
    if n0:
        assert e0.mean() > e1.mean() + 1.2, (e0.mean(), e1.mean())

    # the optimizer pulls the drifted chain back toward the undrifted one
    g_opt, hist = pgm.optimize(g1, iters=15)
    hist = np.asarray(hist)
    assert hist[-1] < hist[0]
    rot_err = lambda Rs: np.mean([_angle_deg(a, b) for a, b in zip(Rs, kf_R)])
    err_before = rot_err(kf_R_d)
    err_after = rot_err(np.asarray(g_opt.R))
    assert err_after < 0.7 * err_before, (err_before, err_after)


def test_graph_with_roll_sweep_fixes_off_axis_drifted_loop(kf_run):
    """VERDICT r4 item 5 end-to-end: inject combined yaw (3 deg) + roll
    (2.5 deg) drift.  The yaw-only coarse stage cannot land the roll
    component inside the registration basin — its surviving 'factors' are
    registrations stuck AT the drifted prior (factor error ~ injected
    drift).  With the 2-D yaw x roll sweep (coarse_sweep2_deg > 0, the
    --roll-sweep CLI flag) factor quality improves decisively and the
    optimized trajectory moves back toward the undrifted estimate."""
    cfg, seq, builder = kf_run
    kf_R = np.stack([k.R_wc for k in builder.keyframes])
    kf_t = np.stack([k.t_wc for k in builder.keyframes])
    F = len(kf_t)
    k0 = F // 2
    up = np.array([0.0, 1.0, 0.0])
    zw = np.array([0.0, 0.0, 1.0])
    dR = (np.asarray(so3.exp(jnp.asarray(up * np.radians(3.0), jnp.float32)))
          @ np.asarray(so3.exp(jnp.asarray(zw * np.radians(2.5), jnp.float32))))
    pivot = kf_t[k0].copy()
    kf_R_d, kf_t_d = kf_R.copy(), kf_t.copy()
    for k in range(k0, F):
        kf_R_d[k] = dR @ kf_R[k]
        kf_t_d[k] = dR @ (kf_t[k] - pivot) + pivot

    kw = dict(config=cfg, K_scale=1.0, min_gap=6, radius=10.0,
              min_matches=100, w_loop=2.0, coarse_sweep_deg=8.0)
    g1, n1 = lc.build_graph_from_run(kf_R_d, kf_t_d, builder.kf_maps,
                                     coarse_sweep2_deg=0.0, **kw)
    g2, n2 = lc.build_graph_from_run(kf_R_d, kf_t_d, builder.kf_maps,
                                     coarse_sweep2_deg=3.0, **kw)

    def loop_errs(g, n):
        F_seq = len(np.asarray(g.f_i)) - n
        return np.asarray([
            _angle_deg(Rm, kf_R[a].T @ kf_R[b])
            for a, b, Rm in zip(np.asarray(g.f_i)[F_seq:],
                                np.asarray(g.f_j)[F_seq:],
                                np.asarray(g.f_Rij)[F_seq:])])

    e1 = loop_errs(g1, n1)
    e2 = loop_errs(g2, n2)
    # measured at authoring: 1-D n=12, e=2.65 deg (~the injected 3.9-deg
    # drift: stuck registrations); 2-D n=21, e=1.45 deg
    assert n2 >= 2
    assert n2 > n1, (n1, n2)
    assert e2.mean() < 1.8, e2
    if n1:
        assert e2.mean() < 0.65 * e1.mean(), (e1.mean(), e2.mean())

    g_opt, hist = pgm.optimize(g2, iters=15)
    assert np.asarray(hist)[-1] < np.asarray(hist)[0]
    rot_err = lambda Rs: np.mean([_angle_deg(a, b) for a, b in zip(Rs, kf_R)])
    assert rot_err(np.asarray(g_opt.R)) < rot_err(kf_R_d)
