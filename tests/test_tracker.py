import numpy as np
import jax.numpy as jnp

from rebvio_tpu.configs import CameraConfig, CoreConfig
from rebvio_tpu.ops import distance_field as DF, matching, tracker
from tests import oracle
from tests.helpers import make_random_map, cam_dict


def _setup(seed=0, H=48, W=64, K=80, kmax=128, R=8):
    rng = np.random.RandomState(seed)
    old_em, old_d = make_random_map(rng, K, kmax, H, W)
    new_em, new_d = make_random_map(rng, K, kmax, H, W)
    field = DF.build_distance_field(new_em, R, H, W)
    field_ids = DF.field_id(field, kmax)
    idf = np.asarray(field_ids)
    cam = CameraConfig(rows=H, cols=W, cx=W / 2, cy=H / 2, fx=100, fy=100,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    cfg = CoreConfig(search_range=R)
    return rng, old_em, old_d, new_em, new_d, field_ids, idf, cam, cfg


def test_try_vel_matches_oracle():
    rng, old_em, old_d, new_em, new_d, field, idf, cam, cfg = _setup()
    cam_d = cam_dict(cam.rows, cam.cols, cam.fm)
    cfg_d = dict(search_range=cfg.search_range, reweight_distance=cfg.reweight_distance,
                 match_threshold=cfg.match_threshold)
    K = int(old_em.count)
    for vel_np in [np.zeros(3), np.array([0.01, -0.02, 0.005])]:
        residuals = np.abs(rng.randn(old_em.kmax).astype(np.float32)) * 3
        srm = 8.0
        out = tracker.try_vel(
            old_em, new_em, field, jnp.asarray(vel_np, jnp.float32),
            jnp.float32(srm), jnp.asarray(residuals), cfg, cam,
        )
        old_d2 = dict(old_d)
        old_d2["valid"] = np.asarray(old_em.valid)[: K]
        score, JtJ, JtF, res, mif = oracle.try_vel(
            old_d2, new_d, idf, residuals[:K].astype(np.float64), vel_np, srm, cfg_d, cam_d
        )
        assert np.allclose(float(out.score), score, rtol=1e-3), (float(out.score), score)
        assert np.allclose(np.asarray(out.JtJ), JtJ, rtol=1e-3, atol=1e-3)
        assert np.allclose(np.asarray(out.JtF), JtF, rtol=1e-3, atol=1e-3)
        assert np.array_equal(np.asarray(out.match_id_forward)[:K], mif)
        assert np.allclose(np.asarray(out.residuals)[:K], res, rtol=1e-3, atol=1e-4)


def test_quantile_matches_oracle():
    rng = np.random.RandomState(3)
    em, d = make_random_map(rng, 90, 128, 48, 64)
    for p in (0.5, 0.9):
        got = float(matching.estimate_quantile(em, p, 100))
        want = oracle.estimate_quantile(d["sigma_rho"], d["valid"], p, 100)
        assert np.isclose(got, want, atol=1e-5), (p, got, want)


def test_forward_match_winner_rule():
    rng = np.random.RandomState(4)
    K = 60
    old_em, old_d = make_random_map(rng, K, 64, 48, 64)
    new_em, new_d = make_random_map(rng, K, 64, 48, 64)
    # random forward matches with deliberate collisions
    mif = rng.randint(-1, 30, 64).astype(np.int32)
    mif[K:] = -1
    old_em = old_em.replace(match_id_forward=jnp.asarray(mif))
    got_map, n = matching.forward_match(old_em, new_em)
    want_mid = oracle.forward_match(old_d["rho"], mif[:K], 64)
    got_mid = np.asarray(got_map.match_id)
    assert np.array_equal(got_mid, want_mid)
    # propagated fields for matched targets
    for t in range(64):
        w = want_mid[t]
        if w >= 0:
            assert np.isclose(float(got_map.rho[t]), old_d["rho"][w], rtol=1e-6)
            assert np.isclose(float(got_map.sigma_rho[t]), old_d["sigma_rho"][w], rtol=1e-6)
            assert int(got_map.matches[t]) == 1


def test_update_inverse_depth_matches_oracle():
    rng = np.random.RandomState(5)
    K = 40
    em, d = make_random_map(rng, K, 64, 48, 64)
    # fabricate matches
    mid = np.full(64, -1, np.int32)
    mid[:K] = rng.randint(0, K, K)
    mpos = d["pos_img"] + rng.randn(K, 2) * 0.5
    mgrad = d["grad"] + rng.randn(K, 2) * 5
    mgn = np.linalg.norm(mgrad, axis=-1)
    em = em.replace(
        match_id=jnp.asarray(mid),
        match_pos_img=jnp.asarray(np.pad(mpos, ((0, 24), (0, 0))).astype(np.float32)),
        match_grad=jnp.asarray(np.pad(mgrad, ((0, 24), (0, 0))).astype(np.float32)),
        match_grad_norm=jnp.asarray(np.pad(mgn, (0, 24)).astype(np.float32)),
    )
    cam = CameraConfig(rows=48, cols=64, cx=32, cy=24, fx=100, fy=100,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    cfg = CoreConfig()
    vel = np.array([0.02, -0.01, 0.003])
    out = tracker.update_inverse_depth(em, jnp.asarray(vel, jnp.float32), cfg, cam)
    cam_d = cam_dict(48, 64, cam.fm)
    cfg_d = dict(reshape_q_abs=cfg.reshape_q_abs, pixel_uncertainty=cfg.pixel_uncertainty)
    for i in range(K):
        kl = dict(pos_img=d["pos_img"][i], match_pos_img=mpos[i],
                  match_grad=mgrad[i], match_grad_norm=mgn[i],
                  rho=d["rho"][i], sigma_rho=d["sigma_rho"][i])
        r, s = oracle.update_inverse_depth_arlu(kl, vel, cfg_d, cam_d)
        assert np.isclose(float(out.rho[i]), r, rtol=1e-3, atol=1e-5), i
        assert np.isclose(float(out.sigma_rho[i]), s, rtol=1e-3, atol=1e-5), i


def test_regularize_matches_oracle():
    rng = np.random.RandomState(6)
    K = 50
    em, d = make_random_map(rng, K, 64, 48, 64)
    id_next = np.full(64, -1, np.int32)
    id_prev = np.full(64, -1, np.int32)
    id_next[: K - 1] = np.arange(1, K)
    id_prev[1:K] = np.arange(0, K - 1)
    em = em.replace(id_next=jnp.asarray(id_next), id_prev=jnp.asarray(id_prev))
    thr = 0.5
    out = matching.regularize_1iter(em, thr)
    r, s = oracle.regularize(
        d["rho"], d["sigma_rho"], d["grad"], d["grad_norm"],
        id_next[:K], id_prev[:K], d["valid"], thr,
    )
    assert np.allclose(np.asarray(out.rho)[:K], r, rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(out.sigma_rho)[:K], s, rtol=1e-4, atol=1e-5)


def test_ext_rot_vel_recovers_rotation():
    """Synthetic consistency: matched pairs generated by a small rigid motion
    should be recovered by the linearized 6-DoF solve."""
    rng = np.random.RandomState(7)
    H, W, K, kmax = 480, 752, 300, 512
    fm = 457.975
    cam = CameraConfig(rows=H, cols=W, cx=W / 2, cy=H / 2, fx=fm, fy=fm,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    cfg = CoreConfig()
    from rebvio_tpu.geometry import so3
    import rebvio_tpu.types as T

    w_true = np.array([0.002, -0.003, 0.001], np.float32)
    v_true = np.array([0.01, 0.02, -0.005], np.float32)
    R = np.asarray(so3.exp(jnp.asarray(w_true)))

    # random 3D points in front of the camera
    z = rng.uniform(2.0, 10.0, K)
    x = rng.uniform(-0.3, 0.3, K) * z
    y = rng.uniform(-0.2, 0.2, K) * z
    P = np.stack([x, y, z], -1)
    q_old = (P[:, :2] / P[:, 2:3]) * fm          # old frame projection
    P_new = P @ R.T  # rotate points (camera motion approx)
    # translation applied via the reference's linearized model: q_t = q0 + rho*(v*fm - vz*q0)
    rho = 1.0 / P[:, 2]
    q_pred = q_old + rho[:, None] * (v_true[:2] * fm - v_true[2] * q_old)
    # the new observed position = rotate old ray by R, then translate
    q_new_rot = np.stack(
        [
            (R[0, 0] * q_old[:, 0] + R[0, 1] * q_old[:, 1] + R[0, 2] * fm),
            (R[1, 0] * q_old[:, 0] + R[1, 1] * q_old[:, 1] + R[1, 2] * fm),
            (R[2, 0] * q_old[:, 0] + R[2, 1] * q_old[:, 1] + R[2, 2] * fm),
        ],
        -1,
    )
    q_new = q_new_rot[:, :2] / q_new_rot[:, 2:3] * fm
    q_new = q_new + rho[:, None] * (v_true[:2] * fm - v_true[2] * q_new)

    ang = rng.uniform(0, 2 * np.pi, K)
    grad = np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32) * 100

    em = T.empty_edge_map(kmax, H, W)
    valid = np.zeros(kmax, bool)
    valid[:K] = True

    def pad(a, fill=0.0):
        out = np.full((kmax,) + a.shape[1:], fill, np.float32)
        out[:K] = a
        return jnp.asarray(out)

    em = em.replace(
        pos_img=pad(q_new.astype(np.float32)),
        match_pos_img=pad(q_old.astype(np.float32)),
        grad=pad(grad), grad_norm=pad(np.linalg.norm(grad, axis=-1)),
        rho=pad(rho.astype(np.float32), 1.0),
        sigma_rho=pad(np.full(K, 0.1, np.float32), 20.0),
        match_id=jnp.asarray(np.where(valid, 0, -1).astype(np.int32)),
        valid=jnp.asarray(valid), count=jnp.asarray(K, jnp.int32),
    )
    X, Wx = tracker.ext_rot_vel(em, jnp.zeros(3, jnp.float32), cfg, cam)
    X = np.asarray(X)
    # rotation part should recover w_true; translation correction ~ v_true
    assert np.allclose(X[3:], w_true, atol=5e-4), X
    assert np.allclose(X[:3], v_true, atol=5e-3), X


def test_ext_rot_vel_nan_propagates_and_singular_zeroes():
    """NaN-path parity with the reference (VERDICT round-1 weak #6):

    * NaN keyline data entering a *matched* lane contaminates JtJ/JtF; TooN
      SVD propagates NaN into X (core.cpp:247-257) and the caller's
      isnan(V) gate latches the failure (rebvio.cpp:236-241) -> X must be
      NaN, not silently zeroed.
    * A *finite singular* system (zero matches -> JtJ = 0) backsubstitutes
      to X = 0 in TooN (singular directions zeroed) -> X must be 0.
    """
    import rebvio_tpu.types as T
    from rebvio_tpu.geometry import linalg

    H, W, kmax = 48, 64, 32
    fm = 45.8
    cam = CameraConfig(rows=H, cols=W, cx=W / 2, cy=H / 2, fx=fm, fy=fm,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    cfg = CoreConfig()

    em = T.empty_edge_map(kmax, H, W)
    valid = np.zeros(kmax, bool)
    valid[:4] = True
    grad = np.zeros((kmax, 2), np.float32)
    grad[:4] = [[100, 0], [0, 100], [70, 70], [-70, 70]]
    rho = np.full(kmax, 1.0, np.float32)
    rho[1] = np.nan  # contaminated matched keyline
    em = em.replace(
        pos_img=jnp.asarray(np.tile([[5.0, 3.0]], (kmax, 1)).astype(np.float32)),
        match_pos_img=jnp.asarray(np.tile([[4.0, 2.0]], (kmax, 1)).astype(np.float32)),
        grad=jnp.asarray(grad),
        grad_norm=jnp.asarray(np.linalg.norm(grad, axis=-1).astype(np.float32)),
        rho=jnp.asarray(rho),
        sigma_rho=jnp.asarray(np.full(kmax, 0.5, np.float32)),
        match_id=jnp.asarray(np.where(valid, 0, -1).astype(np.int32)),
        valid=jnp.asarray(valid),
        count=jnp.asarray(4, jnp.int32),
    )
    X, _ = tracker.ext_rot_vel(em, jnp.zeros(3, jnp.float32), cfg, cam)
    assert np.any(np.isnan(np.asarray(X))), X  # NaN propagates -> fail gate

    # finite singular: no matches at all -> X = 0 exactly
    em0 = em.replace(
        rho=jnp.asarray(np.full(kmax, 1.0, np.float32)),
        match_id=jnp.asarray(np.full(kmax, -1, np.int32)),
    )
    X0, _ = tracker.ext_rot_vel(em0, jnp.zeros(3, jnp.float32), cfg, cam)
    assert np.all(np.asarray(X0) == 0.0), X0

    # sym_solve unit semantics
    A = jnp.zeros((3, 3), jnp.float32)
    b = jnp.zeros((3,), jnp.float32)
    assert np.all(np.asarray(linalg.sym_solve(A, b)) == 0.0)
    An = A.at[0, 0].set(jnp.nan)
    assert np.any(np.isnan(np.asarray(linalg.sym_solve(An, b))))


def test_hybrid_pallas_try_vel_matches_xla():
    """The production hybrid pass (XLA projection+gather, post-gather math as
    one Pallas kernel) must reproduce the all-XLA tracker.try_vel."""
    import os

    import jax.numpy as jnp

    from rebvio_tpu.configs import (
        CameraConfig, CoreConfig, EdgeDetectorConfig, PipelineConfig,
    )
    from rebvio_tpu.data import synthetic
    from rebvio_tpu.ops import distance_field as DF, edge_detect
    from rebvio_tpu.pipeline import frontend_matrices

    cam_c = CameraConfig(rows=120, cols=188, fx=114.6, fy=114.3, cx=91.8,
                         cy=62.1, k1=0, k2=0, k3=0, p1=0, p2=0)
    det = EdgeDetectorConfig(keylines_max=2048, keylines_ref=1200)
    core = CoreConfig(search_range=10)
    cfg = PipelineConfig(camera=cam_c, detector=det, core=core)
    mats = frontend_matrices(cfg)
    seq = synthetic.generate(cam_c, n_frames=2, seed=0)
    m0 = edge_detect.detect(jnp.asarray(seq.images[0] * 3.0), jnp.float32(0.01),
                            mats, det, cam_c)
    m1 = edge_detect.detect(jnp.asarray(seq.images[1] * 3.0), jnp.float32(0.01),
                            mats, det, cam_c)
    att = DF.build_att_field(m1, int(core.search_range), cam_c.rows, cam_c.cols, 1)
    vel = jnp.asarray([0.005, -0.002, 0.01], jnp.float32)
    srm = jnp.float32(30.0)
    rng = np.random.RandomState(7)
    res0 = jnp.asarray(np.abs(rng.randn(det.keylines_max)).astype(np.float32) * 3)

    want = tracker.try_vel(m0, m1, att, vel, srm, res0, core, cam_c, att_f=att.T)
    os.environ["REBVIO_PALLAS_TRYVEL"] = "1"
    try:
        got = tracker.try_vel(m0, m1, att, vel, srm, res0, core, cam_c, att_f=att.T)
    finally:
        os.environ.pop("REBVIO_PALLAS_TRYVEL", None)
    np.testing.assert_allclose(float(got.score), float(want.score), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.JtJ), np.asarray(want.JtJ),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.JtF), np.asarray(want.JtF),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.match_id_forward),
                                  np.asarray(want.match_id_forward))
    np.testing.assert_allclose(np.asarray(got.residuals),
                               np.asarray(want.residuals), rtol=1e-5, atol=1e-6)


def test_pallas_try_vel_matches_xla():
    """The fused Pallas tryVel (north-star attempt; kept as the measurement
    artifact — see its docstring) must reproduce tracker.try_vel exactly in
    interpret mode."""
    import jax.numpy as jnp

    from rebvio_tpu.configs import (
        CameraConfig, CoreConfig, EdgeDetectorConfig, PipelineConfig,
    )
    from rebvio_tpu.data import synthetic
    from rebvio_tpu.ops import distance_field as DF, edge_detect
    from rebvio_tpu.ops.pallas_kernels import try_vel_pallas
    from rebvio_tpu.pipeline import frontend_matrices

    cam_c = CameraConfig(rows=120, cols=188, fx=114.6, fy=114.3, cx=91.8,
                         cy=62.1, k1=0, k2=0, k3=0, p1=0, p2=0)
    det = EdgeDetectorConfig(keylines_max=2048, keylines_ref=1200)
    core = CoreConfig(search_range=10)
    cfg = PipelineConfig(camera=cam_c, detector=det, core=core)
    mats = frontend_matrices(cfg)
    seq = synthetic.generate(cam_c, n_frames=2, seed=0)
    m0 = edge_detect.detect(jnp.asarray(seq.images[0] * 3.0), jnp.float32(0.01),
                            mats, det, cam_c)
    m1 = edge_detect.detect(jnp.asarray(seq.images[1] * 3.0), jnp.float32(0.01),
                            mats, det, cam_c)
    att = DF.build_att_field(m1, int(core.search_range), cam_c.rows, cam_c.cols, 1)
    vel = jnp.asarray([0.005, -0.002, 0.01], jnp.float32)
    srm = jnp.float32(30.0)
    res0 = jnp.zeros((det.keylines_max,), jnp.float32)

    want = tracker.try_vel(m0, m1, att, vel, srm, res0, core, cam_c, att_f=att.T)
    score, G, res, mif = try_vel_pallas(
        m0, att.T, vel, srm, res0, core, cam_c, field_scale=1, block=512,
        interpret=True)
    np.testing.assert_allclose(float(score), float(want.score), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(G[:3, :3]), np.asarray(want.JtJ),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(G[:3, 3]), np.asarray(want.JtF),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mif), np.asarray(want.match_id_forward))
    np.testing.assert_allclose(np.asarray(res), np.asarray(want.residuals),
                               rtol=1e-2, atol=1e-5)


def test_pallas_reg_ekf_matches_xla(monkeypatch):
    """The fused regularize+depth-EKF hybrid (tracker.
    regularize_and_update_depth with the Pallas kernel forced on) must
    reproduce the composition of matching.regularize_1iter and
    tracker.update_inverse_depth exactly (interpret mode off-TPU)."""
    import jax.numpy as jnp

    from rebvio_tpu.configs import CameraConfig, CoreConfig
    from rebvio_tpu.ops.matching import regularize_1iter
    from tests.helpers import make_random_map

    rng = np.random.RandomState(7)
    H, W, K, kmax = 48, 64, 100, 128
    em, _ = make_random_map(rng, K, kmax, H, W)
    # synthesize chains + matches so both stages have work
    idn = np.full(kmax, -1, np.int32)
    idp = np.full(kmax, -1, np.int32)
    mid = np.full(kmax, -1, np.int32)
    idn[:K - 1] = np.arange(1, K)
    idp[1:K] = np.arange(K - 1)
    mid[: K // 2] = rng.permutation(K)[: K // 2]
    mg = rng.randn(kmax, 2).astype(np.float32) * 100
    mgn = np.linalg.norm(mg, axis=-1).astype(np.float32)
    mpi = rng.randn(kmax, 2).astype(np.float32) * 20
    em = em.replace(
        id_next=jnp.asarray(idn), id_prev=jnp.asarray(idp),
        match_id=jnp.asarray(mid), match_grad=jnp.asarray(mg),
        match_grad_norm=jnp.asarray(mgn), match_pos_img=jnp.asarray(mpi),
    )
    cam = CameraConfig(rows=H, cols=W, cx=W / 2, cy=H / 2, fx=100, fy=100,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    cfg = CoreConfig(search_range=8)
    vel = jnp.asarray([0.01, -0.004, 0.02], jnp.float32)
    thr = 0.5

    want = regularize_1iter(em, thr)
    want = tracker.update_inverse_depth(want, vel, cfg, cam)

    monkeypatch.setenv("REBVIO_PALLAS_REGEKF", "1")
    got = tracker.regularize_and_update_depth(em, vel, thr, cfg, cam)
    np.testing.assert_allclose(np.asarray(got.rho), np.asarray(want.rho),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.sigma_rho),
                               np.asarray(want.sigma_rho), rtol=1e-5, atol=1e-6)
