import numpy as np
import jax.numpy as jnp

from rebvio_tpu.configs import CameraConfig, CoreConfig, EdgeMapConfig
from rebvio_tpu.ops import matching
from tests import oracle
from tests.helpers import make_random_map, cam_dict


def test_rotate_keylines():
    rng = np.random.RandomState(0)
    em, d = make_random_map(rng, 40, 64, 48, 64)
    fm = 100.0
    from rebvio_tpu.geometry import so3

    R = np.asarray(so3.exp(jnp.asarray([0.01, -0.02, 0.005], jnp.float32)))
    out = matching.rotate_keylines(em, jnp.asarray(R), fm)
    for i in range(40):
        q = R @ np.array([d["pos_img"][i][0] / fm, d["pos_img"][i][1] / fm, 1.0])
        assert np.allclose(
            np.asarray(out.pos_img[i]), [q[0] / q[2] * fm, q[1] / q[2] * fm], rtol=1e-4, atol=1e-3
        )
        assert np.isclose(float(out.rho[i]), d["rho"][i] / q[2], rtol=1e-4)
        g = R @ np.array([d["grad"][i][0], d["grad"][i][1], 0.0])
        assert np.allclose(np.asarray(out.grad[i]), g[:2], rtol=1e-4, atol=1e-3)
    # gradient_norm deliberately stale
    assert np.allclose(np.asarray(out.grad_norm), np.asarray(em.grad_norm))


def test_directed_match_matches_oracle():
    rng = np.random.RandomState(1)
    H, W, K, kmax = 64, 96, 120, 128
    new_em, new_d = make_random_map(rng, K, kmax, H, W)
    old_em, old_d = make_random_map(rng, K, kmax, H, W)
    cam = CameraConfig(rows=H, cols=W, cx=W / 2, cy=H / 2, fx=100, fy=100,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    core_cfg = CoreConfig(search_range=10)
    em_cfg = EdgeMapConfig()
    cam_d = cam_dict(H, W, cam.fm)
    cfg_d = dict(pixel_uncertainty_match=em_cfg.pixel_uncertainty_match,
                 match_threshold_norm=em_cfg.match_threshold_norm,
                 match_threshold_angle=em_cfg.match_threshold_angle)

    from rebvio_tpu.geometry import so3
    Rback = np.asarray(so3.exp(jnp.asarray([0.005, -0.008, 0.002], jnp.float32))).astype(np.float64)
    vel = np.array([0.01, -0.02, 0.004])
    Rvel = np.diag([1e-4, 1e-4, 1e-5])

    out_map, n = matching.directed_match(
        new_em, old_em, jnp.asarray(vel, jnp.float32), jnp.asarray(Rvel, jnp.float32),
        jnp.asarray(Rback, jnp.float32), em_cfg, core_cfg, cam,
    )
    got = np.asarray(out_map.match_id)[:K]

    vel_b = Rback @ vel
    Rvel_b = Rback @ Rvel @ Rback.T
    want = np.empty(K, np.int32)
    for i in range(K):
        kl = dict(pos_img=new_d["pos_img"][i], rho=new_d["rho"][i],
                  sigma_rho=new_d["sigma_rho"][i], grad=new_d["grad"][i],
                  grad_norm=new_d["grad_norm"][i])
        want[i] = oracle.search_match(kl, old_d, vel_b, Rvel_b, Rback,
                                      core_cfg.search_range, cfg_d, cam_d)
    agree = np.mean(got == want)
    assert agree >= 0.97, (agree, list(zip(got, want))[:20])


def test_directed_match_zero_velocity_branch():
    rng = np.random.RandomState(2)
    H, W, K, kmax = 64, 96, 60, 64
    new_em, new_d = make_random_map(rng, K, kmax, H, W)
    old_em, old_d = make_random_map(rng, K, kmax, H, W)
    cam = CameraConfig(rows=H, cols=W, cx=W / 2, cy=H / 2, fx=100, fy=100,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    core_cfg = CoreConfig(search_range=10)
    em_cfg = EdgeMapConfig()
    cam_d = cam_dict(H, W, cam.fm)
    cfg_d = dict(pixel_uncertainty_match=em_cfg.pixel_uncertainty_match,
                 match_threshold_norm=em_cfg.match_threshold_norm,
                 match_threshold_angle=em_cfg.match_threshold_angle)
    vel = np.zeros(3)
    Rvel = np.eye(3) * 1e-6
    I = np.eye(3)
    out_map, n = matching.directed_match(
        new_em, old_em, jnp.asarray(vel, jnp.float32), jnp.asarray(Rvel, jnp.float32),
        jnp.asarray(I, jnp.float32), em_cfg, core_cfg, cam,
    )
    got = np.asarray(out_map.match_id)[:K]
    want = np.empty(K, np.int32)
    for i in range(K):
        kl = dict(pos_img=new_d["pos_img"][i], rho=new_d["rho"][i],
                  sigma_rho=new_d["sigma_rho"][i], grad=new_d["grad"][i],
                  grad_norm=new_d["grad_norm"][i])
        want[i] = oracle.search_match(kl, old_d, vel, Rvel, I,
                                      core_cfg.search_range, cfg_d, cam_d)
    agree = np.mean(got == want)
    assert agree >= 0.97, agree


def test_tube_match_pallas_matches_xla(monkeypatch):
    """The hybrid Pallas tube matcher (pallas_kernels.tube_match_pallas,
    interpret mode on CPU) must reproduce the XLA formulation of
    directed_match_tube on a real detected pair."""
    from rebvio_tpu.configs import (
        CameraConfig, CoreConfig, EdgeDetectorConfig, PipelineConfig,
    )
    from rebvio_tpu.data import synthetic
    from rebvio_tpu.ops import distance_field as DF, edge_detect
    from rebvio_tpu.pipeline import frontend_matrices

    cam_c = CameraConfig(rows=120, cols=188, fx=114.6, fy=114.3, cx=91.8,
                         cy=62.1, k1=0, k2=0, k3=0, p1=0, p2=0)
    det = EdgeDetectorConfig(keylines_max=2048, keylines_ref=1200)
    core_cfg = CoreConfig(search_range=10)
    cfg = PipelineConfig(camera=cam_c, detector=det, core=core_cfg)
    em_cfg = cfg.edge_map
    mats = frontend_matrices(cfg)
    seq = synthetic.generate(cam_c, n_frames=2, seed=3)
    old = edge_detect.detect(jnp.asarray(seq.images[0] * 3.0), jnp.float32(0.01),
                             mats, det, cam_c)
    new = edge_detect.detect(jnp.asarray(seq.images[1] * 3.0), jnp.float32(0.01),
                             mats, det, cam_c)
    att = DF.build_att_field(old, int(core_cfg.search_range), cam_c.rows, cam_c.cols, 1)
    old = old.replace(att_img=att)
    # spread rho/sigma so the depth gate exercises both branches
    rng = np.random.RandomState(5)
    old = old.replace(
        rho=jnp.asarray(0.5 + np.abs(rng.randn(det.keylines_max)).astype(np.float32)),
        sigma_rho=jnp.asarray(0.3 + np.abs(rng.randn(det.keylines_max)).astype(np.float32)),
        matches=jnp.asarray(rng.randint(0, 9, det.keylines_max), jnp.int32),
    )
    vel = jnp.asarray([0.004, -0.002, 0.01], jnp.float32)
    Rvel = jnp.asarray(np.eye(3, dtype=np.float32) * 1e-5)
    Rback = jnp.asarray(np.eye(3, dtype=np.float32))

    monkeypatch.setenv("REBVIO_PALLAS_TUBE", "0")
    want, n_want = matching.directed_match_tube(
        new, old, vel, Rvel, Rback, em_cfg, core_cfg, cam_c)
    monkeypatch.setenv("REBVIO_PALLAS_TUBE", "1")
    got, n_got = matching.directed_match_tube(
        new, old, vel, Rvel, Rback, em_cfg, core_cfg, cam_c)

    assert int(n_want) > 50  # the scene must actually produce matches
    assert int(n_got) == int(n_want)
    np.testing.assert_array_equal(np.asarray(got.match_id), np.asarray(want.match_id))
    np.testing.assert_array_equal(np.asarray(got.matches), np.asarray(want.matches))
    np.testing.assert_array_equal(np.asarray(got.match_id_keyframe),
                                  np.asarray(want.match_id_keyframe))
    for f in ("rho", "sigma_rho", "match_grad_norm"):
        np.testing.assert_allclose(np.asarray(getattr(got, f)),
                                   np.asarray(getattr(want, f)),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.match_pos_img),
                               np.asarray(want.match_pos_img), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.match_grad),
                               np.asarray(want.match_grad), rtol=1e-5, atol=1e-6)
