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
