import numpy as np
import jax
import jax.numpy as jnp

from rebvio_tpu.ba import problem as bap
from rebvio_tpu.geometry import so3


def make_synthetic_ba(rng, F=6, L=120, noise_px=0.0, perturb=True):
    """Ground-truth poses on an arc observing a point cloud; observations in
    every frame; initial guess = perturbed poses + noisy inverse depths."""
    t_gt = np.stack([0.4 * np.arange(F), 0.1 * np.sin(np.arange(F)), np.zeros(F)], -1)
    R_gt = np.stack([np.asarray(so3.exp(jnp.asarray([0.0, 0.03 * f, 0.0], jnp.float32))) for f in range(F)])

    pts = np.stack([
        rng.uniform(-3, 3 + 0.4 * F, L),
        rng.uniform(-2, 2, L),
        rng.uniform(4, 10, L),
    ], -1)

    anchor_kf = rng.randint(0, F, L).astype(np.int32)
    # anchor ray + true inverse depth
    anchor_ray = np.zeros((L, 3), np.float32)
    rho_gt = np.zeros(L, np.float32)
    for l in range(L):
        a = anchor_kf[l]
        Xc = R_gt[a].T @ (pts[l] - t_gt[a])
        anchor_ray[l] = [Xc[0] / Xc[2], Xc[1] / Xc[2], 1.0]
        rho_gt[l] = 1.0 / Xc[2]

    obs_lm, obs_kf, obs_uv = [], [], []
    for l in range(L):
        for f in range(F):
            Xc = R_gt[f].T @ (pts[l] - t_gt[f])
            if Xc[2] < 0.5:
                continue
            uv = Xc[:2] / Xc[2]
            if noise_px > 0:
                uv = uv + rng.randn(2) * noise_px
            obs_lm.append(l)
            obs_kf.append(f)
            obs_uv.append(uv)
    O = len(obs_lm)

    R0 = R_gt.copy()
    t0 = t_gt.copy()
    rho0 = rho_gt.copy()
    if perturb:
        for f in range(1, F):
            R0[f] = R0[f] @ np.asarray(so3.exp(jnp.asarray(rng.randn(3).astype(np.float32) * 0.01)))
            t0[f] = t0[f] + rng.randn(3) * 0.05
        rho0 = rho_gt * (1.0 + rng.randn(L) * 0.2)

    p = bap.BAProblem(
        R=jnp.asarray(R0, jnp.float32), t=jnp.asarray(t0, jnp.float32),
        rho=jnp.asarray(rho0, jnp.float32),
        anchor_kf=jnp.asarray(anchor_kf),
        anchor_ray=jnp.asarray(anchor_ray),
        obs_lm=jnp.asarray(np.asarray(obs_lm, np.int32)),
        obs_kf=jnp.asarray(np.asarray(obs_kf, np.int32)),
        obs_uv=jnp.asarray(np.asarray(obs_uv, np.float32)),
        obs_w=jnp.ones((O,), jnp.float32) * 500.0,  # ~pixel weighting (fm)
        lm_valid=jnp.ones((L,), bool),
        obs_valid=jnp.ones((O,), bool),
    )
    return p, (R_gt, t_gt, rho_gt)


def test_ba_converges_to_ground_truth():
    rng = np.random.RandomState(0)
    p, (R_gt, t_gt, rho_gt) = make_synthetic_ba(rng)
    p_opt, hist = bap.optimize(p, iters=15)
    hist = np.asarray(hist)
    assert hist[-1] < hist[0] * 1e-4, hist
    # monocular BA has a 7-DoF gauge (pose-0 fixed leaves global scale free):
    # compare up to similarity
    from rebvio_tpu.eval import umeyama

    t_est = np.asarray(p_opt.t, np.float64)
    s, Ru, tu = umeyama(t_est, t_gt.astype(np.float64), with_scale=True)
    t_al = (s * (Ru @ t_est.T)).T + tu
    assert np.linalg.norm(t_al - t_gt, axis=-1).max() < 1e-3
    # inverse depths consistent with the recovered scale
    rho_err = np.abs(np.asarray(p_opt.rho) / s - rho_gt) / rho_gt
    assert np.median(rho_err) < 5e-3, np.median(rho_err)


def test_ba_with_noise_reduces_cost():
    rng = np.random.RandomState(1)
    p, _ = make_synthetic_ba(rng, noise_px=0.001)
    p_opt, hist = bap.optimize(p, iters=10, huber_delta=2.0)
    hist = np.asarray(hist)
    assert hist[-1] < hist[0] * 0.5


def test_ba_masked_invalid_obs():
    rng = np.random.RandomState(2)
    p, _ = make_synthetic_ba(rng, F=4, L=40)
    # invalidate half the observations; should still converge
    ov = np.array(p.obs_valid)
    ov[:: 2] = False
    p = p._replace(obs_valid=jnp.asarray(ov))
    p_opt, hist = bap.optimize(p, iters=12)
    hist = np.asarray(hist)
    assert hist[-1] < hist[0] * 1e-3


def test_distributed_matches_single_device():
    from jax.sharding import Mesh
    from rebvio_tpu.ba import distributed as bad

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs 4 virtual devices")
    rng = np.random.RandomState(3)
    p, _ = make_synthetic_ba(rng, F=5, L=64)
    n = 4
    ps = bad.shard_problem(p, n)
    mesh = Mesh(np.asarray(jax.devices()[:n]), axis_names=("lm",))
    ps_dev = bad.place(ps, mesh)
    opt = bad.make_distributed_optimize(mesh, iters=12)
    p_dist, hist_d = opt(ps_dev)
    hist_d = np.asarray(hist_d)

    p_single, hist_s = bap.optimize(ps, iters=12)
    hist_s = np.asarray(hist_s)
    # identical math modulo reduction order: costs should track closely
    assert hist_d[-1] < hist_d[0] * 1e-3
    assert np.allclose(hist_d[-1], hist_s[-1], rtol=0.2) or (hist_d[-1] < 1e-6 and hist_s[-1] < 1e-6)
    assert np.allclose(np.asarray(p_dist.t), np.asarray(p_single.t), atol=1e-3)
