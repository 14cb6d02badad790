import numpy as np
import jax.numpy as jnp

from rebvio_tpu.ba import pose_graph as pg
from rebvio_tpu.geometry import so3


def _make_graph(rng, F=12, loop=True, noise=0.0):
    # ground-truth circular trajectory
    ang = np.linspace(0, 1.5 * np.pi, F)
    t_gt = np.stack([np.cos(ang), np.sin(ang), 0.1 * ang], -1).astype(np.float32)
    R_gt = np.stack([
        np.asarray(so3.exp(jnp.asarray([0.0, 0.0, a], jnp.float32))) for a in ang
    ])
    fi, fj, Rij, tij, w = pg.factors_from_trajectory(R_gt, t_gt)
    if loop:
        # loop closure between first and last
        fi = np.concatenate([fi, [0]]).astype(np.int32)
        fj = np.concatenate([fj, [F - 1]]).astype(np.int32)
        Rij = np.concatenate([Rij, (R_gt[0].T @ R_gt[F - 1])[None]])
        tij = np.concatenate([tij, (R_gt[0].T @ (t_gt[F - 1] - t_gt[0]))[None]])
        w = np.concatenate([w, [3.0]]).astype(np.float32)

    # perturbed initial poses (accumulating drift)
    R0 = R_gt.copy()
    t0 = t_gt.copy()
    drift = np.zeros(3)
    for f in range(1, F):
        drift += rng.randn(3) * 0.02
        t0[f] = t_gt[f] + drift
        R0[f] = R_gt[f] @ np.asarray(so3.exp(jnp.asarray(rng.randn(3).astype(np.float32) * 0.01)))

    g = pg.PoseGraph(
        R=jnp.asarray(R0, jnp.float32), t=jnp.asarray(t0, jnp.float32),
        f_i=jnp.asarray(fi), f_j=jnp.asarray(fj),
        f_Rij=jnp.asarray(Rij, jnp.float32), f_tij=jnp.asarray(tij, jnp.float32),
        f_w=jnp.asarray(w), f_valid=jnp.ones(len(fi), bool),
    )
    return g, (R_gt, t_gt)


def test_pose_graph_recovers_trajectory():
    rng = np.random.RandomState(0)
    g, (R_gt, t_gt) = _make_graph(rng)
    g_opt, hist = pg.optimize(g, iters=15)
    hist = np.asarray(hist)
    assert hist[-1] < hist[0] * 1e-3, hist
    err0 = np.linalg.norm(np.asarray(g.t) - t_gt, axis=-1).max()
    err1 = np.linalg.norm(np.asarray(g_opt.t) - t_gt, axis=-1).max()
    assert err1 < 0.02, (err0, err1)


def test_pose_graph_masked_factors():
    rng = np.random.RandomState(1)
    g, _ = _make_graph(rng, loop=False)
    fv = np.array(g.f_valid)
    fv[-2:] = False
    g = g._replace(f_valid=jnp.asarray(fv))
    g_opt, hist = pg.optimize(g, iters=8)
    hist = np.asarray(hist)
    assert hist[-1] <= hist[0]
