"""Pose-graph optimization over keyframe odometry + loop-closure factors.

Greenfield backend component (BASELINE.json configs[3]: "pose-graph
backend"); complements the landmark bundle adjustment (ba/problem.py) with a
lighter-weight smoother: nodes are keyframe poses, factors are relative SE3
measurements (sequential odometry from the VIO front end, plus optional
loop closures).  Residual for factor (i, j, R_ij, t_ij):

    r_R = log(R_ij^T (R_i^T R_j))          (rotation, 3)
    r_t = R_i^T (t_j - t_i) - t_ij         (translation, 3)

Damped Gauss-Newton with jacfwd-derived blocks; the [F,6] state is tiny, so
the whole solve is one dense jitted system — the distributed axis for
pose graphs is the factor set, which reduces with a single psum exactly like
ba/distributed.py (factors are sharded, the [6F,6F] normal matrix is
psum-reduced); for typical F <= a few hundred this is not worth the
communication and runs replicated.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rebvio_tpu.geometry import so3


class PoseGraph(NamedTuple):
    R: jnp.ndarray         # [F,3,3] world-from-camera
    t: jnp.ndarray         # [F,3]
    f_i: jnp.ndarray       # [M] int32 factor endpoints
    f_j: jnp.ndarray       # [M] int32
    f_Rij: jnp.ndarray     # [M,3,3] measured relative rotation R_i^T R_j
    f_tij: jnp.ndarray     # [M,3] measured relative translation R_i^T (t_j - t_i)
    f_w: jnp.ndarray       # [M] rotation-residual weight (1/sigma)
    f_valid: jnp.ndarray   # [M] bool
    # translation-residual weight; None -> use f_w for both components.
    # Loop closures registered from edge-map pairs observe rotation much
    # more strongly than (depth-limited) translation, so they get a split
    # weight (ba/loop_closure.build_graph_from_run).
    f_wt: jnp.ndarray = None


def factors_from_trajectory(R, t, stride: int = 1, w: float = 1.0):
    """Sequential odometry factors from a trajectory (i, i+stride)."""
    import numpy as np

    F = len(t)
    fi = np.arange(0, F - stride, dtype=np.int32)
    fj = fi + stride
    Rij = np.einsum("fji,fjk->fik", R[fi], R[fj])  # R_i^T R_j
    tij = np.einsum("fji,fj->fi", R[fi], t[fj] - t[fi])
    return fi, fj, Rij.astype(np.float32), tij.astype(np.float32), np.full(len(fi), w, np.float32)


def _factor_residual(dpi, dpj, Ri, ti, Rj, tj, Rij, tij):
    Ri_p = Ri @ so3.exp(dpi[:3])
    ti_p = ti + dpi[3:]
    Rj_p = Rj @ so3.exp(dpj[:3])
    tj_p = tj + dpj[3:]
    r_R = so3.log(Rij.T @ (Ri_p.T @ Rj_p))
    r_t = Ri_p.T @ (tj_p - ti_p) - tij
    return jnp.concatenate([r_R, r_t])


def _factor_jac(Ri, ti, Rj, tj, Rij, tij):
    z = jnp.zeros((6,), jnp.float32)
    r = _factor_residual(z, z, Ri, ti, Rj, tj, Rij, tij)
    Ji = jax.jacfwd(_factor_residual, argnums=0)(z, z, Ri, ti, Rj, tj, Rij, tij)
    Jj = jax.jacfwd(_factor_residual, argnums=1)(z, z, Ri, ti, Rj, tj, Rij, tij)
    return r, Ji, Jj


@partial(jax.jit, static_argnames=("iters", "fix_first"))
def optimize(g: PoseGraph, iters: int = 10, lam0: float = 1e-4,
             fix_first: bool = True) -> Tuple[PoseGraph, jnp.ndarray]:
    """Damped GN over the pose graph; returns (graph, cost history)."""
    F = g.R.shape[0]
    F6 = 6 * F

    def build(gr):
        i = jnp.clip(g.f_i, 0, F - 1)
        j = jnp.clip(g.f_j, 0, F - 1)
        r, Ji, Jj = jax.vmap(_factor_jac)(
            gr.R[i], gr.t[i], gr.R[j], gr.t[j], g.f_Rij, g.f_tij
        )
        w_rot = jnp.where(g.f_valid, g.f_w, 0.0)
        w_tr = jnp.where(g.f_valid, g.f_w if g.f_wt is None else g.f_wt, 0.0)
        wc = jnp.concatenate(
            [jnp.broadcast_to(w_rot[:, None], w_rot.shape + (3,)),
             jnp.broadcast_to(w_tr[:, None], w_tr.shape + (3,))], axis=1
        )  # [M,6] per-component weights
        r = r * wc
        Ji = Ji * wc[:, :, None]
        Jj = Jj * wc[:, :, None]
        H = jnp.zeros((F, 6, F, 6), jnp.float32)
        H = H.at[i, :, i, :].add(jnp.einsum("mci,mcj->mij", Ji, Ji))
        H = H.at[j, :, j, :].add(jnp.einsum("mci,mcj->mij", Jj, Jj))
        Hij = jnp.einsum("mci,mcj->mij", Ji, Jj)
        H = H.at[i, :, j, :].add(Hij)
        H = H.at[j, :, i, :].add(jnp.swapaxes(Hij, 1, 2))
        b = jnp.zeros((F, 6), jnp.float32)
        b = b.at[i].add(jnp.einsum("mci,mc->mi", Ji, r))
        b = b.at[j].add(jnp.einsum("mci,mc->mi", Jj, r))
        cost = jnp.sum(r * r)
        return H.reshape(F6, F6), b.reshape(F6), cost

    def apply(gr, dp):
        d = dp.reshape(F, 6)
        return gr._replace(
            R=jnp.einsum("fij,fjk->fik", gr.R, so3.exp(d[:, :3])),
            t=gr.t + d[:, 3:],
        )

    def body(carry, _):
        gr, lam, cost_prev = carry
        H, b, _ = build(gr)
        A = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-8))
        if fix_first:
            mask = jnp.arange(F6) >= 6
            A = jnp.where(mask[:, None] & mask[None, :], A, 0.0)
            A = A + jnp.diag(jnp.where(mask, 0.0, 1.0))
            b = jnp.where(mask, b, 0.0)
        dp = jnp.linalg.solve(A, -b)
        gr_new = apply(gr, dp)
        _, _, cost_new = build(gr_new)
        accept = cost_new < cost_prev
        gr_out = jax.tree.map(lambda a, c: jnp.where(accept, a, c), gr_new, gr)
        return (gr_out, jnp.where(accept, lam * 0.5, lam * 4.0),
                jnp.where(accept, cost_new, cost_prev)), cost_prev

    _, _, cost0 = build(g)
    (g_fin, _, _), hist = jax.lax.scan(body, (g, jnp.float32(lam0), cost0), None, length=iters)
    return g_fin, hist
