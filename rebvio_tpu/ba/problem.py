"""Inverse-depth bundle adjustment with Schur-complement reduction.

Greenfield backend (SURVEY.md section 2: the reference has no mapping/BA at
all) implementing the BASELINE.json north-star design: keyframe poses +
1-DoF inverse-depth landmarks (the natural extension of REBVO's per-keyline
rho), optimized by damped Gauss-Newton where the landmark block H_ll is
DIAGONAL — so the Schur complement of the camera system reduces to

    S  = H_pp - (B / H_ll)^T B        (one [6F, L] x [L, 6F] MXU matmul)
    δp = (S + λI)^-1 (b_p - (B / H_ll)^T b_l)
    δρ = (b_l - B δp) / (H_ll + λ)    (embarrassingly parallel back-subst.)

All arrays are fixed-shape with validity masks; observation Jacobians come
from vmapped forward-mode autodiff of the reprojection residual.  The
landmark axis is the distribution axis: each device accumulates S, b over its
landmark shard and a single psum reduces the tiny [6F+6F^2] camera system
(see distributed.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rebvio_tpu.geometry import so3


class BAProblem(NamedTuple):
    """Fixed-shape BA problem.

    F keyframes, L landmarks, O observations.
    Landmark l is anchored in keyframe ``anchor_kf[l]`` at normalized image
    ray ``anchor_ray[l]`` (unit-z), with inverse depth ``rho[l]``.
    Observation o sees landmark ``obs_lm[o]`` in keyframe ``obs_kf[o]`` at
    normalized pixel coords ``obs_uv[o]`` (x/z, y/z).
    """

    R: jnp.ndarray            # [F,3,3] world-from-camera rotation
    t: jnp.ndarray            # [F,3] camera position in world
    rho: jnp.ndarray          # [L] inverse depth in anchor frame
    anchor_kf: jnp.ndarray    # [L] int32
    anchor_ray: jnp.ndarray   # [L,3] (x, y, 1) normalized anchor ray
    obs_lm: jnp.ndarray       # [O] int32 (-1 = invalid)
    obs_kf: jnp.ndarray       # [O] int32
    obs_uv: jnp.ndarray       # [O,2] normalized observed coords
    obs_w: jnp.ndarray        # [O] observation weight (1/sigma)
    lm_valid: jnp.ndarray     # [L] bool
    obs_valid: jnp.ndarray    # [O] bool


def _residual_local(dpa, dpb, drho, Ra, ta, Rb, tb, rho, ray, uv):
    """Reprojection residual under local se3/rho perturbations.

    dpa/dpb = (dw[3], dv[3]) right-perturbations of anchor/target poses,
    drho scalar.  Differentiated at zero by jacfwd.
    """
    Ra_p = Ra @ so3.exp(dpa[:3])
    ta_p = ta + dpa[3:]
    Rb_p = Rb @ so3.exp(dpb[:3])
    tb_p = tb + dpb[3:]
    rho_p = rho + drho
    d = 1.0 / rho_p
    Xw = Ra_p @ (ray * d) + ta_p
    Xb = Rb_p.T @ (Xw - tb_p)
    z = Xb[2]
    z_safe = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    return Xb[:2] / z_safe - uv


def _obs_jacobian(Ra, ta, Rb, tb, rho, ray, uv):
    z6 = jnp.zeros((6,), jnp.float32)
    z1 = jnp.zeros((), jnp.float32)
    r = _residual_local(z6, z6, z1, Ra, ta, Rb, tb, rho, ray, uv)
    Ja = jax.jacfwd(_residual_local, argnums=0)(z6, z6, z1, Ra, ta, Rb, tb, rho, ray, uv)
    Jb = jax.jacfwd(_residual_local, argnums=1)(z6, z6, z1, Ra, ta, Rb, tb, rho, ray, uv)
    Jr = jax.jacfwd(_residual_local, argnums=2)(z6, z6, z1, Ra, ta, Rb, tb, rho, ray, uv)
    return r, Ja, Jb, Jr  # [2], [2,6], [2,6], [2]


class BATerms(NamedTuple):
    """Per-shard normal-equation accumulations (everything needed for the
    reduced camera system plus landmark back-substitution)."""

    H_pp: jnp.ndarray   # [F6, F6]
    b_p: jnp.ndarray    # [F6]
    H_ll: jnp.ndarray   # [L]
    b_l: jnp.ndarray    # [L]
    B: jnp.ndarray      # [L, F6]  (pose-landmark coupling, rows per landmark)
    cost: jnp.ndarray   # [] sum of squared residuals
    n_obs: jnp.ndarray  # [] int32


def accumulate_terms(p: BAProblem, huber_delta: float = 0.0) -> BATerms:
    """Build the (masked) normal equations from all observations."""
    F = p.R.shape[0]
    L = p.rho.shape[0]
    F6 = 6 * F

    lm = jnp.clip(p.obs_lm, 0, L - 1)
    kf = jnp.clip(p.obs_kf, 0, F - 1)
    akf = jnp.clip(p.anchor_kf[lm], 0, F - 1)

    r, Ja, Jb, Jr = jax.vmap(_obs_jacobian)(
        p.R[akf], p.t[akf], p.R[kf], p.t[kf], p.rho[lm], p.anchor_ray[lm], p.obs_uv
    )
    ok = p.obs_valid & (p.obs_lm >= 0) & p.lm_valid[lm]
    w = jnp.where(ok, p.obs_w, 0.0)
    if huber_delta > 0:
        rn = jnp.linalg.norm(r, axis=-1)
        w = w * jnp.where(rn > huber_delta, jnp.sqrt(huber_delta / jnp.where(rn > 0, rn, 1.0)), 1.0)
    r = r * w[:, None]
    Ja = Ja * w[:, None, None]
    Jb = Jb * w[:, None, None]
    Jr = Jr * w[:, None]
    r = jnp.where(jnp.isfinite(r), r, 0.0)
    Ja = jnp.where(jnp.isfinite(Ja), Ja, 0.0)
    Jb = jnp.where(jnp.isfinite(Jb), Jb, 0.0)
    Jr = jnp.where(jnp.isfinite(Jr), Jr, 0.0)

    # Per-observation pose jacobian as a [O, 2, F6] one-hot-block structure is
    # avoided: scatter-add the 6x6 products into [F,6,F,6] directly.
    JaTJa = jnp.einsum("oci,ocj->oij", Ja, Ja)
    JbTJb = jnp.einsum("oci,ocj->oij", Jb, Jb)
    JaTJb = jnp.einsum("oci,ocj->oij", Ja, Jb)
    JaTr = jnp.einsum("oci,oc->oi", Ja, r)
    JbTr = jnp.einsum("oci,oc->oi", Jb, r)
    JrTr = jnp.einsum("oc,oc->o", Jr, r)
    JrTJr = jnp.einsum("oc,oc->o", Jr, Jr)
    JaTJr = jnp.einsum("oci,oc->oi", Ja, Jr)
    JbTJr = jnp.einsum("oci,oc->oi", Jb, Jr)

    Hpp = jnp.zeros((F, 6, F, 6), jnp.float32)
    Hpp = Hpp.at[akf, :, akf, :].add(JaTJa)
    Hpp = Hpp.at[kf, :, kf, :].add(JbTJb)
    Hpp = Hpp.at[akf, :, kf, :].add(JaTJb)
    Hpp = Hpp.at[kf, :, akf, :].add(jnp.swapaxes(JaTJb, 1, 2))

    b_p = jnp.zeros((F, 6), jnp.float32)
    b_p = b_p.at[akf].add(JaTr)
    b_p = b_p.at[kf].add(JbTr)

    H_ll = jnp.zeros((L,), jnp.float32).at[lm].add(jnp.where(ok, JrTJr, 0.0))
    b_l = jnp.zeros((L,), jnp.float32).at[lm].add(jnp.where(ok, JrTr, 0.0))

    Bm = jnp.zeros((L, F, 6), jnp.float32)
    Bm = Bm.at[lm, akf, :].add(JaTJr)
    Bm = Bm.at[lm, kf, :].add(JbTJr)

    cost = jnp.sum(jnp.where(ok[:, None], r * r, 0.0))
    return BATerms(
        H_pp=Hpp.reshape(F6, F6), b_p=b_p.reshape(F6),
        H_ll=H_ll, b_l=b_l, B=Bm.reshape(L, F6),
        cost=cost, n_obs=jnp.sum(ok).astype(jnp.int32),
    )


def schur_reduce(terms: BATerms, lam: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reduced camera system (S, rhs) from one shard's terms.

    Landmarks with no observations (H_ll == 0) contribute nothing.
    """
    H_ll_d = terms.H_ll + lam * jnp.maximum(terms.H_ll, 1e-12)  # LM-style scaling
    inv = jnp.where(terms.H_ll > 0, 1.0 / H_ll_d, 0.0)
    Bw = terms.B * inv[:, None]                  # [L, F6]
    S = terms.H_pp - terms.B.T @ Bw              # MXU contraction over L
    rhs = terms.b_p - Bw.T @ terms.b_l
    return S, rhs


def solve_reduced(
    S: jnp.ndarray, rhs: jnp.ndarray, lam: jnp.ndarray, fix_first: bool = True
) -> jnp.ndarray:
    """Solve the damped reduced system for pose updates; gauge fixed by
    clamping keyframe 0 (rows/cols zeroed, identity block)."""
    F6 = S.shape[0]
    D = jnp.diag(jnp.maximum(jnp.diag(S), 1e-8))
    A = S + lam * D
    if fix_first:
        mask = jnp.arange(F6) >= 6
        A = jnp.where(mask[:, None] & mask[None, :], A, 0.0)
        A = A + jnp.diag(jnp.where(mask, 0.0, 1.0))
        rhs = jnp.where(mask, rhs, 0.0)
    dp = jnp.linalg.solve(A, -rhs)
    return dp


def backsub_landmarks(terms: BATerms, dp: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    H_ll_d = terms.H_ll + lam * jnp.maximum(terms.H_ll, 1e-12)
    inv = jnp.where(terms.H_ll > 0, 1.0 / H_ll_d, 0.0)
    return -(terms.b_l + terms.B @ dp) * inv


def apply_update(p: BAProblem, dp: jnp.ndarray, drho: jnp.ndarray,
                 rho_min: float = 1e-4, rho_max: float = 1e3) -> BAProblem:
    F = p.R.shape[0]
    d = dp.reshape(F, 6)
    R_new = jnp.einsum("fij,fjk->fik", p.R, so3.exp(d[:, :3]))
    t_new = p.t + d[:, 3:]
    rho_new = jnp.clip(p.rho + drho, rho_min, rho_max)
    return p._replace(R=R_new, t=t_new, rho=rho_new)


@partial(jax.jit, static_argnames=("iters", "fix_first", "huber_delta"))
def optimize(
    p: BAProblem,
    iters: int = 10,
    lam0: float = 1e-3,
    fix_first: bool = True,
    huber_delta: float = 0.0,
) -> Tuple[BAProblem, jnp.ndarray]:
    """Damped Gauss-Newton with accept/reject (Levenberg-Marquardt style).

    Returns (optimized problem, [iters] cost history).
    """

    def body(carry, _):
        p, lam, cost_prev = carry
        terms = accumulate_terms(p, huber_delta)
        S, rhs = schur_reduce(terms, lam)
        dp = solve_reduced(S, rhs, lam, fix_first)
        drho = backsub_landmarks(terms, dp, lam)
        p_new = apply_update(p, dp, drho)
        cost_new = accumulate_terms(p_new, huber_delta).cost
        accept = cost_new < cost_prev
        p_out = jax.tree.map(lambda a, b: jnp.where(accept, a, b), p_new, p)
        lam_out = jnp.where(accept, lam * 0.5, lam * 4.0)
        cost_out = jnp.where(accept, cost_new, cost_prev)
        return (p_out, lam_out, cost_out), cost_out

    cost0 = accumulate_terms(p, huber_delta).cost
    (p_fin, _, _), hist = jax.lax.scan(
        body, (p, jnp.float32(lam0), cost0), None, length=iters
    )
    return p_fin, hist
