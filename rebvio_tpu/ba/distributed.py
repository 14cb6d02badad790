"""Distributed bundle adjustment: landmark-sharded Schur reduction over a mesh.

The BASELINE.json north star: partition the map (landmarks + their
observations) across devices/hosts, accumulate each shard's contribution to
the reduced camera system, and combine with a single ``psum`` over ICI.  The
camera system is tiny ([6F, 6F]); everything heavy — Jacobians, landmark
blocks, the [6F, L_shard] x [L_shard, 6F] contraction — stays local to the
shard.  Per GN iteration exactly one all-reduce of 6F*(6F+1) floats crosses
the interconnect, so scaling efficiency is bandwidth-trivial.

Sharding contract: the L (landmark) and O (observation) axes are sharded;
observations must be co-located with their landmarks (the host-side builder
``shard_problem`` repartitions accordingly).  Poses are replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rebvio_tpu.ba import problem as bap


def shard_problem(p: bap.BAProblem, n_shards: int) -> bap.BAProblem:
    """Host-side repartition: pad L and O to multiples of n_shards and
    reorder observations so each landmark's observations live in the same
    shard as the landmark (contiguous blocks)."""
    L = p.rho.shape[0]
    O = p.obs_lm.shape[0]
    Lp = ((L + n_shards - 1) // n_shards) * n_shards
    per_shard_L = Lp // n_shards

    lm = np.asarray(p.obs_lm)
    valid_o = np.asarray(p.obs_valid) & (lm >= 0)
    shard_of_lm = np.arange(Lp) // per_shard_L

    # bucket observations by shard of their landmark
    obs_shard = np.where(valid_o, shard_of_lm[np.clip(lm, 0, Lp - 1)], -1)
    counts = [int((obs_shard == s).sum()) for s in range(n_shards)]
    per_shard_O = max(counts) if counts else 1
    Op = per_shard_O * n_shards

    def gather_obs(arr, fill):
        arr = np.asarray(arr)
        out = np.full((n_shards, per_shard_O) + arr.shape[1:], fill, arr.dtype)
        for s in range(n_shards):
            sel = np.nonzero(obs_shard == s)[0]
            out[s, : len(sel)] = arr[sel]
        return out.reshape((Op,) + arr.shape[1:])

    def pad_lm(arr, fill):
        arr = np.asarray(arr)
        out = np.full((Lp,) + arr.shape[1:], fill, arr.dtype)
        out[:L] = arr
        return out

    return bap.BAProblem(
        R=p.R, t=p.t,
        rho=jnp.asarray(pad_lm(p.rho, 1.0)),
        anchor_kf=jnp.asarray(pad_lm(p.anchor_kf, 0)),
        anchor_ray=jnp.asarray(pad_lm(p.anchor_ray, 0.0)),
        obs_lm=jnp.asarray(gather_obs(p.obs_lm, -1)),
        obs_kf=jnp.asarray(gather_obs(p.obs_kf, 0)),
        obs_uv=jnp.asarray(gather_obs(p.obs_uv, 0.0)),
        obs_w=jnp.asarray(gather_obs(p.obs_w, 0.0)),
        lm_valid=jnp.asarray(pad_lm(p.lm_valid, False)),
        obs_valid=jnp.asarray(gather_obs(p.obs_valid, False)),
    )


def _shard_specs(mesh: Mesh):
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P("lm"))
    return bap.BAProblem(
        R=rep, t=rep,
        rho=shd, anchor_kf=shd, anchor_ray=shd,
        obs_lm=shd, obs_kf=shd, obs_uv=shd, obs_w=shd,
        lm_valid=shd, obs_valid=shd,
    )


def place(p: bap.BAProblem, mesh: Mesh) -> bap.BAProblem:
    specs = _shard_specs(mesh)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), p, specs)


def make_distributed_optimize(mesh: Mesh, iters: int = 10, huber_delta: float = 0.0):
    """Returns a jitted optimizer running the landmark-sharded GN loop.

    Inside shard_map each device sees its landmark/observation shard with
    replicated poses; the only cross-device communication is the psum of
    (S, rhs, cost) per iteration.
    """
    from jax import shard_map

    pspec = bap.BAProblem(
        R=P(), t=P(),
        rho=P("lm"), anchor_kf=P("lm"), anchor_ray=P("lm"),
        obs_lm=P("lm"), obs_kf=P("lm"), obs_uv=P("lm"), obs_w=P("lm"),
        lm_valid=P("lm"), obs_valid=P("lm"),
    )

    def local_iter(p_local: bap.BAProblem, lam, cost_prev):
        # Shard-local landmark indices: obs_lm are global; rebase them.
        li = jax.lax.axis_index("lm")
        Lsh = p_local.rho.shape[0]
        base = li * Lsh
        p_rebased = p_local._replace(
            obs_lm=jnp.where(p_local.obs_lm >= 0, p_local.obs_lm - base, -1)
        )
        terms = bap.accumulate_terms(p_rebased, huber_delta)
        S, rhs = bap.schur_reduce(terms, lam)
        S = jax.lax.psum(S, "lm")
        rhs = jax.lax.psum(rhs, "lm")
        dp = bap.solve_reduced(S, rhs, lam, fix_first=True)
        drho = bap.backsub_landmarks(terms, dp, lam)
        p_new = bap.apply_update(p_rebased, dp, drho)
        cost_new = jax.lax.psum(bap.accumulate_terms(p_new, huber_delta).cost, "lm")
        accept = cost_new < cost_prev
        p_out = jax.tree.map(lambda a, b: jnp.where(accept, a, b), p_new, p_rebased)
        # restore global obs_lm for the carried state
        p_out = p_out._replace(
            obs_lm=jnp.where(p_out.obs_lm >= 0, p_out.obs_lm + base, -1)
        )
        lam_out = jnp.where(accept, lam * 0.5, lam * 4.0)
        cost_out = jnp.where(accept, cost_new, cost_prev)
        return p_out, lam_out, cost_out

    def sharded_fn(p: bap.BAProblem):
        def body(carry, _):
            p, lam, cost = carry
            p, lam, cost = local_iter(p, lam, cost)
            return (p, lam, cost), cost

        li = jax.lax.axis_index("lm")
        Lsh = p.rho.shape[0]
        p0 = p._replace(obs_lm=jnp.where(p.obs_lm >= 0, p.obs_lm - li * Lsh, -1))
        cost0 = jax.lax.psum(bap.accumulate_terms(p0, huber_delta).cost, "lm")
        (p_fin, _, _), hist = jax.lax.scan(
            body, (p, jnp.float32(1e-3), cost0), None, length=iters
        )
        return p_fin, hist

    fn = shard_map(
        sharded_fn, mesh=mesh,
        in_specs=(pspec,),
        out_specs=(pspec, P()),
        check_vma=False,
    )
    return jax.jit(fn)
