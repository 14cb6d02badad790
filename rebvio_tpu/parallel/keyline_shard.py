"""Keyline-sharded tracking: the LM translation tracker over a device mesh.

SURVEY.md §2's greenfield parallelism table calls for keyline-sharded kernel
parallelism: partition the [KMAX] keyline axis across devices and psum the
partial JtJ/JtF/score reductions.  The dense per-pixel structures (the
nearest-field id image and the target map) are replicated; each device runs
the full masked tryVel pass on its keyline shard and one 21-float psum
(3x3 JtJ + 3 JtF + score) per LM evaluation crosses the interconnect — the
communication-optimal decomposition for this kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rebvio_tpu import types as T
from rebvio_tpu.configs import CameraConfig, CoreConfig
from rebvio_tpu.geometry import linalg
from rebvio_tpu.ops import tracker


def make_kl_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), axis_names=("kl",))


def _edge_map_specs(shard_keylines: bool):
    kl = P("kl") if shard_keylines else P()
    return T.EdgeMap(
        pos=kl, pos_img=kl, match_pos_img=kl, grad=kl, match_grad=kl,
        grad_norm=kl, match_grad_norm=kl, rho=kl, sigma_rho=kl,
        id_prev=kl, id_next=kl, match_id=kl, match_id_forward=kl,
        match_id_keyframe=kl, matches=kl, valid=kl,
        count=P(), kl_id_img=P(), att_img=P(), threshold=P(),
    )


def _quantile_sharded(em: T.EdgeMap, percentile: float, num_bins: int, axis: str):
    """estimate_quantile with the histogram psum-reduced over the mesh."""
    span = T.RHO_MAX - T.RHO_MIN
    b = (num_bins * (em.sigma_rho - T.RHO_MIN) / span).astype(jnp.int32)
    b = jnp.clip(b, 0, num_bins - 1)
    onehot = (b[:, None] == jnp.arange(num_bins)[None, :]) & em.valid[:, None]
    hist = jnp.sum(onehot.astype(jnp.int32), axis=0)
    hist = jax.lax.psum(hist, axis)
    count = jax.lax.psum(jnp.sum(em.valid.astype(jnp.int32)), axis)
    csum = jnp.cumsum(hist)
    prefix = jnp.concatenate([jnp.zeros((1,), jnp.int32), csum[:-1]])
    cut = percentile * count.astype(jnp.float32)
    found = prefix.astype(jnp.float32) > cut
    i = jnp.argmax(found)
    val = i.astype(jnp.float32) * span / num_bins + T.RHO_MIN
    return jnp.where(jnp.any(found), val, jnp.float32(1e3))


def make_minimize_vel_sharded(mesh: Mesh, cfg: CoreConfig, cam: CameraConfig,
                              field_scale: int = 1, use_att: bool = False):
    """Returns a jitted (old_map_sharded, new_map_repl, field) ->
    (vel, Rvel, old_map_sharded, score) function.

    With ``use_att`` the replicated ``field`` argument is the [8,N]
    nearest-keyline attribute-plane field (distance_field.build_att_field)
    and each
    device runs the product single-gather/Pallas-hybrid tryVel on its keyline
    shard — the same configuration as the unsharded pipeline (df_mode="jfa",
    configs.py); otherwise it is the [N] id field (two chained gathers)."""

    old_spec = _edge_map_specs(True)
    new_spec = _edge_map_specs(False)

    def fn(old: T.EdgeMap, new: T.EdgeMap, field: jnp.ndarray):
        sigma_rho_min = _quantile_sharded(old, cfg.quantile_cutoff, cfg.quantile_num_bins, "kl")
        residuals = jnp.zeros((old.valid.shape[0],), jnp.float32)
        if use_att:
            # [8,N] planes -> [N,8] rows once, outside the LM loop
            att_f, new_pack, field_f = field.T, None, None
        else:
            att_f, new_pack, field_f = None, tracker.pack_target_fields(new), field.astype(jnp.float32)

        def eval_vel(vel, residuals):
            out = tracker.try_vel(
                old, new, field, vel, sigma_rho_min, residuals, cfg, cam,
                new_pack, field_f, field_scale, att_f,
            )
            score = jax.lax.psum(out.score, "kl")
            JtJ = jax.lax.psum(out.JtJ, "kl")
            JtF = jax.lax.psum(out.JtF, "kl")
            return score, JtJ, JtF, out.residuals, out.match_id_forward

        vel = jnp.zeros(3, jnp.float32)
        F, JtJ, JtF, residuals, mif = eval_vel(vel, residuals)
        u = 1e-3 * jnp.max(JtJ)
        v = jnp.float32(2.0)

        def lm_iter(_, carry):
            vel, F, JtJ, JtF, u, v, residuals, mif = carry
            ApI = JtJ + jnp.eye(3, dtype=jnp.float32) * u
            h = linalg.invert3(ApI) @ (-JtF)
            vel_new = vel + h
            F2, JtJ2, JtF2, residuals, mif = eval_vel(vel_new, residuals)
            gain = (F - F2) / (0.5 * jnp.dot(h, u * h - JtF))
            accept = gain > 0.0
            F = jnp.where(accept, F2, F)
            vel = jnp.where(accept, vel_new, vel)
            JtJ = jnp.where(accept, JtJ2, JtJ)
            JtF = jnp.where(accept, JtF2, JtF)
            u = jnp.where(accept, u * jnp.maximum(0.33, 1.0 - (2.0 * gain - 1.0) ** 3), u * v)
            v = jnp.where(accept, 2.0, v * 2.0)
            return (vel, F, JtJ, JtF, u, v, residuals, mif)

        vel, F, JtJ, JtF, u, v, residuals, mif = jax.lax.fori_loop(
            0, cfg.iterations, lm_iter, (vel, F, JtJ, JtF, u, v, residuals, mif)
        )
        Rvel = linalg.invert3(JtJ)
        old_out = old.replace(match_id_forward=mif)
        return vel, Rvel, old_out, F

    sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(old_spec, new_spec, P()),
        out_specs=(P(), P(), old_spec, P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_edge_map(em: T.EdgeMap, mesh: Mesh, shard_keylines: bool = True) -> T.EdgeMap:
    specs = _edge_map_specs(shard_keylines)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), em, specs
    )
