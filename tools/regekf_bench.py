"""Micro A/B of the regularize+EKF stage at parity geometry on TPU.

Chained through a state perturbation to amortize the dispatch floor.
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.ops import edge_detect, tracker, matching
from rebvio_tpu.pipeline import frontend_matrices, step
from rebvio_tpu.ops.imu import pack_imu_window
from rebvio_tpu import types as T

CHAIN = 32
def fence(x): np.asarray(x)

def timeit(fn, n=4, repeats=3):
    out = fn(); fence(out)
    t0 = time.perf_counter(); fence(out); rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n): out = fn()
        fence(out)
        best = min(best, (time.perf_counter() - t0 - rtt) / n)
    return best

def main():
    config = PipelineConfig()
    cam = config.camera
    mats = frontend_matrices(config)
    n_frames = 8
    seq = synthetic.generate(cam, n_frames=n_frames, seed=0)
    frames = [jnp.asarray(seq.images[i] * config.image_gain) for i in range(n_frames)]
    windows = []
    cursor = 0
    for i in range(n_frames):
        j = cursor
        while j < len(seq.imu_ts_us) and seq.imu_ts_us[j] <= seq.ts_us[i]:
            j += 1
        windows.append(pack_imu_window(seq.imu_gyro[cursor:j], seq.imu_acc[cursor:j],
                                       seq.imu_ts_us[cursor:j], config.imu.sample_max))
        cursor = j
    dt = jnp.float32(0.05)
    state = T.init_vio_state(config)
    for i in range(7):
        state, odo = step(state, frames[i], windows[i], dt, config, mats)
    em = state.edge_map
    fence(em.rho)
    vel = jnp.asarray([0.01, -0.005, 0.02], jnp.float32)
    thr = config.edge_map.regularization_threshold

    def chain(fn):
        @jax.jit
        def chained(m):
            def body(_, carry):
                rho, acc = carry
                m2 = fn(m.replace(rho=rho))
                s = m2.rho.sum() + m2.sigma_rho.sum()
                return rho * (1.0 + 1e-12 * s), acc + s
            rho, acc = jax.lax.fori_loop(0, CHAIN, body, (m.rho, jnp.float32(0)))
            return acc
        return chained

    # full fused stage
    f_full = chain(lambda m: tracker.regularize_and_update_depth(m, vel, thr, config.core, cam))
    # unfused XLA
    f_unf = chain(lambda m: tracker.update_inverse_depth(
        matching.regularize_1iter(m, thr), vel, config.core, cam))
    # gather-only prefix
    def gather_only(m):
        kmax = m.kmax
        nx = jnp.clip(m.id_next, 0, kmax - 1)
        pv = jnp.clip(m.id_prev, 0, kmax - 1)
        pack = jnp.concatenate(
            [m.rho[:, None], m.sigma_rho[:, None], m.grad,
             m.grad_norm[:, None], jnp.zeros((kmax, 3), jnp.float32)], axis=-1)
        rows2 = pack[jnp.stack([nx, pv])]
        return m.replace(rho=m.rho + 1e-20 * rows2.sum())
    f_g = chain(gather_only)
    floor = chain(lambda m: m.replace(rho=m.rho * 1.0))

    t_floor = timeit(lambda: floor(em))
    t_g = timeit(lambda: f_g(em))
    t_full = timeit(lambda: f_full(em))
    t_unf = timeit(lambda: f_unf(em))
    print(f"chain floor        : {t_floor/CHAIN*1e6:7.1f} us/link")
    print(f"gather only        : {(t_g-t_floor)/CHAIN*1e6:7.1f} us")
    print(f"fused pallas stage : {(t_full-t_floor)/CHAIN*1e6:7.1f} us")
    print(f"unfused XLA stage  : {(t_unf-t_floor)/CHAIN*1e6:7.1f} us")

if __name__ == "__main__":
    main()
