import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from rebvio_tpu import types as T
from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.ops.imu import pack_imu_window
from rebvio_tpu.pipeline import frontend_matrices, step
from rebvio_tpu.ops import matching

config = PipelineConfig()
cam = config.camera
mats = frontend_matrices(config)
seq = synthetic.generate(cam, n_frames=8, seed=0)
frames = [jnp.asarray(seq.images[i] * config.image_gain) for i in range(8)]
windows = []
cursor = 0
for i in range(8):
    j = cursor
    while j < len(seq.imu_ts_us) and seq.imu_ts_us[j] <= seq.ts_us[i]:
        j += 1
    windows.append(pack_imu_window(seq.imu_gyro[cursor:j], seq.imu_acc[cursor:j], seq.imu_ts_us[cursor:j], config.imu.sample_max))
    cursor = j
dt = jnp.float32(0.05)
state = T.init_vio_state(config)
for i in range(6):
    state, odo = step(state, frames[i], windows[i], dt, config, mats)
np.asarray(odo.position)
em = state.edge_map

def msum(m):
    return m.rho.sum() + m.sigma_rho.sum()

def bench(name, fn, *args, n=30):
    out = fn(*args); np.asarray(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter()-t0)/n)
    print(f"{name:30s} {best*1e3:8.3f} ms")

@jax.jit
def f_full(m):
    return msum(matching.regularize_1iter(m, 0.5))

@jax.jit
def f_gather_only(m):
    kmax = m.kmax
    nx = jnp.clip(m.id_next, 0, kmax-1)
    pv = jnp.clip(m.id_prev, 0, kmax-1)
    pack = jnp.concatenate([m.rho[:,None], m.sigma_rho[:,None], m.grad, m.grad_norm[:,None], jnp.zeros((kmax,3), jnp.float32)], axis=-1)
    return pack[nx].sum() + pack[pv].sum()

@jax.jit
def f_gather_one(m):
    kmax = m.kmax
    nx = jnp.clip(m.id_next, 0, kmax-1)
    pack = jnp.concatenate([m.rho[:,None], m.sigma_rho[:,None], m.grad, m.grad_norm[:,None], jnp.zeros((kmax,3), jnp.float32)], axis=-1)
    return pack[nx].sum()

@jax.jit
def f_idx_only(m):
    kmax = m.kmax
    nx = jnp.clip(m.id_next, 0, kmax-1)
    return m.rho[nx].sum()

@jax.jit
def f_elem(m):
    kmax = m.kmax
    r = jnp.roll(m.rho, 1); s = jnp.roll(m.sigma_rho, 1)
    return (r*s + m.grad_norm).sum()

bench("regularize full", f_full, em)
bench("2 packed gathers", f_gather_only, em)
bench("1 packed gather", f_gather_one, em)
bench("1 scalar gather rho[nx]", f_idx_only, em)
bench("elementwise only", f_elem, em)
