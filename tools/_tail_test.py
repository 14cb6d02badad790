import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from rebvio_tpu import types as T
from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.geometry import linalg, so3
from rebvio_tpu.ops import matching, sab, imu as imu_ops
from rebvio_tpu.ops.imu import pack_imu_window
from rebvio_tpu.pipeline import frontend_matrices, step

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
state = T.init_vio_state(config)
for i in range(6):
    state, odo = step(state, frames[i], windows[i], jnp.float32(0.05), config, mats)
np.asarray(odo.position)
old_map = state.edge_map
new_map = state.edge_map  # same shape; fine for timing

def bench(name, fn, *args, n=30):
    out = fn(*args); np.asarray(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter()-t0)/n)
    print(f"{name:34s} {best*1e3:8.3f} ms")

# dispatch floor
@jax.jit
def floor_fn(m):
    return m.rho.sum()
bench("dispatch floor", floor_fn, old_map)

# tube matcher A/B over probes
V = jnp.asarray([0.01, 0.0, 0.02], jnp.float32)
PV = jnp.eye(3, dtype=jnp.float32) * 1e-4
Rg = jnp.eye(3, dtype=jnp.float32)
for p in (4, 6, 8):
    @partial(jax.jit, static_argnames=("np_",))
    def f_tube(nm, om, np_=p):
        m2, klm = matching.directed_match_tube(nm, om, V, PV, Rg, config.edge_map, config.core, cam, n_probes=np_)
        return m2.rho.sum() + m2.match_id.sum().astype(jnp.float32) + klm
    bench(f"directed_match_tube probes={p}", f_tube, new_map, old_map)

# SAB estimate_bias with varying iters
ist = state.imu_state
sst = state.sab_state
eye3 = jnp.eye(3, dtype=jnp.float32)
As = jnp.asarray([0.1, -9.8, 0.2], jnp.float32)
Av = jnp.asarray([0.12, -9.7, 0.18], jnp.float32)
R = jnp.eye(3, dtype=jnp.float32)
P_W = eye3 * 1e-4
W_X = jnp.eye(6, dtype=jnp.float32) * 1e4
Xvw = jnp.zeros(6, jnp.float32)
import inspect
sig = inspect.signature(sab.estimate_bias)
print("estimate_bias params:", list(sig.parameters))

@jax.jit
def f_sab(X, P, PKp):
    out = sab.estimate_bias(As, Av, jnp.float32(1.0), R, X, P, eye3*1e-4, P_W,
                            eye3*1e-6, PKp, jnp.float32(1e-4), eye3*4e-4,
                            eye3*1e-6, W_X, Xvw, jnp.float32(9.81))
    return out.K + out.X.sum() + out.P.sum() + out.Xvw.sum()
bench("sab.estimate_bias (20 GN)", f_sab, sst.X, sst.P, state.P_Kp)

# acceleration estimators
@jax.jit
def f_acc(v, R_, vh, dh, ah):
    Av_, vh2, dh2 = imu_ops.estimate_ls4_acceleration(v, R_, jnp.float32(0.05), vh, dh)
    As_, ah2 = imu_ops.estimate_mean_acceleration(v, R_, ah)
    return Av_.sum() + As_.sum() + vh2.sum() + dh2.sum() + ah2.sum()
bench("acc estimators", f_acc, V, R, ist.vel_hist, ist.dt_hist, ist.acc_hist)
