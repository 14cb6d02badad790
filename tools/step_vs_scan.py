"""Single-dispatch step time vs per-frame time inside the 32-frame scan."""
import time
import numpy as np
import jax, jax.numpy as jnp

from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.pipeline import frontend_matrices, step, step_chunk
from rebvio_tpu.ops.imu import pack_imu_window
from rebvio_tpu import types as T

def fence(x): np.asarray(x)

def timeit(fn, n=8, repeats=3):
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
    NF = 32
    seq = synthetic.generate(cam, n_frames=NF, seed=0)
    frames = [jnp.asarray(seq.images[i] * config.image_gain) for i in range(NF)]
    windows = []
    cursor = 0
    for i in range(NF):
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
    fence(odo.position)

    @jax.jit
    def step_scalar(st, fr, imu_d):
        s2, odo = step(st, fr, imu_d, dt, config, mats)
        return odo.position.sum() + s2.edge_map.rho.sum() + s2.K

    t1 = timeit(lambda: step_scalar(state, frames[7], windows[7]), n=20)
    print(f"single step (scalar out): {t1*1e3:7.3f} ms")

    frames_b = jnp.stack(frames)
    imu_b = jax.tree.map(lambda *xs: jnp.stack(xs), *windows)
    dts = jnp.full((NF,), 0.05, jnp.float32)
    s = T.init_vio_state(config)
    s, odos = step_chunk(s, frames_b, imu_b, dts, config, mats)
    fence(odos.position)
    def run():
        nonlocal s
        s, o = step_chunk(s, frames_b, imu_b, dts, config, mats)
        return o.position
    t2 = timeit(run, n=2)
    print(f"scan {NF}-chunk        : {t2*1e3:7.2f} ms = {t2/NF*1e3:7.3f} ms/frame")

if __name__ == "__main__":
    main()
