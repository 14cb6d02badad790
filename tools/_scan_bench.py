"""Scan-chunk throughput vs per-step dispatch."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from rebvio_tpu import types as T
from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.ops.imu import pack_imu_window
from rebvio_tpu.pipeline import frontend_matrices, step, step_chunk

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
config = PipelineConfig()
cam = config.camera
mats = frontend_matrices(config)
seq = synthetic.generate(cam, n_frames=N, seed=0)
frames = np.stack([seq.images[i] * config.image_gain for i in range(N)]).astype(np.float32)
windows = []
cursor = 0
for i in range(N):
    j = cursor
    while j < len(seq.imu_ts_us) and seq.imu_ts_us[j] <= seq.ts_us[i]:
        j += 1
    windows.append(pack_imu_window(seq.imu_gyro[cursor:j], seq.imu_acc[cursor:j], seq.imu_ts_us[cursor:j], config.imu.sample_max))
    cursor = j
imu_b = jax.tree.map(lambda *xs: jnp.stack(xs), *windows)
frames_d = jnp.asarray(frames)
dts = jnp.full((N,), 0.05, jnp.float32)

state0 = T.init_vio_state(config)
# warmup (donation: need fresh state each call)
s, odos = step_chunk(state0, frames_d, imu_b, dts, config, mats)
np.asarray(odos.position)
s, odos = step_chunk(s, frames_d, imu_b, dts, config, mats)
np.asarray(odos.position)
t0 = time.perf_counter(); np.asarray(odos.position); rtt = time.perf_counter() - t0
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(10):
        s, odos = step_chunk(s, frames_d, imu_b, dts, config, mats)
    np.asarray(odos.position)
    best = min(best, (time.perf_counter() - t0 - rtt) / 10)
print(f"chunk N={N}: {best*1e3:.2f} ms = {best/N*1e3:.2f} ms/frame = {N/best:.1f} fps")
