"""Measure batched (vmapped) step throughput on one chip."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from rebvio_tpu import types as T
from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.ops.imu import pack_imu_window
from rebvio_tpu.pipeline import frontend_matrices, step
from rebvio_tpu.parallel.batch import batched_step, init_batched_state

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
config = PipelineConfig()
cam = config.camera
seq = synthetic.generate(cam, n_frames=4, seed=0)
frames1 = [np.asarray(seq.images[i] * config.image_gain) for i in range(4)]
windows = []
cursor = 0
for i in range(4):
    j = cursor
    while j < len(seq.imu_ts_us) and seq.imu_ts_us[j] <= seq.ts_us[i]:
        j += 1
    windows.append(pack_imu_window(seq.imu_gyro[cursor:j], seq.imu_acc[cursor:j], seq.imu_ts_us[cursor:j], config.imu.sample_max))
    cursor = j

frames_b = [jnp.asarray(np.broadcast_to(f, (B,) + f.shape)) for f in frames1]
imu_b = [jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), w) for w in windows]
dt_b = jnp.full((B,), 0.05, jnp.float32)

states = init_batched_state(config, B)
s = states
for i in range(3):
    s, odo = batched_step(s, frames_b[i % 4], imu_b[i % 4], dt_b, config)
np.asarray(odo.position)
t0 = time.perf_counter(); np.asarray(odo.position); rtt = time.perf_counter() - t0
n = 20
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    for i in range(n):
        s, odo = batched_step(s, frames_b[i % 4], imu_b[i % 4], dt_b, config)
    np.asarray(odo.position)
    best = min(best, (time.perf_counter() - t0 - rtt) / n)
print(f"batch={B}: {best*1e3:.2f} ms/step = {B/best:.1f} frames/s/chip")
