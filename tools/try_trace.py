import numpy as np, jax, jax.numpy as jnp
from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.pipeline import frontend_matrices, step
from rebvio_tpu.ops.imu import pack_imu_window
from rebvio_tpu import types as T

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
    windows.append(pack_imu_window(seq.imu_gyro[cursor:j], seq.imu_acc[cursor:j],
                                   seq.imu_ts_us[cursor:j], config.imu.sample_max))
    cursor = j
dt = jnp.float32(0.05)
state = T.init_vio_state(config)
for i in range(6):
    state, odo = step(state, frames[i], windows[i], dt, config, mats)
np.asarray(odo.position)
with jax.profiler.trace("/tmp/jaxtrace"):
    for i in range(3):
        state, odo = step(state, frames[7], windows[7], dt, config, mats)
    np.asarray(odo.position)
print("trace done")
