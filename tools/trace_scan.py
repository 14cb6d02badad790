import numpy as np, jax, jax.numpy as jnp
from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.pipeline import frontend_matrices, step_chunk
from rebvio_tpu.ops.imu import pack_imu_window
from rebvio_tpu import types as T

config = PipelineConfig()
cam = config.camera
mats = frontend_matrices(config)
NF = 8
seq = synthetic.generate(cam, n_frames=NF, seed=0)
frames_b = jnp.stack([jnp.asarray(seq.images[i] * config.image_gain) for i in range(NF)])
windows = []
cursor = 0
for i in range(NF):
    j = cursor
    while j < len(seq.imu_ts_us) and seq.imu_ts_us[j] <= seq.ts_us[i]:
        j += 1
    windows.append(pack_imu_window(seq.imu_gyro[cursor:j], seq.imu_acc[cursor:j],
                                   seq.imu_ts_us[cursor:j], config.imu.sample_max))
    cursor = j
imu_b = jax.tree.map(lambda *xs: jnp.stack(xs), *windows)
dts = jnp.full((NF,), 0.05, jnp.float32)
s = T.init_vio_state(config)
s, odos = step_chunk(s, frames_b, imu_b, dts, config, mats)
np.asarray(odos.position)
with jax.profiler.trace("/tmp/jaxtrace_scan"):
    s, odos = step_chunk(s, frames_b, imu_b, dts, config, mats)
    np.asarray(odos.position)
print("done")
