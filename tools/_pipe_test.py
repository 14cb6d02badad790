import time, sys
import numpy as np
import jax, jax.numpy as jnp
from rebvio_tpu import types as T
from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.ops.imu import pack_imu_window
from rebvio_tpu.pipeline import frontend_matrices, step_chunk, step_chunk_pipelined

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
cpu = len(sys.argv) > 2 and sys.argv[2] == "cpu"
if cpu:
    jax.config.update("jax_platforms", "cpu")
config = PipelineConfig()
cam = config.camera
mats = frontend_matrices(config)
seq = synthetic.generate(cam, n_frames=N, seed=0)
frames = jnp.asarray(np.stack([seq.images[i] * config.image_gain for i in range(N)]).astype(np.float32))
windows = []
cursor = 0
for i in range(N):
    j = cursor
    while j < len(seq.imu_ts_us) and seq.imu_ts_us[j] <= seq.ts_us[i]:
        j += 1
    windows.append(pack_imu_window(seq.imu_gyro[cursor:j], seq.imu_acc[cursor:j], seq.imu_ts_us[cursor:j], config.imu.sample_max))
    cursor = j
imu_b = jax.tree.map(lambda *xs: jnp.stack(xs), *windows)
dts = jnp.full((N,), 0.05, jnp.float32)

s0 = T.init_vio_state(config)
sA, oA = step_chunk(s0, frames, imu_b, dts, config, mats)
sB, oB = step_chunk_pipelined(s0, frames, imu_b, dts, config, mats)
pa, pb = np.asarray(oA.position), np.asarray(oB.position)
print("pos close:", np.allclose(pa, pb, rtol=1e-4, atol=1e-5),
      "max diff:", float(np.abs(pa - pb).max()))
print("matches:", np.asarray(oA.num_matches).tolist())
print("matches:", np.asarray(oB.num_matches).tolist())

if not cpu:
    def bench(name, fn):
        s, o = fn(s0)
        np.asarray(o.position)
        t0 = time.perf_counter(); np.asarray(o.position); rtt = time.perf_counter()-t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            s2 = s0
            for _ in range(6):
                s2, o = fn(s2)
            np.asarray(o.position)
            best = min(best, (time.perf_counter()-t0-rtt)/6)
        print(f"{name}: {best*1e3:.2f} ms = {best/N*1e3:.2f} ms/frame = {N/best:.1f} fps")
    bench("chunk      ", lambda s: step_chunk(s, frames, imu_b, dts, config, mats))
    bench("pipelined  ", lambda s: step_chunk_pipelined(s, frames, imu_b, dts, config, mats))
