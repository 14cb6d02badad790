import time
import numpy as np
import jax, jax.numpy as jnp
from rebvio_tpu.camera import Undistorter
from rebvio_tpu.configs import CameraConfig

def fence(x): np.asarray(x)

def timeit(fn, n=20, repeats=3):
    out = fn(); fence(out)
    t0 = time.perf_counter(); fence(out); rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n): out = fn()
        fence(out)
        best = min(best, (time.perf_counter() - t0 - rtt) / n)
    return best

cam = CameraConfig()
und = Undistorter(cam, gain=3.0)
raw = jax.device_put(np.random.RandomState(0).randint(0, 256, (480, 752), dtype=np.uint8))
fence(raw)
f = jax.jit(lambda r: und(r).sum())
t = timeit(lambda: f(raw))
print(f"u8 undistort (chunked): {t*1e3:7.3f} ms (incl dispatch floor)")
