import time
import numpy as np
import jax, jax.numpy as jnp
from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.ops import distance_field as DF
from rebvio_tpu.ops.pallas_kernels import nn_field_pallas
from tests.helpers import make_random_map

config = PipelineConfig()
H, W = config.camera.rows, config.camera.cols
kmax = config.detector.keylines_max
rng = np.random.RandomState(0)
em, d = make_random_map(rng, 12000, kmax, H, W)
R = int(config.core.search_range)

want = np.asarray(DF.build_nn_field(em, R, H, W))
try:
    got = np.asarray(nn_field_pallas(em, R, H, W))
    print("pallas ran; equal:", np.array_equal(got, want), "ndiff:", int((got != want).sum()))
except Exception as e:
    print("pallas FAILED:", type(e).__name__, str(e)[:500])
    raise SystemExit(0)

def bench(name, fn, n=30):
    out = fn(); np.asarray(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        np.asarray(out)
        best = min(best, (time.perf_counter()-t0)/n)
    print(f"{name:24s} {best*1e3:8.3f} ms")

bench("xla jfa", lambda: DF.build_nn_field(em, R, H, W))
bench("pallas jfa", lambda: nn_field_pallas(em, R, H, W))
