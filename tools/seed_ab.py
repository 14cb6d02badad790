"""A/B seeding variants for the att field at parity geometry (TPU).

Times jitted scalar-output fns with readback fencing, profile_stages-style
(one dispatch per call; the ~0.5-1 ms dispatch floor is common to all
variants, so DELTAS between variants are floor-free).
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.ops import edge_detect, distance_field as DF
from rebvio_tpu.pipeline import frontend_matrices

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

def main():
    config = PipelineConfig()
    cam = config.camera
    mats = frontend_matrices(config)
    seq = synthetic.generate(cam, n_frames=2, seed=0)
    frame = jnp.asarray(seq.images[1] * config.image_gain)
    fence(frame)
    thr = jnp.float32(0.01)

    @jax.jit
    def det_scatter(fr):
        m = edge_detect.detect(fr, thr, mats, config.detector, cam, field_scale=2)
        att = DF.build_att_field(m, 40, cam.rows, cam.cols, 2)
        return m.pos.sum() + m.grad.sum() + att[1].sum()

    @jax.jit
    def det0(fr):
        m = edge_detect.detect(fr, thr, mats, config.detector, cam, field_scale=2)
        return m.pos.sum() + m.grad.sum()

    t0 = timeit(lambda: det0(frame))
    t2 = timeit(lambda: det_scatter(frame))
    print(f"detect only          : {t0*1e3:7.3f} ms")
    print(f"detect+att (product) : {t2*1e3:7.3f} ms   (delta {(t2-t0)*1e3:7.3f})")


def main2():
    """Variant timings: row-window scatter + plane extraction."""
    config = PipelineConfig()
    cam = config.camera
    mats = frontend_matrices(config)
    seq = synthetic.generate(cam, n_frames=2, seed=0)
    frame = jnp.asarray(seq.images[1] * config.image_gain)
    fence(frame)
    thr = jnp.float32(0.01)
    scale = 2
    rows = (cam.rows + 1) // scale; cols = (cam.cols + 1) // scale
    n = rows * cols

    def seeds_of(m):
        kmax = m.kmax
        use = m.valid & ((m.threshold <= 0.0) | (m.grad_norm >= m.threshold))
        px = m.pos[:, 0] / scale; py = m.pos[:, 1] / scale
        col = jnp.floor(px + 0.5).astype(jnp.int32)
        row = jnp.floor(py + 0.5).astype(jnp.int32)
        inb = use & (row >= 0) & (row < rows) & (col >= 0) & (col < cols)
        flat = jnp.where(inb, row * cols + col, n)
        vals = jnp.stack([py, px, jnp.arange(kmax, dtype=jnp.float32),
                          m.grad[:, 0], m.grad[:, 1],
                          jnp.zeros((kmax,), jnp.float32),
                          jnp.zeros((kmax,), jnp.float32),
                          jnp.zeros((kmax,), jnp.float32)], axis=-1)  # [K,8]
        return flat, vals

    @jax.jit
    def det_rowscatter(fr):
        m = edge_detect.detect(fr, thr, mats, config.detector, cam, field_scale=2)
        flat, vals = seeds_of(m)
        init = jnp.full((n + 1, 8), 1e9, jnp.float32)
        tbl = init.at[flat].set(vals, mode="drop")[:n]
        # plane extraction for the flood: [n,8] -> [8,n] transpose
        planes = tbl.T
        return m.pos.sum() + planes.sum()

    @jax.jit
    def det_rowscatter_notrans(fr):
        m = edge_detect.detect(fr, thr, mats, config.detector, cam, field_scale=2)
        flat, vals = seeds_of(m)
        init = jnp.full((n + 1, 8), 1e9, jnp.float32)
        tbl = init.at[flat].set(vals, mode="drop")[:n]
        return m.pos.sum() + tbl.sum()

    @jax.jit
    def det_only(fr):
        m = edge_detect.detect(fr, thr, mats, config.detector, cam, field_scale=2)
        return m.pos.sum()

    t0 = timeit(lambda: det_only(frame))
    t1 = timeit(lambda: det_rowscatter_notrans(frame))
    t2 = timeit(lambda: det_rowscatter(frame))
    print(f"detect only             : {t0*1e3:7.3f} ms")
    print(f"row scatter [K]->[n,8]  : delta {(t1-t0)*1e3:7.3f} ms")
    print(f"  + [n,8]->[8,n] transp : delta {(t2-t0)*1e3:7.3f} ms")

if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "2":
        main2()
    else:
        main()
