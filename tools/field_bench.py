"""Dependent-chain latency of build_att_field (and detect) in isolation.

Usage: python -m tools.field_bench [--profile fast|parity]
"""

import argparse
import time

import numpy as np


def fence(x):
    np.asarray(x)


def timeit(fn, n=10, repeats=3):
    out = fn()
    fence(out)
    t0 = time.perf_counter()
    fence(out)
    rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        fence(out)
        best = min(best, (time.perf_counter() - t0 - rtt) / n)
    return best


CHAIN = 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="fast", choices=["fast", "parity"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rebvio_tpu.configs import PipelineConfig, fast_profile
    from rebvio_tpu.data import synthetic
    from rebvio_tpu.ops import distance_field as DF
    from rebvio_tpu.ops import edge_detect
    from rebvio_tpu.pipeline import frontend_matrices

    config = fast_profile() if args.profile == "fast" else PipelineConfig()
    cam = config.camera
    mats = frontend_matrices(config)
    H, W = cam.rows, cam.cols

    seq = synthetic.generate(cam, n_frames=2, seed=0)
    frame = jnp.asarray(seq.images[1] * config.image_gain)
    thr = jnp.float32(0.01)
    em = edge_detect.detect(frame, thr, mats, config.detector, cam,
                            field_scale=config.field_scale)
    fence(em.pos)

    @jax.jit
    def floor_fn(m):
        return m.rho.sum()

    t_floor = timeit(lambda: floor_fn(em))

    @jax.jit
    def att_chain(m):
        def body(_, carry):
            pos, acc = carry
            m2 = m.replace(pos=pos)
            att = DF.build_att_field(m2, int(config.core.search_range), H, W,
                                     config.field_scale)
            s = att[DF.ATT_D2].sum()
            pos = pos * (1.0 + 1e-12 * s)  # data dependency
            return pos, acc + s
        pos, acc = jax.lax.fori_loop(0, CHAIN, body, (m.pos, jnp.float32(0.0)))
        return acc + pos.sum()

    t_att = timeit(lambda: att_chain(em), n=4)
    print(f"dispatch floor      : {t_floor*1e6:8.1f} us")
    print(f"build_att_field     : {(t_att - t_floor)/CHAIN*1e6:8.1f} us/link "
          f"(chain of {CHAIN})")

    @jax.jit
    def det_chain(fr):
        def body(_, carry):
            f, acc = carry
            m2 = edge_detect.detect(f, thr, mats, config.detector, cam,
                                    field_scale=config.field_scale)
            s = m2.pos.sum()
            f = f * (1.0 + 1e-12 * s)
            return f, acc + s
        f, acc = jax.lax.fori_loop(0, CHAIN, body, (fr, jnp.float32(0.0)))
        return acc + f.sum()

    t_det = timeit(lambda: det_chain(frame), n=4)
    print(f"detect              : {(t_det - t_floor)/CHAIN*1e6:8.1f} us/link "
          f"(chain of {CHAIN})")


if __name__ == "__main__":
    main()
