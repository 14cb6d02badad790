"""A/B: XLA build_att_field / build_nn_field vs Pallas nn_field kernel at the
half-res field geometry.  Usage: python -m tools.jfa_ab
"""

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
    import jax
    import jax.numpy as jnp

    from rebvio_tpu.configs import fast_profile
    from rebvio_tpu.data import synthetic
    from rebvio_tpu.ops import distance_field as DF
    from rebvio_tpu.ops import edge_detect
    from rebvio_tpu.ops.pallas_kernels import nn_field_pallas
    from rebvio_tpu.pipeline import frontend_matrices

    config = fast_profile()
    cam = config.camera
    mats = frontend_matrices(config)
    H, W = cam.rows, cam.cols
    scale = config.field_scale
    Hs, Ws = (H + scale - 1) // scale, (W + scale - 1) // scale
    sr = max(1, round(config.core.search_range / scale))

    seq = synthetic.generate(cam, n_frames=2, seed=0)
    frame = jnp.asarray(seq.images[1] * config.image_gain)
    em = edge_detect.detect(frame, jnp.float32(0.01), mats, config.detector,
                            cam, field_scale=scale)
    # a scaled copy of the map so nn_field_pallas sees scaled coordinates
    em_s = em.replace(pos=em.pos / scale)
    fence(em.pos)

    @jax.jit
    def floor_fn(m):
        return m.rho.sum()

    t_floor = timeit(lambda: floor_fn(em))

    def chain_of(fn):
        @jax.jit
        def chained(m):
            def body(_, carry):
                pos, acc = carry
                s = fn(m.replace(pos=pos))
                pos = pos * (1.0 + 1e-12 * s)
                return pos, acc + s
            pos, acc = jax.lax.fori_loop(0, CHAIN, body, (m.pos, jnp.float32(0.0)))
            return acc + pos.sum()
        return chained

    import os

    from rebvio_tpu.ops.pallas_kernels import att_field_pallas

    os.environ["REBVIO_PALLAS_JFA"] = "0"
    att_chain = chain_of(lambda m: DF.build_att_field(
        m, int(config.core.search_range), H, W, scale)[DF.ATT_D2].sum())
    pal_att_chain = chain_of(lambda m: att_field_pallas(
        m, int(config.core.search_range), H, W, scale)[DF.ATT_D2].sum())
    nn_chain = chain_of(lambda m: DF.build_nn_field(
        m, int(config.core.search_range), H, W, scale).astype(jnp.float32).sum())
    pal_chain = chain_of(lambda m: nn_field_pallas(
        m, sr, Hs, Ws).astype(jnp.float32).sum())

    t_att = timeit(lambda: att_chain(em), n=4)
    t_nn = timeit(lambda: nn_chain(em), n=4)
    t_pal = timeit(lambda: pal_chain(em_s), n=4)
    t_pal_att = timeit(lambda: pal_att_chain(em), n=4)
    print(f"floor                 : {t_floor*1e6:8.1f} us")
    print(f"XLA build_att_field   : {(t_att-t_floor)/CHAIN*1e6:8.1f} us/link")
    print(f"XLA build_nn_field    : {(t_nn-t_floor)/CHAIN*1e6:8.1f} us/link")
    print(f"Pallas nn_field       : {(t_pal-t_floor)/CHAIN*1e6:8.1f} us/link")
    print(f"Pallas att_field      : {(t_pal_att-t_floor)/CHAIN*1e6:8.1f} us/link")


if __name__ == "__main__":
    main()
