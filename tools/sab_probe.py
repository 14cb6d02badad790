"""What dominates estimate_bias: tiny-solve custom calls or op count?"""

import time

import numpy as np


def fence(x):
    np.asarray(x)


def timeit(fn, n=6, repeats=3):
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


CHAIN = 64


def main():
    import jax
    import jax.numpy as jnp

    from rebvio_tpu.geometry import linalg

    A = jnp.eye(7, dtype=jnp.float32) * 3.0 + 0.1
    b = jnp.arange(7, dtype=jnp.float32)

    @jax.jit
    def floor_fn(x):
        return x.sum()

    t_floor = timeit(lambda: floor_fn(b))
    print(f"floor                  : {t_floor*1e6:8.1f} us")

    def chain(fn):
        @jax.jit
        def c(a0, b0):
            def body(_, carry):
                a, bb, acc = carry
                x = fn(a, bb)
                bb = bb * (1.0 + 1e-12 * x.sum())
                return a, bb, acc + x.sum()
            a, bb, acc = jax.lax.fori_loop(0, CHAIN, body, (a0, b0, jnp.float32(0.0)))
            return acc + bb.sum()
        return c

    solve_c = chain(lambda a, bb: jnp.linalg.solve(a, bb))
    chol_c = chain(lambda a, bb: linalg.chol_inverse(a + jnp.outer(bb, bb) * 1e-6)[:, 0])
    mm_c = chain(lambda a, bb: (a @ a @ a)[:, 0] + bb)

    print(f"jnp.linalg.solve 7x7   : {(timeit(lambda: solve_c(A, b)) - t_floor)/CHAIN*1e6:8.1f} us/link")
    print(f"chol_inverse 7x7       : {(timeit(lambda: chol_c(A, b)) - t_floor)/CHAIN*1e6:8.1f} us/link")
    print(f"3 chained 7x7 matmuls  : {(timeit(lambda: mm_c(A, b)) - t_floor)/CHAIN*1e6:8.1f} us/link")


if __name__ == "__main__":
    main()
