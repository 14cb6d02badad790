"""Per-kernel overhead: chains of ops with fusion-breaking reductions."""
import time
import numpy as np
import jax, jax.numpy as jnp

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

def chain_n(n_ops):
    @jax.jit
    def f(x):
        a = x
        for i in range(n_ops):
            a = a * (1.0 + 1e-12 * a.sum())   # reduce -> broadcast: fusion barrier
        return a.sum()
    return f

def matmul_chain(n_ops, m):
    @jax.jit
    def f(A):
        a = A
        for i in range(n_ops):
            a = a @ A * (1.0 - 1e-12)
        return a.sum()
    return f

def main():
    for shape in ((3,), (3, 3), (16000,)):
        x = jnp.full(shape, 0.99, jnp.float32)
        ts = {}
        for n_ops in (8, 128):
            ts[n_ops] = timeit(lambda f=chain_n(n_ops): f(x))
        per = (ts[128] - ts[8]) / 120
        print(f"reduce-chain {str(shape):10s}: {per*1e6:6.2f} us/link")
    A = jnp.eye(3, dtype=jnp.float32) * 0.999
    ts = {}
    for n_ops in (8, 128):
        ts[n_ops] = timeit(lambda f=matmul_chain(n_ops, 3): f(A))
    print(f"3x3 matmul chain       : {(ts[128]-ts[8])/120*1e6:6.2f} us/link")



def main_scatter():
    N = 90241
    K = 16000
    rng = np.random.RandomState(0)
    idx = jnp.asarray(np.sort(rng.choice(N - 1, K, replace=False)), jnp.int32)
    vals = jnp.asarray(rng.rand(K, 8), jnp.float32)
    vals1 = jnp.asarray(rng.rand(K), jnp.float32)
    fill8 = jnp.zeros((8,), jnp.float32)

    def chain(fn):
        @jax.jit
        def f(s0):
            def body(_, carry):
                s, acc = carry
                r = fn((idx + (s * 0).astype(jnp.int32)))
                return s * (1.0 + 1e-12 * r), acc + r
            s, acc = jax.lax.fori_loop(0, 16, body, (s0, jnp.float32(0)))
            return acc
        return f

    def row_scatter_1(ix):
        t = jnp.broadcast_to(fill8, (N, 8)).at[ix].set(vals, mode="drop")
        return t.sum()
    def row_scatter_4(ix):
        t = jnp.broadcast_to(fill8, (N, 8))
        for c in range(4):
            t = t.at[ix[c*4000:(c+1)*4000]].set(vals[c*4000:(c+1)*4000], mode="drop")
        return t.sum()
    def smax_1(ix):
        t = jnp.zeros((K,), jnp.int32).at[ix % K].max(
            jnp.arange(K, dtype=jnp.int32), mode="drop")
        return t.sum().astype(jnp.float32)
    def smax_4(ix):
        t = jnp.zeros((K,), jnp.int32)
        ar = jnp.arange(K, dtype=jnp.int32)
        for c in range(4):
            t = t.at[(ix[c*4000:(c+1)*4000]) % K].max(ar[c*4000:(c+1)*4000], mode="drop")
        return t.sum().astype(jnp.float32)

    fns = {"row scatter 16k": row_scatter_1, "row scatter 4x4k": row_scatter_4,
           "smax 16k": smax_1, "smax 4x4k": smax_4}
    f0 = chain(lambda ix: (ix.sum() * 0).astype(jnp.float32))
    t0 = timeit(lambda: f0(jnp.float32(1.0)))
    for name, fn in fns.items():
        c = chain(fn)
        t = timeit(lambda: c(jnp.float32(1.0)))
        print(f"{name:18s}: {(t-t0)/16*1e6:7.1f} us")


def main_sort():
    HW = 360960
    x = jnp.asarray(np.random.RandomState(0).rand(HW).astype(np.float32))

    def chain(fn):
        @jax.jit
        def f(s0):
            def body(_, carry):
                s, acc = carry
                r = fn(x * (1.0 + 1e-12 * s))
                return s * (1.0 + 1e-12 * r), acc + r
            s, acc = jax.lax.fori_loop(0, 8, body, (s0, jnp.float32(0)))
            return acc
        return f

    import functools
    variants = {
        "full sort [360960]": lambda v: jax.lax.sort(v, is_stable=False)[-16000:].sum(),
        "batched [24,15040]": lambda v: jax.lax.sort(
            v.reshape(24, 15040), dimension=1, is_stable=False)[:, -2000:].sum(),
        "batched [96,3760]": lambda v: jax.lax.sort(
            v.reshape(96, 3760), dimension=1, is_stable=False)[:, -2000:].sum(),
        "batched [8,45120]": lambda v: jax.lax.sort(
            v.reshape(8, 45120), dimension=1, is_stable=False)[:, -2000:].sum(),
        "top_k 16000": lambda v: jax.lax.top_k(v, 16000)[0].sum(),
    }
    f0 = chain(lambda v: v[0])
    t0 = timeit(lambda: f0(jnp.float32(1.0)), n=4)
    for name, fn in variants.items():
        c = chain(fn)
        t = timeit(lambda: c(jnp.float32(1.0)), n=4)
        print(f"{name:20s}: {(t-t0)/8*1e6:8.1f} us")

if __name__ == "__main__":
    import sys
    arg = sys.argv[1] if len(sys.argv) > 1 else ""
    {"scatter": main_scatter, "sort": main_sort}.get(arg, main)()
