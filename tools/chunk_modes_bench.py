"""Quick A/B: step_chunk (exact) vs step_chunk_pipelined (vmapped frontend)
at several chunk sizes.
Usage: python -m tools.chunk_modes_bench [--profile fast|parity]
"""

import argparse
import time

import numpy as np


def fence(tree):
    import jax
    for leaf in jax.tree.leaves(tree):
        np.asarray(leaf)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="fast", choices=["fast", "parity"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rebvio_tpu import types as T
    from rebvio_tpu.configs import PipelineConfig, fast_profile
    from rebvio_tpu.data import synthetic
    from rebvio_tpu.ops.imu import pack_imu_window
    from rebvio_tpu.pipeline import (frontend_matrices, step_chunk,
                                     step_chunk_pipelined)

    config = fast_profile() if args.profile == "fast" else PipelineConfig()
    cam = config.camera
    mats = frontend_matrices(config)

    NMAX = 32
    seq = synthetic.generate(cam, n_frames=NMAX, seed=0)
    frames_all = [jnp.asarray(seq.images[i] * config.image_gain) for i in range(NMAX)]
    windows = []
    cursor = 0
    for i in range(NMAX):
        j = cursor
        while j < len(seq.imu_ts_us) and seq.imu_ts_us[j] <= seq.ts_us[i]:
            j += 1
        windows.append(pack_imu_window(
            seq.imu_gyro[cursor:j], seq.imu_acc[cursor:j], seq.imu_ts_us[cursor:j],
            config.imu.sample_max))
        cursor = j

    for N in (8, 16, 32):
        frames_b = jnp.stack(frames_all[:N])
        imu_b = jax.tree.map(lambda *xs: jnp.stack(xs), *windows[:N])
        dts = jnp.full((N,), 0.05, jnp.float32)
        for name, fn in (("exact", step_chunk), ("pipelined", step_chunk_pipelined)):
            state = T.init_vio_state(config)
            s = state
            for _ in range(2):
                s, odos = fn(s, frames_b, imu_b, dts, config, mats)
            fence(odos.position)
            t0 = time.perf_counter()
            fence(odos.position)
            rtt = time.perf_counter() - t0
            n_iter = max(48 // N, 2)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n_iter):
                    s, odos = fn(s, frames_b, imu_b, dts, config, mats)
                fence(odos.position)
                best = min(best, max(time.perf_counter() - t0 - rtt, 1e-9))
            fps = n_iter * N / best
            print(f"chunk={N:3d} {name:9s}: {fps:7.1f} fps  ({1e3/fps:6.3f} ms/frame)")


if __name__ == "__main__":
    main()
