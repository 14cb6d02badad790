"""Single-chip throughput benchmark across operating points.

Measures frames/s of the full VIO step on synthetic full-res frames for any
combination of profile (parity 16k / fast 8k keylines), execution mode
(streaming step, scan chunk, batched vmap), chunk length and batch size.
All timings are fenced by device->host readbacks with the readback
round-trip subtracted (block_until_ready returns early on the remote
backend).

Usage:
  python -m tools.throughput_bench [--profile fast|parity] [--mode chunk|stream|batch]
                                   [--n 8] [--iters 6]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", choices=["fast", "parity"], default="fast")
    ap.add_argument("--mode", choices=["chunk", "stream", "batch"], default="chunk")
    ap.add_argument("--n", type=int, default=8, help="chunk length / batch size")
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rebvio_tpu import types as T
    from rebvio_tpu.configs import PipelineConfig, fast_profile
    from rebvio_tpu.data import synthetic
    from rebvio_tpu.ops.imu import pack_imu_window
    from rebvio_tpu.pipeline import frontend_matrices, step, step_chunk

    config = fast_profile() if args.profile == "fast" else PipelineConfig()
    cam = config.camera
    mats = frontend_matrices(config)
    N = args.n
    seq = synthetic.generate(cam, n_frames=N, seed=0)
    frames_np = np.stack([seq.images[i] * config.image_gain for i in range(N)]).astype(np.float32)
    windows = []
    cursor = 0
    for i in range(N):
        j = cursor
        while j < len(seq.imu_ts_us) and seq.imu_ts_us[j] <= seq.ts_us[i]:
            j += 1
        windows.append(pack_imu_window(
            seq.imu_gyro[cursor:j], seq.imu_acc[cursor:j], seq.imu_ts_us[cursor:j],
            config.imu.sample_max))
        cursor = j
    dt = jnp.float32(0.05)

    if args.mode == "stream":
        frames = [jnp.asarray(f) for f in frames_np]
        s = T.init_vio_state(config)
        for i in range(3):
            s, odo = step(s, frames[i % N], windows[i % N], dt, config, mats)
        np.asarray(odo.position)
        t0 = time.perf_counter(); np.asarray(odo.position); rtt = time.perf_counter() - t0
        n_it = args.iters * N
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(n_it):
                s, odo = step(s, frames[i % N], windows[i % N], dt, config, mats)
            np.asarray(odo.position)
            best = min(best, (time.perf_counter() - t0 - rtt) / n_it)
        fps = 1.0 / best
    elif args.mode == "chunk":
        frames = jnp.asarray(frames_np)
        imu_b = jax.tree.map(lambda *xs: jnp.stack(xs), *windows)
        dts = jnp.full((N,), 0.05, jnp.float32)
        s = T.init_vio_state(config)
        for _ in range(2):
            s, odos = step_chunk(s, frames, imu_b, dts, config, mats)
        np.asarray(odos.position)
        t0 = time.perf_counter(); np.asarray(odos.position); rtt = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                s, odos = step_chunk(s, frames, imu_b, dts, config, mats)
            np.asarray(odos.position)
            best = min(best, (time.perf_counter() - t0 - rtt) / (args.iters * N))
        fps = 1.0 / best
    else:  # batch: N independent sequences vmapped
        from rebvio_tpu.parallel.batch import batched_step, init_batched_state

        B = N
        fb = jnp.asarray(np.broadcast_to(frames_np[0], (B,) + frames_np[0].shape))
        imu_b = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), windows[0])
        dts = jnp.full((B,), 0.05, jnp.float32)
        s = init_batched_state(config, B)
        for _ in range(3):
            s, odo = batched_step(s, fb, imu_b, dts, config)
        np.asarray(odo.position)
        t0 = time.perf_counter(); np.asarray(odo.position); rtt = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                s, odo = batched_step(s, fb, imu_b, dts, config)
            np.asarray(odo.position)
            best = min(best, (time.perf_counter() - t0 - rtt) / (args.iters * B))
        fps = 1.0 / best

    print(f"profile={args.profile} mode={args.mode} n={N}: "
          f"{1e3/fps:.2f} ms/frame = {fps:.1f} frames/s/chip")


if __name__ == "__main__":
    main()
