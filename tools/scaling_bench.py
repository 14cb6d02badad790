"""Scaling-efficiency benchmark: aggregate VIO frames/s at 1..N devices.

BASELINE.json target: ">= 80% scaling efficiency at 2+ hosts".  The scaling
axis is the greenfield sequence batch (parallel/batch.py): B independent
sequences sharded over the ``seq`` mesh axis, zero collectives on the
critical path.  This harness measures aggregate frames/s at each device
count d (batch B = d, one sequence per device) and reports efficiency
eff(d) = fps(d) / (d * fps(1)).

Runs on whatever devices are visible: the virtual 8-device CPU mesh for CI
validation, a real TPU slice when hardware is attached (single-chip axon
tunnels report d=1 only), and multi-host pods via jax.distributed (run one
copy per host; device counts then span hosts).

Usage: python -m tools.scaling_bench [--devices 1,2,4,8] [--frames 16]
Output: one JSON line per device count + a summary line.

``--batch-sweep B1,B2,..`` instead sweeps the SEQUENCE-BATCH axis on a
fixed single device — the one scaling measurement a single-chip harness
can make for real (VERDICT r4 missing #4): aggregate fps and fps/sequence
at batch 1/2/4/8 on the real chip.  ``--out FILE`` additionally appends
each JSON line to FILE, immune to stderr interleaving on the shared
tunnel (the r4 curve lost its d=1 line to exactly that).
"""

import argparse
import json
import time

import numpy as np


def fence(tree):
    import jax

    for leaf in jax.tree.leaves(tree):
        np.asarray(leaf)


_OUT_FILE = None


def emit(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    if _OUT_FILE:
        with open(_OUT_FILE, "a") as f:
            f.write(line + "\n")


def main():
    global _OUT_FILE
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default=None,
                    help="comma-separated device counts (default: 1,2,4,..,N)")
    ap.add_argument("--frames", type=int, default=16,
                    help="frames per sequence per timing pass")
    ap.add_argument("--profile", default="fast", choices=["fast", "parity", "tiny"])
    ap.add_argument("--platform", default=None, choices=[None, "cpu"],
                    help="force backend (cpu for harness validation)")
    ap.add_argument("--virtual-devices", type=int, default=0,
                    help="CPU-only: number of virtual devices (sets "
                         "xla_force_host_platform_device_count in-process — "
                         "shell-level XLA_FLAGS are not seen by this "
                         "container's interpreter boot)")
    ap.add_argument("--batch-sweep", default=None,
                    help="comma-separated SEQUENCE-BATCH sizes to sweep on a "
                         "single device (e.g. 1,2,4,8) instead of the "
                         "device-count sweep")
    ap.add_argument("--out", default=None,
                    help="append each JSON line to this file (clean of "
                         "stderr interleaving)")
    args = ap.parse_args()
    _OUT_FILE = args.out

    import os

    if args.virtual_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual_devices}"
        ).strip()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rebvio_tpu import types as T
    from rebvio_tpu.configs import PipelineConfig, fast_profile
    from rebvio_tpu.data import synthetic
    from rebvio_tpu.ops.imu import pack_imu_window
    from rebvio_tpu.parallel.batch import (
        batched_step, init_batched_state, make_seq_mesh, shard_batch,
    )

    if args.profile == "tiny":
        import __graft_entry__ as GE

        config = GE._tiny_config()
    elif args.profile == "fast":
        config = fast_profile()
    else:
        config = PipelineConfig()
    cam = config.camera

    n_avail = len(jax.devices())
    if args.devices:
        counts = [int(x) for x in args.devices.split(",")]
    else:
        counts = []
        d = 1
        while d <= n_avail:
            counts.append(d)
            d *= 2

    n_frames = args.frames
    seq = synthetic.generate(cam, n_frames=n_frames, seed=0)
    frames_np = np.stack([seq.images[i] * config.image_gain for i in range(n_frames)])
    windows = []
    cursor = 0
    for i in range(n_frames):
        j = cursor
        while j < len(seq.imu_ts_us) and seq.imu_ts_us[j] <= seq.ts_us[i]:
            j += 1
        windows.append(pack_imu_window(
            seq.imu_gyro[cursor:j], seq.imu_acc[cursor:j], seq.imu_ts_us[cursor:j],
            config.imu.sample_max))
        cursor = j

    if args.batch_sweep:
        # single-device sequence-batch sweep (real-chip scaling axis)
        sweep = [int(x) for x in args.batch_sweep.split(",")]
        results = {}
        mesh = make_seq_mesh(1)
        for B in sweep:
            with mesh:
                states = shard_batch(init_batched_state(config, B), mesh)
                frames_b = [
                    shard_batch(jnp.broadcast_to(
                        jnp.asarray(frames_np[i])[None],
                        (B,) + frames_np[i].shape), mesh)
                    for i in range(n_frames)
                ]
                imu_b = [
                    shard_batch(jax.tree.map(
                        lambda x: jnp.broadcast_to(x[None], (B,) + x.shape),
                        w), mesh)
                    for w in windows
                ]
                dts = shard_batch(jnp.full((B,), 0.05, jnp.float32), mesh)
                st = states
                for i in range(min(3, n_frames)):
                    st, odo = batched_step(st, frames_b[i], imu_b[i], dts, config)
                fence(odo.position)
                t0 = time.perf_counter()
                fence(odo.position)
                rtt = time.perf_counter() - t0
                best = float("inf")
                for _ in range(3):
                    st = states
                    t0 = time.perf_counter()
                    for i in range(n_frames):
                        st, odo = batched_step(st, frames_b[i], imu_b[i],
                                               dts, config)
                    fence(odo.position)
                    best = min(best, max(time.perf_counter() - t0 - rtt, 1e-9))
            fps = n_frames * B / best
            results[B] = fps
            emit({
                "batch": B, "devices": 1,
                "aggregate_fps": round(fps, 2),
                "fps_per_sequence": round(fps / B, 2),
                "efficiency_vs_b1": round(fps / (B * results[1]), 3)
                                    if 1 in results else None,
                "profile": args.profile,
                "platform": jax.devices()[0].platform,
            })
        if len(results) > 1:
            bmax = max(results)
            emit({
                "metric": "batch_scaling_efficiency_single_chip",
                "batch": bmax,
                "value": round(results[bmax] / (bmax * results[1]), 3)
                         if 1 in results else None,
                "unit": f"aggregate fps(B={bmax}) / ({bmax} x fps(B=1)), "
                        f"{args.profile} profile, one device, per-frame "
                        f"dispatch (vmapped batched_step)",
            })
        return

    results = {}
    for d in counts:
        if d > n_avail:
            emit({"devices": d, "skipped": "not enough devices"})
            continue
        mesh = make_seq_mesh(d)
        B = d
        with mesh:
            states = shard_batch(init_batched_state(config, B), mesh)
            frames_b = [
                shard_batch(jnp.broadcast_to(jnp.asarray(frames_np[i])[None],
                                             (B,) + frames_np[i].shape), mesh)
                for i in range(n_frames)
            ]
            imu_b = [
                shard_batch(jax.tree.map(
                    lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), w), mesh)
                for w in windows
            ]
            dts = shard_batch(jnp.full((B,), 0.05, jnp.float32), mesh)

            # warmup/compile
            st = states
            for i in range(min(3, n_frames)):
                st, odo = batched_step(st, frames_b[i], imu_b[i], dts, config)
            fence(odo.position)

            t0 = time.perf_counter()
            fence(odo.position)
            rtt = time.perf_counter() - t0

            best = float("inf")
            for _ in range(3):
                st = states
                t0 = time.perf_counter()
                for i in range(n_frames):
                    st, odo = batched_step(st, frames_b[i], imu_b[i], dts, config)
                fence(odo.position)
                best = min(best, max(time.perf_counter() - t0 - rtt, 1e-9))

        fps = n_frames * B / best
        results[d] = fps
        eff = fps / (d * results[1]) if 1 in results else float("nan")
        emit({
            "devices": d, "batch": B, "frames_per_s": round(fps, 2),
            "efficiency_vs_1dev": round(eff, 3),
        })

    if len(results) > 1:
        dmax = max(results)
        emit({
            "metric": "scaling_efficiency",
            "devices": dmax,
            "value": round(results[dmax] / (dmax * results[1]), 3),
            "unit": f"aggregate fps({dmax} dev) / ({dmax} x fps(1 dev)), "
                    f"{args.profile} profile, platform={jax.devices()[0].platform}",
        })


if __name__ == "__main__":
    main()
