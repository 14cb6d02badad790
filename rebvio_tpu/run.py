"""Command-line dataset runner: the TPU-native equivalent of the reference's
node executable + rosbag player (ros_rebvio_node.cpp, ros_rebvio.cpp:89-126).

    python -m rebvio_tpu.run --dataset synthetic --frames 120 --mode vio
    python -m rebvio_tpu.run --dataset euroc --root /data/V1_01_easy --mode vio

Writes a reference-format odometry file and prints ATE when ground truth is
available.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

from rebvio_tpu import eval as ev
from rebvio_tpu.configs import PipelineConfig, CameraConfig
from rebvio_tpu.runner import VioRunner
from rebvio_tpu.utils import logging as rlog
from rebvio_tpu.utils import timing


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["synthetic", "euroc"], default="synthetic")
    ap.add_argument("--root", help="EuRoC sequence root (contains mav0/)")
    ap.add_argument("--camera-json", help="camera calibration JSON (default EuRoC cam0)")
    ap.add_argument("--mode", choices=["vio", "vo"], default="vio")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--start", type=float, default=None, help="euroc start [s]")
    ap.add_argument("--end", type=float, default=None, help="euroc end [s]")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--odometry-out", default=None)
    ap.add_argument("--checkpoint-out", default=None)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--timing", action="store_true")
    ap.add_argument("--preset", choices=["euroc", "euroc-fast", "half", "small"],
                    default="euroc",
                    help="camera/detector size preset (half/small for quick "
                         "runs; euroc-fast = full resolution, 8k keylines + "
                         "4-probe matcher — ~1.7x faster, see configs."
                         "fast_profile)")
    ap.add_argument("--ba", action="store_true",
                    help="build a keyframe map during the run and refine it "
                         "with Schur-complement bundle adjustment")
    ap.add_argument("--pose-graph", action="store_true",
                    help="build a keyframe pose graph from the run "
                         "(sequential odometry factors + tracker-registered "
                         "loop closures) and optimize it")
    ap.add_argument("--kf-every", type=int, default=5,
                    help="keyframe stride for --ba/--pose-graph; note "
                         "keyframes fire at frames {kf-1, 2*kf-1, ...} "
                         "(phase = kf_every-1, chunk-aligned so the device "
                         "edge map can be snapshotted without per-frame "
                         "readbacks) — earlier revisions used phase 0 "
                         "({0, kf, 2*kf, ...}), so keyframe indices differ "
                         "from pre-r4 outputs")
    ap.add_argument("--roll-sweep", type=float, default=0.0, metavar="DEG",
                    help="loop closure: extend the coarse yaw sweep to a 2-D "
                         "yaw x roll grid sweeping +-DEG about the optical "
                         "axis (needed when roll drift exceeds the ~1-deg "
                         "registration basin; off by default — on pure-yaw "
                         "drift the extra candidates add selection noise)")
    ap.add_argument("--platform", choices=["default", "cpu"], default="default",
                    help="force the JAX backend (cpu for quick local runs)")
    ap.add_argument("--matcher", choices=["tube", "walk"], default="tube",
                    help="epipolar matcher: TPU-first tube probe or the "
                         "reference's pixel walk")
    ap.add_argument("--realtime", type=float, default=0.0, metavar="SPEED",
                    help="pace frames at sensor rate x SPEED with keep-up "
                         "semantics: a bounded queue drops frames when the "
                         "estimator falls behind (the reference's paced "
                         "rosbag player + subscriber queues, "
                         "ros_rebvio.cpp:89-126); reports processed/dropped "
                         "and worst-case latency")
    ap.add_argument("--rt-queue", type=int, default=2,
                    help="realtime mode bounded queue depth")
    ap.add_argument("--chunk", type=int, default=0,
                    help="frames per device dispatch (lax.scan offline fast "
                         "path; 0/1 = streaming, one dispatch per frame)")
    ap.add_argument("--chunk-mode", choices=["pipelined", "exact"], default="exact",
                    help="pipelined = frontend batched across the chunk "
                         "(threshold controller updates once per chunk); "
                         "exact = per-frame streaming semantics")
    ap.add_argument("--df-mode", choices=["jfa", "raster"], default=None,
                    help="auxiliary field: jump-flood NN (default) or the "
                         "reference's rasterized scatter")
    ap.add_argument("--loader", choices=["auto", "native", "python"], default="auto",
                    help="euroc image decode: native = threaded C++ prefetch "
                         "ring (the reference's acquisition thread, built via "
                         "make -C native), python = in-process fallback, "
                         "auto = native when built")
    args = ap.parse_args(argv)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    log = rlog.init()
    timing.enable(args.timing)

    from rebvio_tpu.configs import CoreConfig, EdgeDetectorConfig

    if args.camera_json:
        cam = CameraConfig.from_json(args.camera_json)
        det, core = EdgeDetectorConfig(), CoreConfig()
    elif args.preset == "half":
        cam = CameraConfig(rows=240, cols=376, fx=229.3, fy=228.6, cx=183.6, cy=124.2,
                           k1=0, k2=0, k3=0, p1=0, p2=0)
        det = EdgeDetectorConfig(keylines_max=4096, keylines_ref=3000)
        core = CoreConfig(search_range=20, global_min_matches_threshold=200)
    elif args.preset == "small":
        cam = CameraConfig(rows=120, cols=188, fx=114.6, fy=114.3, cx=91.8, cy=62.1,
                           k1=0, k2=0, k3=0, p1=0, p2=0)
        det = EdgeDetectorConfig(keylines_max=2048, keylines_ref=1200)
        core = CoreConfig(search_range=10, global_min_matches_threshold=100)
    else:
        cam, det, core = CameraConfig(), EdgeDetectorConfig(), CoreConfig()
    df_mode = args.df_mode or ("jfa" if args.matcher == "tube" else "raster")
    if args.preset == "euroc-fast":
        from rebvio_tpu.configs import fast_profile

        config = fast_profile(use_imu=(args.mode == "vio"),
                              matcher=args.matcher, df_mode=df_mode)
    else:
        config = PipelineConfig(camera=cam, detector=det, core=core,
                                use_imu=(args.mode == "vio"),
                                matcher=args.matcher, df_mode=df_mode)

    if args.dataset == "synthetic":
        from rebvio_tpu.data import synthetic

        seq = synthetic.generate(cam, n_frames=args.frames, seed=args.seed)
        undistort = False
        gt = seq.gt_pos
    else:
        from rebvio_tpu.data import euroc

        if not args.root:
            ap.error("--root required for euroc")
        seq = euroc.load(args.root, args.start, args.end, loader=args.loader,
                         rows=cam.rows, cols=cam.cols)
        undistort = True
        gt = None

    runner = VioRunner(config, undistort=undistort)
    if args.resume:
        from rebvio_tpu.utils import checkpoint

        runner.state = checkpoint.load(args.resume, runner.state)
        log.info("resumed state from %s", args.resume)

    builder = None
    if args.ba or args.pose_graph:
        from rebvio_tpu.ba.keyframe_map import KeyframeMapBuilder

        # chunk-aligned keyframes (phase = end of chunk) let run_mapped
        # snapshot the device edge map without per-frame readbacks
        builder = KeyframeMapBuilder(config, kf_every=args.kf_every,
                                     store_maps=args.pose_graph,
                                     kf_phase=args.kf_every - 1)

    # warm the jit on frame 0 so the fps figure reflects steady state
    runner.process_frame(
        np.asarray(seq.images[0]), int(seq.ts_us[0]) - 1,
        np.asarray([], dtype=np.int64), np.zeros((0, 3)), np.zeros((0, 3)),
    )
    runner.reset()

    t0 = time.time()
    rt = None
    if args.realtime > 0:
        if builder is not None or args.chunk:
            ap.error("--realtime is a streaming mode (no --ba/--pose-graph/--chunk)")
        rt = runner.run_realtime(seq, speed=args.realtime,
                                 queue_size=args.rt_queue)
        res = rt.result
    elif builder is None:
        res = runner.run(seq, chunk=args.chunk,
                         pipelined=(args.chunk_mode == "pipelined"))
    else:
        # mapping at chunked speed: one batched trace readback per
        # kf_every-frame chunk (VioRunner.run_mapped)
        res = runner.run_mapped(seq, builder, chunk=args.kf_every)
    elapsed = time.time() - t0
    n = len(res.ts_us)
    log.info("%d frames in %.2fs (%.1f fps), run_ok=%s", n, elapsed, n / elapsed, bool(res.run_ok[-1]))

    if args.odometry_out:
        ev.write_odometry(args.odometry_out, res.ts_us, res.orientation, res.position)
        log.info("odometry written to %s", args.odometry_out)
    if args.checkpoint_out:
        from rebvio_tpu.utils import checkpoint

        checkpoint.save(args.checkpoint_out, runner.state)
        log.info("state checkpoint written to %s", args.checkpoint_out)

    out = {"frames": n, "fps": n / elapsed, "run_ok": bool(res.run_ok[-1])}
    if rt is not None:
        out["realtime_speed"] = args.realtime
        out["rt_processed"] = rt.processed
        out["rt_dropped"] = rt.dropped
        out["rt_worst_latency_ms"] = round(rt.worst_latency_s * 1e3, 1)
    if args.pose_graph and builder is not None and builder.n_keyframes() >= 3:
        from rebvio_tpu.ba import loop_closure as lc
        from rebvio_tpu.ba import pose_graph as pgm

        kf_R = np.stack([k.R_wc for k in builder.keyframes])
        kf_t = np.stack([k.t_wc for k in builder.keyframes])
        g, n_loops = lc.build_graph_from_run(
            kf_R, kf_t, builder.kf_maps, config,
            K_scale=float(runner.state.K),
            min_matches=int(config.core.global_min_matches_threshold),
            coarse_sweep2_deg=args.roll_sweep,
        )
        g_opt, hist = pgm.optimize(g, iters=12)
        out["pg_keyframes"] = builder.n_keyframes()
        out["pg_loop_factors"] = n_loops
        out["pg_cost_before"] = float(np.asarray(hist)[0])
        out["pg_cost_after"] = float(np.asarray(hist)[-1])
        if gt is not None:
            kf_idx = np.asarray([k.index for k in builder.keyframes])
            out["pg_ate_sim3_before"] = ev.ate_rmse(
                kf_t, gt[kf_idx], align=True, with_scale=True)
            out["pg_ate_sim3"] = ev.ate_rmse(
                np.asarray(g_opt.t), gt[kf_idx], align=True, with_scale=True)
    if args.ba and builder is not None and builder.n_keyframes() >= 2:
        from rebvio_tpu.ba import problem as bap

        p = builder.build_problem(min_obs=2)
        if p is not None:
            terms0 = bap.accumulate_terms(p)
            p_opt, hist = bap.optimize(p, iters=10, huber_delta=3.0)
            terms1 = bap.accumulate_terms(p_opt)
            n_obs = max(int(terms0.n_obs), 1)
            out["ba_keyframes"] = builder.n_keyframes()
            out["ba_landmarks"] = int(np.asarray(p.lm_valid).sum())
            out["ba_rms_before_px"] = float(np.sqrt(float(terms0.cost) / n_obs))
            out["ba_rms_after_px"] = float(np.sqrt(float(terms1.cost) / n_obs))
            if gt is not None:
                kf_idx = np.asarray([k.index for k in builder.keyframes])
                out["ba_ate_sim3"] = ev.ate_rmse(
                    np.asarray(p_opt.t), gt[kf_idx], align=True, with_scale=True
                )
    if gt is not None:
        gt_sel = gt if rt is None else gt[rt.frame_idx]
        out["ate_sim3"] = ev.ate_rmse(res.position, gt_sel, align=True, with_scale=True)
        out["ate_se3"] = ev.ate_rmse(res.position, gt_sel, align=True, with_scale=False)
    if args.dataset == "euroc" and seq.gt_pos is not None:
        sel = np.searchsorted(seq.gt_ts_us, res.ts_us)
        sel = np.clip(sel, 0, len(seq.gt_ts_us) - 1)
        out["ate_sim3"] = ev.ate_rmse(res.position, seq.gt_pos[sel], align=True, with_scale=True)
        out["ate_se3"] = ev.ate_rmse(res.position, seq.gt_pos[sel], align=True, with_scale=False)
    print(json.dumps(out))
    if args.timing:
        print(timing.report(), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
