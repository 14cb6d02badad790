"""JtJ-kernel roofline report (BASELINE.json metric: "JtJ kernel % of roofline").

The tracker's try_vel pass is gather-bound, not FLOP-bound: per keyline it
does two data-dependent gathers (field id at the projected pixel, then the
packed target-keyline row) plus ~80 VPU flops and a [K,4]^T[K,4] MXU
contraction.  A classical FLOP roofline is meaningless at 2 MFLOP/pass, so
this tool reports three numbers:

  * dense HBM copy bandwidth (device speed-of-light for streaming ops)
  * random row-gather rate (device speed-of-light for the access pattern)
  * try_vel pass time, its achieved gather rate and bytes/s, as % of the
    two ceilings above

Timings are fenced by device->host readbacks (block_until_ready returns
early on the remote backend) with the readback round-trip subtracted.
"""

import time

import numpy as np


def fence(x):
    np.asarray(x)


def timeit(fn, n=30, repeats=3):
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


def measure() -> dict:
    """Measure device ceilings + try_vel pass; returns a metrics dict.

    Used by main() for the human report and by bench.py to record the
    BASELINE.json 'JtJ kernel % of roofline' metric every round."""
    import jax
    import jax.numpy as jnp

    from rebvio_tpu import types as T
    from rebvio_tpu.configs import PipelineConfig
    from rebvio_tpu.data import synthetic
    from rebvio_tpu.ops import distance_field as DF
    from rebvio_tpu.ops import edge_detect, tracker
    from rebvio_tpu.ops.imu import pack_imu_window
    from rebvio_tpu.pipeline import frontend_matrices, step

    config = PipelineConfig()
    cam = config.camera
    core_cfg = config.core
    mats = frontend_matrices(config)
    H, W = cam.rows, cam.cols
    K = config.detector.keylines_max

    # --- device ceilings ---
    NBIG = 1 << 24
    big = jnp.arange(NBIG, dtype=jnp.float32)

    @jax.jit
    def copy(x):
        return x * 1.0000001

    t_copy = timeit(lambda: copy(big), n=10)
    copy_bw = 2 * NBIG * 4 / t_copy  # read + write

    # Ceiling microbenchmarks shaped like try_vel's two gathers:
    #   (a) K scalar gathers from an [H*W] field image (large table)
    #   (b) K 8-lane row gathers from a [K,8] keyline table (small table)
    rng = np.random.default_rng(0)

    @jax.jit
    def base(s):
        return s[:K].sum()

    field_tbl = jnp.arange(H * W, dtype=jnp.float32)
    fidx = jnp.asarray(rng.integers(0, H * W, K).astype(np.int32))

    @jax.jit
    def gather_field(s, i):
        return s[i].sum()

    t_field = timeit(lambda: gather_field(field_tbl, fidx), n=30)
    t_base = timeit(lambda: base(field_tbl), n=30)
    t_field_net = max(t_field - t_base, 1e-9)

    row_tbl = jnp.arange(K * 8, dtype=jnp.float32).reshape(K, 8) * 0.5
    ridx = jnp.asarray(rng.integers(0, K, K).astype(np.int32))

    @jax.jit
    def gather_rows(s, i):
        return s[i].sum()

    t_rows = timeit(lambda: gather_rows(row_tbl, ridx), n=30)
    t_rows_net = max(t_rows - t_base, 1e-9)

    # steady-state ceiling: the two gather streams pipeline across keylines,
    # so the slower stream bounds the pass
    t_ceiling = max(t_field_net, t_rows_net)
    gather_rate = K / t_ceiling  # keylines/s at the gather ceiling

    # --- realistic try_vel pass ---
    seq = synthetic.generate(cam, n_frames=8, seed=0)
    frames = [jnp.asarray(seq.images[i] * config.image_gain) for i in range(8)]
    windows = []
    cursor = 0
    for i in range(8):
        j = cursor
        while j < len(seq.imu_ts_us) and seq.imu_ts_us[j] <= seq.ts_us[i]:
            j += 1
        windows.append(pack_imu_window(
            seq.imu_gyro[cursor:j], seq.imu_acc[cursor:j], seq.imu_ts_us[cursor:j],
            config.imu.sample_max))
        cursor = j
    state = T.init_vio_state(config)
    for i in range(6):
        state, odo = step(state, frames[i], windows[i], jnp.float32(0.05), config, mats)
    fence(odo.position)

    thr = state.detector_threshold
    new_map = edge_detect.detect(frames[6], thr, mats, config.detector, cam)
    nn = DF.build_nn_field(new_map, int(core_cfg.search_range), H, W)
    old_map = state.edge_map
    vel = jnp.asarray([0.01, 0.0, 0.02], jnp.float32)
    srm = jnp.float32(10.0)
    res0 = jnp.zeros((K,), jnp.float32)

    @jax.jit
    def one_pass(om, nm, fid, v):
        o = tracker.try_vel(om, nm, fid, v, srm, res0, core_cfg, cam)
        return o.score + o.JtJ.sum() + o.JtF.sum() + o.residuals.sum()

    t_pass = timeit(lambda: one_pass(old_map, new_map, nn, vel), n=30)

    @jax.jit
    def nothing(om):
        return om.rho.sum()

    t_floor = timeit(lambda: nothing(old_map), n=30)
    t_net = max(t_pass - t_floor, 1e-9)

    # access accounting per pass: 2 gathers of K indices (1 + 8 lanes),
    # ~15 [K] streaming reads, [K,4] write + MXU contraction
    n_gathers = 2 * K
    stream_bytes = K * 4 * (15 + 4 + 8)
    ach_gather_rate = n_gathers / t_net
    flops = K * (80 + 32)

    return {
        "keylines_max": K,
        "copy_bw_gbs": copy_bw / 1e9,
        "gather_rate_mrows_s": gather_rate / 1e6,
        "gather_field_us": t_field_net * 1e6,
        "gather_rows_us": t_rows_net * 1e6,
        "try_vel_pass_us": t_net * 1e6,
        "achieved_gather_mrows_s": ach_gather_rate / 1e6,
        # fraction of the measured gather ceiling (the slower of the two
        # gather streams, which pipeline across keylines) the pass achieves
        "gather_ceiling_fraction": t_ceiling / t_net,
        "stream_gbs": stream_bytes / t_net / 1e9,
        "stream_bw_fraction": stream_bytes / t_net / copy_bw,
        "tflops": flops / t_net / 1e12,
    }


def main():
    m = measure()
    K = m["keylines_max"]
    print(f"device dense copy bandwidth     : {m['copy_bw_gbs']:8.1f} GB/s")
    print(f"gather ceiling (keylines/s)     : {m['gather_rate_mrows_s']:8.2f} M/s"
          f"  (field gather {m['gather_field_us']:.1f} us, row gather {m['gather_rows_us']:.1f} us per [{K}])")
    print(f"try_vel pass (net of dispatch)  : {m['try_vel_pass_us']:8.1f} us")
    print(f"  gathers issued                : {2*K} ({m['achieved_gather_mrows_s']:.2f} M/s achieved)")
    print(f"  % of device gather ceiling    : {100.0*m['gather_ceiling_fraction']:8.1f} %"
          f"   (slower of the two gather streams / pass time)")
    print(f"  streaming                     : {m['stream_gbs']:.1f} GB/s ({100.0*m['stream_bw_fraction']:.1f}% of copy BW)")
    print(f"  VPU+MXU flops                 : {m['tflops']:.3f} TFLOP/s")


if __name__ == "__main__":
    main()
