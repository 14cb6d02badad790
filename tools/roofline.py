"""JtJ-kernel roofline report (BASELINE.json metric: "JtJ kernel % of roofline").

The tracker's try_vel pass is LATENCY-bound on its data-dependent gather
chain, not FLOP- or bandwidth-bound: per keyline it projects, gathers the
nearest-keyline attribute row at the projected pixel (one [K,8] row gather
from the attribute field — two chained gathers in the legacy id-field path),
does ~80 VPU flops and a [K,4]^T[K,4] MXU contraction.  A classical FLOP
roofline is meaningless at ~2 MFLOP/pass, and a single dispatch is faster
than host-side timing noise, so this tool measures LATENCIES of dependent
chains compiled into one program:

  * try_vel chain: P passes where each pass's velocity depends on the
    previous score — exactly the dependency structure of the LM loop
    (minimizeVel runs 6 such passes per frame, core.cpp:150-189)
  * gather-chain ceiling: the same-length chain of bare row gathers whose
    indices depend on the previous gather's values — the speed of light for
    any algorithm with try_vel's access pattern on this device

and reports per-pass latency, the ceiling, and their ratio (ceiling/pass,
<= 1; the fraction of the pass spent at the unavoidable gather latency).
Timings are fenced by device->host readbacks (block_until_ready returns
early on the remote backend) with the readback round-trip subtracted.
"""

import time

import numpy as np

# Chain length: the remote backend's dispatch floor fluctuates by O(ms)
# between measurements, so per-link numbers need a long chain to dilute the
# floor error (128 links -> ~10 us/link of floor noise).
_CHAIN = 128


def fence(x):
    np.asarray(x)


def timeit(fn, n=20, repeats=3):
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
    """Measure device ceilings + the try_vel dependent chain; returns metrics.

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

    # --- dispatch floor + dense copy bandwidth ---
    NBIG = 1 << 24
    big = jnp.arange(NBIG, dtype=jnp.float32)

    @jax.jit
    def tiny(x):
        return x[:8].sum()

    t_disp = timeit(lambda: tiny(big), n=10)

    @jax.jit
    def copy(x):
        return (x * 1.0000001).sum()

    t_copy = max(timeit(lambda: copy(big), n=10) - t_disp, 1e-9)
    copy_bw = 2 * NBIG * 4 / t_copy  # read + write, net of dispatch

    # --- realistic state: run the pipeline a few frames ---
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
    new_map = edge_detect.detect(frames[6], thr, mats, config.detector, cam,
                                 field_scale=config.field_scale)
    att = DF.build_att_field(new_map, int(core_cfg.search_range), H, W,
                             config.field_scale)
    old_map = state.edge_map
    vel0 = jnp.asarray([0.01, 0.0, 0.02], jnp.float32)
    srm = jnp.float32(10.0)
    res0 = jnp.zeros((K,), jnp.float32)

    @jax.jit
    def floor_fn(om):
        return om.rho.sum()

    t_floor = timeit(lambda: floor_fn(old_map))

    # --- try_vel dependent chain: P passes, velocity depends on prev score ---
    @jax.jit
    def chain(om, nm, att_f, v0):
        def body(_, carry):
            v, acc = carry
            o = tracker.try_vel(om, nm, att_f, v, srm, res0, core_cfg, cam,
                                field_scale=config.field_scale, att_f=att_f)
            # data dependency: next velocity perturbed by this score
            v = v * (1.0 + 1e-12 * o.score) + 1e-9 * o.JtF
            return v, acc + o.score
        v, acc = jax.lax.fori_loop(0, _CHAIN, body, (v0, jnp.float32(0.0)))
        return acc + v.sum()

    att_r = att.T                     # [N,8] row view of the planes
    t_chain = timeit(lambda: chain(old_map, new_map, att_r, vel0), n=10)
    pass_us = max(t_chain - t_floor, 1e-9) / _CHAIN * 1e6

    # --- gather-chain ceiling: same-length chain of bare [K,8] row gathers,
    # next indices derived from the gathered values ---
    Nf = att_r.shape[0]
    idx0 = jnp.asarray(
        np.random.default_rng(0).integers(0, Nf, K).astype(np.int32))

    @jax.jit
    def gather_chain(tbl, i0):
        def body(_, carry):
            idx, acc = carry
            row = tbl[idx]                       # [K,8] dependent row gather
            nxt = (row[:, 0] + row[:, 7]).astype(jnp.int32) % Nf
            return nxt, acc + row[:, 1].sum()
        idx, acc = jax.lax.fori_loop(0, _CHAIN, body, (i0, jnp.float32(0.0)))
        return acc + idx.sum().astype(jnp.float32)

    t_g = timeit(lambda: gather_chain(att_r, idx0), n=10)
    gather_us = max(t_g - t_floor, 1e-9) / _CHAIN * 1e6

    flops = K * (80 + 32)
    return {
        "keylines_max": K,
        "field_scale": config.field_scale,
        "copy_bw_gbs": copy_bw / 1e9,
        "dispatch_floor_us": t_floor * 1e6,
        "try_vel_pass_us": pass_us,
        "gather_chain_us": gather_us,
        # fraction of the pass latency that is the unavoidable dependent
        # row-gather latency (<= 1; 1.0 = the pass IS a bare gather chain)
        "gather_ceiling_fraction": min(gather_us / pass_us, 1.0),
        "tflops": flops / (pass_us * 1e-6) / 1e12,
    }


def main():
    m = measure()
    K = m["keylines_max"]
    print(f"device dense copy bandwidth     : {m['copy_bw_gbs']:8.1f} GB/s")
    print(f"dispatch floor                  : {m['dispatch_floor_us']:8.1f} us")
    print(f"try_vel pass latency (chain/{_CHAIN}) : {m['try_vel_pass_us']:8.1f} us  [{K} keylines]")
    print(f"bare [K,8] row-gather chain     : {m['gather_chain_us']:8.1f} us/link")
    print(f"  % of pass at gather ceiling   : {100.0 * m['gather_ceiling_fraction']:8.1f} %")
    print(f"  VPU+MXU flops                 : {m['tflops']:.3f} TFLOP/s")


if __name__ == "__main__":
    main()


def measure_stages() -> dict:
    """Per-stage ceiling fractions for the hot stages beyond tryVel
    (VERDICT r2 item 7): each stage is timed as a long dependent chain
    compiled into one program (dispatch-floor-free), and compared against
    the relevant device ceiling:

      * detect  -> the raw MXU sandwich chain of its own scale-space /
                   plane-fit matmuls (same shapes, measured)
      * jfa     -> the HBM speed-of-light for its planes (one load + one
                   store of the 5 seed planes + 8 output planes at the
                   measured copy bandwidth; the flood itself is VMEM-
                   resident by construction, so this fraction reads as
                   "how far the VPU roll schedule sits above pure HBM")
      * tube    -> its gather volume ([K,P,8] att rows + [K,P,4] dyn rows)
                   at the device's measured row-gather throughput

    Fractions are ceiling/measured (<= 1; 1.0 = at the ceiling).
    """
    import jax
    import jax.numpy as jnp

    from rebvio_tpu import types as T
    from rebvio_tpu.configs import PipelineConfig
    from rebvio_tpu.data import synthetic
    from rebvio_tpu.ops import distance_field as DF
    from rebvio_tpu.ops import edge_detect, matching
    from rebvio_tpu.ops.imu import pack_imu_window
    from rebvio_tpu.pipeline import frontend_matrices, step

    config = PipelineConfig()
    cam = config.camera
    core_cfg = config.core
    mats = frontend_matrices(config)
    H, W = cam.rows, cam.cols
    K = config.detector.keylines_max
    P = config.edge_map.tube_probes
    CH = 32

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

    img = frames[6]
    thr = state.detector_threshold

    @jax.jit
    def floor_fn(x):
        return x[0, 0]

    t_floor = timeit(lambda: floor_fn(img), n=10)

    # --- detect chain vs raw matmul-sandwich chain ---
    @jax.jit
    def detect_chain(im, t0):
        def body(_, carry):
            t, acc = carry
            m = edge_detect.detect(im, t, mats, config.detector, cam,
                                   field_scale=config.field_scale)
            s = m.grad_norm.sum()
            return t * (1.0 + 1e-12 * s), acc + s
        t, acc = jax.lax.fori_loop(0, CH, body, (t0, jnp.float32(0.0)))
        return acc + t

    t_detect = (timeit(lambda: detect_chain(img, thr), n=3) - t_floor) / CH

    # raw MXU floor: the frontend's banded sandwiches (2-scale blur = 4
    # matmuls + detection-gate sandwiches = 4 matmuls), same shapes
    LL, R = mats.LL, mats.R0   # [2H,H] stacked cascade + [W,W] right band

    @jax.jit
    def mm_chain(im):
        def body(_, x):
            y = (LL @ x)[:H] @ R
            y = (LL @ y)[:H] @ R
            return y * (1.0 / jnp.float32(1e6))
        return jax.lax.fori_loop(0, CH, body, im).sum()

    t_mm = (timeit(lambda: mm_chain(img), n=3) - t_floor) / CH * 2.0  # 8 matmuls

    # --- JFA att-field chain vs HBM floor ---
    new_map = edge_detect.detect(img, thr, mats, config.detector, cam,
                                 field_scale=config.field_scale)

    @jax.jit
    def att_chain(m):
        def body(_, carry):
            g, acc = carry
            att = DF.build_att_field(m.replace(grad_norm=m.grad_norm + 1e-12 * g),
                                     int(core_cfg.search_range), H, W,
                                     config.field_scale)
            s = att[DF.ATT_ID].sum()
            return s, acc + s
        g, acc = jax.lax.fori_loop(0, CH, body, (jnp.float32(0.0), jnp.float32(0.0)))
        return acc

    t_att = (timeit(lambda: att_chain(new_map), n=3) - t_floor) / CH
    n_field = ((H + config.field_scale - 1) // config.field_scale) * (
        (W + config.field_scale - 1) // config.field_scale)
    # measured dense copy bandwidth (read+write)
    NBIG = 1 << 24
    big = jnp.arange(NBIG, dtype=jnp.float32)

    @jax.jit
    def copy(x):
        return (x * 1.0000001).sum()

    t_copy = max(timeit(lambda: copy(big), n=10) - t_floor, 1e-9)
    copy_bw = 2 * NBIG * 4 / t_copy
    jfa_floor = (5 + 8) * n_field * 4 * 2 / copy_bw

    # --- tube matcher chain vs gather-volume floor ---
    att = DF.build_att_field(new_map, int(core_cfg.search_range), H, W,
                             config.field_scale)
    old_map = state.edge_map.replace(att_img=att)
    vel = jnp.asarray([0.01, 0.0, 0.02], jnp.float32)
    Rvel = jnp.eye(3, dtype=jnp.float32) * 1e-5
    Rback = jnp.eye(3, dtype=jnp.float32)

    @jax.jit
    def tube_chain(nm, om, v0):
        def body(_, carry):
            v, acc = carry
            m2, klm = matching.directed_match_tube(
                nm, om, v, Rvel, Rback, config.edge_map, core_cfg, cam,
                field_scale=config.field_scale)
            s = klm.astype(jnp.float32)
            return v * (1.0 + 1e-12 * s), acc + s
        v, acc = jax.lax.fori_loop(0, CH, body, (v0, jnp.float32(0.0)))
        return acc + v.sum()

    t_tube = (timeit(lambda: tube_chain(new_map, old_map, vel), n=3) - t_floor) / CH

    # row-gather throughput: one big [M,8] row gather, amortized
    M = K * P
    tbl = att.T                     # [N,8] row view
    gidx = jnp.asarray(np.random.default_rng(1).integers(
        0, tbl.shape[0], M).astype(np.int32))

    @jax.jit
    def big_gather(t, i0):
        def body(_, carry):
            idx, acc = carry
            row = t[idx]
            return idx, acc + row[:, 1].sum()
        idx, acc = jax.lax.fori_loop(0, CH, body, (i0, jnp.float32(0.0)))
        return acc

    t_bg = (timeit(lambda: big_gather(tbl, gidx), n=3) - t_floor) / CH
    gather_bw = M * 8 * 4 / max(t_bg, 1e-9)
    tube_gather_bytes = K * P * (8 + 4) * 4
    tube_floor = tube_gather_bytes / gather_bw

    return {
        "detect_ms": t_detect * 1e3,
        "detect_mxu_floor_ms": t_mm * 1e3,
        "detect_ceiling_fraction": min(t_mm / max(t_detect, 1e-9), 1.0),
        "jfa_ms": t_att * 1e3,
        "jfa_hbm_floor_ms": jfa_floor * 1e3,
        "jfa_ceiling_fraction": min(jfa_floor / max(t_att, 1e-9), 1.0),
        "tube_ms": t_tube * 1e3,
        "tube_gather_floor_ms": tube_floor * 1e3,
        "tube_ceiling_fraction": min(tube_floor / max(t_tube, 1e-9), 1.0),
        "gather_row_bw_gbs": gather_bw / 1e9,
        "copy_bw_gbs": copy_bw / 1e9,
    }


def main_stages():
    m = measure_stages()
    for k, v in m.items():
        print(f"{k:28s} {v:10.4f}")
