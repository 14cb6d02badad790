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

    t_chain = timeit(lambda: chain(old_map, new_map, att, vel0), n=10)
    pass_us = max(t_chain - t_floor, 1e-9) / _CHAIN * 1e6

    # --- gather-chain ceiling: same-length chain of bare [K,8] row gathers,
    # next indices derived from the gathered values ---
    Nf = att.shape[0]
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

    t_g = timeit(lambda: gather_chain(att, idx0), n=10)
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
