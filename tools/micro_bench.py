"""Dependent-chain latencies of individual pipeline stages.

Usage: python -m tools.micro_bench [--profile fast|parity] [--stages a,b,c]
Stages: scale_space detect sab regularize tube try_vel forward ext quantile
"""

import argparse
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


CHAIN = 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="fast", choices=["fast", "parity"])
    ap.add_argument("--stages", default="scale_space,sab,regularize,tube,try_vel")
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    import jax
    import jax.numpy as jnp

    from rebvio_tpu import types as T
    from rebvio_tpu.configs import PipelineConfig, fast_profile
    from rebvio_tpu.data import synthetic
    from rebvio_tpu.ops import distance_field as DF
    from rebvio_tpu.ops import edge_detect, matching, sab, tracker
    from rebvio_tpu.ops.imu import pack_imu_window
    from rebvio_tpu.ops.scale_space import build_scale_space
    from rebvio_tpu.pipeline import frontend_matrices, step

    config = fast_profile() if args.profile == "fast" else PipelineConfig()
    cam = config.camera
    core_cfg = config.core
    mats = frontend_matrices(config)
    H, W = cam.rows, cam.cols
    K = config.detector.keylines_max

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
    fence(np.asarray(odo.position))

    em = state.edge_map
    frame = frames[6]

    @jax.jit
    def floor_fn(m):
        return m.rho.sum()

    t_floor = timeit(lambda: floor_fn(em))
    print(f"floor               : {t_floor*1e6:8.1f} us")

    def report(name, t):
        print(f"{name:20s}: {(t - t_floor)/CHAIN*1e6:8.1f} us/link")

    if "scale_space" in stages:
        @jax.jit
        def ss_chain(fr):
            def body(_, carry):
                f, acc = carry
                s0, dog, mag = build_scale_space(f, mats)
                s = dog.sum()
                f = f * (1.0 + 1e-12 * s)
                return f, acc + s
            f, acc = jax.lax.fori_loop(0, CHAIN, body, (fr, jnp.float32(0.0)))
            return acc + f.sum()
        report("scale_space", timeit(lambda: ss_chain(frame)))

    if "sab" in stages:
        eye3 = jnp.eye(3, dtype=jnp.float32)
        icfg = config.imu

        @jax.jit
        def sab_chain(st):
            sst = st.sab_state
            a_s = jnp.asarray([0.1, -9.7, 0.2], jnp.float32)
            a_v = jnp.asarray([0.3, -2.4, 0.05], jnp.float32)
            Rot = eye3
            W_Xgv = jnp.eye(6, dtype=jnp.float32) * 100.0
            Xgva = jnp.ones((6,), jnp.float32) * 1e-3

            def body(_, carry):
                X, P, acc = carry
                out = sab.estimate_bias(
                    a_s, a_v, jnp.float32(1.0), Rot, X, P,
                    eye3 * icfg.g_uncertainty ** 2, eye3 * 1e-4,
                    eye3 * icfg.vbias_std_dev ** 2, jnp.float32(1e-3),
                    jnp.float32(icfg.g_norm_uncertainty ** 2),
                    eye3 * icfg.acc_std_dev ** 2, eye3 * 1e-5,
                    W_Xgv, Xgva, jnp.float32(icfg.g_norm),
                    iters=icfg.sab_iterations,
                )
                return out.X, out.P, acc + out.K
            X, P, acc = jax.lax.fori_loop(
                0, CHAIN, body, (sst.X, sst.P, jnp.float32(0.0)))
            return acc + X.sum() + P.sum()
        report(f"sab (i={icfg.sab_iterations})", timeit(lambda: sab_chain(state)))

    if "regularize" in stages:
        @jax.jit
        def reg_chain(m):
            def body(_, carry):
                rho, acc = carry
                m2 = matching.regularize_1iter(
                    m.replace(rho=rho), config.edge_map.regularization_threshold)
                return m2.rho, acc + m2.rho.sum()
            rho, acc = jax.lax.fori_loop(0, CHAIN, body, (m.rho, jnp.float32(0.0)))
            return acc
        report("regularize", timeit(lambda: reg_chain(em)))

    if "tube" in stages or "try_vel" in stages:
        thr = state.detector_threshold
        new_map = edge_detect.detect(frame, thr, mats, config.detector, cam,
                                     field_scale=config.field_scale)
        att = DF.build_att_field(new_map, int(core_cfg.search_range), H, W,
                                 config.field_scale)
        new_map = new_map.replace(att_img=att)
        old_att = DF.build_att_field(em, int(core_cfg.search_range), H, W,
                                     config.field_scale)
        em2 = em.replace(att_img=old_att)
        vel = jnp.asarray([0.01, 0.0, 0.02], jnp.float32)
        Rvel = jnp.eye(3, dtype=jnp.float32) * 1e-4
        Rback = jnp.eye(3, dtype=jnp.float32)

        if "tube" in stages:
            @jax.jit
            def tube_chain(nm, om):
                def body(_, carry):
                    v, acc = carry
                    m2, klm = matching.directed_match_tube(
                        nm, om, v, Rvel, Rback, config.edge_map, core_cfg, cam,
                        field_scale=config.field_scale)
                    v = v * (1.0 + 1e-12 * m2.rho.sum())
                    return v, acc + klm.astype(jnp.float32)
                v, acc = jax.lax.fori_loop(0, CHAIN, body, (vel, jnp.float32(0.0)))
                return acc + v.sum()
            report(f"tube (P={config.edge_map.tube_probes})",
                   timeit(lambda: tube_chain(new_map, em2)))

        if "try_vel" in stages:
            srm = jnp.float32(10.0)
            res0 = jnp.zeros((K,), jnp.float32)

            @jax.jit
            def tv_chain(om, att_f):
                def body(_, carry):
                    v, acc = carry
                    o = tracker.try_vel(om, new_map, att_f, v, srm, res0,
                                        core_cfg, cam,
                                        field_scale=config.field_scale,
                                        att_f=att_f)
                    v = v * (1.0 + 1e-12 * o.score) + 1e-9 * o.JtF
                    return v, acc + o.score
                v, acc = jax.lax.fori_loop(0, CHAIN, body, (vel, jnp.float32(0.0)))
                return acc + v.sum()
            report("try_vel", timeit(lambda: tv_chain(em2, att.T)))


if __name__ == "__main__":
    main()
