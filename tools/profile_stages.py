"""Per-stage timing of the VIO step via compiled pipeline prefixes.

On the remote-TPU backend, per-dispatch overhead scales with the size of a
jitted function's *output* pytree (returning a full EdgeMap costs ~30 ms of
handle traffic), so timing stages as separate jits mis-attributes wildly.
Instead we compile the pipeline *prefix* up to each stage, reduce everything
to one scalar (constant dispatch cost), and report consecutive differences.

Usage: python -m tools.profile_stages [--matcher tube|walk] [--df jfa|raster]
"""

import argparse
import time
from functools import partial

import numpy as np


def fence(x):
    np.asarray(x)


def timeit(fn, n=20, warmup=3, repeats=3):
    out = None
    for _ in range(warmup):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--matcher", default=None)
    ap.add_argument("--df", default=None)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--profile", default="parity", choices=["parity", "fast"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rebvio_tpu import types as T
    from rebvio_tpu.configs import PipelineConfig
    from rebvio_tpu.data import synthetic
    from rebvio_tpu.geometry import linalg, so3
    from rebvio_tpu.ops import distance_field as DF
    from rebvio_tpu.ops import edge_detect, imu as imu_ops, matching, tracker
    from rebvio_tpu.ops.imu import pack_imu_window
    from rebvio_tpu.pipeline import frontend_matrices, step

    from rebvio_tpu.configs import fast_profile

    kw = {}
    if args.matcher:
        kw["matcher"] = args.matcher
    if args.df:
        kw["df_mode"] = args.df
    config = fast_profile(**kw) if args.profile == "fast" else PipelineConfig(**kw)
    cam = config.camera
    core_cfg = config.core
    mats = frontend_matrices(config)

    n_frames = 8
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
    for i in range(6):
        state, odo = step(state, frames[i], windows[i], dt, config, mats)
    fence(np.asarray(odo.position))

    frame = frames[6]
    imu_data = windows[6]
    R_c2i = jnp.asarray(cam.R_c2i_np())
    t_c2i = jnp.asarray(cam.t_c2i_np())

    def msum(m):
        s = m.rho.sum() + m.sigma_rho.sum() + m.pos_img.sum() + m.grad.sum()
        s = s + (m.match_id.sum() + m.matches.sum()).astype(jnp.float32)
        return s

    STAGES = [
        "detect", "att_field", "imu+rotate", "minimize_vel", "forward_match",
        "ext_rot_vel", "directed_match", "reg+ekf(fused)", "(product path)",
    ]

    @partial(jax.jit, static_argnames=("upto",))
    def prefix(st, fr, imu_d, upto):
        threshold = edge_detect.autogain_threshold(
            st.detector_threshold, st.keylines_count, config.detector
        )
        new_map = edge_detect.detect(fr, threshold, mats, config.detector, config.camera,
                                     field_scale=config.field_scale)
        aux = msum(new_map) + threshold
        if upto == 0:
            return aux
        if config.df_mode == "jfa":
            att = DF.build_att_field(new_map, int(core_cfg.search_range), cam.rows, cam.cols,
                                     config.field_scale)
            new_map = new_map.replace(att_img=att)
            field_ids = att
            aux = aux + att[DF.ATT_ID].sum()
        else:
            fld = DF.build_distance_field(new_map, int(core_cfg.search_range), cam.rows, cam.cols)
            field_ids = DF.field_id(fld, new_map.kmax)
            aux = aux + field_ids.sum().astype(jnp.float32)
        if upto == 1:
            return aux
        ii = imu_ops.integrate_imu(imu_d, R_c2i, t_c2i)
        R_prior_T = so3.exp(st.imu_state.Bg) @ ii.R.T
        old_map = matching.rotate_keylines(st.edge_map, R_prior_T, cam.fm)
        aux = aux + msum(old_map) + ii.cacc.sum()
        if upto == 2:
            return aux
        Vg0 = jnp.zeros(3, jnp.float32)
        Vg, P_Vg, old_map, _score = tracker.minimize_vel(
            old_map, new_map, field_ids, Vg0, core_cfg, cam, config.field_scale,
            use_att=(config.df_mode == "jfa"))
        aux = aux + Vg.sum() + P_Vg.sum() + msum(old_map)
        if upto == 3:
            return aux
        new_map, nfm = matching.forward_match(old_map, new_map)
        aux = aux + msum(new_map) + nfm.astype(jnp.float32)
        if upto == 4:
            return aux
        Xv, W_Xv = tracker.ext_rot_vel(new_map, Vg, core_cfg, cam)
        aux = aux + Xv.sum() + W_Xv.sum()
        if upto == 5:
            return aux
        R_Xv = linalg.chol_inverse(W_Xv)
        P_V = R_Xv[0:3, 0:3]
        V = Xv[0:3]
        Rgva = so3.exp(Xv[3:6]).T
        if config.matcher == "tube":
            new_map, klm = matching.directed_match_tube(
                new_map, old_map, V, P_V, Rgva, config.edge_map, core_cfg, cam,
                field_scale=config.field_scale)
        else:
            new_map, klm = matching.directed_match(
                new_map, old_map, V, P_V, Rgva, config.edge_map, core_cfg, cam)
        aux = aux + msum(new_map) + klm.astype(jnp.float32)
        if upto == 6:
            return aux
        # the PRODUCT path: regularize + depth EKF as one fused stage
        # (tracker.regularize_and_update_depth / pallas reg_ekf kernel)
        new_map = tracker.regularize_and_update_depth(
            new_map, V, config.edge_map.regularization_threshold, core_cfg, cam)
        aux = aux + msum(new_map)
        if upto == 7:
            return aux
        return aux  # stage 8 == stage 7 (fused); delta prints ~0

    N = args.iters

    @jax.jit
    def step_scalar(st, fr, imu_d):
        s2, odo = step(st, fr, imu_d, dt, config, mats)
        em2 = s2.edge_map
        return (msum(em2) + em2.kl_id_img.sum().astype(jnp.float32)
                + em2.att_img[2].sum()
                + odo.position.sum() + odo.orientation.sum() + s2.K
                + s2.sab_state.X.sum() + s2.Pos.sum())

    t_scalar = timeit(lambda: step_scalar(state, frame, imu_data), n=N)
    t_step = timeit(lambda: step(state, frame, imu_data, dt, config, mats)[1].position, n=N)

    times = []
    for k in range(len(STAGES)):
        times.append(timeit(lambda k=k: prefix(state, frame, imu_data, k), n=N))

    prev = 0.0
    for name, t in zip(STAGES, times):
        print(f"{name:20s} cum {t*1e3:8.3f} ms   delta {(t-prev)*1e3:8.3f} ms")
        prev = t
    print(f"{'step (scalar out)':20s} cum {t_scalar*1e3:8.3f} ms   delta {(t_scalar-prev)*1e3:8.3f} ms  (SAB + pose + assembly)")
    print(f"{'full step':20s} cum {t_step*1e3:8.3f} ms   delta {(t_step-t_scalar)*1e3:8.3f} ms  (state-output dispatch overhead)")


if __name__ == "__main__":
    main()
