"""In-situ stage attribution by ABLATION: stub one stage at a time (module
monkeypatch + jit cache clear), re-jit the full step, and report the delta
vs the unmodified step.  Unlike prefix profiling, the surviving program is
the real product program minus the stage, so scheduling and fusion stay
faithful; a stage's delta includes upstream work only it consumed.
"""
import time
import numpy as np
import jax, jax.numpy as jnp

from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.data import synthetic
import rebvio_tpu.ops.matching as M
import rebvio_tpu.ops.tracker as TR
import rebvio_tpu.ops.sab as SB
import rebvio_tpu.ops.distance_field as DFM
import rebvio_tpu.ops.edge_detect as ED
from rebvio_tpu.pipeline import frontend_matrices, step
from rebvio_tpu.ops.imu import pack_imu_window
from rebvio_tpu import types as T

def fence(x): np.asarray(x)

def timeit(fn, n=20, repeats=3):
    out = fn(); fence(out)
    t0 = time.perf_counter(); fence(out); rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n): out = fn()
        fence(out)
        best = min(best, (time.perf_counter() - t0 - rtt) / n)
    return best

def main():
    config = PipelineConfig()
    cam = config.camera
    mats = frontend_matrices(config)
    seq = synthetic.generate(cam, n_frames=8, seed=0)
    frames = [jnp.asarray(seq.images[i] * config.image_gain) for i in range(8)]
    windows = []
    cursor = 0
    for i in range(8):
        j = cursor
        while j < len(seq.imu_ts_us) and seq.imu_ts_us[j] <= seq.ts_us[i]:
            j += 1
        windows.append(pack_imu_window(seq.imu_gyro[cursor:j], seq.imu_acc[cursor:j],
                                       seq.imu_ts_us[cursor:j], config.imu.sample_max))
        cursor = j
    dt = jnp.float32(0.05)
    state = T.init_vio_state(config)
    for i in range(7):
        state, odo = step(state, frames[i], windows[i], dt, config, mats)
    fence(odo.position)
    frame, imu_d = frames[7], windows[7]

    def make_scalar():
        @jax.jit
        def step_scalar(st, fr, iw):
            s2, odo = step(st, fr, iw, dt, config, mats)
            em = s2.edge_map
            return (odo.position.sum() + em.rho.sum() + em.sigma_rho.sum()
                    + em.match_pos_img.sum() + s2.K + s2.sab_state.X.sum())
        return step_scalar

    base_fn = make_scalar()
    t_base = timeit(lambda: base_fn(state, frame, imu_d))
    print(f"baseline step      : {t_base*1e3:7.3f} ms")

    def measure(name, patches):
        saved = [(mod, attr, getattr(mod, attr)) for mod, attr, _ in patches]
        for mod, attr, stub in patches:
            setattr(mod, attr, stub)
        jax.clear_caches()
        try:
            fn = make_scalar()
            t = timeit(lambda: fn(state, frame, imu_d))
            print(f"- {name:17s}: {t*1e3:7.3f} ms   stage = {(t_base-t)*1e3:7.3f} ms")
        finally:
            for mod, attr, orig in saved:
                setattr(mod, attr, orig)
            jax.clear_caches()

    # tube matcher -> pass-through (no matching)
    measure("directed_match", [(M, "directed_match_tube",
        lambda new, old, *a, **k: (new, jnp.int32(10000)))])

    # minimize_vel -> zero velocity, identity outputs
    measure("minimize_vel", [(TR, "minimize_vel",
        lambda old, new, fid, v0, cfg, cam_, *a, **k: (
            v0 + 1e-6, jnp.eye(3, dtype=jnp.float32) * 1e-4, old, jnp.float32(1.0)))])

    # SAB -> passthrough
    def sab_stub(a_s, a_v, kP, Rot, X, P, Qg, Qrot, Qbias, QKp, Rg, Rs, Rv,
                 Wvw, Xvw, g_gravit, iters=5):
        return SB.EstimateBiasOut(K=jnp.float32(1.0), X=X, P=P,
                                  g_est=X[1:4], b_est=X[4:7], Xvw=Xvw)
    measure("sab", [(SB, "estimate_bias", sab_stub)])

    # reg+ekf -> identity
    measure("reg+ekf", [(TR, "regularize_and_update_depth",
        lambda em, vel, thr, cfg, cam_: em)])

    # forward_match -> identity
    measure("forward_match", [(M, "forward_match",
        lambda old, new: (new, jnp.int32(1000)))])

    # attribute field -> zeros (detect keeps running; flood+seed ablated)
    measure("att_field", [(DFM, "build_att_field",
        lambda em, sr, r, c, s=1: jnp.zeros((8, (r // s) * ((c + s - 1) // s)),
                                            jnp.float32))])

    # ext_rot_vel -> fixed
    measure("ext_rot_vel", [(TR, "ext_rot_vel",
        lambda new, vel, cfg, cam_: (jnp.zeros(6, jnp.float32) + 1e-6,
                                     jnp.eye(6, dtype=jnp.float32)))])

if __name__ == "__main__":
    main()
