"""Chained micro-benches of the remaining hot stages at parity on TPU.

Each stage runs with REAL pipeline inputs (a warmed state from 7 frames),
chained CHAIN times through a perturbation so the dispatch floor amortizes,
with a floor chain subtracted.  Unlike the prefix profiler, each stage's
FULL output feeds the chain, so XLA cannot dead-code-eliminate stage work.
"""
import time
import numpy as np
import jax, jax.numpy as jnp

from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.ops import edge_detect, tracker, matching, sab as sab_ops, imu as imu_ops
from rebvio_tpu.geometry import linalg, so3
from rebvio_tpu.pipeline import frontend_matrices, step
from rebvio_tpu.ops.imu import pack_imu_window
from rebvio_tpu import types as T

CHAIN = 32
def fence(x): np.asarray(x)

def timeit(fn, n=4, repeats=3):
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
    core = config.core
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
        windows.append(pack_imu_window(seq.imu_gyro[cursor:j], seq.imu_acc[cursor:j],
                                       seq.imu_ts_us[cursor:j], config.imu.sample_max))
        cursor = j
    dt = jnp.float32(0.05)
    state = T.init_vio_state(config)
    for i in range(7):
        state, odo = step(state, frames[i], windows[i], dt, config, mats)
    old_full = state.edge_map        # has att_img
    # a detected new map (old map state doubles as 'new' target: same shapes)
    fence(old_full.rho)
    imu_w = windows[7]

    def chain_em(fn):
        """chain via rho perturbation; consume the WHOLE EdgeMap result."""
        @jax.jit
        def chained(m):
            def body(_, carry):
                rho, acc = carry
                out = fn(m.replace(rho=rho))
                m2, aux = out
                s = (m2.rho.sum() + m2.sigma_rho.sum() + m2.match_pos_img.sum()
                     + m2.match_grad.sum()
                     + (m2.match_id.sum() + m2.matches.sum()).astype(jnp.float32)
                     + aux)
                return rho * (1.0 + 1e-12 * s), acc + s
            rho, acc = jax.lax.fori_loop(0, CHAIN, body, (m.rho, jnp.float32(0)))
            return acc
        return chained

    floor = chain_em(lambda m: (m, jnp.float32(0.0)))
    t_floor = timeit(lambda: floor(old_full))
    print(f"floor              : {t_floor/CHAIN*1e6:7.1f} us/link")

    vel = jnp.asarray([0.01, -0.005, 0.02], jnp.float32)
    Rvel = jnp.eye(3, dtype=jnp.float32) * 1e-5
    Rb = jnp.asarray(np.asarray(so3.exp(jnp.asarray([0.001,0.002,-0.001],jnp.float32))))

    # tube matcher
    f_tube = chain_em(lambda m: (lambda r: (r[0], r[1].astype(jnp.float32)))(
        matching._directed_match_tube_impl(
            m, old_full, vel, Rvel, Rb, config.edge_map, core, cam,
            0, config.field_scale, None, True)))
    t = timeit(lambda: f_tube(old_full))
    print(f"directed_match_tube: {(t-t_floor)/CHAIN*1e6:7.1f} us")

    # forward match (needs match_id_forward; reuse match_id as a stand-in)
    def fwd(m):
        old2 = old_full.replace(match_id_forward=m.match_id)
        r = matching.forward_match(old2, m)
        return r[0], r[1].astype(jnp.float32)
    f_fwd = chain_em(fwd)
    t = timeit(lambda: f_fwd(old_full))
    print(f"forward_match      : {(t-t_floor)/CHAIN*1e6:7.1f} us")

    # minimize_vel (6 try_vel passes + LM bookkeeping)
    def mv(m):
        velr, P_V, old2, score = tracker.minimize_vel(
            m, old_full, old_full.att_img, jnp.zeros(3, jnp.float32),
            core, cam, config.field_scale, use_att=True)
        return old2, velr.sum() + P_V.sum() + score
    f_mv = chain_em(mv)
    t = timeit(lambda: f_mv(old_full))
    print(f"minimize_vel       : {(t-t_floor)/CHAIN*1e6:7.1f} us")

    # SAB block + pose-ish small algebra, chained through X
    ist = state.imu_state
    sst = state.sab_state
    icfg = config.imu
    eye3 = jnp.eye(3, dtype=jnp.float32)

    @jax.jit
    def sab_chain(X0):
        def body(_, carry):
            X, acc = carry
            out = sab_ops.estimate_bias(
                jnp.asarray([0.1, -0.05, 9.7], jnp.float32),
                jnp.asarray([0.12, -0.04, 9.6], jnp.float32),
                jnp.float32(1.0), Rb, X, sst.P, eye3 * 1e-6, eye3 * 1e-4,
                eye3 * 1e-7, jnp.float32(1.0), jnp.float32(4e4), eye3 * 4e-6,
                eye3 * 1e-3, jnp.eye(6, dtype=jnp.float32) * 10.0, jnp.zeros(6, jnp.float32),
                jnp.float32(9.81), iters=icfg.sab_iterations)
            s = out.X.sum() + out.P.sum() + out.K
            return X * (1.0 + 1e-12 * s) + 1e-12 * out.X, acc + s
        X, acc = jax.lax.fori_loop(0, CHAIN, body, (X0, jnp.float32(0)))
        return acc
    t = timeit(lambda: sab_chain(sst.X))
    print(f"sab estimate_bias  : {(t-t_floor)/CHAIN*1e6:7.1f} us")

    # imu integrate + double rotate_keylines
    def ir(m):
        ii = imu_ops.integrate_imu(imu_w, jnp.asarray(cam.R_c2i_np()), jnp.asarray(cam.t_c2i_np()))
        m2 = matching.rotate_keylines(m, Rb @ ii.R.T, cam.fm)
        m2 = matching.rotate_keylines(m2, Rb, cam.fm)
        return m2, ii.cacc.sum() + ii.dt_s
    f_ir = chain_em(ir)
    t = timeit(lambda: f_ir(old_full))
    print(f"imu+2x rotate      : {(t-t_floor)/CHAIN*1e6:7.1f} us")


def main_tube():
    """Decompose directed_match_tube cost: probe gather, dyn gather, rest."""
    config = PipelineConfig()
    cam = config.camera
    core = config.core
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
        windows.append(pack_imu_window(seq.imu_gyro[cursor:j], seq.imu_acc[cursor:j],
                                       seq.imu_ts_us[cursor:j], config.imu.sample_max))
        cursor = j
    dt = jnp.float32(0.05)
    state = T.init_vio_state(config)
    for i in range(7):
        state, odo = step(state, frames[i], windows[i], dt, config, mats)
    m0 = state.edge_map
    fence(m0.rho)
    vel = jnp.asarray([0.01, -0.005, 0.02], jnp.float32)
    Rvel = jnp.eye(3, dtype=jnp.float32) * 1e-5
    Rb = jnp.asarray(np.asarray(so3.exp(jnp.asarray([0.001,0.002,-0.001],jnp.float32))))
    kmax = m0.kmax
    H, W = cam.rows, cam.cols
    fs = config.field_scale
    Wf = (W + fs - 1) // fs
    P = config.edge_map.tube_probes

    def chain_s(fn):
        @jax.jit
        def chained(m):
            def body(_, carry):
                rho, acc = carry
                s = fn(m.replace(rho=rho))
                return rho * (1.0 + 1e-12 * s), acc + s
            rho, acc = jax.lax.fori_loop(0, CHAIN, body, (m.rho, jnp.float32(0)))
            return acc
        return chained

    rng = np.random.RandomState(0)
    pidx_base = jnp.asarray(rng.randint(0, (H//fs)*Wf, size=(P, kmax)), jnp.int32)
    att_rows0 = m0.att_img.T          # [N,8] row view (planes are the carried form)

    def probe_gather(m):
        # index perturbation depends on rho so the gather can't hoist
        off = (m.rho[None, :] * 0).astype(jnp.int32)
        rowp_t = att_rows0[pidx_base + off]
        return rowp_t.sum()
    c_pg = chain_s(probe_gather)
    t_pg = timeit(lambda: c_pg(m0))

    def probe_plus_dyn(m):
        off = (m.rho[None, :] * 0).astype(jnp.int32)
        rowp_t = att_rows0[pidx_base + off]
        from rebvio_tpu.ops.distance_field import ATT_ID
        dyn = jnp.stack([m0.rho, m0.sigma_rho,
                         m0.matches.astype(jnp.float32),
                         m0.match_id_keyframe.astype(jnp.float32)], axis=-1)
        os_t = jnp.clip(rowp_t[..., ATT_ID].astype(jnp.int32), 0, kmax - 1)
        drow_t = dyn[os_t]
        return rowp_t.sum() + drow_t.sum()
    c_pd = chain_s(probe_plus_dyn)
    t_pd = timeit(lambda: c_pd(m0))

    def with_moveaxis(m):
        off = (m.rho[None, :] * 0).astype(jnp.int32)
        rowp_t = att_rows0[pidx_base + off]
        from rebvio_tpu.ops.distance_field import ATT_ID
        dyn = jnp.stack([m0.rho, m0.sigma_rho,
                         m0.matches.astype(jnp.float32),
                         m0.match_id_keyframe.astype(jnp.float32)], axis=-1)
        os_t = jnp.clip(rowp_t[..., ATT_ID].astype(jnp.int32), 0, kmax - 1)
        drow_t = dyn[os_t]
        att_pk = jnp.moveaxis(rowp_t, -1, 0)
        dyn_t = jnp.moveaxis(drow_t, -1, 0)
        return att_pk.sum() + dyn_t.sum()
    c_mv = chain_s(with_moveaxis)
    t_mv = timeit(lambda: c_mv(m0))

    c_fl = chain_s(lambda m: m.rho.sum())
    floor2 = timeit(lambda: c_fl(m0))
    print(f"floor              : {floor2/CHAIN*1e6:7.1f} us/link")
    print(f"[K,{P},8] probe gthr: {(t_pg-floor2)/CHAIN*1e6:7.1f} us")
    print(f"+ dependent dyn    : {(t_pd-floor2)/CHAIN*1e6:7.1f} us")
    print(f"+ 2x moveaxis      : {(t_mv-floor2)/CHAIN*1e6:7.1f} us")



def main_tube2():
    """Gather lowering shapes: monolithic [P*K] vs per-probe [K] gathers."""
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
    m0 = state.edge_map
    fence(m0.rho)
    kmax = m0.kmax
    H, W = cam.rows, cam.cols
    fs = config.field_scale
    Wf = (W + fs - 1) // fs
    N = (H // fs) * Wf
    P = 8
    rng = np.random.RandomState(0)
    pidx = jnp.asarray(rng.randint(0, N, size=(P, kmax)), jnp.int32)

    def chain_s(fn):
        @jax.jit
        def chained(m):
            def body(_, carry):
                rho, acc = carry
                s = fn(m.replace(rho=rho))
                return rho * (1.0 + 1e-12 * s), acc + s
            rho, acc = jax.lax.fori_loop(0, CHAIN, body, (m.rho, jnp.float32(0)))
            return acc
        return chained

    variants = {}
    def v_mono(m):
        off = (m.rho[None, :] * 0).astype(jnp.int32)
        return att_rows0[pidx + off].sum()
    variants["monolithic [P,K]"] = v_mono

    def v_split(m):
        off = (m.rho * 0).astype(jnp.int32)
        tot = jnp.float32(0)
        for p in range(P):
            tot = tot + att_rows0[pidx[p] + off].sum()
        return tot
    variants["8x per-probe [K]"] = v_split

    def v_flat(m):
        off = (m.rho[None, :] * 0).astype(jnp.int32)
        return att_rows0[(pidx + off).reshape(-1)].sum()
    variants["flat [P*K]"] = v_flat

    def v_sorted(m):
        # spatially coherent (sorted) indices: locality sensitivity probe
        off = (m.rho[None, :] * 0).astype(jnp.int32)
        srt = jnp.sort(pidx.reshape(-1))
        return att_rows0[srt + jnp.tile(off[0], P)].sum()
    variants["sorted [P*K]"] = v_sorted

    c_fl = chain_s(lambda m: m.rho.sum())
    floor2 = timeit(lambda: c_fl(m0))
    print(f"floor              : {floor2/CHAIN*1e6:7.1f} us/link")
    for name, fn in variants.items():
        c = chain_s(fn)
        t = timeit(lambda: c(m0))
        print(f"{name:19s}: {(t-floor2)/CHAIN*1e6:7.1f} us")


def main_thresh():
    """Per-gather index-count cost curve for an [N,8] f32 row table."""
    config = PipelineConfig()
    cam = config.camera
    fs = config.field_scale
    N = (cam.rows // fs) * ((cam.cols + fs - 1) // fs)
    tbl = jnp.asarray(np.random.RandomState(0).rand(N, 8), jnp.float32)
    rng = np.random.RandomState(1)
    TOT = 128000
    idx_all = jnp.asarray(rng.randint(0, N, size=TOT), jnp.int32)
    seedv = jnp.float32(1.0)

    def chain_of(n_idx):
        n_g = TOT // n_idx
        parts = [idx_all[i*n_idx:(i+1)*n_idx] for i in range(n_g)]
        @jax.jit
        def chained(s0):
            def body(_, carry):
                s, acc = carry
                off = (s * 0).astype(jnp.int32)
                tot = jnp.float32(0)
                for p in parts:
                    tot = tot + tbl[p + off].sum()
                return s * (1.0 + 1e-12 * tot), acc + tot
            s, acc = jax.lax.fori_loop(0, CHAIN, body, (s0, jnp.float32(0)))
            return acc
        return chained

    @jax.jit
    def floor_fn(s0):
        def body(_, carry):
            s, acc = carry
            return s * 1.0, acc + s
        s, acc = jax.lax.fori_loop(0, CHAIN, body, (s0, jnp.float32(0)))
        return acc
    t_fl = timeit(lambda: floor_fn(seedv))
    for n_idx in (8000, 16000, 32000, 64000, 128000):
        c = chain_of(n_idx)
        t = timeit(lambda: c(seedv))
        us = (t - t_fl) / CHAIN * 1e6
        print(f"gather {TOT} idx in chunks of {n_idx:6d}: {us:7.1f} us "
              f"({us*1e3/TOT:.2f} ns/idx)")


if __name__ == "__main__":
    import sys as _s
    arg = _s.argv[1] if len(_s.argv) > 1 else ""
    {"tube": main_tube, "tube2": main_tube2, "thresh": main_thresh}.get(arg, main)()
