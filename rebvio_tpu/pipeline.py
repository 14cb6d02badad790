"""The full VIO pipeline as one pure jitted ``step`` function.

TPU-native rebuild of ``Rebvio::stateEstimationProcess`` — the 170-line master
loop of the reference (rebvio/src/rebvio.cpp:92-293) — plus the frontend
thread's detection stage (rebvio.cpp:56-90).  The reference's 2-thread /
3-queue object pipeline becomes:

    step(state, frame, imu, frame_dt) -> (state', odometry)

with all filter state explicit in ``VioState`` (types.py).  Control flow that
the reference expresses with early-exits and latched flags (NaN guard and
minimum-match failure, rebvio.cpp:236-252) is branchless: both failure gates
mask the state update and latch ``run_ok``.

Sequencing parity notes (numbers are rebvio.cpp lines):
  146-160 bias-init window,  163-165 gyro pre-rotation of the old map,
  169 minimizeVel,  172 forwardMatch,  177 extRotVel,  186-200 gyro-bias
  fusion and covariance extraction,  203-204 acceleration estimators,
  210-233 SAB scale filter (engaged after frame 4 + init window),
  245 directedMatch,  256-259 regularization + depth EKF,
  263-271 gravity-aligned global pose integration.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from rebvio_tpu import types as T
from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.geometry import linalg, so3
from rebvio_tpu.ops import distance_field as DF
from rebvio_tpu.ops import edge_detect, imu as imu_ops, matching, sab, tracker
from rebvio_tpu.ops.scale_space import FrontendMatrices, ScaleSpaceParams

_F32_MAX = 3.4028235e38
_SS_CACHE = {}


def frontend_matrices(config: PipelineConfig) -> FrontendMatrices:
    """Device-resident banded frontend operators for this camera geometry
    (uploaded once; passed through step so the remote executable takes them
    as arguments rather than re-shipped constants)."""
    key = (config.camera.rows, config.camera.cols, config.detector.plane_fit_size)
    if key not in _SS_CACHE:
        _SS_CACHE[key] = ScaleSpaceParams(*key)
    return _SS_CACHE[key].matrices()


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y) if x.ndim == 0 else jnp.where(
        jnp.reshape(pred, (1,) * x.ndim), x, y), a, b)


def detect_frame(state: T.VioState, frame: jnp.ndarray, mats: FrontendMatrices,
                 config: PipelineConfig):
    """Frontend: auto-gain threshold + keyline detection (rebvio.cpp:56-75)."""
    threshold = edge_detect.autogain_threshold(
        state.detector_threshold, state.keylines_count, config.detector
    )
    if config.df_mode == "jfa":
        # dense-plane seeding (seed_stack_dense): the scatter-free fast path
        # for the JFA attribute field; build_att_field's Pallas flood uses
        # the stack, the XLA fallback ignores it (DCE'd on CPU)
        new_map, stack = edge_detect.detect_with_seeds(
            frame, threshold, mats, config.detector, config.camera,
            config.field_scale, int(config.core.search_range))
        att = DF.build_att_field(
            new_map, int(config.core.search_range), config.camera.rows,
            config.camera.cols, config.field_scale, seed_stack=stack,
        )
        new_map = new_map.replace(att_img=att)
    else:
        new_map = edge_detect.detect(frame, threshold, mats, config.detector,
                                     config.camera,
                                     field_scale=config.field_scale)
    return new_map, threshold


def estimate(
    state: T.VioState,
    old_map: T.EdgeMap,
    new_map: T.EdgeMap,
    imu_data: T.ImuFrameData,
    frame_dt: jnp.ndarray,
    config: PipelineConfig,
) -> Tuple[T.VioState, T.EdgeMap, T.Odometry]:
    """One estimation iteration over an (old, new) edge-map pair."""
    cam = config.camera
    core_cfg = config.core
    icfg = config.imu
    fm = cam.fm
    ist = state.imu_state
    sst = state.sab_state
    use_imu = config.use_imu
    eye3 = jnp.eye(3, dtype=jnp.float32)

    # --- distance field from the new map (rebvio.cpp:142) ---
    if config.df_mode == "jfa":
        field_ids = new_map.att_img  # attribute field, built in detect_frame
        field_scale = config.field_scale
    else:
        # the rasterized reference field is always full-resolution;
        # config.field_scale only applies to the JFA field
        field = DF.build_distance_field(
            new_map, int(core_cfg.search_range), cam.rows, cam.cols
        )
        field_ids = DF.field_id(field, new_map.kmax)
        field_scale = 1

    Bg = ist.Bg
    W_Bg = ist.W_Bg
    sab_X = sst.X

    if use_imu:
        ii = imu_ops.integrate_imu(imu_data, jnp.asarray(cam.R_c2i_np()), jnp.asarray(cam.t_c2i_np()))
        # --- bias init window (rebvio.cpp:146-160) ---
        if icfg.init_bias > 0:
            in_init = (~ist.initialized) & (state.num_frames > 0)
            gyro_acc = jnp.where(in_init, ist.gyro_init_acc + ii.gyro * ii.dt_s, ist.gyro_init_acc)
            g_acc = jnp.where(in_init, ist.g_init_acc - ii.cacc, ist.g_init_acc)
            n_init = jnp.where(in_init, ist.num_gyro_init + 1, ist.num_gyro_init)
            done = in_init & (n_init > icfg.init_bias_frame_num)
            nf = jnp.maximum(n_init.astype(jnp.float32), 1.0)
            Bg = jnp.where(done, gyro_acc / nf, Bg)
            W_Bg = jnp.where(done, linalg.invert3(ist.RGBias * 1e2), W_Bg)
            sab_X = jnp.where(done, sab_X.at[1:4].set(g_acc / nf), sab_X)
            initialized = ist.initialized | done
        else:
            newly = (~ist.initialized) & (state.num_frames > 0)
            Bg = jnp.where(newly, jnp.asarray(icfg.init_bias_guess, jnp.float32) * ii.dt_s, Bg)
            initialized = ist.initialized | newly
            gyro_acc, g_acc, n_init = ist.gyro_init_acc, ist.g_init_acc, ist.num_gyro_init
        # gyro-bias-corrected inter-frame rotation prior (rebvio.cpp:163-164)
        R_prior_T = so3.exp(Bg) @ ii.R.T
        cacc = ii.cacc
    else:
        initialized = ist.initialized
        gyro_acc, g_acc, n_init = ist.gyro_init_acc, ist.g_init_acc, ist.num_gyro_init
        R_prior_T = eye3
        cacc = jnp.zeros(3, jnp.float32)

    # forward-rotate old keylines by the gyro prior (rebvio.cpp:165)
    old_map = matching.rotate_keylines(old_map, R_prior_T, fm)

    # --- translation-only LM against the distance field (rebvio.cpp:169) ---
    Vg = jnp.zeros(3, jnp.float32)
    Vg, P_Vg, old_map, _score = tracker.minimize_vel(
        old_map, new_map, field_ids, Vg, core_cfg, cam, field_scale,
        use_att=(config.df_mode == "jfa"),
    )

    # --- forward matching into the new map (rebvio.cpp:172) ---
    new_map, _nfm = matching.forward_match(old_map, new_map)

    # --- 6-DoF linear refinement (rebvio.cpp:177) ---
    Xv, W_Xv = tracker.ext_rot_vel(new_map, Vg, core_cfg, cam)
    Xgv, W_Xgv = Xv, W_Xv

    # --- gyro bias correction (rebvio.cpp:186-190) ---
    RGBias = eye3 * (icfg.gyro_bias_std_dev * frame_dt) ** 2
    RGyro = eye3 * (icfg.gyro_std_dev * frame_dt) ** 2
    if use_imu:
        Xgv, W_Xgv, W_Bg, dgbias = tracker.gyro_bias_correction(
            Xgv, W_Xgv, W_Bg, RGyro, RGBias
        )
        Bg = Bg + dgbias
    dVgv = Xgv[0:3]
    dWgv = Xgv[3:6]

    # --- compose visually-corrected rotation/translation (rebvio.cpp:192-200)
    R0 = so3.exp(dWgv)
    R_T = R0 @ R_prior_T                  # R.T() = R0 * R.T()
    R = R_T.T
    Vgv = R0 @ Vg + dVgv
    R_Xgv = linalg.chol_inverse(W_Xgv)
    P_V = R_Xgv[0:3, 0:3]
    P_W = R_Xgv[3:6, 3:6]

    # --- acceleration estimators (rebvio.cpp:203-204) ---
    dt_safe = jnp.maximum(frame_dt, 1e-6)
    Av, vel_hist, dt_hist = imu_ops.estimate_ls4_acceleration(
        -Vgv / dt_safe, R, frame_dt, ist.vel_hist, ist.dt_hist
    )
    As, acc_hist = imu_ops.estimate_mean_acceleration(cacc, R, ist.acc_hist)

    # --- SAB scale filter (rebvio.cpp:206-233) ---
    K = state.K
    P_Kp = state.P_Kp
    sab_P, g_est, b_est = sst.P, sst.g_est, sst.b_est
    Xgva = Xgv
    if use_imu:
        engaged = state.num_frames > (4 + icfg.init_bias_frame_num)
        Rv_sab = P_V / dt_safe ** 4
        Qg = eye3 * icfg.g_uncertainty ** 2
        Qbias = eye3 * icfg.vbias_std_dev ** 2
        Rg = jnp.float32(icfg.g_norm_uncertainty ** 2)
        Rs = eye3 * icfg.acc_std_dev ** 2
        out = sab.estimate_bias(
            As, Av, jnp.float32(1.0), R, sab_X, sab_P, Qg, P_W, Qbias, P_Kp,
            Rg, Rs, Rv_sab, W_Xgv, Xgva, jnp.float32(icfg.g_norm),
            iters=icfg.sab_iterations,
        )
        K = jnp.where(engaged, out.K, K)
        sab_X = jnp.where(engaged, out.X, sab_X)
        sab_P = jnp.where(engaged, out.P, sab_P)
        g_est = jnp.where(engaged, out.g_est, g_est)
        b_est = jnp.where(engaged, out.b_est, b_est)
        Xgva = jnp.where(engaged, out.Xvw, Xgva)
    else:
        engaged = jnp.zeros((), bool)

    dVgva = Xgva[0:3]
    dWgva = Xgva[3:6]
    R0gva = so3.exp(dWgva)
    # engaged: Rgva.T = R0gva @ R_prior.T ; else Rgva = R (rebvio.cpp:193,217-232)
    Rgva = (R0gva @ R_prior_T).T
    Vgva = R0gva @ Vg + dVgva
    V = Vgva
    # second forward rotation of the old map (rebvio.cpp:223,232)
    old_map = matching.rotate_keylines(old_map, R0gva, fm)

    # --- failure gates (rebvio.cpp:236-252) ---
    fail_nan = jnp.any(jnp.isnan(V))
    if config.matcher == "tube":
        assert config.df_mode == "jfa", "tube matcher requires the JFA field"
        # exact gradient-replay matrix for the two in-flight rotations of the
        # old map (rotate_keylines drops z per stage, so 2x2 blocks compose)
        Mg = R0gva[:2, :2] @ R_prior_T[:2, :2]
        new_map_dm, klm = matching.directed_match_tube(
            new_map, old_map, V, P_V, Rgva, config.edge_map, core_cfg, cam,
            field_scale=config.field_scale, grad_rot2=Mg,
        )
    else:
        new_map_dm, klm = matching.directed_match(
            new_map, old_map, V, P_V, Rgva, config.edge_map, core_cfg, cam
        )
    new_map_post = _tree_where(fail_nan, new_map, new_map_dm)
    klm = jnp.where(fail_nan, 0, klm)
    fail_matches = (~fail_nan) & (klm < core_cfg.global_min_matches_threshold)
    failed = fail_nan | fail_matches

    # --- regularization + depth EKF on success (rebvio.cpp:256-259) ---
    reg = tracker.regularize_and_update_depth(
        new_map_post, V, config.edge_map.regularization_threshold, core_cfg, cam
    )
    new_map_post = _tree_where(failed, new_map_post, reg)

    V = jnp.where(failed, jnp.zeros(3, jnp.float32), V)
    P_Kp = jnp.where(failed, _F32_MAX, P_Kp)

    # --- global pose integration (rebvio.cpp:263-271) ---
    if use_imu:
        u1 = Rgva.T @ ist.u_est
        gden = jnp.maximum(jnp.dot(g_est, g_est), 1e-20)
        u1 = u1 - (jnp.dot(u1, g_est) / gden) * g_est
        u1 = u1 / jnp.maximum(jnp.linalg.norm(u1), 1e-20)
        R1 = so3.rotation_between(g_est, jnp.array([0.0, 1.0, 0.0], jnp.float32))
        R2 = so3.rotation_between(R1 @ u1, jnp.array([1.0, 0.0, 0.0], jnp.float32))
        R_global_new = R2 @ R1
        Pos_new = state.Pos - R_global_new @ Vgva * K
        integrate = engaged
        u_est = jnp.where(integrate, u1, ist.u_est)
    else:
        # Vision-only: dead-reckon pose by composing the inter-frame motion
        # (no gravity alignment available without an accelerometer).
        # Keyline coords map X_new = Rgva^T X_old, so world-from-camera
        # composes as R_wc,new = R_wc,old @ Rgva.
        R_global_new = state.R_global @ Rgva
        Pos_new = state.Pos - R_global_new @ Vgva * K
        integrate = jnp.ones((), bool)
        u_est = ist.u_est
    R_global = jnp.where(integrate, R_global_new, state.R_global)
    Pos = jnp.where(integrate, Pos_new, state.Pos)

    new_state = state.replace(
        edge_map=new_map_post,
        imu_state=ist.replace(
            Bg=Bg, W_Bg=W_Bg, RGBias=RGBias, u_est=u_est,
            initialized=initialized, num_gyro_init=n_init,
            gyro_init_acc=gyro_acc, g_init_acc=g_acc,
            vel_hist=vel_hist, dt_hist=dt_hist, acc_hist=acc_hist,
        ),
        sab_state=sst.replace(X=sab_X, P=sab_P, g_est=g_est, b_est=b_est),
        K=K, Pos=Pos, R_global=R_global, P_Kp=P_Kp,
        num_frames=state.num_frames + 1,
        run_ok=state.run_ok & ~failed,
    )
    odo = T.Odometry(
        orientation=so3.log(R_global),
        position=Pos,
        num_matches=klm,
        run_ok=new_state.run_ok,
    )
    return new_state, new_map_post, odo


@partial(jax.jit, static_argnames=("config",))
def step_chunk(
    state: T.VioState,
    frames: jnp.ndarray,           # [N,H,W]
    imu_data: T.ImuFrameData,      # leaves [N,...]
    frame_dt: jnp.ndarray,         # [N]
    config: PipelineConfig,
    mats: FrontendMatrices = None,
) -> Tuple[T.VioState, T.Odometry]:
    """Process N frames in one dispatch via lax.scan (dataset/offline mode).

    Semantically identical to N calls of ``step`` (the recurrence is strictly
    frame-sequential, rebvio.cpp:122-131), but amortizes the per-dispatch and
    state-output overhead over the chunk — the replacement for the
    reference's 2-thread streaming pipeline when the input is a prerecorded
    sequence.  (State donation is not usable here: the freshly initialized
    state aliases identical zero-filled buffers across leaves, which XLA
    rejects as a double donation.)
    """
    if mats is None:
        mats = frontend_matrices(config)

    def body(st, inp):
        fr, im, dt = inp
        st2, odo = step(st, fr, im, dt, config, mats)
        return st2, odo

    return jax.lax.scan(body, state, (frames, imu_data, frame_dt))


@partial(jax.jit, static_argnames=("config",))
def step_chunk_traced(
    state: T.VioState,
    frames: jnp.ndarray,           # [N,H,W]
    imu_data: T.ImuFrameData,      # leaves [N,...]
    frame_dt: jnp.ndarray,         # [N]
    config: PipelineConfig,
    mats: FrontendMatrices = None,
):
    """step_chunk that ALSO emits the per-frame mapping trace.

    The keyframe-map builder (ba/keyframe_map.py) needs per frame only
    (valid, match_id) for track propagation plus (pos_img, rho) at
    keyframes; fetching them per frame costs multiple device->host round
    trips each (VERDICT r3 weak #8: the --ba path was host-bound at
    per-frame readbacks).  Returned stacked [N,...] on device, the host
    reads each field back ONCE per chunk.
    """
    if mats is None:
        mats = frontend_matrices(config)

    def body(st, inp):
        fr, im, dt = inp
        st2, odo = step(st, fr, im, dt, config, mats)
        em = st2.edge_map
        trace = {
            "valid": em.valid,
            "match_id": em.match_id,
            "pos_img": em.pos_img,
            "rho": em.rho,
        }
        return st2, (odo, trace)

    state, (odos, trace) = jax.lax.scan(body, state, (frames, imu_data, frame_dt))
    return state, odos, trace


@partial(jax.jit, static_argnames=("config",))
def step_chunk_pipelined(
    state: T.VioState,
    frames: jnp.ndarray,           # [N,H,W]
    imu_data: T.ImuFrameData,      # leaves [N,...]
    frame_dt: jnp.ndarray,         # [N]
    config: PipelineConfig,
    mats: FrontendMatrices = None,
) -> Tuple[T.VioState, T.Odometry]:
    """N frames per dispatch with the frontend batched across the chunk.

    The reference runs detection on its own thread, concurrent with
    estimation (rebvio.cpp:28-29): the auto-gain threshold chain is
    detector-local and estimation never feeds back into detection.  Holding
    the threshold fixed within the chunk makes all N detections independent,
    so they run as ONE vmapped frontend (N-wide matmuls, one JFA pass set)
    instead of N serial ones; estimation then scans over the precomputed
    maps.  Deviation from the strict streaming semantics: the threshold
    controller (edge_detector.cpp:33-36) updates once per chunk (from the
    last frame's keyline count) instead of once per frame — the controller's
    gain (5e-7/keyline) makes this a sub-1e-4 threshold difference per chunk.
    """
    if mats is None:
        mats = frontend_matrices(config)
    threshold = edge_detect.autogain_threshold(
        state.detector_threshold, state.keylines_count, config.detector
    )

    def detect_one(fr):
        if config.df_mode == "jfa":
            m, stack = edge_detect.detect_with_seeds(
                fr, threshold, mats, config.detector, config.camera,
                config.field_scale, int(config.core.search_range))
            att = DF.build_att_field(
                m, int(config.core.search_range), config.camera.rows,
                config.camera.cols, config.field_scale, seed_stack=stack,
            )
            m = m.replace(att_img=att)
        else:
            m = edge_detect.detect(fr, threshold, mats, config.detector,
                                   config.camera,
                                   field_scale=config.field_scale)
        return m

    maps = jax.vmap(detect_one)(frames)

    def body(st, inp):
        new_map, imu_i, dt_i = inp
        return advance(st, new_map, threshold, imu_i, dt_i, config)

    return jax.lax.scan(body, state, (maps, imu_data, frame_dt))


@partial(jax.jit, static_argnames=("config",))
def step(
    state: T.VioState,
    frame: jnp.ndarray,
    imu_data: T.ImuFrameData,
    frame_dt: jnp.ndarray,
    config: PipelineConfig,
    mats: FrontendMatrices = None,
) -> Tuple[T.VioState, T.Odometry]:
    """Process one frame: detect keylines, then (if a previous map exists and
    the failure latch is clear) run the estimation iteration."""
    if mats is None:
        mats = frontend_matrices(config)
    new_map, threshold = detect_frame(state, frame, mats, config)
    return advance(state, new_map, threshold, imu_data, frame_dt, config)


def advance(
    state: T.VioState,
    new_map: T.EdgeMap,
    threshold: jnp.ndarray,
    imu_data: T.ImuFrameData,
    frame_dt: jnp.ndarray,
    config: PipelineConfig,
) -> Tuple[T.VioState, T.Odometry]:
    """Everything after detection: estimation, first-frame handling, failure
    latch / recovery, and state bookkeeping (the non-frontend part of the
    master loop, rebvio.cpp:119-292)."""
    est_state, est_map, est_odo = estimate(
        state, state.edge_map, new_map, imu_data, frame_dt, config
    )
    est_state = est_state.replace(edge_map=est_map)

    # First frame: only store the detection (the reference's estimator waits
    # for two maps, rebvio.cpp:122-131).
    first_state = state.replace(edge_map=new_map)
    idle_odo = T.Odometry(
        orientation=so3.log(state.R_global),
        position=state.Pos,
        num_matches=jnp.zeros((), jnp.int32),
        run_ok=state.run_ok,
    )

    is_first = state.frames_seen == 0
    frozen = ~state.run_ok  # failure latch (rebvio.cpp:241,252)
    use_est = (~is_first) & (~frozen)

    out_state = _tree_where(use_est, est_state, first_state)
    odo = _tree_where(use_est, est_odo, idle_odo)
    if config.recover_on_failure:
        # Re-seed: keep the calibration-like state (pose, K, biases, SAB) but
        # restart tracking from the fresh detection with cleared histories.
        ist0 = state.imu_state
        recovered = out_state.replace(
            edge_map=new_map,
            imu_state=ist0.replace(
                vel_hist=jnp.zeros_like(ist0.vel_hist),
                dt_hist=jnp.zeros_like(ist0.dt_hist),
                acc_hist=jnp.zeros_like(ist0.acc_hist),
            ),
            run_ok=jnp.ones((), bool),
        )
        out_state = _tree_where(frozen, recovered, out_state)
    out_state = out_state.replace(
        frames_seen=state.frames_seen + 1,
        detector_threshold=threshold,
        keylines_count=new_map.count,
    )
    return out_state, odo
