"""Core state pytrees: fixed-shape edge map (keyline SoA) and filter state.

Design (SURVEY.md section 7): the reference's mutable object graph — per-frame
``EdgeMap`` keyline vectors (edge_map.hpp:126-135), ``ImuState`` scratch
(types/imu.hpp:170-187), SAB filter state (sab_estimator.hpp:37-64), and
function-static filter histories (core.cpp:287-292,335-338) — is replaced by
explicit, fixed-shape pytrees so that the whole per-frame update is one pure
jitted function.  Keylines live in ``[KMAX]`` structure-of-arrays with a
validity mask; "continue" gates in the reference's loops become masked lanes.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from rebvio_tpu.configs import PipelineConfig

# Inverse-depth constants (types/keyline.hpp:17-19)
RHO_MAX = 20.0
RHO_MIN = 1e-3
RHO_INIT = 1.0
SIGMA_RHO_INIT = 20.0


class EdgeMap(struct.PyTreeNode):
    """Fixed-shape structure-of-arrays keyline map for one frame.

    Mirrors the fields of ``types::KeyLine`` (keyline.hpp:24-60) plus the
    per-map auxiliary data the reference keeps on ``EdgeMap``: the dense
    image-index -> keyline-index lookup (``keylines_mask_``,
    edge_map.hpp:131; kept dense as an [H,W] int32 id image, which the
    reference's detector also maintains as ``EdgeDetector::keylines_mask_``,
    edge_detector.hpp:86) and the detection threshold (edge_map.hpp:132).
    """

    pos: jnp.ndarray            # [K,2] subpixel pixel coords (origin top-left)
    pos_img: jnp.ndarray        # [K,2] principal-point-centered coords
    match_pos_img: jnp.ndarray  # [K,2]
    grad: jnp.ndarray           # [K,2] DoG gradient
    match_grad: jnp.ndarray     # [K,2]
    grad_norm: jnp.ndarray      # [K]
    match_grad_norm: jnp.ndarray  # [K]
    rho: jnp.ndarray            # [K] inverse depth
    sigma_rho: jnp.ndarray      # [K] inverse depth uncertainty
    id_prev: jnp.ndarray        # [K] int32 chain link (-1 = none)
    id_next: jnp.ndarray        # [K] int32 chain link (-1 = none)
    match_id: jnp.ndarray       # [K] int32
    match_id_forward: jnp.ndarray  # [K] int32
    match_id_keyframe: jnp.ndarray  # [K] int32
    matches: jnp.ndarray        # [K] int32 consecutive-match counter
    valid: jnp.ndarray          # [K] bool
    count: jnp.ndarray          # [] int32 number of valid keylines
    kl_id_img: jnp.ndarray      # [H,W] int32 keyline id per pixel (-1 = none)
    att_img: jnp.ndarray        # [8,H*W] f32 nearest-keyline attribute PLANES (lane-compact; distance_field.att_rows for the gatherable row view)
                                # (distance_field.build_att_field lanes; the
                                # tracker's single-gather fast path)
    threshold: jnp.ndarray      # [] f32 detection threshold of this map

    @property
    def kmax(self) -> int:
        return self.pos.shape[0]


def empty_edge_map(kmax: int, rows: int, cols: int, field_scale: int = 1) -> EdgeMap:
    f = jnp.zeros((kmax,), jnp.float32)
    f2 = jnp.zeros((kmax, 2), jnp.float32)
    i = jnp.full((kmax,), -1, jnp.int32)
    fr = (rows + field_scale - 1) // field_scale
    fc = (cols + field_scale - 1) // field_scale
    return EdgeMap(
        pos=f2, pos_img=f2, match_pos_img=f2, grad=f2, match_grad=f2,
        grad_norm=f, match_grad_norm=f,
        rho=jnp.full((kmax,), RHO_INIT, jnp.float32),
        sigma_rho=jnp.full((kmax,), SIGMA_RHO_INIT, jnp.float32),
        id_prev=i, id_next=i, match_id=i, match_id_forward=i,
        match_id_keyframe=i, matches=jnp.zeros((kmax,), jnp.int32),
        valid=jnp.zeros((kmax,), bool), count=jnp.zeros((), jnp.int32),
        kl_id_img=jnp.full((rows, cols), -1, jnp.int32),
        att_img=jnp.full((8, fr * fc), -1.0, jnp.float32),
        threshold=jnp.full((), -1.0, jnp.float32),
    )


class ImuFrameData(struct.PyTreeNode):
    """Fixed-size buffer of IMU samples between two frames (device input).

    Replaces ``IntegratedImu``'s incremental accumulation (types/imu.hpp:51-75)
    with a batched representation: the host loader packs up to ``sample_max``
    samples with their per-sample dt (reference quirk preserved: the first
    sample in an interval gets dt = 0.005 s, imu.hpp:58) and the quirky
    integer-extrapolated interval dt (imu.hpp:81).
    """

    gyro: jnp.ndarray     # [S,3] raw gyro (IMU frame) [rad/s]
    acc: jnp.ndarray      # [S,3] raw accelerometer (IMU frame) [m/s^2]
    dt: jnp.ndarray       # [S] per-sample dt [s] (first = 0.005)
    n: jnp.ndarray        # [] int32 valid sample count
    dt_interval: jnp.ndarray  # [] f32 integration interval [s] ((last-init)/(n-1)*n in us, integer math)


def empty_imu_frame(sample_max: int) -> ImuFrameData:
    return ImuFrameData(
        gyro=jnp.zeros((sample_max, 3), jnp.float32),
        acc=jnp.zeros((sample_max, 3), jnp.float32),
        dt=jnp.zeros((sample_max,), jnp.float32),
        n=jnp.zeros((), jnp.int32),
        dt_interval=jnp.zeros((), jnp.float32),
    )


class IntegratedImu(struct.PyTreeNode):
    """Result of integrating one inter-frame IMU buffer (imu.hpp:80-94)."""

    R: jnp.ndarray        # [3,3] inter-frame rotation (camera frame)
    gyro: jnp.ndarray     # [3] mean gyro (camera frame)
    acc: jnp.ndarray      # [3] mean accelerometer (camera frame)
    dgyro: jnp.ndarray    # [3] angular acceleration (camera frame)
    cacc: jnp.ndarray     # [3] lever-arm-compensated acceleration
    dt_s: jnp.ndarray     # [] integration interval [s]


class SabState(struct.PyTreeNode):
    """Scale/attitude/bias 7-state filter (sab_estimator.hpp:37-64).

    X = [alpha, g(3), b(3)]; scale K = tan(alpha) (core.cpp:386-389).
    Noise matrices that the reference stores on the state but derives from
    config (Qg, Qbias, Rg, Rs) are kept in config; the per-frame ones
    (Qrot, QKp, Rv) are passed as arguments where needed.
    """

    X: jnp.ndarray    # [7]
    P: jnp.ndarray    # [7,7]
    g_est: jnp.ndarray  # [3]
    b_est: jnp.ndarray  # [3]


def init_sab_state(cfg) -> SabState:
    X = jnp.array([jnp.pi / 4, 0.0, cfg.g_norm, 0.0, 0.0, 0.0, 0.0], jnp.float32)
    P = jnp.diag(jnp.array([
        cfg.scale_std_dev_init ** 2,
        100.0, 100.0, 100.0,
        cfg.vbias_std_dev ** 2 * 1e1,
        cfg.vbias_std_dev ** 2 * 1e1,
        cfg.vbias_std_dev ** 2 * 1e1,
    ], jnp.float32))
    return SabState(X=X, P=P, g_est=jnp.zeros(3, jnp.float32), b_est=jnp.zeros(3, jnp.float32))


class ImuState(struct.PyTreeNode):
    """Persistent inertial-fusion state threaded through frames
    (types/imu.hpp:170-187 plus the function-static histories of
    core.cpp:287-292 and core.cpp:335-338 made explicit)."""

    Bg: jnp.ndarray          # [3] gyro bias
    W_Bg: jnp.ndarray        # [3,3] gyro bias information matrix
    RGBias: jnp.ndarray      # [3,3] gyro bias observation noise (prev frame's)
    u_est: jnp.ndarray       # [3] heading direction estimate
    initialized: jnp.ndarray  # [] bool
    num_gyro_init: jnp.ndarray  # [] int32
    gyro_init_acc: jnp.ndarray  # [3] accumulated gyro*dt during init window
    g_init_acc: jnp.ndarray     # [3] accumulated -cacc during init window
    # estimateLs4Acceleration history (core.cpp:287-292)
    vel_hist: jnp.ndarray    # [5,3] V, V0, V1, V2, V3 rows
    dt_hist: jnp.ndarray     # [4] Dt
    # estimateMeanAcceleration history (core.cpp:335-338)
    acc_hist: jnp.ndarray    # [4,3] A, A0, A1, A2 rows


def init_imu_state() -> ImuState:
    return ImuState(
        Bg=jnp.zeros(3, jnp.float32),
        W_Bg=jnp.eye(3, dtype=jnp.float32) * 1e-2,  # invert(100*I), imu.hpp:181
        RGBias=jnp.eye(3, dtype=jnp.float32),
        u_est=jnp.array([1.0, 0.0, 0.0], jnp.float32),
        initialized=jnp.zeros((), bool),
        num_gyro_init=jnp.zeros((), jnp.int32),
        gyro_init_acc=jnp.zeros(3, jnp.float32),
        g_init_acc=jnp.zeros(3, jnp.float32),
        vel_hist=jnp.zeros((5, 3), jnp.float32),
        dt_hist=jnp.zeros((4,), jnp.float32),
        acc_hist=jnp.zeros((4, 3), jnp.float32),
    )


class VioState(struct.PyTreeNode):
    """Full estimator state: everything ``stateEstimationProcess`` keeps in
    locals/members across frames (rebvio.cpp:92-118) as one pytree."""

    edge_map: EdgeMap        # previous frame's (post-update) edge map
    imu_state: ImuState
    sab_state: SabState
    K: jnp.ndarray           # [] scale
    Pos: jnp.ndarray         # [3] global position
    R_global: jnp.ndarray    # [3,3] gravity-aligned global rotation
    P_Kp: jnp.ndarray        # [] process noise of the scale angle
    num_frames: jnp.ndarray  # [] int32 estimation pairs processed
    frames_seen: jnp.ndarray  # [] int32 frames ingested (num_frames + 1)
    detector_threshold: jnp.ndarray  # [] f32 auto-gained detection threshold
    keylines_count: jnp.ndarray      # [] int32 previous detection count
    run_ok: jnp.ndarray      # [] bool failure latch (rebvio.cpp:236-252)


class Odometry(struct.PyTreeNode):
    """Per-frame output record (types/odometry.hpp:19-23)."""

    orientation: jnp.ndarray  # [3] so3 log of R_global
    position: jnp.ndarray     # [3]
    num_matches: jnp.ndarray  # [] int32 directed matches (diagnostic)
    run_ok: jnp.ndarray       # [] bool


def init_vio_state(config: PipelineConfig) -> VioState:
    kmax = config.detector.keylines_max
    cam = config.camera
    return VioState(
        edge_map=empty_edge_map(kmax, cam.rows, cam.cols, config.field_scale),
        imu_state=init_imu_state(),
        sab_state=init_sab_state(config.imu),
        K=jnp.ones((), jnp.float32),
        Pos=jnp.zeros(3, jnp.float32),
        R_global=jnp.eye(3, dtype=jnp.float32),
        P_Kp=jnp.full((), 5e-6, jnp.float32),
        num_frames=jnp.zeros((), jnp.int32),
        frames_seen=jnp.zeros((), jnp.int32),
        detector_threshold=jnp.full((), config.detector.threshold, jnp.float32),
        keylines_count=jnp.zeros((), jnp.int32),
        run_ok=jnp.ones((), bool),
    )
