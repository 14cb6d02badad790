"""Configuration dataclasses for the TPU-native REBVO pipeline.

The reference implementation (baumlin/rebvio) configures each module with a
default-initialized C++ struct (rebvio/include/rebvio/edge_detector.hpp:19-32,
core.hpp:82-95, edge_map.hpp:19-26, types/imu.hpp:154-168) aggregated in
``RebvioConfig`` (rebvio.hpp:29-33), with a hard-coded EuRoC cam0 calibration
(camera.hpp:25-45).  Here every config is an immutable dataclass; the camera
calibration is externalized (JSON/dict loadable) instead of hard-coded.

All defaults reproduce the reference's EuRoC-tuned values.
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Pinhole camera + rad-tan distortion + camera->IMU extrinsics.

    Defaults are the EuRoC MAV cam0 calibration hard-coded in the reference
    (camera.hpp:25-45).  ``fm`` (mean focal length) is what the whole pipeline
    uses downstream, matching ``Camera::fm_``.
    """

    fx: float = 458.654
    fy: float = 457.296
    cx: float = 367.215
    cy: float = 248.375
    k1: float = -0.28340811
    k2: float = 0.07395907
    k3: float = 0.0
    p1: float = 0.00019359
    p2: float = 1.76187114e-05
    rows: int = 480
    cols: int = 752
    # Rotation/translation camera -> IMU (camera.hpp:41-44)
    R_c2i: Tuple[float, ...] = (
        0.0148655429818, -0.999880929698, 0.00414029679422,
        0.999557249008, 0.0149672133247, 0.025715529948,
        -0.0257744366974, 0.00375618835797, 0.999660727178,
    )
    t_c2i: Tuple[float, ...] = (-0.0216401454975, -0.064676986768, 0.00981073058949)

    @property
    def fm(self) -> float:
        return 0.5 * (self.fx + self.fy)

    def R_c2i_np(self) -> np.ndarray:
        return np.asarray(self.R_c2i, dtype=np.float32).reshape(3, 3)

    def t_c2i_np(self) -> np.ndarray:
        return np.asarray(self.t_c2i, dtype=np.float32)

    @staticmethod
    def from_json(path: str) -> "CameraConfig":
        with open(path, "r") as f:
            d = json.load(f)
        for k in ("R_c2i", "t_c2i"):
            if k in d:
                d[k] = tuple(d[k])
        return CameraConfig(**d)

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)


@dataclasses.dataclass(frozen=True)
class EdgeDetectorConfig:
    """DoG keyline detector parameters (edge_detector.hpp:19-32)."""

    keylines_ref: int = 12000        # target keyline count for auto-gain
    keylines_max: int = 16000        # hard cap (and static array size KMAX)
    plane_fit_size: int = 2          # 5x5 plane-fit window radius
    pos_neg_threshold: float = 0.4   # DoG positive/negative balance gate
    dog_threshold: float = 0.095259868922420
    threshold: float = 0.01          # initial manual threshold (auto-gained)
    gain: float = 5e-7               # auto-gain toward keylines_ref (0 = off)
    max_threshold: float = 0.5
    min_threshold: float = 0.005
    num_bins: int = 100              # histogram bins for auto-threshold
    max_image_value: float = 765.0   # 255 * 3 input gain (edge_detector.cpp:21)
    # Run the frontend's banded MXU sandwiches (blur cascade + 5x5 window
    # reductions) with bf16 operands / f32 accumulation.  OFF for the parity
    # profile (reference anchoring wants exact-f32 DoG); the fast profile
    # turns it on under its ATE-band contract (validated on the synthetic
    # regression + reference anchors, tests/test_fast_profile.py).
    frontend_bf16: bool = False


@dataclasses.dataclass(frozen=True)
class EdgeMapConfig:
    """Keyline matching parameters (edge_map.hpp:19-26)."""

    pixel_uncertainty_match: float = 2.0
    match_threshold_norm: float = 1.0
    match_threshold_angle: float = 45.0   # [deg]
    regularization_threshold: float = 0.5
    # tube matcher (TPU redesign of searchMatch) probes per keyline; no
    # reference counterpart.  Measured on v5e: 8 probes is as fast as 6
    # (the [K,8] probe axis tiles better than [K,6]); 4 is ~40% faster but
    # loses ~10% of matches on synthetic VO.  Quality default: 8.
    tube_probes: int = 8

    @property
    def cang_min_edge(self) -> float:
        return math.cos(self.match_threshold_angle * math.pi / 180.0)


@dataclasses.dataclass(frozen=True)
class CoreConfig:
    """Tracker / depth-filter parameters (core.hpp:82-95)."""

    search_range: float = 40.0
    reweight_distance: float = 2.0
    match_threshold: float = 0.5
    min_match_threshold: int = 0
    iterations: int = 5
    global_min_matches_threshold: int = 500
    pixel_uncertainty: float = 1.0
    quantile_cutoff: float = 0.9
    quantile_num_bins: int = 100
    reshape_q_abs: float = 1e-4


@dataclasses.dataclass(frozen=True)
class ImuConfig:
    """IMU fusion / SAB filter noise parameters (types/imu.hpp:154-168)."""

    g_norm: float = 9.81
    g_uncertainty: float = 2e-3
    g_norm_uncertainty: float = 0.2e3
    acc_std_dev: float = 2.0e-3
    gyro_std_dev: float = 1.6968e-04
    gyro_bias_std_dev: float = 1.9393e-05
    vbias_std_dev: float = 1e-7
    scale_std_dev_mult: float = 1e-2
    scale_std_dev_max: float = 1e-4
    scale_std_dev_init: float = 1.2e-3
    init_bias: int = 1               # 0: use guess, 1: estimate over window
    init_bias_frame_num: int = 10
    init_bias_guess: Tuple[float, float, float] = (0.0188, 0.0037, 0.0776)
    sample_max: int = 32             # static per-frame IMU sample buffer size
    # SAB Gauss-Newton iterations.  The reference runs a fixed 20 (its
    # convergence tolerances default to 0, sab_estimator.hpp:72), but the
    # solve converges far earlier: 20/12/8/5/4 iterations all produce an
    # IDENTICAL trajectory against the reference binary's golden run
    # (cross-ATE 0.0305 m at every setting on the seed0/120 anchor,
    # measured round 3).  5 is the product default (one-iteration margin
    # over the smallest identical setting); the GN chain is op-latency-
    # bound on TPU, so each iteration dropped is a direct per-frame saving.
    sab_iterations: int = 5


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Top-level aggregation (mirrors RebvioConfig, rebvio.hpp:29-33) plus
    TPU-framework-specific switches that have no reference counterpart."""

    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    detector: EdgeDetectorConfig = dataclasses.field(default_factory=EdgeDetectorConfig)
    edge_map: EdgeMapConfig = dataclasses.field(default_factory=EdgeMapConfig)
    core: CoreConfig = dataclasses.field(default_factory=CoreConfig)
    imu: ImuConfig = dataclasses.field(default_factory=ImuConfig)
    use_imu: bool = True             # False => vision-only VO (R prior = I)
    image_gain: float = 3.0          # input intensity gain (rebvio.cpp:43)
    # Elastic recovery (greenfield; the reference latches run_=false forever,
    # rebvio.cpp:236-252): when True, a tracking failure re-seeds the map from
    # the next detection and continues instead of freezing.
    recover_on_failure: bool = False
    # TPU-first algorithm variants (see ops/distance_field.py,
    # ops/matching.py):
    #   df_mode "jfa"    — dense jump-flood nearest-keyline field (fast);
    #           "raster" — the reference's gradient-ray scatter rasterization.
    #   matcher "tube"   — probe the JFA field along the epipolar tube (fast);
    #           "walk"   — the reference's first-hit pixel walk.
    # ("tube" requires df_mode == "jfa".)
    df_mode: str = "jfa"
    matcher: str = "tube"
    # JFA field resolution divisor (df_mode "jfa" only; ignored by
    # "raster").  2 = half-resolution auxiliary field: 4x less field traffic
    # and a 4x smaller gather table for every tracker/matcher lookup; the
    # field only *proposes* candidate keylines — all gates and residuals use
    # the exact keyline fields — so the cost is an occasional nearest-
    # keyline proposal swap within ~field_scale pixels.  Default 2: measured
    # against the real reference implementation's golden trajectory the
    # parity profile tracks it at 0.035 m cross-ATE over a 2.24 m span
    # (0.022 at scale 1, both ~1% of span; scale 4 degrades to 0.124 and is
    # rejected — see tests/test_reference_anchor.py).
    field_scale: int = 2

    @property
    def kmax(self) -> int:
        return self.detector.keylines_max


def fast_profile(**overrides) -> PipelineConfig:
    """Throughput-oriented full-resolution profile.

    Same camera/algorithm as the default EuRoC profile but with the keyline
    budget halved (8192 max / 6000 target vs the reference's 16000/12000,
    edge_detector.hpp:20-21) and a 4-probe tube matcher.  Every matcher and
    tracker kernel is gather-bound, so cost scales ~linearly with the keyline
    count; 6k keylines is still 3-10x the feature budget of typical
    point-feature VIO systems, and the auto-gain controller simply raises the
    detection threshold to keep the strongest edges.  Validated on the
    synthetic regression to track within the same ATE band as the default
    profile (tests/test_fast_profile.py).
    """
    det = EdgeDetectorConfig(keylines_max=8192, keylines_ref=6000,
                             frontend_bf16=True)
    em = EdgeMapConfig(tube_probes=4)
    # field_scale stays 2: a third-resolution field (scale 3) would shrink
    # the field block ~2x and even tightens the reference-anchor cross-ATE
    # (0.017 vs 0.054 m on the 60-frame seed-0 golden), but it MISSES the
    # fast-vs-default ATE band on the synthetic VO regression (0.039 vs
    # <= 0.023, tests/test_fast_profile.py) and was rejected; scale 4 is
    # worse on both counts (cross 0.095, GT-ATE 0.364 vs 0.253).  The
    # general-s dense seeding it required is kept and tested
    # (test_seed_stack_dense_matches_scatter_seeding).
    base = dict(detector=det, edge_map=em, field_scale=2)
    base.update(overrides)
    return PipelineConfig(**base)
