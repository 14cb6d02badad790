"""Loop-closure registration + pose-graph construction from a VIO run.

Greenfield backend component (BASELINE.json configs[3]: "pose-graph
backend").  The reference has no loop closing — its map lives for exactly
two frames (rebvio.cpp:122-131) — but its own tracking machinery is a
registration engine: rotate one edge map by a pose prior
(edge_map.cpp:58-71), run the translation LM against the other map's
distance field (core.cpp:150-189), then the 6-DoF linear refinement
(core.cpp:191-261).  Applied to a *keyframe pair* instead of a frame pair,
with the prior seeded from the current pose estimates, it measures the
relative pose directly from the edge images — the visual correction on top
of the (drifted) odometry chain is exactly the loop-closure information.

Pipeline: propose revisit candidates (estimated positions within a radius,
temporal gap above a floor) -> register each pair with the tracker ->
quality-gate on forward-match count -> emit SE3 factors for
ba/pose_graph.optimize alongside the sequential odometry factors.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rebvio_tpu import types as T
from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.geometry import so3
from rebvio_tpu.ops import distance_field as DF
from rebvio_tpu.ops import matching, tracker
from rebvio_tpu.ba import pose_graph as PG


@partial(jax.jit, static_argnames=("config", "iters"))
def register_pair(
    em_i: T.EdgeMap,
    em_j: T.EdgeMap,
    R_prior: jnp.ndarray,
    config: PipelineConfig,
    iters: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Register edge map i against edge map j with rotation prior
    R_prior = R_i^T R_j (world-from-camera convention).

    Returns (R_ij, V, n_matches, score): the measured relative rotation, the
    visual-scale translation of the i->j camera motion in the composed
    convention of the pipeline (t_j - t_i = -R_i @ R_ij @ V * K,
    rebvio.cpp:263-271), the forward-match count (quality gate), and the
    tracker's final LM score.

    Each iteration re-rotates map i by the improved rotation and reruns the
    translation LM + 6-DoF refinement.  Capture basin: like every direct
    edge-based method (the reference's tracker relies on its gyro prior the
    same way), association through the nearest-edge field is only valid while
    the prior's reprojection error is below the inter-edge spacing — priors
    good to ~1 deg converge; multi-degree errors alias onto neighboring
    edges and stall.
    """
    cam = config.camera
    core = config.core

    # the target map's nearest-keyline attribute field (rebuilt rather than
    # trusting em_j.att_img so registration works in every df_mode)
    att = DF.build_att_field(
        em_j, int(core.search_range), cam.rows, cam.cols, config.field_scale
    )

    R_cur = R_prior
    V = jnp.zeros(3, jnp.float32)
    nfm = jnp.zeros((), jnp.int32)
    score = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        # rotate map i into j's predicted frame (rebvio.cpp:163-165)
        old = matching.rotate_keylines(em_i, R_cur.T, cam.fm)
        vel, P_V, old, score = tracker.minimize_vel(
            old, em_j, att, jnp.zeros(3, jnp.float32), core, cam,
            field_scale=config.field_scale, use_att=True,
        )
        new2, nfm = matching.forward_match(old, em_j)
        Xv, W_Xv = tracker.ext_rot_vel(new2, vel, core, cam)
        # compose exactly like the estimation loop (pipeline.py: R_T = R0 @
        # R_prior_T; world-from-camera R_ij = R_prior @ R0^T; V = R0@Vg + dV)
        R0 = so3.exp(Xv[3:6])
        R_cur = R_cur @ R0.T
        V = R0 @ vel + Xv[0:3]
    return R_cur, V, nfm, score


def propose_candidates(
    positions: np.ndarray, min_gap: int = 8, radius: float = 0.6,
    max_pairs: int = 32,
) -> List[Tuple[int, int]]:
    """Revisit candidates among keyframe positions: pairs (i, j), i < j,
    separated by >= min_gap keyframes with estimated positions within
    ``radius``.  Nearest-first, capped at max_pairs."""
    F = len(positions)
    cands = []
    for i in range(F):
        for j in range(i + min_gap, F):
            d = float(np.linalg.norm(positions[j] - positions[i]))
            if d <= radius:
                cands.append((d, i, j))
    cands.sort()
    return [(i, j) for _, i, j in cands[:max_pairs]]


def build_graph_from_run(
    kf_R: np.ndarray,            # [F,3,3] keyframe world-from-camera
    kf_t: np.ndarray,            # [F,3]
    kf_maps: List[T.EdgeMap],    # F stored keyframe edge maps
    config: PipelineConfig,
    K_scale: float = 1.0,
    min_gap: int = 8,
    radius: float = 0.6,
    min_matches: int = 300,
    w_seq: float = 1.0,
    w_loop: float = 0.3,
    w_loop_t: float = 0.1,
    max_correction: float = 0.025,
) -> Tuple[PG.PoseGraph, int]:
    """Sequential odometry factors from the VIO keyframe chain + tracker-
    registered loop-closure factors.  Returns (graph, n_loop_factors).

    Loop factors get split weights: rotation at ``w_loop`` (registration
    noise is a few tenths of a degree over keyframe baselines, vs the
    near-exact internal consistency of the sequential chain), translation at
    ``w_loop_t`` (depth-limited — the forward component especially is weakly
    observed over short edge-map baselines).  Pairs whose measured rotation
    correction exceeds ``max_correction`` rad are dropped: corrections beyond
    the direct-association capture basin are aliasing, not measurement
    (register_pair docstring)."""
    F = len(kf_t)
    fi, fj, Rij, tij, fw = PG.factors_from_trajectory(kf_R, kf_t, w=w_seq)
    fwt = fw.copy()

    lf_i, lf_j, lf_R, lf_t = [], [], [], []
    for (i, j) in propose_candidates(kf_t, min_gap, radius):
        R_prior = jnp.asarray(kf_R[i].T @ kf_R[j], jnp.float32)
        R_m, V, nfm, _score = register_pair(kf_maps[i], kf_maps[j], R_prior, config)
        if int(nfm) < min_matches or not bool(np.isfinite(np.asarray(V)).all()):
            continue
        corr = np.asarray(so3.log(jnp.asarray(R_prior).T @ R_m))
        if float(np.linalg.norm(corr)) > max_correction:
            continue
        R_m = np.asarray(R_m, np.float64)
        t_m = -(R_m @ np.asarray(V, np.float64)) * float(K_scale)
        lf_i.append(i)
        lf_j.append(j)
        lf_R.append(R_m)
        lf_t.append(t_m)

    n_loops = len(lf_i)
    if n_loops:
        fi = np.concatenate([fi, np.asarray(lf_i, np.int32)])
        fj = np.concatenate([fj, np.asarray(lf_j, np.int32)])
        Rij = np.concatenate([Rij, np.stack(lf_R).astype(np.float32)])
        tij = np.concatenate([tij, np.stack(lf_t).astype(np.float32)])
        fw = np.concatenate([fw, np.full(n_loops, w_loop, np.float32)])
        fwt = np.concatenate([fwt, np.full(n_loops, w_loop_t, np.float32)])

    g = PG.PoseGraph(
        R=jnp.asarray(kf_R, jnp.float32),
        t=jnp.asarray(kf_t, jnp.float32),
        f_i=jnp.asarray(fi),
        f_j=jnp.asarray(fj),
        f_Rij=jnp.asarray(Rij),
        f_tij=jnp.asarray(tij),
        f_w=jnp.asarray(fw),
        f_valid=jnp.ones(len(fi), bool),
        f_wt=jnp.asarray(fwt),
    )
    return g, n_loops
