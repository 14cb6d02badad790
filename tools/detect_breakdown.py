"""Intra-detect attribution: compiled prefixes of the detection stage.

detect() dominates the frame (~1.9 ms of a 4.5/7.0 ms step, PROFILE_r03);
this tool times compiled prefixes of its internal pipeline the same way
profile_stages.py does for the frame: reduce every prefix to one scalar,
subtract consecutive cumulative times.

Usage: python -m tools.detect_breakdown [--profile fast|parity]
"""

import argparse
import time
from functools import partial

import numpy as np


def fence(x):
    np.asarray(x)


def timeit(fn, n=30, repeats=3):
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
    ap.add_argument("--profile", default="fast", choices=["fast", "parity"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rebvio_tpu.configs import PipelineConfig, fast_profile
    from rebvio_tpu.data import synthetic
    from rebvio_tpu.ops import edge_detect
    from rebvio_tpu.ops.scale_space import build_scale_space
    from rebvio_tpu.ops.edge_detect import _join_edges, _tune_threshold
    from rebvio_tpu.pipeline import frontend_matrices

    config = fast_profile() if args.profile == "fast" else PipelineConfig()
    cam = config.camera
    cfg = config.detector
    mats = frontend_matrices(config)
    H, W = cam.rows, cam.cols
    kmax = cfg.keylines_max
    pfs = cfg.plane_fit_size

    seq = synthetic.generate(cam, n_frames=1, seed=0)
    image = jnp.asarray(seq.images[0] * config.image_gain)
    threshold = jnp.asarray(1.0, jnp.float32)

    STAGES = ["scale_space", "gates+planefit", "sort_compact", "gathers",
              "scatter_id", "join_edges", "tune_threshold"]

    @partial(jax.jit, static_argnames=("upto",))
    def prefix(image, threshold, upto):
        s0, dog, mag = build_scale_space(image, mats)
        aux = s0[0, 0] + dog.sum() * 0 + mag[100, 100]
        if upto == 0:
            return aux + dog[50, 50]
        n_win = (2 * pfs + 1) ** 2
        pn_threshold = float(n_win) * cfg.pos_neg_threshold
        gthr = threshold * cfg.max_image_value * cfg.dog_threshold
        gradient_threshold_sq = gthr * gthr
        mthr = threshold * cfg.max_image_value
        mag_threshold = mthr * mthr
        sxx = float((2 * pfs + 1) * sum(i * i for i in range(-pfs, pfs + 1)))
        sign_map = jnp.where(dog > 0.0, 1.0, -1.0)
        dogXW = dog @ mats.XW
        lcat = mats.S5H @ jnp.concatenate([sign_map, dog, dogXW], axis=1)
        S5Hsign = lcat[:, :W]
        S5Hdog = lcat[:, W:2 * W]
        t0 = lcat[:, 2 * W:] / sxx
        YHdog = mats.YH @ dog
        rcat = jnp.concatenate([S5Hsign, S5Hdog, YHdog], axis=0) @ mats.S5W
        pn = rcat[:H]
        t2 = rcat[H:2 * H] / float(n_win)
        t1 = rcat[2 * H:] / sxx
        g2 = t0 * t0 + t1 * t1
        tmp = t2 / jnp.where(g2 > 0, g2, 1.0)
        xs = -t0 * tmp
        ys = -t1 * tmp
        rr = jnp.arange(H, dtype=jnp.int32)[:, None]
        cc = jnp.arange(W, dtype=jnp.int32)[None, :]
        interior = (rr >= pfs) & (rr < H - pfs) & (cc >= pfs) & (cc < W - pfs)
        cand = (
            interior
            & (mag >= mag_threshold)
            & (jnp.abs(pn) <= pn_threshold)
            & (jnp.abs(xs) <= 0.5)
            & (jnp.abs(ys) <= 0.5)
            & (g2 >= gradient_threshold_sq)
            & (g2 > 0)
        )
        if upto == 1:
            return aux + cand.sum().astype(jnp.float32) + xs[60, 60]
        cand_flat = cand.reshape(-1)
        total = jnp.sum(cand_flat.astype(jnp.float32))
        count = jnp.minimum(total, kmax).astype(jnp.int32)
        neg_big = jnp.float32(-3.4e38)
        keys = jnp.where(cand_flat, -jnp.arange(H * W, dtype=jnp.float32), neg_big)
        top = jax.lax.sort(keys, is_stable=False)[H * W - kmax:][::-1]
        slots = jnp.arange(1, kmax + 1, dtype=jnp.float32)
        valid = slots <= total
        safe_idx = jnp.where(valid, -top, 0.0).astype(jnp.int32)
        if upto == 2:
            return aux + safe_idx.sum().astype(jnp.float32)
        prow = (safe_idx // W).astype(jnp.float32)
        pcol = (safe_idx % W).astype(jnp.float32)
        planes = jnp.stack([xs, ys, t0, t1], axis=-1).reshape(H * W, 4)
        rowk = planes[safe_idx]
        xs_k, ys_k, g0_k, g1_k = rowk[:, 0], rowk[:, 1], rowk[:, 2], rowk[:, 3]
        pos = jnp.stack([pcol + xs_k, prow + ys_k], axis=-1)
        pos = jnp.where(valid[:, None], pos, 0.0)
        grad = jnp.where(valid[:, None], jnp.stack([g0_k, g1_k], axis=-1), 0.0)
        grad_norm = jnp.sqrt(jnp.sum(grad * grad, axis=-1))
        if upto == 3:
            return aux + pos.sum() + grad_norm.sum()
        scatter_idx = jnp.where(valid, safe_idx, H * W)
        kl_id_img = (
            jnp.full((H * W,), -1, jnp.int32)
            .at[scatter_idx]
            .set(jnp.arange(kmax, dtype=jnp.int32), mode="drop")
            .reshape(H, W)
        )
        if upto == 4:
            return aux + pos.sum() + kl_id_img.sum().astype(jnp.float32)
        id_next, id_prev = _join_edges(pos, grad, valid, kl_id_img)
        if upto == 5:
            return (aux + pos.sum() + kl_id_img.sum().astype(jnp.float32)
                    + id_next.sum().astype(jnp.float32) + id_prev.sum().astype(jnp.float32))
        map_threshold = _tune_threshold(grad_norm, valid, count, cfg)
        return (aux + pos.sum() + kl_id_img.sum().astype(jnp.float32)
                + id_next.sum().astype(jnp.float32) + map_threshold)

    @jax.jit
    def full_detect(image, threshold):
        m = edge_detect.detect(image, threshold, mats, cfg, cam,
                               field_scale=config.field_scale)
        return (m.pos.sum() + m.grad.sum() + m.kl_id_img.sum().astype(jnp.float32)
                + m.threshold + m.count.astype(jnp.float32))

    times = [timeit(lambda k=k: prefix(image, threshold, k))
             for k in range(len(STAGES))]
    t_full = timeit(lambda: full_detect(image, threshold))

    prev = 0.0
    for name, t in zip(STAGES, times):
        print(f"{name:16s} cum {t*1e3:8.3f} ms   delta {(t-prev)*1e3:8.3f} ms")
        prev = t
    print(f"{'full detect':16s} cum {t_full*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
