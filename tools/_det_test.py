import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.pipeline import frontend_matrices
from rebvio_tpu.ops import edge_detect
from rebvio_tpu.ops.scale_space import build_scale_space

config = PipelineConfig()
cam = config.camera
cfg = config.detector
mats = frontend_matrices(config)
seq = synthetic.generate(cam, n_frames=2, seed=0)
image = jnp.asarray(seq.images[0] * config.image_gain)
thr = jnp.float32(0.01)
jax.block_until_ready(image)

H, W = cam.rows, cam.cols
pfs = cfg.plane_fit_size
kmax = cfg.keylines_max

@partial(jax.jit, static_argnames=("upto",))
def det_prefix(img, threshold, upto):
    left = mats.LL @ img
    aux = left.sum()
    if upto == 0:
        return aux
    s0 = left[:H] @ mats.R0
    s1 = left[H:] @ mats.R1
    dog = s1 - s0
    dx = jnp.zeros_like(s0).at[:, 1:-1].set(s0[:, 2:] - s0[:, :-2])
    dy = jnp.zeros_like(s0).at[1:-1, :].set(s0[2:, :] - s0[:-2, :])
    mag = dx * dx + dy * dy
    mag = mag.at[0, :].set(0.0).at[-1, :].set(0.0)
    mag = mag.at[:, 0].set(0.0).at[:, -1].set(0.0)
    aux = aux + dog.sum() + mag.sum()
    if upto == 1:
        return aux
    n_win = (2*pfs+1)**2
    pn_threshold = float(n_win) * cfg.pos_neg_threshold
    gthr = threshold * cfg.max_image_value * cfg.dog_threshold
    gradient_threshold_sq = gthr * gthr
    mthr = threshold * cfg.max_image_value
    mag_threshold = mthr * mthr
    sxx = float((2*pfs+1) * sum(i*i for i in range(-pfs, pfs+1)))
    sign_map = jnp.where(dog > 0.0, 1.0, -1.0)
    dogXW = dog @ mats.XW
    lcat = mats.S5H @ jnp.concatenate([sign_map, dog, dogXW], axis=1)
    S5Hsign = lcat[:, :W]; S5Hdog = lcat[:, W:2*W]; t0_ = lcat[:, 2*W:] / sxx
    YHdog = mats.YH @ dog
    rcat = jnp.concatenate([S5Hsign, S5Hdog, YHdog], axis=0) @ mats.S5W
    aux = aux + rcat.sum() + t0_.sum()
    if upto == 2:
        return aux
    pn = rcat[:H]; t2 = rcat[H:2*H] / float(n_win); t1 = rcat[2*H:] / sxx
    g2 = t0_*t0_ + t1*t1
    tmp = t2 / jnp.where(g2 > 0, g2, 1.0)
    xs = -t0_*tmp; ys = -t1*tmp
    rr = jnp.arange(H, dtype=jnp.int32)[:, None]
    cc = jnp.arange(W, dtype=jnp.int32)[None, :]
    interior = (rr >= pfs) & (rr < H-pfs) & (cc >= pfs) & (cc < W-pfs)
    cand = (interior & (mag >= mag_threshold) & (jnp.abs(pn) <= pn_threshold)
            & (jnp.abs(xs) <= 0.5) & (jnp.abs(ys) <= 0.5)
            & (g2 >= gradient_threshold_sq) & (g2 > 0))
    aux = aux + cand.sum().astype(jnp.float32) + xs.sum() + ys.sum()
    if upto == 3:
        return aux
    cand_flat = cand.reshape(-1)
    total = jnp.sum(cand_flat.astype(jnp.float32))
    count = jnp.minimum(total, kmax).astype(jnp.int32)
    neg_big = jnp.float32(-3.4e38)
    keys = jnp.where(cand_flat, -jnp.arange(H * W, dtype=jnp.float32), neg_big)
    _, flat_idx = jax.lax.top_k(keys, kmax)
    slots = jnp.arange(1, kmax + 1, dtype=jnp.float32)
    valid = slots <= total
    safe_idx = jnp.where(valid, flat_idx, 0)
    aux = aux + safe_idx.sum().astype(jnp.float32)
    if upto == 4:
        return aux
    prow = (safe_idx // W).astype(jnp.float32)
    pcol = (safe_idx % W).astype(jnp.float32)
    xs_k = xs.reshape(-1)[safe_idx]; ys_k = ys.reshape(-1)[safe_idx]
    g0_k = t0_.reshape(-1)[safe_idx]; g1_k = t1.reshape(-1)[safe_idx]
    pos = jnp.stack([pcol + xs_k, prow + ys_k], axis=-1)
    pos = jnp.where(valid[:, None], pos, 0.0)
    grad = jnp.where(valid[:, None], jnp.stack([g0_k, g1_k], axis=-1), 0.0)
    grad_norm = jnp.sqrt(jnp.sum(grad*grad, axis=-1))
    aux = aux + pos.sum() + grad.sum() + grad_norm.sum()
    if upto == 5:
        return aux
    scatter_idx = jnp.where(valid, safe_idx, H*W)
    kl_id_img = (jnp.full((H*W,), -1, jnp.int32).at[scatter_idx]
                 .set(jnp.arange(kmax, dtype=jnp.int32), mode="drop").reshape(H, W))
    aux = aux + kl_id_img.sum().astype(jnp.float32)
    if upto == 6:
        return aux
    id_next, id_prev = edge_detect._join_edges(pos, grad, valid, kl_id_img)
    aux = aux + id_next.sum().astype(jnp.float32) + id_prev.sum().astype(jnp.float32)
    if upto == 7:
        return aux
    mt = edge_detect._tune_threshold(grad_norm, valid, count, cfg)
    return aux + mt

names = ["LL@img", "right mm + dog/mag", "gate matmuls", "cand", "top_k",
         "slot gathers", "id scatter", "join_edges", "tune_threshold"]
prev = 0.0
for k, nm in enumerate(names):
    def f(k=k):
        return det_prefix(image, thr, k)
    out = f(); np.asarray(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(25):
            out = f()
        np.asarray(out)
        best = min(best, (time.perf_counter()-t0)/25)
    print(f"{nm:20s} cum {best*1e3:8.3f} ms   delta {(best-prev)*1e3:8.3f} ms")
    prev = best
