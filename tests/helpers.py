"""Shared test fixtures: random edge maps in both SoA and oracle-dict form."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rebvio_tpu import types as T


def make_random_map(rng, K, kmax, H, W, margin=3):
    """Random valid keylines with plausible geometry; returns (EdgeMap, dict)."""
    # one keyline per pixel cell, like the real detector (resample collisions)
    pos = np.zeros((K, 2), np.float32)
    cells_used = set()
    for i in range(K):
        for _ in range(200):
            c = np.array([rng.uniform(margin, W - margin), rng.uniform(margin, H - margin)])
            cell = (int(np.floor(c[1] + 0.5)), int(np.floor(c[0] + 0.5)))
            if cell not in cells_used:
                cells_used.add(cell)
                pos[i] = c
                break
        else:
            raise RuntimeError("could not place unique keyline")
    ang = rng.uniform(0, 2 * np.pi, K)
    mag = rng.uniform(50.0, 300.0, K)
    grad = np.stack([np.cos(ang) * mag, np.sin(ang) * mag], axis=-1).astype(np.float32)
    grad_norm = np.linalg.norm(grad, axis=-1).astype(np.float32)
    rho = rng.uniform(0.05, 3.0, K).astype(np.float32)
    sigma_rho = rng.uniform(0.1, 10.0, K).astype(np.float32)

    id_img = np.full((H, W), -1, np.int32)
    for i in range(K):
        id_img[int(np.floor(pos[i, 1] + 0.5)), int(np.floor(pos[i, 0] + 0.5))] = i

    cx, cy = W / 2.0, H / 2.0
    pos_img = pos - np.array([cx, cy], np.float32)

    em = T.empty_edge_map(kmax, H, W)
    valid = np.zeros(kmax, bool)
    valid[:K] = True

    def pad(a, fill=0.0):
        out = np.full((kmax,) + a.shape[1:], fill, a.dtype)
        out[:K] = a
        return jnp.asarray(out)

    em = em.replace(
        pos=pad(pos), pos_img=pad(pos_img), match_pos_img=pad(pos_img),
        grad=pad(grad), grad_norm=pad(grad_norm),
        rho=pad(rho, T.RHO_INIT), sigma_rho=pad(sigma_rho, 20.0),
        valid=jnp.asarray(valid), count=jnp.asarray(K, jnp.int32),
        kl_id_img=jnp.asarray(id_img),
        threshold=jnp.asarray(-1.0, jnp.float32),
    )
    d = dict(
        pos=pos.astype(np.float64), pos_img=pos_img.astype(np.float64),
        match_pos_img=pos_img.astype(np.float64),
        grad=grad.astype(np.float64), grad_norm=grad_norm.astype(np.float64),
        rho=rho.astype(np.float64), sigma_rho=sigma_rho.astype(np.float64),
        valid=valid[:K], id_img=id_img, threshold=-1.0,
        cx=cx, cy=cy,
    )
    return em, d


def cam_dict(H, W, fm=100.0):
    return dict(rows=H, cols=W, fm=fm, cx=W / 2.0, cy=H / 2.0)
