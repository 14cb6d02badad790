"""Sequential numpy oracle of the reference semantics, used only by tests.

These are slow, loop-based re-implementations written from the algorithmic
description of the reference (rebvio/src/*.cpp) — NOT the production path.
The production jnp ops are checked against these on small random inputs.
"""

from __future__ import annotations

import math

import numpy as np

RHO_MAX = 20.0
RHO_MIN = 1e-3
RHO_INIT = 1.0


def round_half_away(x):
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


# ---------------------------------------------------------------- scale space
def box_average(img, d):
    H, W = img.shape
    d2 = d // 2
    out = np.zeros_like(img)
    for r in range(H):
        r0, r1 = max(0, r - d2), min(H - 1, r + d2)
        for c in range(W):
            c0, c1 = max(0, c - d2), min(W - 1, c + d2)
            win = img[r0 : r1 + 1, c0 : c1 + 1]
            out[r, c] = win.sum() / win.size
    return out


def smooth(img, widths):
    out = img
    for d in widths:
        out = box_average(out, d)
    return out


def grad_mag(s0):
    H, W = s0.shape
    mag = np.zeros_like(s0)
    for r in range(1, H - 1):
        for c in range(1, W - 1):
            dx = s0[r, c + 1] - s0[r, c - 1]
            dy = s0[r + 1, c] - s0[r - 1, c]
            mag[r, c] = dx * dx + dy * dy
    return mag


# ------------------------------------------------------------- edge detection
def detect_keylines(dog, mag, threshold, cfg_dict):
    """Returns list of dicts (pos, grad, ...) in raster order + id image."""
    pfs = cfg_dict["plane_fit_size"]
    H, W = dog.shape
    n = 2 * pfs + 1
    pn_threshold = n * n * cfg_dict["pos_neg_threshold"]
    miv = cfg_dict["max_image_value"]
    gthr2 = (threshold * miv * cfg_dict["dog_threshold"]) ** 2
    mthr2 = (threshold * miv) ** 2
    xs_g = np.arange(-pfs, pfs + 1, dtype=np.float64)
    sxx = n * np.sum(xs_g**2)
    keylines = []
    id_img = np.full((H, W), -1, np.int32)
    for r in range(pfs, H - pfs):
        for c in range(pfs, W - pfs):
            if len(keylines) >= cfg_dict["keylines_max"]:
                return keylines, id_img
            if mag[r, c] < mthr2:
                continue
            win = dog[r - pfs : r + pfs + 1, c - pfs : c + pfs + 1].astype(np.float64)
            pn = np.sum(win > 0) - np.sum(win <= 0)
            if abs(pn) > pn_threshold:
                continue
            t0 = np.sum(win * xs_g[None, :]) / sxx
            t1 = np.sum(win * xs_g[:, None]) / sxx
            t2 = np.mean(win)
            g2 = t0 * t0 + t1 * t1
            if g2 <= 0:
                continue
            tmp = t2 / g2
            xs = -t0 * tmp
            ys = -t1 * tmp
            if abs(xs) > 0.5 or abs(ys) > 0.5:
                continue
            if g2 < gthr2:
                continue
            keylines.append(
                dict(
                    pos=np.array([c + xs, r + ys]),
                    grad=np.array([t0, t1]),
                    grad_norm=math.sqrt(g2),
                    rho=RHO_INIT,
                    sigma_rho=20.0,
                )
            )
            id_img[r, c] = len(keylines) - 1
    return keylines, id_img


# ------------------------------------------------------------- distance field
def build_distance_field(pos, grad, grad_norm, use, R, rows, cols):
    """Returns (id_field, dist_field) flat arrays."""
    idf = np.full(rows * cols, -1, np.int32)
    dsf = np.full(rows * cols, np.iinfo(np.int32).max, np.int64)
    K = len(pos)
    for idx in range(K):
        if not use[idx]:
            continue
        gx, gy = grad[idx] / grad_norm[idx]
        for r in range(-R, R):
            row = int(round_half_away(gy * r + pos[idx][1]))
            col = int(round_half_away(gx * r + pos[idx][0]))
            if row < 0 or row >= rows or col < 0 or col >= cols:
                continue
            fi = row * cols + col
            if idf[fi] >= 0 and dsf[fi] < abs(r):
                continue
            dsf[fi] = abs(r)
            idf[fi] = idx
    return idf, dsf


# --------------------------------------------------------------- forward match
def forward_match(old_rho, old_mif, new_size):
    """Sequential winner rule; returns match_id per new keyline."""
    match_id = np.full(new_size, -1, np.int32)
    cur_rho = np.zeros(new_size)
    for idx in range(len(old_rho)):
        t = old_mif[idx]
        if t < 0:
            continue
        if match_id[t] >= 0 and cur_rho[t] > old_rho[idx]:
            continue
        cur_rho[t] = old_rho[idx]
        match_id[t] = idx
    return match_id


# ------------------------------------------------------------------ try_vel
def try_vel(old, new, idf, residuals, vel, sigma_rho_min, cfg, cam):
    """old/new: dicts of arrays. Returns (score, JtJ, JtF, res', mif)."""
    K = len(old["pos"])
    rows, cols = cam["rows"], cam["cols"]
    fm = cam["fm"]
    R = cfg["search_range"]
    JtJ = np.zeros((3, 3))
    JtF = np.zeros(3)
    score = 0.0
    res = residuals.copy()
    mif = np.full(K, -1, np.int32)
    for i in range(K):
        if not old["valid"][i]:
            continue
        if old["threshold"] > 0 and old["grad_norm"][i] < old["threshold"]:
            continue
        if old["sigma_rho"][i] > sigma_rho_min:
            continue
        w = 1.0
        if residuals[i] > cfg["reweight_distance"]:
            w = cfg["reweight_distance"] / residuals[i]
        z_p = 1.0 / old["rho"][i] + vel[2]
        if z_p <= 0:
            f = (1.0 / old["sigma_rho"][i]) * R * w
            score += f * f
            continue
        rho_p = 1.0 / z_p
        p_x = rho_p * (vel[0] * fm - vel[2] * old["pos_img"][i][0]) + old["pos_img"][i][0]
        p_y = rho_p * (vel[1] * fm - vel[2] * old["pos_img"][i][1]) + old["pos_img"][i][1]
        p_xc = p_x + cam["cx"]
        p_yc = p_y + cam["cy"]
        x = int(math.floor(p_xc + 0.5))
        y = int(math.floor(p_yc + 0.5))
        if x < 1 or y < 1 or x >= cols - 1 or y >= rows - 1:
            f = (1.0 / old["sigma_rho"][i]) * R * w
            score += f * f
            continue
        fid = idf[y * cols + x]
        matched = fid >= 0
        if matched:
            gN = new["grad"][fid]
            gnN = new["grad_norm"][fid]
            dot = gN[0] * old["grad"][i][0] + gN[1] * old["grad"][i][1]
            if abs(dot - gnN * gnN) > cfg["match_threshold"] * gnN * gnN:
                matched = False
        if not matched:
            f = (1.0 / old["sigma_rho"][i]) * R * w
            score += f * f
            continue
        gnx = gN[0] / gnN
        gny = gN[1] / gnN
        dx = p_xc - new["pos"][fid][0]
        dy = p_yc - new["pos"][fid][1]
        fi = dx * gnx + dy * gny
        f = fi / old["sigma_rho"][i] * w
        score += f * f
        df_dx = gnx / old["sigma_rho"][i]
        df_dy = gny / old["sigma_rho"][i]
        jx = rho_p * fm * df_dx * w
        jy = rho_p * fm * df_dy * w
        jz = -rho_p * (p_x * df_dx + p_y * df_dy) * w
        j = np.array([jx, jy, jz])
        JtJ += np.outer(j, j)
        JtF += j * f
        res[i] = abs(fi)
        mif[i] = fid
    return score, JtJ, JtF, res, mif


# --------------------------------------------------------------- search match
def search_match(kl, old, vel, Rvel, Rback, max_radius, cfg, cam):
    fm = cam["fm"]
    pum = cfg["pixel_uncertainty_match"]
    cang_min = math.cos(cfg["match_threshold_angle"] * math.pi / 180.0)
    rows, cols = cam["rows"], cam["cols"]
    p = Rback @ np.array([kl["pos_img"][0], kl["pos_img"][1], fm])
    pmx = p[0] * fm / p[2]
    pmy = p[1] * fm / p[2]
    k_rho = kl["rho"] * fm / p[2]
    pi0x = pmx + cam["cx"]
    pi0y = pmy + cam["cy"]
    t_x = -(vel[0] * fm - vel[2] * pmx)
    t_y = -(vel[1] * fm - vel[2] * pmy)
    norm_t = math.sqrt(t_x * t_x + t_y * t_y)
    DrDv = np.array([fm, fm, -(pmx + pmy)])
    sigma2_t = DrDv @ Rvel @ DrDv
    if norm_t > 1e-6:
        t_x /= norm_t
        t_y /= norm_t
        dq_rho = norm_t * k_rho
        dq_min = max(0.0, norm_t * (k_rho - kl["sigma_rho"])) - pum
        dq_max = min(max_radius, norm_t * (k_rho + kl["sigma_rho"])) + pum
        if dq_rho > dq_max:
            dq_rho = 0.5 * (dq_max + dq_min)
            t_steps = int(dq_rho + 0.5)
        else:
            t_steps = int(max(dq_max - dq_rho, dq_rho - dq_min))
    else:
        t_x = kl["grad"][0] / kl["grad_norm"]
        t_y = kl["grad"][1] / kl["grad_norm"]
        norm_t = 1.0
        dq_min = -max_radius - pum
        dq_max = max_radius + pum
        dq_rho = 0.0
        t_steps = int(dq_max)

    tn = dq_rho
    tp = dq_rho + 1
    for _ in range(t_steps):
        for side in range(2):
            t = tp if side else tn
            if side and t > dq_max:
                continue
            if not side and t < dq_min:
                continue
            row = int(round_half_away(t_y * t + pi0y))
            col = int(round_half_away(t_x * t + pi0x))
            if row < 0 or row >= rows or col < 0 or col >= cols:
                continue
            oid = old["id_img"][row, col]
            if oid < 0:
                continue
            cang = (
                old["grad"][oid][0] * kl["grad"][0] + old["grad"][oid][1] * kl["grad"][1]
            ) / (old["grad_norm"][oid] * kl["grad_norm"])
            if cang < cang_min or abs(old["grad_norm"][oid] / kl["grad_norm"] - 1.0) > cfg["match_threshold_norm"]:
                continue
            v_rho_dr = (
                pum * pum
                + old["sigma_rho"][oid] ** 2 * norm_t * norm_t
                + sigma2_t * old["rho"][oid] ** 2
            )
            if (t - norm_t * old["rho"][oid]) ** 2 > v_rho_dr:
                continue
            return oid
        tp += 1
        tn -= 1
    return -1


# --------------------------------------------------------------- regularize
def regularize(rho, sigma_rho, grad, grad_norm, id_next, id_prev, valid, thr):
    K = len(rho)
    r_out = rho.copy()
    s_out = sigma_rho.copy()
    for i in range(K):
        if not valid[i] or id_next[i] < 0 or id_prev[i] < 0:
            continue
        n, p = id_next[i], id_prev[i]
        if (rho[n] - rho[p]) ** 2 > sigma_rho[n] ** 2 + sigma_rho[p] ** 2:
            continue
        alpha = (grad[n] @ grad[p]) / (grad_norm[n] * grad_norm[p])
        if alpha < thr:
            continue
        alpha = (alpha - thr) / (1.0 - thr)
        alpha /= abs(rho[n] - rho[p]) / (sigma_rho[n] + sigma_rho[p]) + 1.0
        wr = 1.0 / sigma_rho[i] ** 2
        wrn = alpha / sigma_rho[n] ** 2
        wrp = alpha / sigma_rho[p] ** 2
        r_out[i] = (rho[i] * wr + rho[n] * wrn + rho[p] * wrp) / (wr + wrn + wrp)
        s_out[i] = (sigma_rho[i] * wr + sigma_rho[n] * wrn + sigma_rho[p] * wrp) / (wr + wrn + wrp)
    return r_out, s_out


# ----------------------------------------------------------------- depth EKF
def update_inverse_depth_arlu(kl, vel, cfg, cam):
    fm = cam["fm"]
    qx, qy = kl["pos_img"]
    q0x, q0y = kl["match_pos_img"]
    v_rho = kl["sigma_rho"] ** 2
    ux = kl["match_grad"][0] / kl["match_grad_norm"]
    uy = kl["match_grad"][1] / kl["match_grad_norm"]
    Y = ux * (qx - q0x) + uy * (qy - q0y)
    H = ux * (vel[0] * fm - vel[2] * q0x) + uy * (vel[1] * fm - vel[2] * q0y)
    rho_p = 1.0 / (1.0 / kl["rho"] + vel[2])
    F = 1.0 / (1.0 + kl["rho"] * vel[2])
    F *= F
    p_p = F * v_rho * F + cfg["reshape_q_abs"] ** 2
    e = Y - H * rho_p
    S = H * p_p * H + cfg["pixel_uncertainty"] ** 2
    Kk = p_p * H / S
    rho = rho_p + Kk * e
    v_rho = (1.0 - Kk * H) * p_p
    sigma = math.sqrt(v_rho)
    if rho < RHO_MIN:
        sigma += RHO_MIN - rho
        rho = RHO_MIN
    elif rho > RHO_MAX:
        rho = RHO_MAX
    return rho, sigma


# ------------------------------------------------------------------ quantile
def estimate_quantile(sigma_rho, valid, percentile, num_bins):
    size = int(valid.sum())
    hist = np.zeros(num_bins, np.int64)
    for i in range(len(sigma_rho)):
        if not valid[i]:
            continue
        b = int(num_bins * (sigma_rho[i] - RHO_MIN) / (RHO_MAX - RHO_MIN))
        b = min(max(b, 0), num_bins - 1)
        hist[b] += 1
    a = 0
    for i in range(num_bins):
        if a > percentile * size:
            return i * (RHO_MAX - RHO_MIN) / num_bins + RHO_MIN
        a += hist[i]
    return 1e3
