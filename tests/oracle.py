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


# ===================================================================
# Composed sequential oracle of the vision-only master loop
# (rebvio.cpp:92-293 restricted to the paths that do not touch
# imu_state_/sab_state_) — used by test_oracle_pipeline.py to check the
# jitted pipeline's STAGE SEQUENCING, not just each kernel in isolation.
# ===================================================================


def rodrigues(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + math.sin(th) * Kx + (1 - math.cos(th)) * (Kx @ Kx)


def rotate_keylines(m, R, fm):
    """edge_map.cpp:58-71 (in place on the dict-of-arrays map)."""
    for i in range(len(m["pos"])):
        if not m["valid"][i]:
            continue
        q = R @ np.array([m["pos_img"][i][0] / fm, m["pos_img"][i][1] / fm, 1.0])
        if q[2] == 0.0:
            continue
        m["pos_img"][i] = np.array([q[0] / q[2] * fm, q[1] / q[2] * fm])
        m["rho"][i] /= q[2]
        m["sigma_rho"][i] /= q[2]
        g = R @ np.array([m["grad"][i][0], m["grad"][i][1], 0.0])
        m["grad"][i] = g[:2]


def join_edges(ks, id_img):
    """edge_detector.cpp:125-165: link keylines along the edge tangent."""
    H, W = id_img.shape
    K = len(ks)
    id_next = np.full(K, -1, np.int32)
    id_prev = np.full(K, -1, np.int32)

    def probe(x, y):
        if 0 <= y < H and 0 <= x < W:
            return id_img[y, x]
        return -1

    for i, k in enumerate(ks):
        x = int(k["pos"][0] + 0.5)
        y = int(k["pos"][1] + 0.5)
        tx, ty = -k["grad"][1], k["grad"][0]
        if ty > 0:
            px = 1 if tx > 0 else -1
            py = 1
        else:
            px = -1 if tx < 0 else 1
            py = -1
        for dx, dy in ((px, 0), (0, py), (px, py)):
            nid = probe(x + dx, y + dy)
            if nid >= 0:
                id_next[i] = nid
                id_prev[nid] = i
                break
    return id_next, id_prev


def tune_threshold(grad_norms, keylines_max, num_bins=100):
    """edge_detector.cpp:167-186 incl. the skip-bin-0 loop quirk."""
    if len(grad_norms) == 0:
        return 0.0
    max_dog = float(np.max(grad_norms))
    min_dog = float(np.min(grad_norms))
    rng = max_dog - min_dog if max_dog > min_dog else 1.0
    hist = np.zeros(num_bins, np.int64)
    for g in grad_norms:
        b = int(num_bins * (max_dog - g) / rng)
        hist[min(max(b, 0), num_bins - 1)] += 1
    a = 0
    i = 0
    while a < keylines_max and i < num_bins:
        i += 1
        if i < num_bins:
            a += hist[i]
    return max_dog - i * (max_dog - min_dog) / num_bins


def minimize_vel(old, new, idf, vel0, cfg, cam):
    """LM driver (core.cpp:150-189). Returns (vel, Rvel, mif, score)."""
    sigma_rho_min = estimate_quantile(
        old["sigma_rho"], old["valid"], cfg["quantile_cutoff"], 100)
    residuals = np.zeros(len(old["pos"]))
    F, JtJ, JtF, residuals, mif = try_vel(
        old, new, idf, residuals, vel0, sigma_rho_min, cfg, cam)
    vel = np.asarray(vel0, np.float64)
    u = 1e-3 * JtJ.max()
    v = 2.0
    for _ in range(cfg["iterations"]):
        h = np.linalg.solve(JtJ + np.eye(3) * u, -JtF)
        vel_new = vel + h
        F2, JtJ2, JtF2, residuals, mif = try_vel(
            old, new, idf, residuals, vel_new, sigma_rho_min, cfg, cam)
        gain = (F - F2) / (0.5 * h @ (u * h - JtF))
        if gain > 0:
            F, vel, JtJ, JtF = F2, vel_new, JtJ2, JtF2
            u *= max(0.33, 1.0 - (2.0 * gain - 1.0) ** 3)
            v = 2.0
        else:
            u *= v
            v *= 2.0
    return vel, np.linalg.inv(JtJ), mif, F


def ext_rot_vel(new, vel, cfg, cam):
    """6-DoF linear refinement from forward matches (core.cpp:191-261)."""
    fm = cam["fm"]
    rows_phi = []
    ys = []
    for i in range(len(new["pos"])):
        if not new["valid"][i] or new["match_id"][i] < 0:
            continue
        gn = new["grad_norm"][i]
        u_x = new["grad"][i][0] / gn
        u_y = new["grad"][i][1] / gn
        rho_t = 1.0 / (1.0 / new["rho"][i] + vel[2])
        q0x, q0y = new["match_pos_img"][i]
        qtx = q0x + rho_t * (vel[0] * fm - vel[2] * q0x)
        qty = q0y + rho_t * (vel[1] * fm - vel[2] * q0y)
        q_x, q_y = new["pos_img"][i]
        phi = np.array([
            u_x * rho_t * fm,
            u_y * rho_t * fm,
            u_x * (-rho_t * q_x) + u_y * (-rho_t * q_y),
            -u_x * q_x * q_y / fm - u_y * (fm + q_y * q_y / fm),
            u_y * q_x * q_y / fm + u_x * (fm + q_x * q_x / fm),
            -u_x * q_y + u_y * q_x,
        ])
        Y = u_x * (q_x - qtx) + u_y * (q_y - qty)
        dqvel = u_x * (vel[0] * fm - vel[2] * q0x) + u_y * (vel[1] * fm - vel[2] * q0y)
        s_y = math.sqrt(new["sigma_rho"][i] ** 2 * dqvel ** 2 + cfg["pixel_uncertainty"] ** 2)
        w = 1.0
        if abs(Y) > cfg["reweight_distance"]:
            w = abs(Y) / cfg["reweight_distance"]
        rows_phi.append(phi / (s_y * w))
        ys.append(Y / (s_y * w))
    Phi = np.stack(rows_phi) if rows_phi else np.zeros((1, 6))
    Yv = np.asarray(ys) if ys else np.zeros(1)
    JtJ = Phi.T @ Phi
    JtF = Phi.T @ Yv
    X = np.linalg.lstsq(JtJ, JtF, rcond=None)[0]
    return X, JtJ


def empty_map():
    return None


def oracle_step(state, dog, mag, cfg_det, cfg_core, cfg_em, cam):
    """One vision-only master-loop iteration over precomputed (dog, mag).

    ``state``: dict with keys map (dict-of-arrays or None), threshold,
    keylines_count, R_global, Pos, run_ok.  Returns (state, odometry dict).
    Ordering per rebvio.cpp:119-292 with R prior = I and no SAB.
    """
    # auto-gain (edge_detector.cpp:33-36)
    thr = state["threshold"]
    if cfg_det["gain"] > 0:
        thr -= cfg_det["gain"] * (cfg_det["keylines_ref"] - state["keylines_count"])
        thr = min(max(thr, cfg_det["min_threshold"]), cfg_det["max_threshold"])

    ks, id_img = detect_keylines(dog, mag, thr, cfg_det)
    id_next, id_prev = join_edges(ks, id_img)
    map_thr = tune_threshold(np.array([k["grad_norm"] for k in ks]),
                             cfg_det["keylines_max"])
    K = len(ks)
    new = dict(
        pos=np.stack([k["pos"] for k in ks]) if K else np.zeros((0, 2)),
        grad=np.stack([k["grad"] for k in ks]) if K else np.zeros((0, 2)),
        grad_norm=np.array([k["grad_norm"] for k in ks]),
        rho=np.full(K, RHO_INIT), sigma_rho=np.full(K, 20.0),
        valid=np.ones(K, bool), threshold=map_thr,
        match_id=np.full(K, -1, np.int32),
        match_pos_img=np.zeros((K, 2)), match_grad=np.zeros((K, 2)),
        match_grad_norm=np.zeros(K), matches=np.zeros(K, np.int32),
        id_next=id_next, id_prev=id_prev, id_img=id_img,
    )
    new["pos_img"] = new["pos"] - np.array([cam["cx"], cam["cy"]])
    new["match_pos_img"] = new["pos_img"].copy()

    state = dict(state)
    state["keylines_count"] = K
    state["threshold"] = thr
    odo = dict(position=state["Pos"].copy(), num_matches=0, run_ok=state["run_ok"])
    if state["map"] is None or not state["run_ok"]:
        state["map"] = new
        return state, odo
    old = state["map"]

    # distance field from the NEW map (rebvio.cpp:142)
    use = new["valid"].copy()
    if new["threshold"] > 0:
        use &= new["grad_norm"] >= new["threshold"]
    idf, _ = build_distance_field(
        new["pos"], new["grad"], new["grad_norm"], use,
        int(cfg_core["search_range"]), cam["rows"], cam["cols"])

    # minimizeVel (rebvio.cpp:169) — R prior = I so no pre-rotation
    vel, Rvel, mif, _ = minimize_vel(old, new, idf, np.zeros(3), cfg_core, cam)

    # forwardMatch (rebvio.cpp:172, edge_map.cpp:73-99)
    match_id = forward_match(old["rho"], mif, K)
    for t in range(K):
        s = match_id[t]
        if s < 0:
            continue
        new["rho"][t] = old["rho"][s]
        new["sigma_rho"][t] = old["sigma_rho"][s]
        new["matches"][t] = old["matches"][s] + 1
        new["match_id"][t] = s
        new["match_pos_img"][t] = old["pos_img"][s]
        new["match_grad"][t] = old["grad"][s]
        new["match_grad_norm"][t] = old["grad_norm"][s]

    # extRotVel (rebvio.cpp:177)
    Xv, W_Xv = ext_rot_vel(new, vel, cfg_core, cam)
    dV, dW = Xv[:3], Xv[3:]
    R0 = rodrigues(dW)
    Rgva = R0.T  # R prior = I
    Vgva = R0 @ vel + dV
    P_V = np.linalg.inv(W_Xv)[:3, :3]

    # second rotation of the old map (rebvio.cpp:223,232)
    rotate_keylines(old, R0, cam["fm"])

    # failure gates (rebvio.cpp:236-252)
    if np.any(np.isnan(Vgva)):
        state["run_ok"] = False
        state["map"] = new
        return state, odo

    # directedMatch back into the old map (rebvio.cpp:245)
    klm = 0
    for i in range(K):
        kl = {k: new[k][i] for k in
              ("pos_img", "rho", "sigma_rho", "grad", "grad_norm")}
        oid = search_match(kl, old, Rgva @ Vgva, Rgva @ P_V @ Rgva.T, Rgva,
                           cfg_core["search_range"], cfg_em, cam)
        if oid >= 0:
            klm += 1
            new["rho"][i] = old["rho"][oid]
            new["sigma_rho"][i] = old["sigma_rho"][oid]
            new["match_id"][i] = oid
            new["matches"][i] = old["matches"][oid] + 1
            new["match_pos_img"][i] = old["pos_img"][oid]
            new["match_grad"][i] = old["grad"][oid]
            new["match_grad_norm"][i] = old["grad_norm"][oid]
        else:
            new["match_id"][i] = -1
    if klm < cfg_core["global_min_matches_threshold"]:
        state["run_ok"] = False
        state["map"] = new
        odo["num_matches"] = 0
        return state, odo

    # regularize + depth EKF (rebvio.cpp:256-259)
    new["rho"], new["sigma_rho"] = regularize(
        new["rho"], new["sigma_rho"], new["grad"], new["grad_norm"],
        new["id_next"], new["id_prev"], new["valid"],
        cfg_em["regularization_threshold"])
    for i in range(K):
        if new["match_id"][i] < 0:
            continue
        kl = {k: new[k][i] for k in
              ("pos_img", "match_pos_img", "rho", "sigma_rho",
               "match_grad", "match_grad_norm")}
        r, s = update_inverse_depth_arlu(kl, Vgva, cfg_core, cam)
        if not (np.isfinite(r) and np.isfinite(s)):
            r, s = RHO_INIT, RHO_MAX
        new["rho"][i], new["sigma_rho"][i] = r, s

    # vision-only global pose integration (pipeline.py VO branch)
    state["R_global"] = state["R_global"] @ Rgva
    state["Pos"] = state["Pos"] - state["R_global"] @ Vgva
    state["map"] = new
    odo = dict(position=state["Pos"].copy(), num_matches=klm, run_ok=True)
    return state, odo
