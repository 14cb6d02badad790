import numpy as np
import jax.numpy as jnp

from rebvio_tpu.ops import distance_field as DF
from tests.helpers import make_random_map


def _brute_nn(pos, valid, H, W, R):
    """Exact nearest-keyline id per pixel within radius R (subpixel metric)."""
    ids = np.full((H, W), -1, np.int32)
    P = pos[valid]
    pid = np.nonzero(valid)[0]
    for y in range(H):
        for x in range(W):
            d2 = (P[:, 0] - x) ** 2 + (P[:, 1] - y) ** 2
            j = np.argmin(d2)
            if d2[j] <= R * R:
                ids[y, x] = pid[j]
    return ids


def test_jfa_matches_brute_force_nn():
    rng = np.random.RandomState(0)
    H, W, K, kmax, R = 40, 56, 30, 64, 8
    em, d = make_random_map(rng, K, kmax, H, W)
    got = np.asarray(DF.build_nn_field(em, R, H, W)).reshape(H, W)
    want = _brute_nn(np.asarray(em.pos), np.asarray(em.valid), H, W, R)
    # JFA is near-exact; require distance-correctness rather than exact ids
    # (ties / JFA approximation may pick a different equally-near keyline)
    pos = np.asarray(em.pos)
    mismatch = 0
    for y in range(H):
        for x in range(W):
            g, w = got[y, x], want[y, x]
            if g == w:
                continue
            if (g < 0) != (w < 0):
                mismatch += 1
                continue
            dg = (pos[g, 0] - x) ** 2 + (pos[g, 1] - y) ** 2
            dw = (pos[w, 0] - x) ** 2 + (pos[w, 1] - y) ** 2
            if abs(dg - dw) > 1e-3:  # picked a strictly farther keyline
                mismatch += 1
    assert mismatch <= 0.002 * H * W, mismatch


def test_jfa_respects_threshold_gate():
    rng = np.random.RandomState(1)
    H, W, K, kmax, R = 32, 32, 20, 32, 6
    em, d = make_random_map(rng, K, kmax, H, W)
    thr = float(np.median(d["grad_norm"]))
    em = em.replace(threshold=jnp.asarray(thr, jnp.float32))
    got = np.asarray(DF.build_nn_field(em, R, H, W))
    gated_out = set(np.nonzero(d["grad_norm"] < thr)[0])
    present = set(int(i) for i in got[got >= 0])
    assert not (present & gated_out)


def test_pallas_att_field_matches_contract():
    # The attribute-field kernel: id lane distance-correct vs brute force,
    # and every payload lane exactly the chosen keyline's detection fields.
    from rebvio_tpu.ops.pallas_kernels import att_field_pallas

    rng = np.random.RandomState(3)
    H, W, K, kmax, R = 40, 56, 36, 64, 8
    em, d = make_random_map(rng, K, kmax, H, W)
    att = np.asarray(att_field_pallas(em, R, H, W, scale=1, interpret=True))
    att = att.T                     # [8,N] planes -> [N,8] rows for the checks
    got = att[:, DF.ATT_ID].astype(np.int32).reshape(H, W)
    want = _brute_nn(np.asarray(em.pos), np.asarray(em.valid), H, W, R)
    pos = np.asarray(em.pos)
    grad = np.asarray(em.grad)
    gn = np.asarray(em.grad_norm)
    mismatch = 0
    for y in range(H):
        for x in range(W):
            g, w = got[y, x], want[y, x]
            if (g < 0) != (w < 0):
                mismatch += 1
                continue
            if g >= 0:
                i = y * W + x
                assert np.allclose(att[i, DF.ATT_GX:DF.ATT_GX + 2], grad[g])
                assert abs(att[i, DF.ATT_GN] - gn[g]) < 1e-5 * max(1.0, gn[g])
                assert np.allclose(att[i, DF.ATT_POSX:DF.ATT_POSX + 2], pos[g])
                assert att[i, DF.ATT_D2] <= R * R + 1e-3
            if g == w:
                continue
            dg = (pos[g, 0] - x) ** 2 + (pos[g, 1] - y) ** 2
            dw = (pos[w, 0] - x) ** 2 + (pos[w, 1] - y) ** 2
            if abs(dg - dw) > 1e-3:
                mismatch += 1
    assert mismatch <= 0.002 * H * W, mismatch


def test_pallas_att_field_scale_matches_xla():
    # At scale 2 the Pallas kernel must agree with the XLA formulation's
    # contract: scaled-grid metric, full-res pos payload.
    import os

    from rebvio_tpu.ops.pallas_kernels import att_field_pallas

    rng = np.random.RandomState(4)
    H, W, K, kmax, R = 48, 64, 40, 64, 10
    em, d = make_random_map(rng, K, kmax, H, W)
    os.environ["REBVIO_PALLAS_JFA"] = "0"
    try:
        ref = np.asarray(DF.build_att_field(em, R, H, W, scale=2)).T
    finally:
        os.environ.pop("REBVIO_PALLAS_JFA", None)
    got = np.asarray(att_field_pallas(em, R, H, W, scale=2, interpret=True)).T
    pos = np.asarray(em.pos)
    Hs, Ws = H // 2, W // 2
    mismatch = 0
    for i in range(Hs * Ws):
        gid = int(got[i, DF.ATT_ID])
        rid = int(ref[i, DF.ATT_ID])
        if gid >= 0:
            assert np.allclose(got[i, DF.ATT_POSX:DF.ATT_POSX + 2], pos[gid])
        if gid == rid:
            continue
        if (gid < 0) != (rid < 0):
            mismatch += 1
            continue
        y, x = i // Ws, i % Ws
        dg = (pos[gid, 0] / 2 - x) ** 2 + (pos[gid, 1] / 2 - y) ** 2
        dr = (pos[rid, 0] / 2 - x) ** 2 + (pos[rid, 1] / 2 - y) ** 2
        # the XLA field quantizes seeds to 1/q px; allow that band
        if abs(dg - dr) > 0.6:
            mismatch += 1
    assert mismatch <= 0.005 * Hs * Ws, mismatch


def test_pallas_jfa_matches_xla_jfa():
    # The Pallas kernel keeps the exact subpixel metric; the XLA JFA packs
    # seed coords as fixed-point (<= 0.25 px quantization) to roll one plane
    # per pass, so compare by distance-correctness (same contract as the
    # brute-force test) instead of bit equality.
    from rebvio_tpu.ops.pallas_kernels import nn_field_pallas

    rng = np.random.RandomState(2)
    H, W, K, kmax, R = 40, 56, 36, 64, 8
    from tests.helpers import make_random_map

    em, d = make_random_map(rng, K, kmax, H, W)
    want = np.asarray(DF.build_nn_field(em, R, H, W)).reshape(H, W)
    got = np.asarray(nn_field_pallas(em, R, H, W, interpret=True)).reshape(H, W)
    pos = np.asarray(em.pos)
    mismatch = 0
    for y in range(H):
        for x in range(W):
            g, w = got[y, x], want[y, x]
            if g == w:
                continue
            if (g < 0) != (w < 0):
                mismatch += 1
                continue
            dg = (pos[g, 0] - x) ** 2 + (pos[g, 1] - y) ** 2
            dw = (pos[w, 0] - x) ** 2 + (pos[w, 1] - y) ** 2
            if abs(dg - dw) > 0.6:  # beyond the quantization band
                mismatch += 1
    assert mismatch <= 0.002 * H * W, mismatch



def test_att_field_plane_layout_contract():
    """The attribute field is canonically [8, N] PLANE-major (the
    lane-compact carried form; see distance_field.build_att_field docstring)
    and att_rows is its exact [N, 8] gatherable row view.  Pins the r5
    layout contract so a consumer regression to row-major carry (16x
    lane-padded scan state) fails loudly."""
    rng = np.random.RandomState(11)
    H, W, K, kmax, R = 40, 56, 30, 64, 8
    em, _ = make_random_map(rng, K, kmax, H, W)
    att = DF.build_att_field(em, R, H, W)
    assert att.shape == (8, H * W)
    rows = DF.att_rows(att)
    assert rows.shape == (H * W, 8)
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(att).T)
    # id plane consistent with the id-only field on in-range cells
    ids = np.asarray(DF.build_nn_field(em, R, H, W))
    att_ids = np.asarray(att[DF.ATT_ID]).astype(np.int32)
    agree = (att_ids == ids)
    # JFA tie-breaks may differ between the two builds; require bulk
    # agreement and identical emptiness
    assert np.mean(agree) > 0.99
    np.testing.assert_array_equal(att_ids < 0, ids < 0)


def test_empty_edge_map_att_shape():
    from rebvio_tpu import types as T

    em = T.empty_edge_map(64, 40, 56, 2)
    assert em.att_img.shape == (8, (40 // 2) * (56 // 2))


def test_seed_stack_dense_matches_scatter_seeding():
    """seed_stack_dense (the detector-plane dense seeding fast path, incl.
    the general-s parity decomposition added for the fast profile's scale-3
    field) must flood to EXACTLY the same attribute field as the scatter-
    seeded att_field_pallas: both build the same seed stack content, and
    the flood is deterministic.  Covers scales 2 and 3 in interpret mode."""
    from rebvio_tpu import types as T
    from rebvio_tpu.ops.pallas_kernels import _att_flood, att_field_pallas

    rng = np.random.RandomState(7)
    H, W, K, kmax, R = 24, 36, 40, 64, 8
    flat = np.sort(rng.choice(np.arange(W + 1, (H - 1) * W - 1), K,
                              replace=False))
    r, c = flat // W, flat % W
    sub = rng.uniform(-0.45, 0.45, (2, K)).astype(np.float32)
    g = rng.randn(2, K).astype(np.float32)

    kl_id = np.full((H, W), -1, np.int32)
    kl_id[r, c] = np.arange(K)
    xs = np.zeros((H, W), np.float32); xs[r, c] = sub[0]
    ys = np.zeros((H, W), np.float32); ys[r, c] = sub[1]
    t0 = np.zeros((H, W), np.float32); t0[r, c] = g[0]
    t1 = np.zeros((H, W), np.float32); t1[r, c] = g[1]

    em = T.empty_edge_map(kmax, H, W, 1)
    pos = np.zeros((kmax, 2), np.float32)
    pos[:K, 0] = c + sub[0]
    pos[:K, 1] = r + sub[1]
    grad = np.zeros((kmax, 2), np.float32)
    grad[:K] = g.T
    em = em.replace(
        pos=jnp.asarray(pos), grad=jnp.asarray(grad),
        grad_norm=jnp.asarray(np.hypot(grad[:, 0], grad[:, 1])),
        valid=jnp.asarray(np.arange(kmax) < K),
        threshold=jnp.float32(0.0),
    )

    for s in (2, 3):
        frows, fcols = -(-H // s), -(-W // s)
        sr = max(1, round(R / s))
        stack = DF.seed_stack_dense(
            jnp.asarray(kl_id), jnp.asarray(xs), jnp.asarray(ys),
            jnp.asarray(t0), jnp.asarray(t1), jnp.float32(0.0),
            R, H, W, s)
        got = np.asarray(_att_flood(stack, sr, frows, fcols, s,
                                    interpret=True))
        want = np.asarray(att_field_pallas(em, R, H, W, scale=s,
                                           interpret=True))
        np.testing.assert_array_equal(
            got[DF.ATT_ID], want[DF.ATT_ID], err_msg=f"scale {s}")
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5,
                                   err_msg=f"scale {s}")
