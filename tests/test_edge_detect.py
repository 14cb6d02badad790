import dataclasses

import numpy as np
import jax.numpy as jnp

from rebvio_tpu.configs import CameraConfig, EdgeDetectorConfig
from rebvio_tpu.ops import edge_detect
from rebvio_tpu.ops.scale_space import ScaleSpaceParams, build_scale_space
from tests import oracle


def _test_image(H, W, seed=0):
    """Smooth synthetic image with strong edges (bright polygon on dark bg)."""
    rng = np.random.RandomState(seed)
    img = np.full((H, W), 30.0, np.float32)
    # a few bright rectangles and a diagonal band
    img[H // 4 : H // 2, W // 5 : W // 2] = 220.0
    img[2 * H // 3 :, 2 * W // 3 :] = 160.0
    yy, xx = np.mgrid[0:H, 0:W]
    band = np.abs(yy - 0.7 * xx - H * 0.1) < 4
    img[band] = 250.0
    img += rng.randn(H, W).astype(np.float32) * 1.0
    return img * 3.0  # input gain as in the pipeline


def test_detect_matches_oracle():
    H, W = 96, 128
    cam = CameraConfig(rows=H, cols=W, cx=W / 2, cy=H / 2, fx=100, fy=100,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    cfg = EdgeDetectorConfig(keylines_max=2048, keylines_ref=1024)
    ss = ScaleSpaceParams(H, W)
    img = _test_image(H, W)
    threshold = 0.05

    m = edge_detect.detect(jnp.asarray(img), jnp.float32(threshold), ss.matrices(), cfg, cam)
    count = int(m.count)
    assert count > 50, count

    s0, dog, mag = build_scale_space(jnp.asarray(img), ss.matrices())
    ks, id_img = oracle.detect_keylines(
        np.asarray(dog, np.float64), np.asarray(mag, np.float64), threshold,
        dict(plane_fit_size=cfg.plane_fit_size, pos_neg_threshold=cfg.pos_neg_threshold,
             max_image_value=cfg.max_image_value, dog_threshold=cfg.dog_threshold,
             keylines_max=cfg.keylines_max),
    )
    # counts should agree within borderline-gate tolerance
    assert abs(count - len(ks)) <= max(3, 0.02 * len(ks)), (count, len(ks))

    got_pos = np.asarray(m.pos)[:count]
    want_pos = np.stack([k["pos"] for k in ks])
    # match raster order on the common prefix of identical integer pixels
    n = min(count, len(ks))
    ok = 0
    for i in range(n):
        if np.allclose(got_pos[i], want_pos[i], atol=2e-2):
            ok += 1
    assert ok >= 0.95 * n, (ok, n)

    # gradient values for matching entries
    got_grad = np.asarray(m.grad)[:count]
    want_grad = np.stack([k["grad"] for k in ks])
    sel = [i for i in range(n) if np.allclose(got_pos[i], want_pos[i], atol=2e-2)]
    assert np.allclose(got_grad[sel], want_grad[sel], rtol=2e-2, atol=0.5)

    # id image consistency: every valid keyline's integer pixel maps back
    id_img_got = np.asarray(m.kl_id_img)
    for i in range(0, count, 17):
        x = int(np.floor(got_pos[i][0] + 0.5))
        y = int(np.floor(got_pos[i][1] + 0.5))
        assert id_img_got[y, x] == i


def test_keylines_cap_and_raster_order():
    H, W = 64, 96
    cam = CameraConfig(rows=H, cols=W, cx=W / 2, cy=H / 2, fx=100, fy=100,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    cfg = EdgeDetectorConfig(keylines_max=64, keylines_ref=32)
    ss = ScaleSpaceParams(H, W)
    img = _test_image(H, W, seed=3)
    m = edge_detect.detect(jnp.asarray(img), jnp.float32(0.02), ss.matrices(), cfg, cam)
    assert int(m.count) == 64  # saturated at cap
    pos = np.asarray(m.pos)[:64]
    ridx = np.floor(pos[:, 1] + 0.5) * W + np.floor(pos[:, 0] + 0.5)
    assert np.all(np.diff(ridx) > 0)  # strict raster order


def test_join_edges_links_along_band():
    H, W = 64, 96
    cam = CameraConfig(rows=H, cols=W, cx=W / 2, cy=H / 2, fx=100, fy=100,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    cfg = EdgeDetectorConfig(keylines_max=2048)
    ss = ScaleSpaceParams(H, W)
    img = _test_image(H, W, seed=1)
    m = edge_detect.detect(jnp.asarray(img), jnp.float32(0.05), ss.matrices(), cfg, cam)
    count = int(m.count)
    id_next = np.asarray(m.id_next)[:count]
    id_prev = np.asarray(m.id_prev)[:count]
    # a healthy fraction of keylines on long edges should be chained
    frac = np.mean(id_next >= 0)
    assert frac > 0.3, frac
    # consistency: if id_next[i] = j then id_prev[j] points at some keyline
    # whose id_next is j (later writers may override, but j must be claimed)
    for i in range(0, count, 13):
        j = id_next[i]
        if j >= 0:
            p = id_prev[j]
            assert p >= 0 and id_next[p] == j


def test_autogain():
    cfg = EdgeDetectorConfig()
    t = edge_detect.autogain_threshold(jnp.float32(0.01), jnp.asarray(0, jnp.int32), cfg)
    # fewer keylines than ref -> threshold decreases
    assert float(t) < 0.01
    t2 = edge_detect.autogain_threshold(jnp.float32(0.01), jnp.asarray(20000, jnp.int32), cfg)
    assert float(t2) > 0.01
