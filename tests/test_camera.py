import numpy as np
import jax.numpy as jnp

from rebvio_tpu.camera import Undistorter, distort_normalized, make_undistort_map, remap_bilinear
from rebvio_tpu.configs import CameraConfig


def test_undistort_identity_without_distortion():
    cam = CameraConfig(rows=32, cols=48, cx=24, cy=16, fx=40, fy=40,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    rng = np.random.RandomState(0)
    img = rng.rand(32, 48).astype(np.float32) * 255
    u = Undistorter(cam, gain=1.0)
    out = np.asarray(u(jnp.asarray(img)))
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_undistort_inverts_distortion():
    """Project a grid through the forward distortion, then check the remap
    samples the distorted location (cv::undistort semantics)."""
    cam = CameraConfig()  # EuRoC calibration
    grid = make_undistort_map(cam)
    # center pixel should map near itself
    cy, cx = int(cam.cy), int(cam.cx)
    assert abs(grid[cy, cx, 0] - cam.cx) < 1.0
    assert abs(grid[cy, cx, 1] - cam.cy) < 1.0
    # a corner-ish pixel under EuRoC's barrel distortion maps inward
    y, x = 40, 60
    xn = (x - cam.cx) / cam.fm
    yn = (y - cam.cy) / cam.fm
    xd, yd = distort_normalized(cam, np.asarray(xn), np.asarray(yn))
    assert np.isclose(grid[y, x, 0], cam.fm * xd + cam.cx, atol=1e-3)
    assert np.isclose(grid[y, x, 1], cam.fm * yd + cam.cy, atol=1e-3)


def test_remap_out_of_bounds_zero():
    img = jnp.ones((8, 8), jnp.float32)
    grid = np.zeros((8, 8, 2), np.float32)
    grid[..., 0] = -5.0  # off image
    grid[..., 1] = 3.0
    out = np.asarray(remap_bilinear(img, jnp.asarray(grid)))
    assert np.all(out == 0.0)


def test_camera_config_json_roundtrip(tmp_path):
    cam = CameraConfig()
    p = str(tmp_path / "cam.json")
    cam.to_json(p)
    cam2 = CameraConfig.from_json(p)
    assert cam2 == cam
    assert np.allclose(cam2.R_c2i_np(), cam.R_c2i_np())


def test_undistorter_u8_fast_path_matches_f32_remap():
    """The packed-lane uint8 remap (Undistorter._remap_u8) must agree with
    the general f32 bilinear gather to FP-reassociation tolerance."""
    from rebvio_tpu.camera import Undistorter

    cam = CameraConfig()
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=(cam.rows, cam.cols), dtype=np.uint8)
    und = Undistorter(cam, gain=3.0)
    fast = np.asarray(und(jnp.asarray(raw)))                     # u8 path
    ref = np.asarray(
        remap_bilinear(jnp.asarray(raw.astype(np.float32) * 3.0), und.grid)
    )
    assert fast.shape == ref.shape
    assert np.abs(fast - ref).max() < 1e-3


def test_undistorter_u8_border_partial_footprints():
    """A camera whose undistort map samples on/near the last row and column
    (partial 2x2 bilinear footprints) must agree between the packed uint8
    path and remap_bilinear — the packed path's per-tap masks reproduce
    remap_bilinear's per-tap zero fill exactly (ADVICE r3: the old packed
    path zeroed any pixel whose footprint was not fully interior)."""
    # pincushion-style distortion (k1>0) pushes border samples OUTWARD, so
    # the map lands on / beyond the last row and column
    cam = CameraConfig(rows=32, cols=48, cx=24.3, cy=16.7, fx=30, fy=30,
                       k1=0.2, k2=0.0, k3=0.0, p1=0.01, p2=-0.01)
    grid = make_undistort_map(cam)
    # the scenario must actually occur: some samples with x0 or y0 on the
    # last row/col (partial footprint) but still partially in bounds
    x0 = np.floor(grid[..., 0]); y0 = np.floor(grid[..., 1])
    partial = ((x0 == cam.cols - 1) & (y0 >= 0) & (y0 < cam.rows)) | \
              ((y0 == cam.rows - 1) & (x0 >= 0) & (x0 < cam.cols))
    assert partial.any(), "test camera does not exercise partial footprints"
    rng = np.random.default_rng(1)
    raw = rng.integers(1, 256, size=(cam.rows, cam.cols), dtype=np.uint8)
    und = Undistorter(cam, gain=1.0)
    fast = np.asarray(und(jnp.asarray(raw)))
    ref = np.asarray(remap_bilinear(jnp.asarray(raw.astype(np.float32)), und.grid))
    assert np.abs(fast - ref).max() < 1e-3
