import os

import numpy as np
import jax.numpy as jnp

from rebvio_tpu import types as T
from rebvio_tpu.configs import PipelineConfig, CameraConfig, EdgeDetectorConfig
from rebvio_tpu.utils import checkpoint


def _cfg():
    cam = CameraConfig(rows=32, cols=48, cx=24, cy=16, fx=40, fy=40,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    det = EdgeDetectorConfig(keylines_max=64)
    return PipelineConfig(camera=cam, detector=det)


def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg()
    state = T.init_vio_state(cfg)
    state = state.replace(K=jnp.float32(3.25), num_frames=jnp.asarray(7, jnp.int32))
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save(p, state)
    restored = checkpoint.load(p, T.init_vio_state(cfg))
    assert float(restored.K) == 3.25
    assert int(restored.num_frames) == 7
    np.testing.assert_array_equal(
        np.asarray(restored.edge_map.kl_id_img), np.asarray(state.edge_map.kl_id_img)
    )


def test_checkpoint_shape_mismatch(tmp_path):
    cfg = _cfg()
    state = T.init_vio_state(cfg)
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save(p, state)
    cam2 = CameraConfig(rows=16, cols=48, cx=24, cy=8, fx=40, fy=40,
                        k1=0, k2=0, k3=0, p1=0, p2=0)
    cfg2 = PipelineConfig(camera=cam2, detector=cfg.detector)
    try:
        checkpoint.load(p, T.init_vio_state(cfg2))
        assert False, "expected shape mismatch"
    except ValueError:
        pass


def test_cli_synthetic(tmp_path, capsys):
    from rebvio_tpu.run import main

    odo = str(tmp_path / "odo.txt")
    rc = main([
        "--dataset", "synthetic", "--mode", "vo", "--frames", "10",
        "--preset", "small", "--odometry-out", odo,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"ate_sim3"' in out
    assert os.path.exists(odo)
    from rebvio_tpu.eval import read_odometry

    ts, ori, pos = read_odometry(odo)
    assert len(ts) == 10


def test_visualize_edge_image(tmp_path):
    import jax.numpy as jnp
    from rebvio_tpu import types as T
    from rebvio_tpu.utils.visualize import render_edge_image, write_png_rgb
    from rebvio_tpu.data.euroc import _read_png_gray

    em = T.empty_edge_map(8, 16, 20)
    import numpy as np

    pos = np.zeros((8, 2), np.float32)
    pos[0] = [5, 5]
    pos[1] = [10, 7]
    valid = np.zeros(8, bool)
    valid[:2] = True
    mid = np.full(8, -1, np.int32)
    mid[1] = 0
    em = em.replace(pos=jnp.asarray(pos), valid=jnp.asarray(valid),
                    match_id=jnp.asarray(mid))
    frame = np.full((16, 20), 100.0, np.float32)
    rgb = render_edge_image(frame, em, gain=1.0)
    assert tuple(rgb[5, 5]) == (200, 40, 40)
    assert tuple(rgb[7, 10]) == (255, 64, 64)
    p = str(tmp_path / "viz.png")
    write_png_rgb(p, rgb)
    gray = _read_png_gray(p)  # reads first channel
    assert gray.shape == (16, 20)
