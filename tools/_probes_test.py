import dataclasses
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from rebvio_tpu.configs import PipelineConfig, CameraConfig, EdgeDetectorConfig, CoreConfig, EdgeMapConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.runner import VioRunner
from rebvio_tpu import eval as ev

def cfg_for(probes, use_imu):
    cam = CameraConfig(rows=240, cols=376, fx=229.3, fy=228.6, cx=183.6, cy=124.2,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    det = EdgeDetectorConfig(keylines_max=4096, keylines_ref=3000)
    core = CoreConfig(search_range=20, global_min_matches_threshold=200)
    em = EdgeMapConfig(tube_probes=probes)
    return PipelineConfig(camera=cam, detector=det, core=core, edge_map=em, use_imu=use_imu)

for probes in (8, 6, 4):
    cfg = cfg_for(probes, False)
    seq = synthetic.generate(cfg.camera, n_frames=40, seed=0)
    r = VioRunner(cfg, undistort=False)
    res = r.run(seq)
    span = np.linalg.norm(seq.gt_pos[-1] - seq.gt_pos[0])
    ate = ev.ate_rmse(res.position, seq.gt_pos, align=True, with_scale=True)
    print(f"probes={probes}: ok={res.run_ok.all()} matches_min={res.num_matches[2:].min()} "
          f"matches_mean={res.num_matches[2:].mean():.0f} ate={ate:.4f} ({100*ate/span:.1f}% span)")

for probes in (8, 6):
    cfg = cfg_for(probes, True)
    seq = synthetic.generate(cfg.camera, n_frames=100, seed=0)
    r = VioRunner(cfg, undistort=False)
    res = r.run(seq)
    print(f"VIO probes={probes}: ok={res.run_ok.all()} K={float(r.state.K):.3f} "
          f"matches_min={res.num_matches[2:].min()}")
