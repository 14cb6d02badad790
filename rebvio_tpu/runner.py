"""Host-side sequence runner: feeds frames + IMU windows into the jitted step.

Replaces the reference's thread/queue plumbing and rosbag player
(rebvio.cpp:56-90, ros_rebvio.cpp:89-126) with a simple host loop:
per frame, the IMU samples with ts <= frame ts are packed into the fixed
buffer (exactly the drain rule of rebvio.cpp:77-84) and the pure step runs
on device.  Undistortion happens on device via the precomputed remap.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from rebvio_tpu import types as T
from rebvio_tpu.camera import Undistorter
from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.ops.imu import pack_imu_window
from rebvio_tpu.pipeline import frontend_matrices, step


@dataclasses.dataclass
class RunResult:
    ts_us: np.ndarray        # [N]
    orientation: np.ndarray  # [N,3]
    position: np.ndarray     # [N,3]
    num_matches: np.ndarray  # [N]
    run_ok: np.ndarray       # [N] bool


class VioRunner:
    def __init__(self, config: PipelineConfig, undistort: bool = True):
        self.config = config
        self.undistorter = Undistorter(config.camera, config.image_gain) if undistort else None
        self.mats = frontend_matrices(config)
        self.state = T.init_vio_state(config)
        self._last_ts: Optional[int] = None
        self._imu_cursor = 0

    def reset(self):
        self.state = T.init_vio_state(self.config)
        self._last_ts = None
        self._imu_cursor = 0

    def process_frame(self, image: np.ndarray, ts_us: int, imu_ts, imu_gyro, imu_acc):
        """Process one frame given the *entire* IMU stream arrays; the runner
        keeps a cursor and consumes samples with ts <= frame ts."""
        c = self._imu_cursor
        j = c
        while j < len(imu_ts) and imu_ts[j] <= ts_us:
            j += 1
        window = pack_imu_window(
            imu_gyro[c:j], imu_acc[c:j], imu_ts[c:j], self.config.imu.sample_max
        )
        self._imu_cursor = j
        frame_dt = 0.0 if self._last_ts is None else (ts_us - self._last_ts) / 1e6
        self._last_ts = ts_us

        img = jnp.asarray(image)
        if self.undistorter is not None:
            img = self.undistorter(img)
        else:
            img = img.astype(jnp.float32) * self.config.image_gain
        self.state, odo = step(
            self.state, img, window, jnp.float32(frame_dt), self.config, self.mats
        )
        return odo

    def run(self, seq) -> RunResult:
        """Run a synthetic/EuRoC Sequence object end to end."""
        ts, ori, pos, nm, ok = [], [], [], [], []
        for i in range(len(seq.images)):
            odo = self.process_frame(
                seq.images[i], int(seq.ts_us[i]), seq.imu_ts_us, seq.imu_gyro, seq.imu_acc
            )
            ts.append(int(seq.ts_us[i]))
            ori.append(np.asarray(odo.orientation))
            pos.append(np.asarray(odo.position))
            nm.append(int(odo.num_matches))
            ok.append(bool(odo.run_ok))
        return RunResult(
            ts_us=np.asarray(ts),
            orientation=np.stack(ori),
            position=np.stack(pos),
            num_matches=np.asarray(nm),
            run_ok=np.asarray(ok),
        )
