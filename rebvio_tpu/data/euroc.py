"""EuRoC MAV ASL-format dataset loader.

Replaces the reference's rosbag player (ros_rebvio.cpp:89-126) with a direct
reader of the ASL directory layout:

    <root>/mav0/cam0/data.csv + data/<ts>.png
    <root>/mav0/imu0/data.csv
    <root>/mav0/state_groundtruth_estimate0/data.csv   (optional)

Camera calibration should be supplied via CameraConfig (the reference
hard-codes EuRoC cam0, camera.hpp:25-45, which is this loader's default).
PNG decoding uses torch-free pure-python fallbacks: imageio/PIL if present,
else a minimal PNG grayscale decoder.
"""

from __future__ import annotations

import csv
import dataclasses
import os
import struct
import zlib
from typing import List, Optional

import numpy as np


def _read_png_gray(path: str) -> np.ndarray:
    """Minimal 8-bit grayscale PNG reader (EuRoC images are 8-bit gray)."""
    try:
        from PIL import Image  # type: ignore

        return np.asarray(Image.open(path).convert("L"), dtype=np.uint8)
    except Exception:
        pass
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    idat = b""
    width = height = bit_depth = color_type = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(">IIBB", chunk[:10])
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length
    assert bit_depth == 8, f"unsupported bit depth {bit_depth}"
    raw = zlib.decompress(idat)
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    stride = width * ch
    img = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    off = 0
    for r in range(height):
        ft = raw[off]
        row = np.frombuffer(raw[off + 1 : off + 1 + stride], np.uint8).copy()
        off += 1 + stride
        if ft == 1:  # sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif ft == 2:  # up
            row = (row + prev) & 0xFF
        elif ft == 3:  # avg
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((int(left) + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # paeth
            for i in range(stride):
                a = int(row[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        img[r] = row
        prev = row
    img = img.reshape(height, width, ch)
    if ch > 1:
        img = img[..., 0]
    else:
        img = img[..., 0] if img.ndim == 3 else img
    return img


@dataclasses.dataclass
class EurocSequence:
    image_paths: List[str]
    ts_us: np.ndarray
    imu_ts_us: np.ndarray
    imu_gyro: np.ndarray
    imu_acc: np.ndarray
    gt_ts_us: Optional[np.ndarray] = None
    gt_pos: Optional[np.ndarray] = None
    # "native": threaded C++ prefetch ring (native/loader.cpp); "python":
    # in-process decoder; "auto": native when the library is built.
    loader: str = "auto"
    rows: int = 480
    cols: int = 752

    def __len__(self):
        return len(self.image_paths)

    @property
    def images(self):
        """Image accessor compatible with VioRunner.run (indexable).

        The product path (the reference's acquisition thread, rebvio.cpp:56-90)
        streams through the native prefetcher: decode threads run ahead of the
        device loop so input never serializes with compute.  Access must then
        be sequential from 0 — exactly VioRunner's pattern.  The pure-python
        decoder remains the random-access fallback.  Memoized so repeated
        property reads share one prefetch ring.
        """
        cached = getattr(self, "_images_cache", None)
        if cached is not None:
            return cached
        use_native = self.loader == "native"
        if self.loader == "auto":
            from rebvio_tpu.data import native_loader

            use_native = native_loader.available()
        obj = (_NativeSeqImages(self.image_paths, self.rows, self.cols)
               if use_native else _LazyImages(self.image_paths))
        self._images_cache = obj
        return obj


class _LazyImages:
    def __init__(self, paths):
        self.paths = paths

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        # uint8 stays uint8: the device casts+gains after upload
        # (camera.Undistorter), so the host->device transfer is 4x smaller
        return _read_png_gray(self.paths[i])


class _NativeSeqImages:
    """Sequential view over the native prefetching loader.

    Supports strictly in-order indexing (what VioRunner does); a restart from
    index 0 reopens the ring.  The ring decodes `n_threads` PNGs ahead of the
    consumer, replacing the reference's data-acquisition thread + mutex queue
    (rebvio.cpp:56-90) at full speed.
    """

    def __init__(self, paths, rows, cols, n_threads: int = 3, ring: int = 8):
        from rebvio_tpu.data import native_loader

        self.paths = paths
        self._make = lambda: native_loader.NativeImageLoader(
            paths, rows, cols, n_threads=n_threads, ring=ring, gain=1.0)
        self._ldr = None
        self._next_i = 0

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        if i == 0 and self._next_i != 0:
            if self._ldr is not None:
                self._ldr.close()
            self._ldr, self._next_i = None, 0
        if i != self._next_i:
            # out-of-order access: fall back to the python decoder
            return _read_png_gray(self.paths[i])
        if self._ldr is None:
            self._ldr = self._make()
        self._next_i += 1
        f = self._ldr.next()
        if f is None:
            raise IndexError(i)
        # the ring decodes to float (gain=1.0, exact integers); ship uint8
        # over the device tunnel and let the device re-cast (4x less traffic)
        return f.astype(np.uint8)


def load(root: str, start_s: Optional[float] = None, end_s: Optional[float] = None,
         loader: str = "auto", rows: int = 480, cols: int = 752) -> EurocSequence:
    """Load an ASL-format sequence; timestamps converted ns -> us (the
    reference also operates in us, image.hpp:19-22).

    ``loader``: "native" (threaded C++ prefetch ring), "python", or "auto"
    (native when built — the product default; the python decoder would cap a
    ~200 fps pipeline at a few fps of input)."""
    mav = os.path.join(root, "mav0")
    cam_csv = os.path.join(mav, "cam0", "data.csv")
    imu_csv = os.path.join(mav, "imu0", "data.csv")

    img_ts, img_paths = [], []
    with open(cam_csv) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            img_ts.append(int(row[0]) // 1000)
            img_paths.append(os.path.join(mav, "cam0", "data", row[1].strip()))
    imu_ts, gyro, acc = [], [], []
    with open(imu_csv) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            imu_ts.append(int(row[0]) // 1000)
            gyro.append([float(x) for x in row[1:4]])
            acc.append([float(x) for x in row[4:7]])

    img_ts = np.asarray(img_ts, np.int64)
    imu_ts = np.asarray(imu_ts, np.int64)
    gyro = np.asarray(gyro, np.float32)
    acc = np.asarray(acc, np.float32)

    if start_s is not None or end_s is not None:
        t0 = img_ts[0]
        lo = t0 + int((start_s or 0) * 1e6)
        hi = t0 + int((end_s or 1e12) * 1e6)
        sel = (img_ts >= lo) & (img_ts <= hi)
        img_ts = img_ts[sel]
        img_paths = [p for p, s in zip(img_paths, sel) if s]
        seli = (imu_ts >= lo - 100_000) & (imu_ts <= hi)
        imu_ts, gyro, acc = imu_ts[seli], gyro[seli], acc[seli]

    gt_ts = gt_pos = None
    gt_csv = os.path.join(mav, "state_groundtruth_estimate0", "data.csv")
    if os.path.exists(gt_csv):
        # NB: must not be named `rows` — that would shadow the image-height
        # parameter consumed by EurocSequence below (round-2 bug).
        gt_rows = []
        with open(gt_csv) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                gt_rows.append([int(row[0]) // 1000] + [float(x) for x in row[1:4]])
        arr = np.asarray(gt_rows)
        gt_ts = arr[:, 0].astype(np.int64)
        gt_pos = arr[:, 1:4].astype(np.float32)

    return EurocSequence(
        image_paths=img_paths, ts_us=img_ts,
        imu_ts_us=imu_ts, imu_gyro=gyro, imu_acc=acc,
        gt_ts_us=gt_ts, gt_pos=gt_pos,
        loader=loader, rows=rows, cols=cols,
    )
