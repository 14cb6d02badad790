import os
import struct
import zlib

import numpy as np
import pytest

from rebvio_tpu.data import native_loader


def _write_png_gray(path, img: np.ndarray, filt: int = 0):
    """Minimal 8-bit grayscale PNG writer (filter type per row)."""
    H, W = img.shape
    raw = b""
    prev = np.zeros(W, np.uint8)
    for r in range(H):
        row = img[r]
        if filt == 0:
            enc = row
        elif filt == 2:  # up
            enc = (row.astype(np.int16) - prev.astype(np.int16)) % 256
        else:
            raise ValueError(filt)
        raw += bytes([filt]) + enc.astype(np.uint8).tobytes()
        prev = row

    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", W, H, 8, 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))


@pytest.mark.skipif(not native_loader.available(), reason="native lib not built")
def test_native_loader_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    H, W = 24, 32
    paths = []
    imgs = []
    for i in range(6):
        img = rng.randint(0, 255, (H, W)).astype(np.uint8)
        p = str(tmp_path / f"f{i}.png")
        _write_png_gray(p, img, filt=(0 if i % 2 == 0 else 2))
        paths.append(p)
        imgs.append(img)

    ld = native_loader.NativeImageLoader(paths, H, W, n_threads=2, ring=3, gain=3.0)
    for i in range(6):
        f = ld.next()
        assert f is not None
        np.testing.assert_allclose(f, imgs[i].astype(np.float32) * 3.0)
    assert ld.next() is None
    ld.close()


@pytest.mark.skipif(not native_loader.available(), reason="native lib not built")
def test_native_loader_matches_python_decoder(tmp_path):
    from rebvio_tpu.data.euroc import _read_png_gray

    rng = np.random.RandomState(1)
    H, W = 16, 20
    img = (rng.rand(H, W) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    _write_png_gray(p, img, filt=2)
    got_py = _read_png_gray(p)
    np.testing.assert_array_equal(got_py, img)
    ld = native_loader.NativeImageLoader([p], H, W, gain=1.0)
    np.testing.assert_allclose(ld.next(), img.astype(np.float32))
