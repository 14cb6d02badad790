import numpy as np
import jax.numpy as jnp

from rebvio_tpu.ops import scale_space as ss
from tests import oracle


def test_box_widths_euroc():
    """Widths for the reference's sigma0/sigma1 (scale_space.cpp:186)."""
    w0, s0_true = ss.box_widths(3.56359, 3)
    assert w0 == [7, 7, 7]
    assert np.isclose(s0_true, np.sqrt(12.0), atol=1e-6)
    w1, s1_true = ss.box_widths(s0_true * 1.2599, 3)
    assert w1 == [9, 9, 9]


def test_box_average_matches_oracle():
    rng = np.random.RandomState(0)
    img = rng.rand(20, 27).astype(np.float32) * 100
    for d in (3, 5, 7):
        got = np.asarray(ss.smooth(jnp.asarray(img), (d,)))
        want = oracle.box_average(img.astype(np.float64), d)
        assert np.allclose(got, want, rtol=1e-4, atol=1e-3), f"d={d}"


def test_smooth_cascade():
    rng = np.random.RandomState(1)
    img = rng.rand(16, 19).astype(np.float32) * 255
    got = np.asarray(ss.smooth(jnp.asarray(img), (3, 3, 5)))
    want = oracle.smooth(img.astype(np.float64), [3, 3, 5])
    assert np.allclose(got, want, rtol=1e-4, atol=1e-3)


def test_gradient_magnitude():
    rng = np.random.RandomState(2)
    img = rng.rand(24, 33).astype(np.float32) * 255
    p = ss.ScaleSpaceParams(24, 33)
    s0, dog, mag = ss.build_scale_space(jnp.asarray(img), p.matrices())
    s0_np = np.asarray(s0, np.float64)
    want = oracle.grad_mag(s0_np)
    assert np.allclose(np.asarray(mag), want, rtol=1e-3, atol=1e-2)
    # DoG = scale1 - scale0
    s1 = oracle.smooth(img.astype(np.float64), list(p.widths1))
    assert np.allclose(np.asarray(dog), s1 - oracle.smooth(img.astype(np.float64), list(p.widths0)), rtol=1e-3, atol=1e-2)
