import numpy as np
import jax.numpy as jnp

from rebvio_tpu.geometry import linalg, so3
from rebvio_tpu.ops import sab


def _problem(a_true=np.arctan(5.0), g_true=(0.3, -9.7, 0.5), b_true=(0.001, -0.002, 0.0005)):
    g = np.asarray(g_true, np.float32)
    b = np.asarray(b_true, np.float32)
    a_s = np.asarray([0.4, -0.2, 0.1], np.float32)  # gravity-corrected accel minus g offset
    # consistent visual acceleration: (a_s + g) cos a - a_v sin a = 0
    a_v = (a_s + g) / np.tan(a_true)
    X_true = np.concatenate([[a_true], g, b]).astype(np.float32)
    Pp = np.eye(7, dtype=np.float32) * 1e-4
    prob = sab.SabProblem(
        a_v=jnp.asarray(a_v), a_s=jnp.asarray(a_s),
        G=jnp.float32(np.linalg.norm(g)),
        x_p=jnp.asarray(X_true), Pp=jnp.asarray(Pp),
        W_pp=jnp.asarray(np.linalg.inv(Pp)),
        Rv=jnp.eye(3, dtype=jnp.float32) * 1e-4,
        Rs=jnp.eye(3, dtype=jnp.float32) * 1e-5,
        Rg=jnp.float32(1e2),
    )
    return prob, X_true


def test_sab_residual_zero_at_truth():
    prob, X_true = _problem(b_true=(0, 0, 0))
    JtJ, JtF = sab.sab_problem(prob, jnp.asarray(X_true))
    # the GN step at the consistent state is negligible (JtF itself is fp
    # noise amplified by the information weights, so test the solved step)
    h = np.asarray(linalg.sym_solve(JtJ, -JtF))
    assert np.max(np.abs(h)) < 1e-4, h


def test_sab_gn_converges_from_perturbed_start():
    prob, X_true = _problem()
    X0 = X_true + np.asarray([0.2, 0.5, -0.4, 0.3, 0.005, -0.004, 0.003], np.float32)
    X = np.asarray(sab.sab_gauss_newton(prob, jnp.asarray(X0), iters=20))
    assert abs(X[0] - X_true[0]) < 5e-3, (X[0], X_true[0])
    assert np.allclose(X[1:4], X_true[1:4], atol=0.05), (X[1:4], X_true[1:4])


def test_sab_bias_saturation():
    prob, X_true = _problem()
    X0 = X_true.copy()
    X0[4:] = 0.5  # way past the saturation limit
    X = np.asarray(sab.sab_gauss_newton(prob, jnp.asarray(X0), iters=1))
    assert np.all(np.abs(X[4:]) <= 0.02 + 1e-6)


def test_estimate_bias_scale_recovery():
    """Full predict+GN update: K = tan(alpha) should track the ratio between
    accelerometer-derived and visual accelerations."""
    scale = 4.0
    g = np.asarray([0.0, -9.81, 0.0], np.float32)
    a_s = np.asarray([1.0, 0.5, -0.3], np.float32)
    a_v = (a_s + g) / scale
    X = jnp.asarray(np.concatenate([[np.pi / 4], g, [0, 0, 0]]), jnp.float32)
    P = jnp.eye(7, dtype=jnp.float32) * 1e-2
    eye = jnp.eye(3, dtype=jnp.float32)
    out = sab.estimate_bias(
        a_s=jnp.asarray(a_s), a_v=jnp.asarray(a_v), kP=jnp.float32(1.0),
        Rot=jnp.eye(3, dtype=jnp.float32), X=X, P=P,
        Qg=eye * 1e-6, Qrot=eye * 1e-8, Qbias=eye * 1e-10,
        QKp=jnp.float32(1e-4), Rg=jnp.float32(1e2), Rs=eye * 1e-5,
        Rv=eye * 1e-4, Wvw=jnp.eye(6, dtype=jnp.float32) * 1e4,
        Xvw=jnp.zeros(6, jnp.float32), g_gravit=jnp.float32(9.81),
    )
    assert abs(float(out.K) - scale) < 0.3, float(out.K)
    assert np.linalg.norm(np.asarray(out.g_est) - g) < 0.5


def test_pallas_estimate_bias_matches_xla():
    """The one-kernel Mosaic SAB filter (pallas_kernels.estimate_bias_pallas,
    exercised through sab.estimate_bias with REBVIO_PALLAS_SAB=1 — interpret
    mode on CPU) reproduces the XLA path to float tolerance across realistic
    and perturbed inputs.  Expected deviation source: the pivot-free
    Gauss-Jordan inverse in place of the unrolled Cholesky — same inverse,
    different rounding."""
    import os

    rng = np.random.RandomState(0)
    eye = jnp.eye(3, dtype=jnp.float32)
    try:
        for trial in range(4):
            scale = [4.0, 1.5, 7.0, 3.0][trial]
            g = (np.asarray([0.3, -9.7, 0.5], np.float32)
                 + rng.randn(3).astype(np.float32) * 0.1)
            a_s = rng.randn(3).astype(np.float32)
            a_v = (a_s + g) / scale
            X = jnp.asarray(np.concatenate([[np.arctan(scale * 0.8)], g,
                                            rng.randn(3) * 1e-3]), jnp.float32)
            Pm = rng.randn(7, 7).astype(np.float32) * 3e-2
            P = jnp.asarray(Pm @ Pm.T + np.eye(7, dtype=np.float32) * 1e-2)
            Wm = rng.randn(6, 6).astype(np.float32)
            Wvw = jnp.asarray(Wm @ Wm.T + np.eye(6, dtype=np.float32) * 1e3)
            kw = dict(
                a_s=jnp.asarray(a_s), a_v=jnp.asarray(a_v),
                kP=jnp.float32(1.0),
                Rot=so3.exp(jnp.asarray(rng.randn(3) * 0.05, jnp.float32)),
                X=X, P=P, Qg=eye * 1e-6, Qrot=eye * 1e-8, Qbias=eye * 1e-10,
                QKp=jnp.float32(1e-4), Rg=jnp.float32(1e2), Rs=eye * 1e-5,
                Rv=eye * 1e-4, Wvw=Wvw,
                Xvw=jnp.asarray(rng.randn(6) * 1e-2, jnp.float32),
                g_gravit=jnp.float32(9.81),
            )
            os.environ["REBVIO_PALLAS_SAB"] = "0"
            ref = sab.estimate_bias(**kw, iters=8)
            os.environ["REBVIO_PALLAS_SAB"] = "1"
            out = sab.estimate_bias(**kw, iters=8)
            np.testing.assert_allclose(np.asarray(out.K), np.asarray(ref.K),
                                       rtol=2e-3, atol=2e-3)
            np.testing.assert_allclose(np.asarray(out.X), np.asarray(ref.X),
                                       rtol=2e-3, atol=2e-3)
            np.testing.assert_allclose(np.asarray(out.Xvw),
                                       np.asarray(ref.Xvw),
                                       rtol=5e-3, atol=5e-3)
            np.testing.assert_allclose(np.asarray(out.P), np.asarray(ref.P),
                                       rtol=5e-2, atol=1e-5)
    finally:
        os.environ.pop("REBVIO_PALLAS_SAB", None)
