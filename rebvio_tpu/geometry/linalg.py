"""Small fixed-size linear algebra helpers mirroring the reference's TooN use.

The reference relies on a closed-form adjugate 3x3 inverse
(types/definitions.hpp:40-53), TooN::Cholesky inverses for 6x6/7x7
(core.cpp:198,277,384,403) and TooN::SVD backsubstitution (core.cpp:247,
sab_estimator.cpp:31).  These are the jnp equivalents, all float32 and
jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def invert3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of a 3x3 matrix (definitions.hpp:40-53)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    adj = jnp.stack(
        [
            jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    return adj / det[..., None, None]


def _chol_inverse_unrolled(m: jnp.ndarray) -> jnp.ndarray:
    """Fully unrolled Cholesky inverse for small static n (the pipeline's
    6x6/7x7 information matrices).  jnp.linalg.cholesky + triangular solve
    lower to LAPACK-style custom calls — dozens of tiny sequential kernels
    on TPU, the dominant cost of the SAB Gauss-Newton chain — while this
    form is ~n^3/3 scalar ops XLA fuses into a handful of kernels.
    sqrt of a negative diagonal (non-PD input) yields NaN, preserving the
    reference's unpivoted TooN::Cholesky failure mode."""
    n = m.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = m[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    # inv(L) by unrolled forward substitution, then inv(m) = Linv^T Linv
    Li = [[None] * n for _ in range(n)]
    for j in range(n):
        Li[j][j] = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = L[i][j] * Li[j][j]
            for k in range(j + 1, i):
                s = s + L[i][k] * Li[k][j]
            Li[i][j] = -s / L[i][i]
    zero = jnp.zeros_like(m[..., 0, 0])
    out_rows = []
    for i in range(n):
        row = []
        for j in range(n):
            s = zero
            for k in range(max(i, j), n):
                s = s + Li[k][i] * Li[k][j]
            row.append(s)
        out_rows.append(jnp.stack(row, axis=-1))
    return jnp.stack(out_rows, axis=-2)


def chol_inverse(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse via Cholesky factorization (TooN::Cholesky::get_inverse).

    Produces NaNs on non-positive-definite input, mirroring the reference's
    unpivoted factorization failure mode.  Small static sizes (n <= 8) use
    the unrolled form (_chol_inverse_unrolled); larger fall back to the
    LAPACK-style path.
    """
    if m.shape[-1] <= 8:
        return _chol_inverse_unrolled(m)
    L = jnp.linalg.cholesky(m)
    eye = jnp.eye(m.shape[-1], dtype=m.dtype)
    Linv = jnp.linalg.solve(L, eye)
    return Linv.T @ Linv


def svd_solve(A: jnp.ndarray, b: jnp.ndarray, rcond: float = 1e-9) -> jnp.ndarray:
    """Least-squares solve via SVD with singular-value cutoff, mirroring
    TooN::SVD::backsub's condition-number truncation."""
    U, s, Vt = jnp.linalg.svd(A, full_matrices=False)
    cutoff = rcond * jnp.max(s)
    s_inv = jnp.where(s > cutoff, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    return Vt.T @ (s_inv * (U.T @ b))


def gj_inverse(m: jnp.ndarray) -> jnp.ndarray:
    """Unrolled pivot-free Gauss-Jordan inverse for small PD matrices.

    Built from ops Mosaic can lower (concatenate, iota masks, broadcasts) so
    it runs inside Pallas kernels where jnp.linalg's LAPACK-style custom
    calls cannot (pallas_kernels.estimate_bias_pallas).  Pivot-free matches
    the reference's unpivoted TooN::Cholesky failure mode: non-PD input
    yields inf/NaN instead of raising.
    """
    n = m.shape[-1]
    a = jnp.concatenate([m, jnp.eye(n, dtype=m.dtype)], axis=-1)  # [n,2n]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 2 * n), 0)
    for i in range(n):
        piv_row = a[i:i + 1, :] / a[i:i + 1, i:i + 1]   # [1,2n]
        fac = a[:, i:i + 1]                              # [n,1]
        a = a - fac @ piv_row
        a = jnp.where(rows == i, piv_row, a)             # restore pivot row
    return a[:, n:]


def gj_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pallas-lowerable solve with sym_solve's semantics (finite-but-singular
    input -> zeros; non-finite input -> NaN propagates)."""
    x = (gj_inverse(A) @ b[:, None])[:, 0]
    inputs_finite = jnp.all(jnp.isfinite(A)) & jnp.all(jnp.isfinite(b))
    singular = inputs_finite & ~jnp.all(jnp.isfinite(x))
    return jnp.where(singular, jnp.zeros_like(x), x)


def sym_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Direct solve for symmetric (near-)PD normal matrices.

    TPU-friendly replacement for the reference's TooN::SVD backsubstitution
    on well-conditioned Gauss-Newton systems (core.cpp:247,
    sab_estimator.cpp:31): XLA's iterative SVD costs ~1 ms per 7x7 on TPU,
    while an LU solve is microseconds; for PD inputs the results coincide.

    NaN semantics match the reference exactly:
      * *finite but singular* input (e.g. the zero-matches case, JtJ = 0):
        TooN's SVD backsub zeroes the singular directions, so X = 0 — the
        LU solve's inf/NaN is mapped to zero;
      * *non-finite* input (NaN keyline data contaminating JtJ/JtF): TooN
        propagates NaN, the caller's isnan(V) gate latches the failure
        (core.cpp:251-257, rebvio.cpp:236-241) — NaN is propagated here
        too so the pipeline's fail_nan gate fires the same frame.

    Small static sizes take the unrolled Gauss-Jordan path (gj_solve, same
    semantics) instead of the LAPACK-style LU custom call.
    """
    if A.shape[-1] <= 8 and A.ndim == 2:
        return gj_solve(A, b)
    x = jnp.linalg.solve(A, b)
    inputs_finite = jnp.all(jnp.isfinite(A)) & jnp.all(jnp.isfinite(b))
    singular = inputs_finite & ~jnp.all(jnp.isfinite(x))
    return jnp.where(singular, jnp.zeros_like(x), x)
