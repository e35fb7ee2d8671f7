"""Complex dense linear algebra that runs on TPU.

This TPU generation implements real f32/f64-free LU/QR/SVD only for REAL
dtypes; complex LAPACK-style ops (the reference leans on zsysv/zgesdd/zgeqp3,
``solver.h:113-383``) are UNIMPLEMENTED on the TPU backend.  The standard
TPU-native answer is the real 2n x 2n embedding

    M = A + iB   ->   R = [[A, -B], [B, A]],   M v = c  <->  R [x; y] = [re c; im c]

which preserves norms and null spaces, so solve / nullspace run on the MXU in
real arithmetic.  On CPU (complex LAPACK available through XLA) the direct
complex ops are used.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _backend_supports_complex_linalg() -> bool:
    return jax.default_backend() in ("cpu", "gpu")


def real_embedding(M):
    """[[A, -B], [B, A]] for M = A + iB."""
    A = jnp.real(M)
    B = jnp.imag(M)
    return jnp.block([[A, -B], [B, A]])


def complex_solve(M, C, force_real_embedding: bool = False):
    """Solve M X = C for complex square M, complex RHS C (matrix or vector)."""
    if _backend_supports_complex_linalg() and not force_real_embedding:
        return jnp.linalg.solve(M, C)
    n = M.shape[-1]
    R = real_embedding(M)
    vec = C.ndim == 1
    Cm = C[:, None] if vec else C
    rhs = jnp.concatenate([jnp.real(Cm), jnp.imag(Cm)], axis=0)
    Z = jnp.linalg.solve(R, rhs)
    X = Z[:n] + 1j * Z[n:]
    return X[:, 0] if vec else X


def complex_solve_trace(M, dM, force_real_embedding: bool = False):
    """trace(M^{-1} dM) -- the Newton-trace-secant denominator
    (solver.h:129-139).  Computed on real planes (complex diagonal
    extraction is a memory op the TPU backend lacks)."""
    if _backend_supports_complex_linalg() and not force_real_embedding:
        return jnp.trace(jnp.linalg.solve(M, dM))
    n = M.shape[-1]
    R = real_embedding(M)
    rhs = jnp.concatenate([jnp.real(dM), jnp.imag(dM)], axis=0)
    Z = jnp.linalg.solve(R, rhs)
    return jnp.trace(Z[:n]) + 1j * jnp.trace(Z[n:])


def complex_bilinear(v, M):
    """v^T M v for complex v, M, computed on real planes (no complex
    reductions -- the TPU backend lacks them)."""
    vr, vi = jnp.real(v), jnp.imag(v)
    Mr, Mi = jnp.real(M), jnp.imag(M)
    wr = Mr @ vr - Mi @ vi
    wi = Mr @ vi + Mi @ vr
    re = jnp.sum(vr * wr - vi * wi)
    im = jnp.sum(vr * wi + vi * wr)
    return re + 1j * im


def null_space_vector(M, force_real_embedding: bool = False,
                      method: str | None = None):
    """Null-space (least-singular right-singular) vector of M, conjugated to
    match the reference's nullSpace() output convention (solver.h:58-112).

    Methods:
      * ``svd`` (CPU default): exact reference semantics.
      * ``inverse`` (TPU default): inverse iteration on the real embedding --
        two LU solves amplify the null direction by 1/sigma_min, orders of
        magnitude faster than TPU SVD (which lowers to a slow host-free
        Jacobi-style routine) and *more* accurate in f32.
    """
    complex_ok = _backend_supports_complex_linalg() and not force_real_embedding
    if method is None:
        method = "svd" if complex_ok else "inverse"

    if method == "svd" and complex_ok:
        _, _, vh = jnp.linalg.svd(M)
        return jnp.conj(vh[-1, :])

    n = M.shape[-1]
    R = real_embedding(M)
    if method == "svd":
        _, _, vh = jnp.linalg.svd(R)
        z = vh[-1, :]
    else:
        lu, piv = jax.scipy.linalg.lu_factor(R)
        z = jnp.ones((2 * n,), R.dtype)
        z = z.at[n:].set(0.3)  # break real/imag symmetry
        for _ in range(2):
            z = jax.scipy.linalg.lu_solve((lu, piv), z)
            z = z / jnp.sqrt(jnp.sum(z * z))
    zr, zi = z[:n], z[n:]
    nrm = jnp.sqrt(jnp.sum(zr * zr + zi * zi))
    # v = zr + i zi IS the null vector (R [zr; zi] ~ M v); the complex-SVD
    # path's conj(vh[-1]) equals the null vector too, so no conjugation here.
    return zr / nrm + 1j * (zi / nrm)
