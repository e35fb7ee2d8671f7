"""Block-banded complex LU factorization + triangular solves on TPU.

The shifted systems of the sparse eigensolve path (shift-invert Arnoldi and
the bordered-Newton polish) need M(sigma)^{-1} applied to vectors without
ever materializing the dense operator.  The kernel-integral operator is
banded (kappa decays in |eta - eta'|; the singularity handler adds a width-5
band, reference ``src/singularity_handler.cpp:3-24``), so the factorization
is a block-banded LU **without pivoting**:

    for k in block rows:               (lax.scan -- nb sequential steps)
        invD_k = inv(W[k, 0])          (complex bs x bs via real embedding)
        for i in 1..h:   L      = W[k+i, -i] @ invD_k        (stored in place)
        for i,j in 1..h: W[k+i, j-i] -= L_i @ W[k, j]

Banded LU has no fill outside the band, so the factors live in the same
(nb, 2h+1) block-row storage.  All block products are (re, im)-plane
matmuls on the MXU (the TPU backend implements complex dtypes only
elementwise); the per-step inverse is one real 2bs x 2bs inverse.

No pivoting is safe here in the usual shift-invert sense: the operator's
diagonal blocks are dominated by the reference's 1 + 1/tau identity term
(solver.h:439-459) and near-singularity at a converged shift expresses as a
*globally* small singular value that inverse iteration amplifies -- exactly
the effect shift-invert exploits.  Validated against the dense-path goldens
in tests/test_banded.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp


def _cmm(a, b):
    """Complex block matmul on (2, bs, bs) planes."""
    ar, ai = a[0], a[1]
    br, bi = b[0], b[1]
    return jnp.stack([ar @ br - ai @ bi, ar @ bi + ai @ br])


def _cinv(a):
    """Complex inverse of a (2, bs, bs) plane block via the real 2bs x 2bs
    embedding [[A, -B], [B, A]]; its inverse is [[C, -D], [D, C]] with
    C + iD = (A + iB)^{-1}."""
    bs = a.shape[-1]
    R = jnp.block([[a[0], -a[1]], [a[1], a[0]]])
    Ri = jnp.linalg.inv(R)
    return jnp.stack([Ri[:bs, :bs], Ri[bs:, :bs]])


@dataclass(frozen=True)
class BandedLU:
    """Factored block-banded operator.

    W: (nb + h, 2h+1, 2, bs, bs) block-row storage; W[i, h+d] holds the
       factor block at (row i, col i+d): U on d >= 0, unit-L on d < 0.
    invD: (nb, 2, bs, bs) inverses of the U diagonal blocks.
    """
    W: Any
    invD: Any
    n: int
    block: int
    h: int

    @property
    def nb(self) -> int:
        return self.n // self.block


jax.tree_util.register_dataclass(
    BandedLU, data_fields=["W", "invD"], meta_fields=["n", "block", "h"])


def rowmajor_from_bdia(op) -> tuple:
    """BDIAOperator (diag-major) -> (W, h): block-ROW-major banded storage
    (nb + h, 2h+1, 2, bs, bs), padded with h zero rows so the factorization
    window never leaves the array."""
    nb = op.n // op.block
    h = max(abs(d) for d in op.offsets)
    W = jnp.zeros((nb + h, 2 * h + 1, 2, op.block, op.block),
                  op.data.dtype)
    for k, d in enumerate(op.offsets):
        W = W.at[:nb, h + d].set(op.data[k])
    return W, h


def banded_lu(op) -> BandedLU:
    """Factor a BDIAOperator in place of its band.  Jittable; nb sequential
    scan steps, each O(h^2) block matmuls + one block inverse."""
    W, h = rowmajor_from_bdia(op)
    nb = op.n // op.block
    bs = op.block
    invD0 = jnp.zeros((nb, 2, bs, bs), op.data.dtype)

    def step(carry, k):
        W, invD = carry
        # rows k .. k+h of the band
        win = jax.lax.dynamic_slice_in_dim(W, k, h + 1, axis=0)
        iD = _cinv(win[0, h])
        new_rows = [win[0]]
        for i in range(1, h + 1):
            row = win[i]
            L = _cmm(row[h - i], iD)
            row = row.at[h - i].set(L)
            for j in range(1, h + 1):
                row = row.at[h + j - i].add(-_cmm(L, win[0, h + j]))
            new_rows.append(row)
        W = jax.lax.dynamic_update_slice_in_dim(
            W, jnp.stack(new_rows), k, axis=0)
        invD = jax.lax.dynamic_update_slice_in_dim(
            invD, iD[None], k, axis=0)
        return (W, invD), None

    (W, invD), _ = jax.lax.scan(step, (W, invD0), jnp.arange(nb))
    return BandedLU(W=W, invD=invD, n=op.n, block=bs, h=h)


def banded_solve(lu: BandedLU, xr, xi):
    """Solve M z = x given the banded factorization, on (re, im) planes.

    xr, xi: (n,) vectors or (n, r) multivectors.  Forward substitution with
    the unit-L band, then backward with U using the stored diagonal-block
    inverses; both are lax.scans carrying an h-block sliding window.
    """
    nb, bs, h = lu.nb, lu.block, lu.h
    vec = xr.ndim == 1
    xr2 = xr[:, None] if vec else xr
    xi2 = xi[:, None] if vec else xi
    r = xr2.shape[1]
    b = jnp.stack([xr2.reshape(nb, bs, r), xi2.reshape(nb, bs, r)], axis=1)

    def cmv(blk, v):
        """(2, bs, bs) complex block times (2, bs, r) complex segment."""
        return jnp.stack([blk[0] @ v[0] - blk[1] @ v[1],
                          blk[0] @ v[1] + blk[1] @ v[0]])

    W = lu.W

    # forward: y[k] = b[k] - sum_{i=1..h} L[k, -i] y[k-i]
    def fwd(win, k):
        # win: (h, 2, bs, r) = y[k-h .. k-1] (zeros for k-i < 0)
        row = jax.lax.dynamic_index_in_dim(W, k, axis=0, keepdims=False)
        y = b[k]
        for i in range(1, h + 1):
            y = y - cmv(row[h - i], win[h - i])
        win = jnp.concatenate([win[1:], y[None]], axis=0)
        return win, y

    win0 = jnp.zeros((h, 2, bs, r), b.dtype)
    _, y = jax.lax.scan(fwd, win0, jnp.arange(nb))

    # backward: z[k] = invD[k] (y[k] - sum_{j=1..h} U[k, +j] z[k+j])
    def bwd(win, k):
        # win: (h, 2, bs, r) = z[k+1 .. k+h] (zeros past the edge)
        row = jax.lax.dynamic_index_in_dim(W, k, axis=0, keepdims=False)
        iD = jax.lax.dynamic_index_in_dim(lu.invD, k, axis=0, keepdims=False)
        t = y[k]
        for j in range(1, h + 1):
            t = t - cmv(row[h + j], win[j - 1])
        z = cmv(iD, t)
        win = jnp.concatenate([z[None], win[:-1]], axis=0)
        return win, z

    _, z = jax.lax.scan(bwd, win0, jnp.arange(nb - 1, -1, -1))
    z = z[::-1]
    zr = z[:, 0].reshape(lu.n, r)
    zi = z[:, 1].reshape(lu.n, r)
    if vec:
        zr, zi = zr[:, 0], zi[:, 0]
    return zr, zi


def _ct(blk):
    """Transpose (NOT conjugated) of a (2, bs, bs) complex plane block."""
    return jnp.swapaxes(blk, -1, -2)


def banded_selected_inverse(lu: BandedLU):
    """Upper-band blocks of Z = M^{-1} for complex-SYMMETRIC banded M, by
    block Takahashi recurrences on the banded LU (selected inversion).

    The Newton-trace update of the reference eigensolve needs
    tr(M^{-1} dM) (solver.h:113-160); dM is banded, so only the entries of
    M^{-1} INSIDE the band are required -- and those close on themselves:
    with M = L D U~ (U~ unit upper, from the stored non-unit U via
    U~_ik = D_i^{-1} U_ik),

        Z_ij = -sum_{k=i+1..i+h} U~_ik Z_kj          (j > i)
        Z_ii = D_i^{-1} - sum_{k=i+1..i+h} U~_ik Z_ki

    evaluated backward from the bottom-right corner; every Z on the right
    lies in the band below/right of (i, j), and lower entries mirror by the
    symmetry Z_kj = Z_jk^T.  Cost O(nb h^2) block matmuls -- same order as
    the factorization itself, so the trace never densifies anything.

    Returns Zu: (nb, h+1, 2, bs, bs) with Zu[i, d] = Z_{i, i+d}
    (zero-padded past the bottom edge).
    """
    nb, bs, h = lu.nb, lu.block, lu.h
    W, invD = lu.W, lu.invD

    def step(win, i):
        # win[t] = Zu row (i + 1 + t), t = 0..h-1 (zeros beyond the edge)
        row_w = jax.lax.dynamic_index_in_dim(W, i, axis=0, keepdims=False)
        iD = jax.lax.dynamic_index_in_dim(invD, i, axis=0, keepdims=False)
        ut = [_cmm(iD, row_w[h + dk]) for dk in range(1, h + 1)]

        z_row = [None] * (h + 1)
        for dj in range(h, 0, -1):          # Z_{i, i+dj}
            acc = jnp.zeros_like(iD)
            for dk in range(1, h + 1):
                if dj >= dk:
                    zkj = win[dk - 1][dj - dk]
                else:
                    zkj = _ct(win[dj - 1][dk - dj])   # mirror: Z symmetric
                acc = acc + _cmm(ut[dk - 1], zkj)
            z_row[dj] = -acc
        acc = jnp.zeros_like(iD)
        for dk in range(1, h + 1):
            acc = acc + _cmm(ut[dk - 1], _ct(z_row[dk]))
        z_row[0] = iD - acc

        z_row = jnp.stack(z_row)            # (h+1, 2, bs, bs)
        new_win = jnp.concatenate([z_row[None], win[:-1]], axis=0) if h \
            else win
        return new_win, z_row

    win0 = jnp.zeros((h, h + 1, 2, bs, bs), W.dtype)
    _, z_rows = jax.lax.scan(step, win0, jnp.arange(nb - 1, -1, -1))
    return z_rows[::-1]


def banded_trace_product(Zu, op):
    """tr(M^{-1} A) for complex-symmetric banded M (Zu from
    ``banded_selected_inverse``) and complex-symmetric BDIAOperator A:
    since both are symmetric, tr(Z A) = sum_{(i,j) in band} Z_ij (*) A_ij
    elementwise -- diagonal block-column once, off-diagonal columns twice.

    Returns the complex scalar as (re, im).
    """
    h = max(op.offsets)
    tr_r = jnp.asarray(0.0, Zu.dtype)
    tr_i = jnp.asarray(0.0, Zu.dtype)
    for d in range(h + 1):
        A = op.data[op.offsets.index(d)]     # (nb, 2, bs, bs)
        Z = Zu[:, d]
        w = 1.0 if d == 0 else 2.0
        tr_r = tr_r + w * jnp.sum(Z[:, 0] * A[:, 0] - Z[:, 1] * A[:, 1])
        tr_i = tr_i + w * jnp.sum(Z[:, 0] * A[:, 1] + Z[:, 1] * A[:, 0])
    return tr_r, tr_i
