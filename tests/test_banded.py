"""Block-banded LU correctness: factor/solve vs dense reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from emme_tpu.ops import banded, sparse


def _random_banded(n, block, h, seed=0, diag_boost=2.0):
    """Random complex banded matrix with a boosted diagonal (the operator's
    1 + 1/tau identity term) stored dense + as BDIA."""
    rng = np.random.default_rng(seed)
    nb = n // block
    M = (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))) / np.sqrt(n)
    keep = np.abs(np.subtract.outer(np.arange(nb), np.arange(nb))) <= h
    mask = np.kron(keep, np.ones((block, block), bool))
    M = np.where(mask, M, 0.0)
    M += diag_boost * np.eye(n)
    op = sparse.bdia_from_dense(M, block=block)
    assert max(abs(d) for d in op.offsets) == h
    return M, op


@pytest.mark.parametrize("n,block,h", [(64, 16, 1), (96, 16, 2), (128, 32, 3)])
def test_banded_solve_matches_dense(n, block, h):
    M, op = _random_banded(n, block, h)
    lu = jax.jit(banded.banded_lu)(op)
    rng = np.random.default_rng(1)
    x = rng.normal(size=n) + 1j * rng.normal(size=n)
    zr, zi = jax.jit(banded.banded_solve)(
        lu, jnp.asarray(x.real), jnp.asarray(x.imag))
    z = np.asarray(zr) + 1j * np.asarray(zi)
    expect = np.linalg.solve(M, x)
    assert np.linalg.norm(z - expect) / np.linalg.norm(expect) < 1e-10


def test_banded_solve_multivector():
    M, op = _random_banded(96, 16, 2, seed=3)
    lu = banded.banded_lu(op)
    rng = np.random.default_rng(4)
    X = rng.normal(size=(96, 3)) + 1j * rng.normal(size=(96, 3))
    zr, zi = banded.banded_solve(lu, jnp.asarray(X.real), jnp.asarray(X.imag))
    Z = np.asarray(zr) + 1j * np.asarray(zi)
    expect = np.linalg.solve(M, X)
    assert np.linalg.norm(Z - expect) / np.linalg.norm(expect) < 1e-10


def test_banded_lu_near_singular_shift():
    """Shift-invert usage: factor M - sigma I with sigma near an eigenvalue;
    the solve must still amplify the near-null direction accurately."""
    M, op0 = _random_banded(64, 16, 1, seed=5)
    evals, evecs = np.linalg.eig(M)
    k = np.argmin(np.abs(evals - 2.0))
    sigma = evals[k] + 1e-4
    Ms = M - sigma * np.eye(64)
    op = sparse.bdia_from_dense(Ms, block=16)
    lu = banded.banded_lu(op)
    x = np.ones(64) + 0.1j
    zr, zi = banded.banded_solve(lu, jnp.asarray(x.real), jnp.asarray(x.imag))
    z = np.asarray(zr) + 1j * np.asarray(zi)
    expect = np.linalg.solve(Ms, x)
    assert np.linalg.norm(z - expect) / np.linalg.norm(expect) < 1e-8
    # the solve output should align with the near-null eigenvector
    v = evecs[:, k]
    cos = np.abs(v.conj() @ z) / np.linalg.norm(z)
    assert cos > 0.99


def test_selected_inverse_trace(tokamak_cfg):
    """Block-Takahashi selected inversion: band entries of M^{-1} and the
    Newton-trace tr(M^{-1} dM) match the dense computation exactly."""
    import json
    from emme_tpu import from_config
    from emme_tpu.grid import Grid
    from emme_tpu.ops.singularity import singularity_coeff_band
    from emme_tpu.solvers import sparse_eigen

    cfg = dict(tokamak_cfg, npoints=32)
    p = from_config(cfg)
    grid = Grid.create(p.length, p.npoints)
    bs, h = 8, 3
    cb = singularity_coeff_band(32, (h + 1) * bs - 1)
    om = jnp.complex128(-0.8 + 0.25j)
    A = sparse_eigen.assemble_bdia(p, grid, cb, om, h, bs)
    B = sparse_eigen.assemble_bdia(p, grid, cb, om * 1.01, h, bs)
    dM = sparse_eigen.bdia_secant(B, A, om * 0.01)

    lu = banded.banded_lu(A)
    Zu = banded.banded_selected_inverse(lu)
    tr_r, tr_i = banded.banded_trace_product(Zu, dM)
    got = complex(float(tr_r), float(tr_i))

    def todense(op):
        nb = op.n // op.block
        b = op.block
        M = np.zeros((op.n, op.n), complex)
        d_ = np.asarray(op.data)
        for k, d in enumerate(op.offsets):
            for r in range(nb):
                c = r + d
                if 0 <= c < nb:
                    M[r*b:(r+1)*b, c*b:(c+1)*b] = d_[k, r, 0] + 1j*d_[k, r, 1]
        return M

    Md, dMd = todense(A), todense(dM)
    want = np.trace(np.linalg.solve(Md, dMd))
    assert abs(got - want) / abs(want) < 1e-12

    Z = np.linalg.inv(Md)
    Zu_np = np.asarray(Zu)
    nb = 32 // bs
    for i in range(nb):
        for d in range(h + 1):
            if i + d < nb:
                gotb = Zu_np[i, d, 0] + 1j * Zu_np[i, d, 1]
                wantb = Z[i*bs:(i+1)*bs, (i+d)*bs:(i+d+1)*bs]
                np.testing.assert_allclose(gotb, wantb, atol=1e-12)
