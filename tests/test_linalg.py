"""Complex linear algebra via real 2n embedding (the TPU path) vs direct
complex ops."""
import numpy as np
import jax.numpy as jnp
import pytest

from emme_tpu.ops import linalg


@pytest.fixture
def near_singular():
    rng = np.random.default_rng(0)
    n = 64
    A = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    A = A + A.T  # complex symmetric like the physics operator
    u, s, vh = np.linalg.svd(A)
    s2 = s.copy()
    s2[-1] = 1e-10
    M = (u * s2) @ vh
    return M, np.conj(vh[-1])


def test_complex_solve_real_embedding_matches():
    rng = np.random.default_rng(1)
    n = 32
    M = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    C = rng.normal(size=(n, 3)) + 1j * rng.normal(size=(n, 3))
    X1 = np.asarray(linalg.complex_solve(jnp.asarray(M), jnp.asarray(C)))
    X2 = np.asarray(linalg.complex_solve(jnp.asarray(M), jnp.asarray(C),
                                         force_real_embedding=True))
    assert np.abs(X1 - X2).max() < 1e-10
    assert np.abs(M @ X1 - C).max() < 1e-10


def test_complex_solve_trace_matches():
    rng = np.random.default_rng(2)
    n = 32
    M = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    D = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    t1 = complex(linalg.complex_solve_trace(jnp.asarray(M), jnp.asarray(D)))
    t2 = complex(linalg.complex_solve_trace(jnp.asarray(M), jnp.asarray(D),
                                            force_real_embedding=True))
    t_np = np.trace(np.linalg.solve(M, D))
    assert abs(t1 - t_np) < 1e-9 * abs(t_np)
    assert abs(t2 - t_np) < 1e-9 * abs(t_np)


@pytest.mark.parametrize("method", ["svd", "inverse"])
def test_null_space_real_embedding(near_singular, method):
    M, v_true = near_singular
    v = np.asarray(linalg.null_space_vector(
        jnp.asarray(M), force_real_embedding=True, method=method))
    assert abs(np.vdot(v_true, v)) > 1 - 1e-8


def test_null_space_complex(near_singular):
    M, v_true = near_singular
    v = np.asarray(linalg.null_space_vector(jnp.asarray(M)))
    assert abs(np.vdot(v_true, v)) > 1 - 1e-8
