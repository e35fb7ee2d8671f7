"""Bessel substrate vs scipy (AMOS) ground truth."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import iv, jv

from emme_tpu.ops.bessel import (
    bessel_i01_scaled, bessel_i01_scaled_miller, bessel_j0, bessel_j1)


def _sample_z(n=2000, max_mag=150.0, seed=0):
    rng = np.random.default_rng(seed)
    mag = 10 ** rng.uniform(-3, np.log10(max_mag), n)
    ang = rng.uniform(-np.pi, np.pi, n)
    return mag * np.exp(1j * ang)


def _relerr(a, b):
    return np.abs(a - b) / (np.abs(b) + 1e-300)


def test_fast_i01_scaled_accuracy():
    z = _sample_z()
    i0s, i1s, zs = (np.asarray(v) for v in bessel_i01_scaled(jnp.array(z)))
    assert _relerr(i0s, iv(0, z) * np.exp(zs)).max() < 1e-9
    assert _relerr(i1s, iv(1, z) * np.exp(zs)).max() < 1e-9


def test_miller_matches_reference_algorithm():
    # The mask-vectorized Miller recurrence must agree with truth within the
    # static-bound-supported range (reference functions.h:381-408 semantics).
    z = _sample_z(n=1000, max_mag=80.0, seed=1)
    i0s, i1s, zs = (np.asarray(v) for v in bessel_i01_scaled_miller(jnp.array(z)))
    assert _relerr(i0s, iv(0, z) * np.exp(zs)).max() < 1e-7
    assert _relerr(i1s, iv(1, z) * np.exp(zs)).max() < 1e-7


def test_fast_vs_miller_consistency():
    z = _sample_z(n=500, max_mag=60.0, seed=2)
    f0, f1, _ = (np.asarray(v) for v in bessel_i01_scaled(jnp.array(z)))
    m0, m1, _ = (np.asarray(v) for v in bessel_i01_scaled_miller(jnp.array(z)))
    assert _relerr(f0, m0).max() < 1e-6
    assert _relerr(f1, m1).max() < 1e-6


def test_i01_at_zero():
    i0s, i1s, _ = bessel_i01_scaled(jnp.array([0.0 + 0.0j]))
    assert np.allclose(np.asarray(i0s), 1.0)
    assert np.allclose(np.asarray(i1s), 0.0)


@pytest.mark.parametrize("fn,order", [(bessel_j0, 0), (bessel_j1, 1)])
def test_j01_real(fn, order):
    x = np.linspace(-40, 40, 4001)
    err = np.abs(np.asarray(fn(jnp.array(x))) - jv(order, x))
    assert err.max() < 1e-9
