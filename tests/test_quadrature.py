"""Gauss-Kronrod panel quadrature on analytic integrals."""
import numpy as np
import jax.numpy as jnp
import pytest

from emme_tpu.ops import quadrature as q


@pytest.mark.parametrize("order", [15, 31])
def test_rule_integrates_polynomials(order):
    # K15 is exact for degree <= 22, K31 for degree <= 46; check degree 10.
    x, wk, wg = q.gk_rule(order)
    for deg in range(0, 11):
        est = np.sum(wk * x**deg)
        exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
        assert abs(est - exact) < 1e-14


@pytest.mark.parametrize("order", [15, 31])
def test_gauss_embedded_weights(order):
    # The embedded Gauss rule must itself integrate constants exactly.
    x, wk, wg = q.gk_rule(order)
    assert abs(np.sum(wg) - 2.0) < 1e-13
    assert abs(np.sum(wk) - 2.0) < 1e-13


def test_fixed_panels_gaussian():
    bounds = q.linear_bounds(jnp.array(-8.0), jnp.array(8.0), 16)
    integral, err = q.integrate_fixed(lambda t: jnp.exp(-t**2), bounds)
    assert abs(float(integral) - np.sqrt(np.pi)) < 1e-13
    assert float(err) < 1e-10


def test_fixed_panels_oscillatory_complex():
    # int_0^50 exp(i 3 t - 0.2 t) dt, resolved by ~1-period panels
    bounds = q.linear_bounds(jnp.array(0.0), jnp.array(50.0), 64)
    integral, _ = q.integrate_fixed(
        lambda t: jnp.exp((1j * 3.0 - 0.2) * t), bounds)
    exact = (np.exp((3j - 0.2) * 50) - 1) / (3j - 0.2)
    assert abs(complex(integral) - exact) < 1e-12


def test_geometric_bounds_monotone():
    b = q.geometric_bounds(jnp.array([1e-3, 1e-2]), jnp.array([10.0, 20.0]), 24)
    bn = np.asarray(b)
    assert bn.shape == (2, 25)
    assert (np.diff(bn, axis=-1) > 0).all()
