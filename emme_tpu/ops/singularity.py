"""Quadrature-correction coefficient matrix for the |eta - eta'| kernel
singularity (reference src/singularity_handler.cpp:3-24): a band of 6
Lagrange-type coefficients by |i-j|, 1.0 elsewhere, and a -0.5 trapezoid
end-correction on the first/last columns."""
import numpy as np
import jax.numpy as jnp

_COEFF = np.array([
    0.0,
    2.951388888888883,
    -2.4305555555555305,
    4.166666666667441,
    -0.3472222222224549,
    1.159722222222284,
])

# half-width of the correction band (|i-j| <= 5 gets non-unit coefficients)
SINGULAR_BAND_HALF_WIDTH = 5


def singularity_coeff_matrix(n: int, dtype=jnp.float64):
    i = np.arange(n)
    diff = np.abs(i[:, None] - i[None, :])
    mat = np.where(diff <= 5, _COEFF[np.minimum(diff, 5)], 1.0)
    mat[:, 0] -= 0.5
    mat[:, n - 1] -= 0.5
    return jnp.asarray(mat, dtype=dtype)


def singularity_coeff_band(n: int, h_el: int, dtype=jnp.float64):
    """Banded storage of the same coefficients: (n, 2*h_el+1) with
    band[i, dj + h_el] = coeff[i, i + dj].  O(n * band) memory -- the dense
    (n, n) matrix never exists (used by the direct-to-sparse assembly)."""
    dj = np.arange(-h_el, h_el + 1)
    band = np.where(np.abs(dj) <= 5, _COEFF[np.minimum(np.abs(dj), 5)], 1.0)
    band = np.broadcast_to(band, (n, 2 * h_el + 1)).copy()
    i = np.arange(n)
    j = i[:, None] + dj[None, :]
    band[j == 0] -= 0.5
    band[j == n - 1] -= 0.5
    return jnp.asarray(band, dtype=dtype)
