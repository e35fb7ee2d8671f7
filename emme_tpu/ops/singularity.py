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


def singularity_coeff_matrix(n: int, dtype=jnp.float64):
    i = np.arange(n)
    diff = np.abs(i[:, None] - i[None, :])
    mat = np.where(diff <= 5, _COEFF[np.minimum(diff, 5)], 1.0)
    mat[:, 0] -= 0.5
    mat[:, n - 1] -= 0.5
    return jnp.asarray(mat, dtype=dtype)
