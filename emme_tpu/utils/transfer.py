"""Device->host transfer helpers.

The TPU backend cannot transfer complex arrays (complex dtypes exist only for
elementwise compute), so complex results are fetched as (re, im) real planes
and recombined on the host."""
import numpy as np
import jax.numpy as jnp


def fetch(x):
    """numpy copy of a jax array; complex arrays go through real planes."""
    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.complexfloating):
        return np.asarray(jnp.real(x)) + 1j * np.asarray(jnp.imag(x))
    return np.asarray(x)


def fetch_scalar(x):
    v = fetch(x)
    return complex(v) if np.iscomplexobj(v) else float(v)
