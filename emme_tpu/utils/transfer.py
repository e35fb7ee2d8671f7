"""Device->host transfer helpers.

The TPU backend cannot transfer complex arrays (complex dtypes exist only for
elementwise compute), so complex results are fetched as (re, im) real planes
and recombined on the host."""
import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def _split(x):
    # must run under jit: EAGER complex ops (even real/imag) are
    # unimplemented on the TPU backend
    return jnp.real(x), jnp.imag(x)


def fetch(x):
    """numpy copy of a jax array; complex arrays go through real planes.
    Host (numpy) inputs pass through without touching the device -- round-
    tripping them via jnp.asarray would be an eager complex transfer, which
    the TPU backend cannot do."""
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        re, im = _split(x)
        return np.asarray(re) + 1j * np.asarray(im)
    return np.asarray(x)


def fetch_scalar(x):
    v = fetch(x)
    return complex(v) if np.iscomplexobj(v) else float(v)
