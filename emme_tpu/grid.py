"""Uniform 1-D field-line grid (reference include/Grid.h:6-20):
npoints nodes on [-length, length], dx = 2*length/(npoints-1)."""
from dataclasses import dataclass
from typing import Any
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Grid:
    length: Any
    npoints: int
    dx: Any
    eta: Any    # (npoints,) nodes

    @classmethod
    def create(cls, length, npoints: int, dtype=jnp.float64):
        length = jnp.asarray(length, dtype=dtype)
        dx = 2.0 * length / (npoints - 1)
        eta = -length + dx * jnp.arange(npoints, dtype=dtype)
        return cls(length=length, npoints=npoints, dx=dx, eta=eta)


jax.tree_util.register_dataclass(
    Grid, data_fields=["length", "dx", "eta"], meta_fields=["npoints"])
