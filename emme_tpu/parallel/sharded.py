"""Mesh-sharded assembly, eigensolve step, and PIC deposition.

Replaces the reference's thread-pool parallelism (one task per matrix entry,
``solver.h:433-513``; 512-marker blocks + 256 private deposition buffers,
``solver_pic.h:129-138, 249-352``) with SPMD over a device mesh:

  * assembly: the upper-triangle pair list shards across the ``rows`` axis;
    each device evaluates its pairs' kernel integrals, then the (small)
    entry vector is all-gathered over ICI and materialized into the
    operator.  This preserves the reference's 2x symmetry saving while
    scaling the quadrature work -- which is >99% of the cost -- linearly.
  * PIC: markers shard across ``rows``; CIC deposition runs per-shard and
    the deposited density is reduced with ``jax.lax.psum`` (the parallel
    equivalent of the reference's serial buffer reduction).
  * scans/shifts: an embarrassingly-parallel ``scan`` axis (vmap + shard).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..grid import Grid
from ..ops import kernels
from ..solvers import eigen as eigen_mod
from ..solvers import pic as pic_mod


def _padded_pairs(n: int, n_shards: int):
    iu, ju = np.triu_indices(n, k=1)
    npairs = len(iu)
    pad = (-npairs) % n_shards
    iu = np.concatenate([iu, np.zeros(pad, iu.dtype)])
    ju = np.concatenate([ju, np.ones(pad, ju.dtype)])
    return iu, ju, npairs


def sharded_assemble(p, grid: Grid, coeff, omega, mesh: Mesh, quad=None,
                    chunk: int = 2048):
    """Assemble M(omega) with pair-sharded quadrature.

    Output is replicated (each device holds the full matrix); the entry
    all-gather moves only O(npairs) complex values over ICI.
    """
    n = grid.npoints
    n_shards = mesh.shape["rows"]
    iu, ju, npairs = _padded_pairs(n, n_shards)
    eta_a = grid.eta[iu]
    eta_b = grid.eta[ju]
    ms = (0, 1, 2) if p.electromagnetic else (0,)

    def shard_fn(ea, eb):
        def compute(args):
            a, b = args
            (vals), _ = kernels.kappa_f_tau(p, a, b, omega, ms=ms, quad=quad)
            return vals
        local = eigen_mod._chunked(compute, (ea, eb), ea.shape[0],
                                   min(chunk, ea.shape[0]))
        # all-gather the per-pair kernel values over the rows axis (ICI)
        return tuple(
            jax.lax.all_gather(v, "rows", axis=0, tiled=True) for v in local)

    spec = P("rows")
    vals = shard_map(
        shard_fn, mesh=mesh, in_specs=(spec, spec),
        out_specs=P(None), check_vma=False,
    )(eta_a, eta_b)
    vals = tuple(v[:npairs] for v in vals)

    return eigen_mod._materialize_from_pairs(
        p, grid, coeff, vals, (eta_a[:npairs], eta_b[:npairs]),
        (iu[:npairs], ju[:npairs]), omega)


def sharded_newton_step(p, grid, coeff, state, mesh, quad=None,
                        chunk: int = 2048):
    """Newton-trace-secant step with sharded assembly; the dense solve runs
    on the replicated matrix."""
    d_omega = -1.0 / eigen_mod.linalg.complex_solve_trace(state.M, state.dM)
    omega = state.omega + d_omega
    M_new = sharded_assemble(p, grid, coeff, omega, mesh, quad, chunk)
    dM = (M_new - state.M) / d_omega
    return eigen_mod.EigenState(omega=omega, d_omega=d_omega, M=M_new, dM=dM)


def sharded_init_state(p, grid, coeff, omega_init, mesh, quad=None,
                       chunk: int = 2048):
    omega_old = 0.99 * omega_init
    d_omega = 0.01 * omega_init
    M_old = sharded_assemble(p, grid, coeff, omega_old, mesh, quad, chunk)
    omega = omega_old + d_omega
    M = sharded_assemble(p, grid, coeff, omega, mesh, quad, chunk)
    dM = (M - M_old) / d_omega
    return eigen_mod.EigenState(omega=omega, d_omega=d_omega, M=M, dM=dM)


# ---------------------------------------------------------------------------
# PIC with sharded markers
# ---------------------------------------------------------------------------

def pic_sharded_step(p, mesh: Mesh, qn_coef, state, dt):
    """One RK3 PIC step with markers sharded over ``rows``; deposition
    reduces the density with psum over ICI."""

    def shard_fn(s):
        reduce = partial(jax.lax.psum, axis_name="rows")
        new_s, _v = pic_mod.rk3_step(p, s, dt, qn_coef,
                                     density_reduce=reduce)
        return new_s

    marker_spec = pic_mod.PICState(
        eta=P("rows"), v_para=P("rows"), v_perp=P("rows"), weight=P("rows"),
        omega_dv=P("rows"), omega_st=P("rows"), p_weight=P("rows"),
        j0=P("rows"), dc_pb=P("rows"), field=P(None))
    return shard_map(shard_fn, mesh=mesh, in_specs=(marker_spec,),
                     out_specs=marker_spec)(state)


def pic_sharded_run(p, marker_per_cell, n_steps, dt, mesh, key=None):
    key = key if key is not None else jax.random.PRNGKey(0)
    dtype = jnp.asarray(p.length).dtype
    s0 = pic_mod.init_state(p, marker_per_cell, key, dtype=dtype)
    qn = pic_mod.quasi_neutrality_coef(p, dtype=dtype)

    def body(s, _):
        s = pic_sharded_step(p, mesh, qn, s, dt)
        return s, pic_mod.field_stats(s.field)

    return jax.lax.scan(body, s0, None, length=n_steps)
