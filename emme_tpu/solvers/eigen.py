"""Nonlinear eigensolver for the gyrokinetic integral operator M(omega).

Replaces the reference ``EigenSolver`` (``include/solver.h:44-516``):

* Matrix assembly: the reference queues one thread-pool task per
  upper-triangle entry, each running an adaptive scalar quadrature
  (solver.h:433-513).  Here all entries' kernel integrals evaluate as one
  batched XLA computation over a static panel mesh; the electromagnetic case
  shares a single integrand sweep across the m = 0, 1, 2 moments (the
  reference recomputes the integral per moment).
* Newton-secant iteration on det M(omega) = 0 via the trace update
  d_omega = -1 / tr(M^{-1} dM) (solver.h:113-160), with dM from the secant
  difference (solver.h:54-57).
* Null space extraction by SVD (solver.h:58-112).

All steps are jittable; the driver loop runs on host with a jitted step, and
``solve`` offers a fully-traced ``lax.while_loop`` variant.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..grid import Grid
from ..ops import kernels
from ..ops.singularity import singularity_coeff_matrix


def _pair_indices(n: int):
    iu, ju = np.triu_indices(n, k=1)
    return iu, ju


def _chunked(fn, args, n_items: int, chunk: int):
    """Apply fn over equal chunks of the leading axis (padding the tail)."""
    chunk = min(chunk, n_items)
    n_chunks = -(-n_items // chunk)
    pad = n_chunks * chunk - n_items
    padded = tuple(
        jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1), mode="edge")
        if pad else a for a in args)
    stacked = tuple(a.reshape(n_chunks, chunk, *a.shape[1:]) for a in padded)
    out = jax.lax.map(fn, stacked)
    out = tuple(o.reshape(n_chunks * chunk, *o.shape[2:])[:n_items] for o in out)
    return out


def assemble_matrix(p, grid: Grid, coeff, omega, quad=None, chunk: int = 2048):
    """Assemble the dense complex-symmetric M(omega).

    Electrostatic (beta_e == 0): dim = npoints,
      M[i,j] = -kappa_all(0, eta_i, eta_j, omega) * coeff[i,j] * dx (i != j)
      M[i,i] = 1 + 1/tau                                (solver.h:439-459)

    Electromagnetic: dim = 2*npoints with the phi/A_par 2x2 block structure
    of solver.h:461-511: symmetric A (phi-phi), antisymmetric U (phi-A), and
    symmetric D (A-A) with diagonal 2 tau / beta_e * bi(eta_i).
    """
    n = grid.npoints
    dx = grid.dx
    iu, ju = _pair_indices(n)
    eta_a = grid.eta[iu]
    eta_b = grid.eta[ju]
    cdtype = jnp.complex128 if grid.eta.dtype == jnp.float64 else jnp.complex64

    ms = (0, 1, 2) if p.electromagnetic else (0,)

    def compute(args):
        ea, eb = args
        (vals), _err = kernels.kappa_f_tau(p, ea, eb, omega, ms=ms, quad=quad)
        return vals

    vals = _chunked(compute, (eta_a, eta_b), len(iu), chunk)

    diag_val = (1.0 + 1.0 / p.tau).astype(cdtype)

    if not p.electromagnetic:
        k0 = vals[0]  # kappa_e(0) == 0 (Parameters.cpp:193-194)
        entries = -k0 * coeff[iu, ju] * dx
        M = jnp.zeros((n, n), cdtype)
        M = M.at[iu, ju].set(entries)
        M = M + M.T
        M = M.at[jnp.arange(n), jnp.arange(n)].set(diag_val)
        return M

    k0, k1, k2 = vals
    k1 = k1 + kernels.kappa_f_tau_e(p, eta_a, eta_b, omega, 1)
    k2 = k2 + kernels.kappa_f_tau_e(p, eta_a, eta_b, omega, 2)

    a_entries = -k0 * coeff[iu, ju] * dx
    u_entries = k1 * dx
    d_entries = k2 * dx

    A = jnp.zeros((n, n), cdtype).at[iu, ju].set(a_entries)
    A = A + A.T
    A = A.at[jnp.arange(n), jnp.arange(n)].set(diag_val)

    U = jnp.zeros((n, n), cdtype).at[iu, ju].set(u_entries)
    U = U - U.T  # antisymmetric, zero diagonal (solver.h:480-504)

    D = jnp.zeros((n, n), cdtype).at[iu, ju].set(d_entries)
    D = D + D.T
    D = D.at[jnp.arange(n), jnp.arange(n)].set(
        ((2.0 * p.tau) / p.beta_e * p.bi(grid.eta)).astype(cdtype))

    return jnp.block([[A, U], [U.T, D]])


@dataclass
class EigenState:
    omega: Any
    d_omega: Any
    M: Any
    dM: Any


jax.tree_util.register_dataclass(
    EigenState, data_fields=["omega", "d_omega", "M", "dM"], meta_fields=[])


def init_state(p, grid, coeff, omega_init, quad=None, chunk: int = 2048):
    """Reference ctor seeding (solver.h:396-415): assemble at 0.99*w0 and w0,
    secant derivative from the pair."""
    omega_old = 0.99 * omega_init
    d_omega = 0.01 * omega_init
    M_old = assemble_matrix(p, grid, coeff, omega_old, quad, chunk)
    omega = omega_old + d_omega
    M = assemble_matrix(p, grid, coeff, omega, quad, chunk)
    dM = (M - M_old) / d_omega
    return EigenState(omega=omega, d_omega=d_omega, M=M, dM=dM)


def newton_trace_step(p, grid, coeff, state: EigenState, quad=None,
                      chunk: int = 2048) -> EigenState:
    """One Newton-trace-secant iteration (solver.h:113-160)."""
    X = jnp.linalg.solve(state.M, state.dM)
    d_omega = -1.0 / jnp.trace(X)
    omega = state.omega + d_omega
    M_new = assemble_matrix(p, grid, coeff, omega, quad, chunk)
    dM = (M_new - state.M) / d_omega
    return EigenState(omega=omega, d_omega=d_omega, M=M_new, dM=dM)


def null_space(M):
    """Conjugated last right-singular vector (solver.h:58-112)."""
    _, _, vh = jnp.linalg.svd(M)
    return jnp.conj(vh[-1, :])


def solve(p, omega_init, tol: float | None = None, quad=None,
          chunk: int = 2048, callback=None, dtype=None):
    """Full eigen solve on host: returns (omega, eigenvector, n_steps, state).

    Convergence: |d_omega| < tol * |omega| within iteration_step_limit steps
    (main.cpp:43-57).
    """
    tol = tol if tol is not None else 1e-6
    dtype = dtype if dtype is not None else jnp.asarray(p.length).dtype
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    grid = Grid.create(p.length, p.npoints, dtype=dtype)
    coeff = singularity_coeff_matrix(p.npoints, dtype=dtype)

    step = jax.jit(partial(newton_trace_step, quad=quad, chunk=chunk),
                   static_argnames=())
    state = init_state(p, grid, coeff, jnp.asarray(omega_init, cdtype),
                       quad, chunk)
    n_steps = 0
    for j in range(p.iteration_step_limit + 1):
        state = step(p, grid, coeff, state)
        n_steps = j + 1
        if callback is not None:
            callback(j, state)
        if abs(complex(state.d_omega)) < tol * abs(complex(state.omega)):
            break
    vec = null_space(state.M)
    return complex(state.omega), vec, n_steps, state
