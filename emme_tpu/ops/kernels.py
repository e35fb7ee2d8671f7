"""Gyrokinetic propagator kernels kappa_f_tau / kappa_f_tau_e.

The ion kernel (reference ``src/Parameters.cpp:113-184``) is the single most
expensive function in the whole pipeline: a contour-rotated integral over
normalized transit time t in [0, inf) whose integrand combines the parallel
propagator, FLR-scaled complex Bessel I0/I1, and a log-domain underflow-safe
exponential assembly.  The reference evaluates it with adaptive Gauss-Kronrod
per matrix entry on a thread pool; here the integrand is evaluated for *all*
matrix entries x *all* quadrature nodes as one fused XLA computation on a
static per-entry panel mesh (see ``emme_tpu.ops.quadrature``).

Electron kernels (``Parameters.cpp:186-209``) are closed forms.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from . import quadrature
from .bessel import bessel_i01_scaled

SAFE_EXP_CUTOFF = -40.0  # reference Parameters.cpp:167-173

# Default panel counts for the transit-time integral, per working precision.
# The f64 mesh over-resolves on purpose (golden comparisons to ~1e-10); at f32
# the matrix entries bottom out at ~1e-7 relative rounding noise, so a mesh
# ~4x coarser reaches the same converged eigenvalue (validated at n=1024
# tokamak -- rel err 1.38e-6 vs 1.31e-6 for the dense mesh -- and n=128
# stellarator, identical to 3 digits of its reference-quadrature-limited
# agreement) in ~30% of the assembly time.
PANEL_PRESETS = {
    "float32": {"n_shoulder": 8, "n_osc": 32, "n_tail": 4},
    "float64": {"n_shoulder": 40, "n_osc": 144, "n_tail": 16},
}


def panel_preset(real_dtype) -> dict:
    return dict(PANEL_PRESETS[jnp.dtype(real_dtype).name])


# |eta - eta'| tier table for assembly: (upper bound, per-tier mesh spec).
# The integrand's resolution demand is set by the Gaussian turn-on at
# t ~ q R |d_eta| / vt.  Round-5 AUTO-TUNED per-tier panel counts
# (benchmarks/tune_panels.py): minimal (n_shoulder, n_osc, n_tail)
# satisfying the reference acceptance criterion err <= max(accuracy,
# precision |I|) with >= 2x margin, measured as DIRECT deviation from the
# f64 dense mesh over the (|d_eta|, omega-basin) envelope of BOTH canonical
# cases.  The tuned split shifts panels shoulder-ward with |d_eta| (the
# turn-on sharpens) -- the old scale-based table (0.5x / 0.25x of the base)
# had it backwards: its quarter mesh deviated up to 6e-4 ABSOLUTE (600x the
# tokamak threshold) on far pairs at the GOLDEN omega, tolerated only
# because those entries are tiny and their errors average out in the
# eigenvalue.  The tuned table is ~10% cheaper AND within threshold
# everywhere (margins 0.27 / 0.09 / 0.02 for the three far tiers).  A
# per-tier order-7 pure-Gauss sweep measured as a LOSS (the integrand
# rewards high per-panel order; see tune_panels.py) -- the quadrature is at
# its cost frontier, so no further assembly factor hides here.
# Spec: scale float (legacy) or frozen (key, value) tuple of panel counts.
TIER_TABLE = (
    (0.6, 1.0),
    (8.0, (("n_osc", 12), ("n_shoulder", 6), ("n_tail", 1))),
    (16.0, (("n_osc", 4), ("n_shoulder", 4), ("n_tail", 1))),
    (float("inf"), (("n_osc", 4), ("n_shoulder", 6), ("n_tail", 1))),
)


def scaled_quad(quad, real_dtype, spec) -> dict:
    """Per-tier panel mesh: ``spec`` is a scale float (legacy: every panel
    count multiplied) or a frozen (key, value) tuple of EXPLICIT panel
    counts (the auto-tuned TIER_TABLE form; non-count keys like ``order``
    still come from ``quad``/the preset).

    A user/guard ``quad`` whose panel counts differ from the preset (e.g.
    refine_quad's doubling) scales the tuple spec's counts by the same
    per-key ratio -- otherwise quad_guard's 'refine' retry would re-solve
    the flagged far-tier pairs on the identical tuned mesh."""
    base = panel_preset(real_dtype)
    if quad:
        base.update(quad)
    if isinstance(spec, (int, float)):
        return {k: (max(1, int(round(v * spec))) if k.startswith("n_")
                    else v) for k, v in base.items()}
    preset = panel_preset(real_dtype)
    out = dict(base)
    for k, v in dict(spec).items():
        factor = base.get(k, preset[k]) / preset[k]
        out[k] = max(1, int(round(v * factor)))
    return out


def tier_thresholds_ij(dx: float, npoints: int, table=TIER_TABLE) -> tuple:
    """TIER_TABLE in static |i - j| index units for a concrete grid spacing
    (tier membership must be trace-static)."""
    out = []
    for ub, scale in table:
        ij = npoints if ub == float("inf") \
            else min(npoints, int(np.ceil(ub / dx)))
        out.append((ij, scale))
    return tuple(out)


def _complex_dtype(real_dtype):
    return jnp.complex128 if real_dtype == jnp.float64 else jnp.complex64


def kappa_integrand(p, t, eta, eta_p, omega, ms: Sequence[int]):
    """Integrand of kappa_f_tau at transit-time nodes ``t``.

    Args:
      p: Params pytree.
      t: (..., ) real array of integration nodes (broadcasts against eta).
      eta, eta_p: field-line coordinates (broadcast with t).
      omega: complex frequency.
      ms: static tuple of velocity moments to emit (subset of (0, 1, 2)).

    Returns:
      tuple of arrays, one per m in ``ms``.

    Mirrors reference Parameters.cpp:120-176.
    """
    cdtype = _complex_dtype(jnp.asarray(t).dtype)
    one_i = jnp.asarray(1j, cdtype)

    # contour rotation: omi = -copysign(1, Re omega)
    omi = -jnp.sign(jnp.where(jnp.real(omega) == 0, 1.0, jnp.real(omega)))
    exp_arg = jnp.exp(-omi * one_i * jnp.arctan(t / p.arc_coeff))
    taut = t * exp_arg
    jacob = exp_arg - (one_i * exp_arg * omi * t) / (
        p.arc_coeff * (1.0 + (t / p.arc_coeff) ** 2))

    beta1 = p.beta_1(eta, eta_p)
    d_eta = eta - eta_p
    lam = 1.0 + 0.5 * one_i * (taut * p.vt) / (p.q * p.R * d_eta) * beta1

    bi_eta = p.bi(eta)
    bi_eta_p = p.bi(eta_p)
    sqrt_bb = jnp.sqrt(bi_eta * bi_eta_p)

    i0s, i1s, zs = bessel_i01_scaled(sqrt_bb / lam)

    lam3_inv = lam ** -3
    norm_vel = (p.q * p.R * d_eta) / (p.vt * taut)

    i0_coef = ((omega - p.omega_s_i * (1.0 + p.eta_i * (0.5 * norm_vel**2 - 1.5)))
               / lam
               + p.omega_s_i * p.eta_i * (0.5 * (bi_eta + bi_eta_p) - lam) * lam3_inv)
    i1_coef = -p.omega_s_i * p.eta_i * sqrt_bb * lam3_inv

    log_norm_vel = -0.5 * norm_vel**2
    log_i_beta = -0.5 * one_i * beta1 * norm_vel
    log_hf_tau = one_i * taut * omega
    log_exp_term = -(bi_eta + bi_eta_p) / (2.0 + one_i * beta1 / norm_vel)
    log_coef = log_norm_vel + log_i_beta + log_hf_tau + log_exp_term

    # underflow-safe exp: the Bessel scaling e^{zs} is folded into the
    # exponent exactly as the reference does (Parameters.cpp:174-175).
    expo = log_coef - zs
    keep = jnp.real(expo) >= SAFE_EXP_CUTOFF
    # clamp the discarded lanes so exp() can't overflow/NaN before the select
    safe = jnp.exp(jnp.where(keep, expo, SAFE_EXP_CUTOFF))
    core = jnp.where(keep, safe * (i0_coef * i0s + i1_coef * i1s), 0.0)

    base = jacob / taut * core
    out = []
    for m in ms:
        out.append(base * norm_vel**m if m else base)
    return tuple(out)


def transit_panel_bounds(p, d_eta_abs, omega, n_shoulder: int = 40,
                         n_osc: int = 144, n_tail: int = 16):
    """Per-entry panel boundaries for the transit-time integral.

    Three graded sections tuned to the integrand structure:
      * shoulder: geometric panels through the Gaussian turn-on at
        t ~ q R |d_eta| / vt (the exp(-(qR d_eta / vt t)^2 / 2) factor kills
        everything below t_a / ~9; oscillation from beta_1*norm_vel demands
        fine panels on the shoulder).
      * oscillatory bulk: linear panels sized for the exp(i omega taut)
        oscillation, up to the contour-rotation decay cutoff.
      * tail: geometric panels to capture slow residual decay.

    All boundaries are traced values; the panel COUNT is static.
    """
    a = p.q * p.R * d_eta_abs / p.vt          # Gaussian scale per entry
    t_a = a / 12.0 + 1e-8
    t_b = jnp.maximum(3.0 * a, 1.0)

    aw = jnp.abs(omega)
    im = jnp.imag(omega)
    re = jnp.abs(jnp.real(omega))
    # decay rate after full contour rotation ~ max(|Re w|, Im w); before
    # rotation (t < arc) only Im w (if > 0) damps.
    rate_far = jnp.maximum(jnp.maximum(re, im), 0.02)
    rate_near = jnp.maximum(im, 0.0)
    # if the mode grows only after rotation, mass extends past ~4*arc
    t_cut = jnp.where(rate_near > 0.05,
                      45.0 / rate_near,
                      45.0 / rate_far + 4.0 * p.arc_coeff)
    t_c = jnp.maximum(jnp.maximum(t_cut, 4.0 * t_b), 50.0)
    t_d = 50.0 * t_c

    sh = quadrature.geometric_bounds(t_a, t_b, n_shoulder)
    osc = quadrature.linear_bounds(t_b, t_c, n_osc)
    tail = quadrature.geometric_bounds(t_c, t_d, n_tail)
    return jnp.concatenate([sh, osc[..., 1:], tail[..., 1:]], axis=-1)


def kappa_f_tau(p, eta, eta_p, omega, ms: Sequence[int] = (0,),
                quad=None):
    """Batched ion kernel: broadcasts over array eta/eta_p.

    Returns (values, errs): ``values`` is a tuple (one entry per m) of complex
    arrays shaped like ``eta``; ``errs`` is a matching tuple of the summed
    embedded G-K error estimates per moment (diagnostic, consumed by the
    runtime quadrature guard).
    Reference: Parameters.cpp:113-184.
    """
    quad = quad or {}
    order = quad.get("order", p.integration_start_points)
    preset = panel_preset(jnp.asarray(eta).dtype)
    bounds = transit_panel_bounds(
        p, jnp.abs(eta - eta_p), omega,
        n_shoulder=quad.get("n_shoulder", preset["n_shoulder"]),
        n_osc=quad.get("n_osc", preset["n_osc"]),
        n_tail=quad.get("n_tail", preset["n_tail"]))
    pts, wk, wg = quadrature.panel_points(bounds, order)

    fvals = kappa_integrand(
        p, pts, jnp.asarray(eta)[..., None, None],
        jnp.asarray(eta_p)[..., None, None], omega, ms)

    pref = -1j * (p.q * p.R) / (p.vt * jnp.sqrt(2.0 * jnp.pi))
    outs = []
    errs = []
    for f in fvals:
        integral, err = quadrature.panel_reduce(f, wk, wg)
        outs.append(pref * integral)
        errs.append(jnp.abs(pref) * err)
    return tuple(outs), tuple(errs)


def kappa_f_tau_e(p, eta, eta_p, omega, m: int):
    """Adiabatic/fluid electron kernel, closed form.
    Reference: Parameters.cpp:186-209."""
    d = eta - eta_p
    sgn = d / jnp.abs(d)
    if m == 0:
        return jnp.zeros(jnp.broadcast_shapes(jnp.shape(eta), jnp.shape(eta_p)),
                         dtype=_complex_dtype(jnp.asarray(p.q).dtype))
    if m == 1:
        return (-1j * (p.q * p.R) / (2.0 * p.vt * p.tau)
                * (omega - p.omega_s_e) * sgn)
    if m == 2:
        return ((p.q**2 * p.R**2) / (2.0 * p.vt**2 * p.tau) * sgn
                * (omega * (omega - p.omega_s_e) * d
                   - p.beta_1_e(eta, eta_p) * p.vt / (p.q * p.R)
                   * (omega - p.omega_s_e * (1.0 + p.eta_e))))
    raise ValueError("Unsupported mode value")
