"""Distributed block-banded factorization, solve, and Newton-trace step
(SPIKE + Woodbury) over a device mesh.

The single-device banded path (``ops/banded.py``) is a sequential
``lax.scan`` over all nb block rows -- the factorization chain is the one
part of the sparse eigensolve (reference iteration ``solver.h:113-160``)
that round 2 never distributed.  Here the band's block rows shard over the
mesh ``rows`` axis and every shard factors its LOCAL diagonal block in
parallel (nb/S scan steps instead of nb); the inter-shard coupling is
handled EXACTLY by a Woodbury correction on the shard interfaces:

    M = D + P K P^T
      D = blockdiag(A_0..A_{S-1})   (per-shard banded blocks, h <= nbl)
      P = edge selectors (top/bottom h block rows of every shard)
      K = interface corner blocks E_s (and E_s^T -- M is complex symmetric)

    M^{-1} = D^{-1} - X (I + K G)^{-1} K X^T ,   X = D^{-1} P,  G = P^T X

so a distributed solve is: local banded solve + an r x r reduced correction
(r = 2 S h bs), replicated over the mesh; and the Newton-trace denominator
splits into

    tr(M^{-1} dM) = sum_s tr(A_s^{-1} dM_ss)                (local Takahashi)
                  - tr((I + K G)^{-1} K (X^T dD X + G K' G))  (reduced)

with dM = dD + P K' P^T decomposed the same way.  Both pieces are exact --
the distributed omega trajectory matches the single-device one to roundoff
(tests/test_spike.py).  All small reduced-system algebra runs replicated on
every device in (re, im) planes (complex linalg is unimplemented on TPU);
the heavy parts -- assembly quadrature, local LU/Takahashi scans, edge
spikes -- scale with 1/S per device.

Assembly shards the same way: each device builds only its block rows via
``sparse_eigen.assemble_bdia_window`` (kernel-table window = its rows plus
a de_max halo), so the dominant quadrature cost also scales 1/S.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..grid import Grid
from ..ops import banded, pallas_kappa
from ..ops.sparse import BDIAOperator, bdia_matvec
from ..solvers import sparse_eigen as se


# ---------------------------------------------------------------------------
# (re, im)-plane helpers for the replicated reduced-system algebra
# ---------------------------------------------------------------------------

def _pmm(ar, ai, br, bi):
    """Complex matmul on planes."""
    return ar @ br - ai @ bi, ar @ bi + ai @ br


def _psolve(ar, ai, br, bi):
    """Solve (Ar + i Ai) Z = (Br + i Bi) via the real 2m x 2m embedding."""
    m = ar.shape[0]
    R = jnp.block([[ar, -ai], [ai, ar]])
    rhs = jnp.concatenate([br, bi], axis=0)
    Z = jnp.linalg.solve(R, rhs)
    return Z[:m], Z[m:]


# ---------------------------------------------------------------------------
# local-shard building blocks (called INSIDE shard_map)
# ---------------------------------------------------------------------------

def _mask_local(data, offsets, nbl: int):
    """Zero blocks (i, i+d) crossing the shard boundary -> the SPIKE
    diagonal block A_s."""
    i = jnp.arange(nbl)
    planes = []
    for k, d in enumerate(offsets):
        valid = ((i + d >= 0) & (i + d < nbl)).astype(data.dtype)
        planes.append(data[k] * valid[:, None, None, None])
    return jnp.stack(planes)


def _right_corner(data, offsets, h: int, bs: int, nbl: int):
    """Interface corner E_s: blocks of shard s's bottom h rows crossing into
    shard s+1's top h rows, as (2, h*bs, h*bs) planes.  E[a, c] = block at
    (local row nbl-h+a, global col offset d = c + h - a); only 1 <= d <= h
    exists (lower-left triangle)."""
    zero = jnp.zeros((2, bs, bs), data.dtype)
    rows = []
    for a in range(h):
        cols = []
        for c in range(h):
            d = c + h - a
            blk = data[offsets.index(d), nbl - h + a] if 1 <= d <= h else zero
            cols.append(blk)
        rows.append(jnp.concatenate(cols, axis=-1))
    return jnp.concatenate(rows, axis=-2)


def _edge_rhs(n_s: int, m: int, dtype):
    """(n_s, 2m) RHS with identity at the top h and bottom h block rows --
    the P selector columns for one shard."""
    Pr = jnp.zeros((n_s, 2 * m), dtype)
    eye = jnp.eye(m, dtype=dtype)
    Pr = Pr.at[:m, :m].set(eye)
    Pr = Pr.at[n_s - m:, m:].set(eye)
    return Pr


def _edge_rows(Zr, Zi, m: int):
    """P^T Z: stack the top and bottom h-block rows -> (2m, cols)."""
    return (jnp.concatenate([Zr[:m], Zr[-m:]], axis=0),
            jnp.concatenate([Zi[:m], Zi[-m:]], axis=0))


def _spike_factor(data_local, offsets, h: int, bs: int):
    """Per-shard factorization piece: banded LU of the masked local block,
    edge spikes X_s = A_s^{-1} [P^t, P^b], and the corner G_s = P^T X_s."""
    nbl = data_local.shape[1]
    n_s = nbl * bs
    m = h * bs
    masked = _mask_local(data_local, offsets, nbl)
    A_s = BDIAOperator(data=masked, offsets=offsets, n=n_s, block=bs)
    lu = banded.banded_lu(A_s)
    Pr = _edge_rhs(n_s, m, data_local.dtype)
    Xr, Xi = banded.banded_solve(lu, Pr, jnp.zeros_like(Pr))
    Gr, Gi = _edge_rows(Xr, Xi, m)
    return lu, masked, (Xr, Xi), (Gr, Gi)


def _gather_K(data_local, offsets, h, bs, nbl, S, axis_name):
    """All-gathered interface couplings -> the replicated r x r K matrix
    (r = 2 S h bs).  Group layout: [t_0, b_0, t_1, b_1, ...] each h*bs wide;
    K[b_i, t_{i+1}] = E_i, K[t_{i+1}, b_i] = E_i^T."""
    m = h * bs
    r = 2 * S * m
    s = jax.lax.axis_index(axis_name)
    E = _right_corner(data_local, offsets, h, bs, nbl)
    E = E * (s < S - 1).astype(E.dtype)     # last shard has no right coupling
    E_all = jax.lax.all_gather(E, axis_name, axis=0)   # (S, 2, m, m)
    Kr = jnp.zeros((r, r), data_local.dtype)
    Ki = jnp.zeros((r, r), data_local.dtype)
    for i in range(S - 1):
        rb = (2 * i + 1) * m       # bottom of shard i
        ct = (2 * i + 2) * m       # top of shard i+1
        Kr = Kr.at[rb:rb + m, ct:ct + m].set(E_all[i, 0])
        Ki = Ki.at[rb:rb + m, ct:ct + m].set(E_all[i, 1])
        Kr = Kr.at[ct:ct + m, rb:rb + m].set(E_all[i, 0].T)
        Ki = Ki.at[ct:ct + m, rb:rb + m].set(E_all[i, 1].T)
    return Kr, Ki


def _gather_blockdiag(Br, Bi, axis_name, S):
    """Per-shard (2m, 2m) corner -> replicated block-diagonal (r, r)."""
    m2 = Br.shape[0]
    B_all_r = jax.lax.all_gather(Br, axis_name, axis=0)    # (S, 2m, 2m)
    B_all_i = jax.lax.all_gather(Bi, axis_name, axis=0)
    r = S * m2
    Gr = jnp.zeros((r, r), Br.dtype)
    Gi = jnp.zeros((r, r), Bi.dtype)
    for s in range(S):
        Gr = Gr.at[s * m2:(s + 1) * m2, s * m2:(s + 1) * m2].set(B_all_r[s])
        Gi = Gi.at[s * m2:(s + 1) * m2, s * m2:(s + 1) * m2].set(B_all_i[s])
    return Gr, Gi


def _reduced_matrix(Kr, Ki, Gr, Gi):
    """R = I + K G on planes."""
    Rr, Ri = _pmm(Kr, Ki, Gr, Gi)
    return Rr + jnp.eye(Rr.shape[0], dtype=Rr.dtype), Ri


def _spike_apply_inverse(lu, X, K, R, fr, fi, axis_name, S):
    """z = M^{-1} f given the per-shard LU + spikes and the replicated
    reduced matrices: local solve, gather edge values, reduced correction.
    fr, fi: local (n_s,) or (n_s, k) planes; returns the same shape."""
    Xr, Xi = X
    Kr, Ki = K
    Rr, Ri = R
    m = Xr.shape[1] // 2
    vec = fr.ndim == 1
    fr2 = fr[:, None] if vec else fr
    fi2 = fi[:, None] if vec else fi
    gr, gi = banded.banded_solve(lu, fr2, fi2)       # (n_s, k)
    ur, ui = _edge_rows(gr, gi, m)                   # (2m, k)
    u_all_r = jax.lax.all_gather(ur, axis_name, axis=0).reshape(-1, ur.shape[1])
    u_all_i = jax.lax.all_gather(ui, axis_name, axis=0).reshape(-1, ui.shape[1])
    # w = (I + K G)^{-1} K u  (replicated small algebra)
    br, bi = _pmm(Kr, Ki, u_all_r, u_all_i)
    wr, wi = _psolve(Rr, Ri, br, bi)
    s = jax.lax.axis_index(axis_name)
    w_s_r = jax.lax.dynamic_slice_in_dim(wr, s * 2 * m, 2 * m, axis=0)
    w_s_i = jax.lax.dynamic_slice_in_dim(wi, s * 2 * m, 2 * m, axis=0)
    cr, ci = _pmm(Xr, Xi, w_s_r, w_s_i)
    zr, zi = gr - cr, gi - ci
    if vec:
        zr, zi = zr[:, 0], zi[:, 0]
    return zr, zi


def _spike_trace(lu, masked_M, X, G, K, R, dM_local, offsets, h, bs,
                 axis_name, S):
    """tr(M^{-1} dM), exactly, distributed:
    sum_s tr(A_s^{-1} dM_ss) - tr((I+KG)^{-1} K (X^T dD X + G K' G))."""
    nbl = dM_local.shape[1]
    n_s = nbl * bs
    m = h * bs
    Xr, Xi = X
    Gr, Gi = G
    Kr, Ki = K
    Rr, Ri = R

    # local Takahashi trace of the diagonal part
    dD = BDIAOperator(data=_mask_local(dM_local, offsets, nbl),
                      offsets=offsets, n=n_s, block=bs)
    Zu = banded.banded_selected_inverse(lu)
    t1r, t1i = banded.banded_trace_product(Zu, dD)
    t1r = jax.lax.psum(t1r, axis_name)
    t1i = jax.lax.psum(t1i, axis_name)

    # H = X^T dD X (block-diagonal, per shard) + G K' G (replicated)
    Yr, Yi = bdia_matvec(dD, Xr, Xi)                 # (n_s, 2m)
    Hd_r = Xr.T @ Yr - Xi.T @ Yi
    Hd_i = Xr.T @ Yi + Xi.T @ Yr
    Hr, Hi = _gather_blockdiag(Hd_r, Hd_i, axis_name, S)
    Kpr, Kpi = _gather_K(dM_local, offsets, h, bs, nbl, S, axis_name)
    GKr, GKi = _pmm(Gr, Gi, Kpr, Kpi)
    GKGr, GKGi = _pmm(GKr, GKi, Gr, Gi)
    Hr, Hi = Hr + GKGr, Hi + GKGi

    # t2 = tr((I + K G)^{-1} (K H))
    KHr, KHi = _pmm(Kr, Ki, Hr, Hi)
    Zr, Zi = _psolve(Rr, Ri, KHr, KHi)
    t2r = jnp.trace(Zr)
    t2i = jnp.trace(Zi)
    return t1r - t2r, t1i - t2i


# ---------------------------------------------------------------------------
# sharded assembly + the distributed Newton step (shard_map drivers)
# ---------------------------------------------------------------------------

def _data_spec():
    return P(None, "rows", None, None, None)


def sharded_assemble_bdia(p, grid: Grid, coeff_band, omega, h: int,
                          block: int, mesh: Mesh, quad=None,
                          chunk: int = 4096, tiers=None,
                          fused: bool = False) -> BDIAOperator:
    """Mesh-sharded direct-to-BDIA assembly: every shard evaluates only the
    kernel integrals for ITS block rows (+ halo) and builds them in place.
    Returns a BDIAOperator whose ``data`` is sharded on the block-row axis."""
    S = mesh.shape["rows"]
    dim = 2 * grid.npoints if p.electromagnetic else grid.npoints
    nb = dim // block
    assert nb % S == 0, (nb, S)
    nbl = nb // S

    def shard_fn(cb):
        s = jax.lax.axis_index("rows")
        return se.assemble_bdia_window(p, grid, cb, omega, h, block,
                                       s * nbl, nbl, quad, chunk, tiers,
                                       fused)

    data = shard_map(shard_fn, mesh=mesh, in_specs=(P(None, None),),
                     out_specs=_data_spec(), check_vma=False)(coeff_band)
    return BDIAOperator(data=data, offsets=tuple(range(-h, h + 1)),
                        n=dim, block=block)


def sharded_trace_d_omega(op: BDIAOperator, dop: BDIAOperator, mesh: Mesh):
    """d_omega = -1 / tr(M^{-1} dM), the whole chain (local LU + Takahashi,
    edge spikes, reduced correction) under shard_map.  Returns (re, im)."""
    S = mesh.shape["rows"]
    h = max(op.offsets)
    bs = op.block
    nbl = (op.n // bs) // S

    def shard_fn(Md, dMd):
        lu, masked, X, G = _spike_factor(Md, op.offsets, h, bs)
        K = _gather_K(Md, op.offsets, h, bs, nbl, S, "rows")
        Gd = _gather_blockdiag(G[0], G[1], "rows", S)
        R = _reduced_matrix(K[0], K[1], Gd[0], Gd[1])
        tr_r, tr_i = _spike_trace(lu, masked, X, Gd, K, R, dMd,
                                  op.offsets, h, bs, "rows", S)
        d = tr_r * tr_r + tr_i * tr_i
        return -tr_r / d, tr_i / d        # -1/tr on planes

    return shard_map(shard_fn, mesh=mesh,
                     in_specs=(_data_spec(), _data_spec()),
                     out_specs=(P(), P()), check_vma=False)(
        op.data, dop.data)


def sharded_solve_vec(op: BDIAOperator, mesh: Mesh, fr, fi):
    """Distributed z = M^{-1} f (row-sharded f), via SPIKE + reduced
    correction.  fr, fi sharded over ``rows``."""
    S = mesh.shape["rows"]
    h = max(op.offsets)
    bs = op.block
    nbl = (op.n // bs) // S

    def shard_fn(Md, fr_l, fi_l):
        lu, masked, X, G = _spike_factor(Md, op.offsets, h, bs)
        K = _gather_K(Md, op.offsets, h, bs, nbl, S, "rows")
        Gd = _gather_blockdiag(G[0], G[1], "rows", S)
        R = _reduced_matrix(K[0], K[1], Gd[0], Gd[1])
        return _spike_apply_inverse(lu, X, K, R, fr_l, fi_l, "rows", S)

    return shard_map(shard_fn, mesh=mesh,
                     in_specs=(_data_spec(), P("rows"), P("rows")),
                     out_specs=(P("rows"), P("rows")), check_vma=False)(
        op.data, fr, fi)


def sharded_nullspace(op: BDIAOperator, mesh: Mesh, iters: int = 3):
    """Distributed inverse-iteration nullspace (cf. solver.h:58-112):
    the SPIKE factorization is built once, then reused across iterations."""
    S = mesh.shape["rows"]
    h = max(op.offsets)
    bs = op.block
    nbl = (op.n // bs) // S
    n = op.n

    def shard_fn(Md):
        lu, masked, X, G = _spike_factor(Md, op.offsets, h, bs)
        K = _gather_K(Md, op.offsets, h, bs, nbl, S, "rows")
        Gd = _gather_blockdiag(G[0], G[1], "rows", S)
        R = _reduced_matrix(K[0], K[1], Gd[0], Gd[1])
        s = jax.lax.axis_index("rows")
        n_s = nbl * bs
        i_loc = jnp.arange(n_s, dtype=Md.dtype) + (s * n_s).astype(Md.dtype)
        vr = jnp.ones((n_s,), Md.dtype)
        vi = 0.3 * (i_loc / n - 0.5)
        for _ in range(iters):
            vr, vi = _spike_apply_inverse(lu, X, K, R, vr, vi, "rows", S)
            nrm2 = jax.lax.psum(jnp.sum(vr * vr + vi * vi), "rows")
            nrm = jnp.sqrt(nrm2)
            vr, vi = vr / nrm, vi / nrm
        return vr, vi

    return shard_map(shard_fn, mesh=mesh, in_specs=(_data_spec(),),
                     out_specs=(P("rows"), P("rows")), check_vma=False)(
        op.data)


# ---------------------------------------------------------------------------
# full distributed sparse eigensolve
# ---------------------------------------------------------------------------

def _secant(op_new: BDIAOperator, op_old: BDIAOperator, dr, di):
    """(M_new - M_old) / d_omega on (sharded) planes."""
    inv = 1.0 / (dr * dr + di * di)
    diff = op_new.data - op_old.data
    re = diff[..., 0, :, :] * (dr * inv) - diff[..., 1, :, :] * (-di * inv)
    im = diff[..., 0, :, :] * (-di * inv) + diff[..., 1, :, :] * (dr * inv)
    return BDIAOperator(data=jnp.stack([re, im], axis=-3),
                        offsets=op_new.offsets, n=op_new.n,
                        block=op_new.block)


_SHARDED_JIT: dict = {}


def _sharded_fns(mesh, h, block, quad, chunk, dtype, tiers,
                 fused: bool = False):
    qkey = tuple(sorted(quad.items())) if quad else None
    key = (id(mesh), h, block, qkey, chunk, jnp.dtype(dtype).name, tiers,
           fused)
    if key not in _SHARDED_JIT:
        def assemble(p, grid, cb, re, im):
            om = (re + 1j * im).astype(
                jnp.complex128 if dtype == jnp.float64 else jnp.complex64)
            return sharded_assemble_bdia(p, grid, cb, om, h, block, mesh,
                                         quad, chunk, tiers, fused)

        def init(p, grid, cb, re, im):
            M_old = assemble(p, grid, cb, 0.99 * re, 0.99 * im)
            M = assemble(p, grid, cb, re, im)
            dM = _secant(M, M_old, 0.01 * re, 0.01 * im)
            return M, dM

        def step(p, grid, cb, M, dM, om_re, om_im):
            dr, di = sharded_trace_d_omega(M, dM, mesh)
            re, im = om_re + dr, om_im + di
            M_new = assemble(p, grid, cb, re, im)
            dM_new = _secant(M_new, M, dr, di)
            return M_new, dM_new, re, im, dr, di

        _SHARDED_JIT[key] = (jax.jit(init), jax.jit(step),
                             jax.jit(lambda M: sharded_nullspace(M, mesh)))
    return _SHARDED_JIT[key]


def solve(p, omega_init, mesh: Mesh, tol: float | None = None, quad=None,
          chunk: int = 16384, dtype=None, band_deta: float | None = None,
          block: int | None = None, tiered: bool | None = None,
          stats: dict | None = None, host64: bool = False,
          fused: bool | None = None):
    """Distributed sparse eigensolve: the whole Newton-trace step --
    assembly, banded factorization, exact trace, secant update -- runs
    sharded over ``mesh``'s ``rows`` axis.  Semantics (seeding, iteration,
    convergence, nullspace) match ``sparse_eigen.solve`` with
    method="TraceSecant"; the trajectories agree to roundoff
    (tests/test_spike.py).  Returns (omega, eigenvector, n_steps, M)."""
    tol = tol if tol is not None else 1e-6
    dtype = dtype if dtype is not None else jnp.asarray(p.length).dtype
    band_deta = band_deta if band_deta is not None else se.DEFAULT_BAND_DETA
    grid = Grid.create(p.length, p.npoints, dtype=dtype)
    dim = 2 * p.npoints if p.electromagnetic else p.npoints
    S = mesh.shape["rows"]
    if block is None:
        # largest MXU-friendly block with nb divisible by S and h <= nbl
        block = se.pick_block(dim // S)
    nb = dim // block
    h = se.band_halfwidth(p, grid, block, band_deta)
    nbl = nb // S
    if h > nbl:
        raise ValueError(
            f"shard too narrow: half-bandwidth {h} blocks > {nbl} local "
            f"block rows (raise block size or lower mesh rows)")
    w_el = se.em_de_max(p.npoints, h, block) if p.electromagnetic \
        else (h + 1) * block - 1
    coeff_band = se.singularity_coeff_band(p.npoints, w_el, dtype=dtype)

    if tiered is None:
        tiered = dtype == jnp.float32
    tiers = None
    if tiered:
        dxf = 2.0 * float(p.length) / (p.npoints - 1)
        tiers = se.kernels.tier_thresholds_ij(dxf, p.npoints)
    # Gate the fused Pallas integrand on the MESH's platform, not the default
    # backend: the dryrun shards over a virtual CPU mesh while a tunneled TPU
    # chip may remain the default backend (and vice versa a future CPU-default
    # host could drive a TPU mesh).
    mesh_platform = mesh.devices.flat[0].platform
    if fused is None:
        fused = dtype == jnp.float32 and mesh_platform == "tpu"

    init, step, nullspace = _sharded_fns(mesh, h, block, quad, chunk, dtype,
                                         tiers, fused)
    omega = complex(omega_init)
    dev_tol = max(tol, 2e-4) if host64 else tol
    d_omega = 0.01 * omega
    with mesh, pallas_kappa.force_interpret(mesh_platform != "tpu"):
        M, dM = init(p, grid, coeff_band,
                     jnp.asarray(omega.real, dtype),
                     jnp.asarray(omega.imag, dtype))
        om_re = jnp.asarray(omega.real, dtype)
        om_im = jnp.asarray(omega.imag, dtype)
        n_steps = 0
        for j in range(p.iteration_step_limit + 1):
            M, dM, om_re, om_im, dr, di = step(p, grid, coeff_band, M, dM,
                                               om_re, om_im)
            n_steps = j + 1
            d_omega = complex(float(dr), float(di))
            omega = complex(float(om_re), float(om_im))
            if abs(d_omega) < dev_tol * abs(omega):
                break
        if not host64:
            vr, vi = nullspace(M)
    if stats is not None:
        stats["mesh_rows"] = S
        stats["block"] = block
        stats["h"] = h
        stats["nnz"] = M.nnz
    if host64:
        # hybrid polish: host complex128 banded linalg on the (gathered)
        # operator; the few extra polish assemblies run single-device on the
        # DEFAULT backend (not the mesh), so the fused Pallas flag must be
        # re-gated on it -- with a TPU mesh driven from a CPU-default host,
        # fused=True would otherwise run the polish assemblies in
        # interpret mode, orders of magnitude slower
        fused_polish = fused and jax.default_backend() == "tpu"
        state = se.SparseEigenState(omega=omega, d_omega=d_omega, M=M, dM=dM)
        omega, vec, extra = se.host64_polish_banded(
            p, grid, coeff_band, state, tol, h, block, quad=quad,
            chunk=chunk, tiers=tiers, fused=fused_polish)
        if p.electromagnetic:
            vec = se.deinterleave(vec)
        return omega, vec, n_steps + extra, M
    vec = np.asarray(vr) + 1j * np.asarray(vi)
    if p.electromagnetic:
        vec = se.deinterleave(vec)
    return omega, vec, n_steps, M
