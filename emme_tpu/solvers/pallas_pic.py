"""Hand-fused Pallas TPU kernel for the PIC marker pass.

One kernel per RK3 stage fuses the entire marker sweep of the reference's
``put_velocity`` + ``update`` + ``solve_field`` chain
(``include/solver_pic.h:82-156, 249-354``): CIC field gather, J0/J1 FLR +
drift physics, RK weight/position update, and CIC charge deposition run in
ONE pass over VMEM-resident marker blocks with the field table and the
deposition accumulator living in VMEM for the whole sweep.

Why: the XLA path is emitter-bound on its one-hot CIC contractions -- XLA's
chosen dot emitter costs ~2.6 cycles/marker per gather/deposit regardless of
operand dtype (BENCH_PIC.md r4 roofline), 6 ops x 180 steps = the entire
2.66 s runtime.  Here the contractions are phrased for the MXU directly:

* gather: the cell index splits as idx = hi * 128 + lo; a 128-wide lo
  one-hot (one MXU lane tile, generated in-kernel from a broadcasted iota)
  contracts against the (G*8, 128) field-table stack, and the G = nf/128
  hi-groups resolve with VPU selects.  FLOP count identical to the
  full-width one-hot, but tiled as a dense (G*8,128)@(128,NB) matmul the
  MXU runs at rate.
* deposit: the transposed trick -- per sublane row, the masked channel
  values (2G, NB) contract against the lo one-hot (128, NB) over the
  MARKER (lane) axis (an "NT" dot, the QK^T pattern), accumulating the
  (2G, 128)-shaped group grid in VMEM across the whole grid sweep.  No
  scatter: TPU has none worth using (measured 10x slower, BENCH_PIC.md).

Marker arrays are viewed (8, m/8) -- full VPU sublane occupancy for the
elementwise physics -- and blocked along lanes over a 1-D grid.

Numerical notes: the one-hot is EXACT in any dtype; dot precision is
selectable ("default" = single bf16 pass: field/charge values rounded to
~3 digits, well under the delta-f Monte-Carlo noise and equivalent to the
round-4 validated "bf16" CIC option; "highest" = true f32 at ~1/6 MXU
rate).  j0 / the drift-center pull-back are RECOMPUTED from (eta, v_perp)
each phase instead of stored -- identical values to the reference's
stored-at-solve_field ones (same formula, same inputs) minus the HBM round
trips; the reference's j0-zero-init quirk (solver_pic.h:34-47: the very
first put_velocity sees j0 == 0) is preserved via the ``first`` variant.

Validated against the XLA path in tests/test_pallas_pic.py (interpret mode
on CPU, statistical gamma/omega on TPU).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.bessel import bessel_j0, bessel_j1
from .pic import (RK_COEF, PICState, cell_width, quasi_neutrality_coef,
                  init_state, field_stats)
from ..ops.pallas_kappa import interpret_default

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}

# params vector layout (SMEM (1, 16) f32)
_P_L, _P_CW, _P_VT, _P_BT, _P_SHAT, _P_ODB, _P_QR, _P_SUBDT, _P_I2CW = range(9)


def _stats_from_planes(fr, fi):
    """field_stats on (G, 128) real planes (main.cpp:111-118)."""
    re = fr.reshape(-1)
    im = fi.reshape(-1)
    return jnp.stack([re.mean(), im.mean(),
                      jnp.sqrt((re * re + im * im).mean())])


def _gather_table(fr, fi, G):
    """Build the 8-channel gather table stack (G*8, 128) from the (G, 128)
    field planes.  The layout is row-major over cells, so cell c+1 is
    lane+1 with a wrap onto the next row's lane 0."""
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)

    def shift_p1(a):
        # pltpu.roll takes non-negative shifts: -1 == size-1
        nxt = pltpu.roll(a, G - 1, 0)
        return jnp.where(lane2 == 127, nxt[:, 0:1],
                         pltpu.roll(a, 127, 1))

    def shift_m1(a):
        prv = pltpu.roll(a, 1, 0)
        return jnp.where(lane2 == 0, prv[:, 127:128],
                         pltpu.roll(a, 1, 1))

    fpr, fpi = shift_p1(fr), shift_p1(fi)
    gr_, gi_ = fpr - shift_m1(fr), fpi - shift_m1(fi)
    gpr, gpi = shift_p1(gr_), shift_p1(gi_)
    return jnp.stack([fr, fi, fpr, fpi, gr_, gi_, gpr, gpi],
                     axis=1).reshape(G * 8, 128)


def _gather_channels(ts, hi, lo, G, NB, prec):
    """CIC gather of the 8 table channels at (hi, lo) cell indices:
    the 128-wide lo one-hot contracts on the MXU, hi-groups resolve with
    VPU selects.  Returns 8 (8, NB) channel arrays."""
    rows = [[] for _ in range(8)]                    # 8 channels
    for s in range(8):
        lo_s = lo[s:s + 1, :]                        # (1, NB)
        hi_s = hi[s:s + 1, :]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (128, NB), 0)
        oh = jnp.where(lanes == lo_s, 1.0, 0.0).astype(jnp.float32)
        A = jax.lax.dot_general(                     # (G*8, NB)
            ts, oh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        rowid = jax.lax.broadcasted_iota(jnp.int32, (G * 8, NB), 0)
        grp = jax.lax.shift_right_logical(rowid, jnp.int32(3))  # row // 8
        B = jnp.where(grp == hi_s, A, 0.0)
        Gs = jnp.sum(B.reshape(G, 8, NB), axis=0)    # (8ch, NB)
        for c in range(8):
            rows[c].append(Gs[c:c + 1, :])
    return [jnp.concatenate(r, axis=0) for r in rows]  # 8 x (8, NB)


def _deposit_acc(denr, deni, w2l, w2, hi2, lo2, hir, lor, G, NB, prec):
    """CIC deposition of (denr, deni) at the left/right CIC nodes via the
    transposed "NT" dot; returns the (4G, 128) partial accumulation."""
    acc = jnp.zeros((4 * G, 128), jnp.float32)
    for s in range(8):
        parts = []
        for node, (hh, ll, wt) in enumerate(
                ((hi2, lo2, w2l), (hir, lor, w2))):
            vr = (denr * wt)[s:s + 1, :]
            vi = (deni * wt)[s:s + 1, :]
            hs = hh[s:s + 1, :]
            rows_v = [jnp.where(hs == h, vr, 0.0) for h in range(G)] \
                + [jnp.where(hs == h, vi, 0.0) for h in range(G)]
            V = jnp.concatenate(rows_v, axis=0)      # (2G, NB)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (128, NB), 0)
            oh = jnp.where(lanes == ll[s:s + 1, :], 1.0, 0.0) \
                .astype(jnp.float32)
            Y = jax.lax.dot_general(                 # (2G, 128)
                V, oh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            parts.append(Y)
        acc = acc + jnp.concatenate(parts, axis=0)
    return acc


def _stage_kernel(stage: int, first: bool, dc: bool, G: int, nf: int,
                  NB: int, prec):
    """Kernel body for RK stage ``stage``.  Static: stage index (selects the
    tableau coefficients and whether a previous-stage velocity rides in),
    ``first`` (reference j0-zero-init quirk), ``dc`` (drift-center
    transformation branch), G = nf/128 hi-groups, NB = lane block."""
    has_prev = stage == 2
    c_prev = float(RK_COEF[2][1])
    c_cur = float(RK_COEF[stage][stage] if stage != 2 else RK_COEF[2][2])
    # stage 0: combo = 1.0 v0 ; stage 1: combo = 1.0 v1 ;
    # stage 2: combo = 1.5220.. v1 - 0.5220.. v2   (solver_pic.h:466-470)

    def kernel(params, fr_ref, fi_ref, qn_ref, eta_ref, vpar_ref,
               vperp_ref, wre_ref, wim_ref, odv_ref, ost_ref, pw_ref,
               *rest):
        if has_prev:
            vpre_ref, vpim_ref = rest[0], rest[1]
            rest = rest[2:]
        velre_o, velim_o, eta_o, wre_o, wim_o, y_ref, fro, fio = rest

        L = params[0, _P_L]
        cw = params[0, _P_CW]
        vt = params[0, _P_VT]
        bt = params[0, _P_BT]
        shat = params[0, _P_SHAT]
        odb = params[0, _P_ODB]
        qR = params[0, _P_QR]
        sub_dt = params[0, _P_SUBDT]
        i2cw = params[0, _P_I2CW]

        eta = eta_ref[:]
        vpar = vpar_ref[:]
        vperp = vperp_ref[:]
        odv = odv_ref[:]

        # ---- locate at current eta (solver_pic.h:96-104) ----
        x = (eta + L) / cw
        idxf = jnp.floor(x)
        wgt = x - idxf
        idx = jnp.clip(idxf.astype(jnp.int32), 0, nf - 1)
        hi = jax.lax.shift_right_logical(idx, jnp.int32(7))
        lo = jnp.bitwise_and(idx, jnp.int32(127))

        # ---- gather table, built IN-KERNEL from the field planes ----
        # (kills the per-stage XLA table-build fragments)
        ts = _gather_table(fr_ref[:], fi_ref[:], G)
        f0r, f0i, f1r, f1i, g0r, g0i, g1r, g1i = \
            _gather_channels(ts, hi, lo, G, NB, prec)

        wl = 1.0 - wgt
        phir = wl * f0r + wgt * f1r
        phii = wl * f0i + wgt * f1i
        dphir = (wl * g0r + wgt * g1r) * i2cw
        dphii = (wl * g0i + wgt * g1i) * i2cw

        # ---- marker physics (solver_pic.h:82-140) ----
        x_perp = vperp / vt
        sb = jnp.sqrt(bt * (1.0 + (shat * eta) ** 2))
        dj0 = -bt * (shat * shat) * x_perp * eta * bessel_j1(x_perp * sb) / sb
        omega_d = odb * (jnp.cos(eta) + shat * eta * jnp.sin(eta))
        if first:
            j0 = jnp.zeros_like(eta)
            dcr = jnp.zeros_like(eta)
            dci = jnp.zeros_like(eta)
        else:
            j0 = bessel_j0(x_perp * sb)
            odi = (qR / vpar) * odb * (jnp.sin(eta) * (1.0 + shat)
                                       - shat * eta * jnp.cos(eta))
            ph = odi * odv
            dcr = jnp.cos(ph)
            dci = -jnp.sin(ph)

        a = ost_ref[:] - omega_d * odv
        vq = vpar / qR
        comr = -a * j0 * phii - vq * (j0 * dphir + dj0 * phir)
        comi = a * j0 * phir - vq * (j0 * dphii + dj0 * phii)
        pw = pw_ref[:]
        if dc:
            velr = pw * (dcr * comr + dci * comi)
            veli = pw * (dcr * comi - dci * comr)
        else:
            b = omega_d * odv
            velr = wim_ref[:] * b + pw * comr
            veli = -wre_ref[:] * b + pw * comi
        velre_o[:] = velr
        velim_o[:] = veli

        # ---- RK combo + update (solver_pic.h:142-151, 425-435) ----
        if has_prev:
            combor = c_prev * vpre_ref[:] + c_cur * velr
            comboi = c_prev * vpim_ref[:] + c_cur * veli
        else:
            combor = c_cur * velr
            comboi = c_cur * veli
        eta_n = eta + vpar * (sub_dt / qR)
        m = eta_n + L
        eta_n = m - 2.0 * L * jnp.floor(m / (2.0 * L)) - L
        wre_n = wre_ref[:] + combor * sub_dt
        wim_n = wim_ref[:] + comboi * sub_dt
        eta_o[:] = eta_n
        wre_o[:] = wre_n
        wim_o[:] = wim_n

        # ---- deposition at eta_n (solver_pic.h:249-354) ----
        x2 = (eta_n + L) / cw
        i2f = jnp.floor(x2)
        w2 = x2 - i2f
        idx2 = jnp.clip(i2f.astype(jnp.int32), 0, nf - 1)
        idxr = idx2 + 1
        idxr = jnp.where(idxr >= nf, 0, idxr)
        hi2 = jax.lax.shift_right_logical(idx2, jnp.int32(7))
        lo2 = jnp.bitwise_and(idx2, jnp.int32(127))
        hir = jax.lax.shift_right_logical(idxr, jnp.int32(7))
        lor = jnp.bitwise_and(idxr, jnp.int32(127))

        sbn = jnp.sqrt(bt * (1.0 + (shat * eta_n) ** 2))
        j0n = bessel_j0(x_perp * sbn)
        if dc:
            odin = (qR / vpar) * odb * (jnp.sin(eta_n) * (1.0 + shat)
                                        - shat * eta_n * jnp.cos(eta_n))
            phn = odin * odv
            dnr = jnp.cos(phn)
            dni = -jnp.sin(phn)
            denr = j0n * (wre_n * dnr - wim_n * dni)
            deni = j0n * (wre_n * dni + wim_n * dnr)
        else:
            denr = j0n * wre_n
            deni = j0n * wim_n

        w2l = 1.0 - w2
        acc = _deposit_acc(denr, deni, w2l, w2, hi2, lo2, hir, lor,
                           G, NB, prec)

        @pl.when(pl.program_id(0) == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
        y_ref[:] += acc

        # ---- quasi-neutrality field solve, IN-KERNEL ----
        # y_ref is complete only at the LAST program; every program writes
        # the field planes and the sequential grid makes the last write the
        # complete one (solver_pic.h:350-353)
        y = y_ref[:]
        fro[:] = (y[0:G] + y[2 * G:3 * G]) * qn_ref[:]
        fio[:] = (y[G:2 * G] + y[3 * G:4 * G]) * qn_ref[:]

    return kernel


def _stage_call(stage: int, first: bool, dc: bool, G: int, nf: int, NB: int,
                n_blocks: int, precision: str, interpret: bool):
    prec = _PRECISIONS[precision]
    kernel = _stage_kernel(stage, first, dc, G, nf, NB, prec)
    has_prev = stage == 2
    n_in = 8 + (2 if has_prev else 0)

    blk = lambda i: (0, i)
    marker_spec = pl.BlockSpec((8, NB), blk, memory_space=pltpu.VMEM)
    grid_spec = lambda rows: pl.BlockSpec((rows, 128), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM)
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [grid_spec(G)] * 3                      # field planes + qn
        + [marker_spec] * n_in)
    out_specs = (
        [marker_spec] * 5
        + [grid_spec(4 * G), grid_spec(G), grid_spec(G)])
    NM = NB * n_blocks
    out_shape = ([jax.ShapeDtypeStruct((8, NM), jnp.float32)] * 5
                 + [jax.ShapeDtypeStruct((4 * G, 128), jnp.float32)]
                 + [jax.ShapeDtypeStruct((G, 128), jnp.float32)] * 2)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


class _FusedStep:
    """Per-(p-static, shapes) compiled fused RK3 step."""

    def __init__(self, p, m: int, dt, precision: str = "default",
                 interpret: bool | None = None, min_blocks: int = 1):
        nf = int(p.npoints)
        if nf % 128:
            raise ValueError(f"fused PIC needs npoints % 128 == 0, got {nf}")
        if m % 8 or (m // 8) % 128:
            raise ValueError(f"fused PIC needs markers % 1024 == 0, got {m}")
        self.nf = nf
        self.G = nf // 128
        NM = m // 8
        NB = NM
        # largest lane block; with min_blocks > 1 (the single-launch path's
        # alias-carry precondition) prefer the largest block that still
        # yields that many grid blocks, falling back to the unconstrained
        # search if NM is too small to split
        for mb in dict.fromkeys((min_blocks, 1)):
            got = next((c for c in (8192, 4096, 2048, 1024, 512, 256, 128)
                        if NM % c == 0 and NM // c >= mb), None)
            if got is not None:
                NB = got
                break
        self.NB = NB
        self.n_blocks = NM // NB
        self.dc = bool(p.drift_center_transformation_switch)
        self.precision = precision
        self.interpret = interpret_default() if interpret is None \
            else interpret
        self._calls = {}

    def _call(self, stage: int, first: bool):
        key = (stage, first)
        if key not in self._calls:
            self._calls[key] = _stage_call(
                stage, first, self.dc, self.G, self.nf, self.NB,
                self.n_blocks, self.precision, self.interpret)
        return self._calls[key]

    def params_vec(self, p, dt):
        cw = cell_width(p)
        vals = jnp.zeros((1, 16), jnp.float32)
        sets = {_P_L: p.length, _P_CW: cw, _P_VT: p.vt, _P_BT: p.b_theta,
                _P_SHAT: p.shat, _P_ODB: p.omega_d_bar, _P_QR: p.q * p.R,
                _P_I2CW: 1.0 / (2.0 * cw)}
        for k, v in sets.items():
            vals = vals.at[0, k].set(jnp.asarray(v, jnp.float32))
        return vals, jnp.asarray(dt, jnp.float32)

    def step(self, p, arrs, field, qn2d, dt, first: bool = False):
        """One RK3 step on the (8, m/8)-viewed marker arrays.

        ``arrs``: dict with eta, v_para, v_perp, w_re, w_im, odv, ost, pw.
        ``field``: (fr, fi) planes shaped (G, 128); ``qn2d``: the
        quasi-neutrality coefficient reshaped (G, 128).  The step is
        EXACTLY three pallas_calls -- the gather table and the field solve
        live inside the kernel.  Returns (new arrs, new field planes)."""
        base, dtf = self.params_vec(p, dt)
        fr, fi = field
        vel_prev = None
        for stage in range(3):
            sub_dt = float(RK_COEF[stage][stage + 1]) * dtf
            params = base.at[0, _P_SUBDT].set(sub_dt)
            ins = [params, fr, fi, qn2d, arrs["eta"], arrs["v_para"],
                   arrs["v_perp"], arrs["w_re"], arrs["w_im"], arrs["odv"],
                   arrs["ost"], arrs["pw"]]
            if stage == 2:
                ins += [vel_prev[0], vel_prev[1]]
            call = self._call(stage, first and stage == 0)
            velr, veli, eta_n, wre_n, wim_n, _Y, fr, fi = call(*ins)
            if stage == 1:
                vel_prev = (velr, veli)
            arrs = dict(arrs, eta=eta_n, w_re=wre_n, w_im=wim_n)
        return arrs, (fr, fi)


def state_to_arrs(s: PICState):
    m = s.eta.shape[0]
    v = lambda a: a.reshape(8, m // 8)
    return {"eta": v(s.eta), "v_para": v(s.v_para), "v_perp": v(s.v_perp),
            "w_re": v(jnp.real(s.weight)), "w_im": v(jnp.imag(s.weight)),
            "odv": v(s.omega_dv), "ost": v(s.omega_st),
            "pw": v(s.p_weight)}


def arrs_to_state(p, arrs, field) -> PICState:
    """Back to PICState; j0 / dc_pb refreshed the way solve_field leaves
    them (recomputed at the current eta)."""
    f = lambda a: a.reshape(-1)
    eta = f(arrs["eta"])
    v_perp = f(arrs["v_perp"])
    v_para = f(arrs["v_para"])
    odv = f(arrs["odv"])
    x_perp = v_perp / p.vt
    sb = jnp.sqrt(p.b_theta * (1.0 + (p.shat * eta) ** 2))
    j0 = bessel_j0(x_perp * sb)
    odi = ((p.q * p.R / v_para) * p.omega_d_bar
           * (jnp.sin(eta) * (1.0 + p.shat) - p.shat * eta * jnp.cos(eta)))
    dc_pb = jnp.exp(-1j * odi * odv)
    return PICState(
        eta=eta, v_para=v_para, v_perp=v_perp,
        weight=f(arrs["w_re"]) + 1j * f(arrs["w_im"]),
        omega_dv=odv, omega_st=f(arrs["ost"]), p_weight=f(arrs["pw"]),
        j0=j0, dc_pb=dc_pb, field=field)


def _mega_kernel(dc: bool, G: int, nf: int, NB: int, n_blocks: int, prec):
    """Single-launch kernel body: the WHOLE PIC run as one pallas_call with
    grid (n_steps, 3, n_blocks).  Marker state (eta, weight, stage
    velocity) carries between grid steps through the aliased in/out HBM
    buffers (input_output_aliases): the block written at (stage, i) is
    re-fetched at (stage+1, i) n_blocks grid steps later, after its output
    flush has completed (validated for n_blocks >= 3 on hardware by
    benchmarks/validate_mega_pic.py and guarded at runtime by
    ``_alias_carry_selfcheck``; the caller enforces >= _MIN_MEGA_BLOCKS).
    The field double-buffers in VMEM
    scratch: the stage at linear index t = 3*step + stage reads plane
    buffer t%2 (the one the previous stage completed) and writes (t+1)%2
    progressively, last block's write being the complete field
    (solver_pic.h:350-353).  Per-step field stats (main.cpp:111-118) are
    computed in-kernel at the last program of each step's stage 2."""

    def kernel(consts, stab, fr_in, fi_in, qn_ref,
               eta_ref, vpar_ref, vperp_ref, wre_ref, wim_ref,
               odv_ref, ost_ref, pw_ref, velre_ref, velim_ref,
               eta_o, wre_o, wim_o, velre_o, velim_o, fro, fio, stats_ref,
               fa_r, fa_i, fb_r, fb_i, y_ref):
        step = pl.program_id(0)
        stage = pl.program_id(1)
        i = pl.program_id(2)
        t = step * 3 + stage
        even = jax.lax.rem(t, jnp.int32(2)) == 0
        first = (t == 0)          # reference j0-zero-init (solver_pic.h:34-47)

        L = consts[0, _P_L]
        cw = consts[0, _P_CW]
        vt = consts[0, _P_VT]
        bt = consts[0, _P_BT]
        shat = consts[0, _P_SHAT]
        odb = consts[0, _P_ODB]
        qR = consts[0, _P_QR]
        i2cw = consts[0, _P_I2CW]
        sub_dt = stab[stage, 0]
        c_prev = stab[stage, 1]   # 0, 0, RK_COEF[2][1]
        c_cur = stab[stage, 2]    # 1, 1, RK_COEF[2][2]

        eta = eta_ref[:]
        vpar = vpar_ref[:]
        vperp = vperp_ref[:]
        odv = odv_ref[:]

        # ---- locate at current eta (solver_pic.h:96-104) ----
        x = (eta + L) / cw
        idxf = jnp.floor(x)
        wgt = x - idxf
        idx = jnp.clip(idxf.astype(jnp.int32), 0, nf - 1)
        hi = jax.lax.shift_right_logical(idx, jnp.int32(7))
        lo = jnp.bitwise_and(idx, jnp.int32(127))

        # ---- field select: t == 0 reads the initial planes; afterwards
        # the buffer the previous stage completed ----
        fr = jnp.where(first, fr_in[:], jnp.where(even, fa_r[:], fb_r[:]))
        fi = jnp.where(first, fi_in[:], jnp.where(even, fa_i[:], fb_i[:]))
        ts = _gather_table(fr, fi, G)
        f0r, f0i, f1r, f1i, g0r, g0i, g1r, g1i = \
            _gather_channels(ts, hi, lo, G, NB, prec)

        wl = 1.0 - wgt
        phir = wl * f0r + wgt * f1r
        phii = wl * f0i + wgt * f1i
        dphir = (wl * g0r + wgt * g1r) * i2cw
        dphii = (wl * g0i + wgt * g1i) * i2cw

        # ---- marker physics (solver_pic.h:82-140); the first-stage
        # j0 == 0 quirk is a traced select here ----
        x_perp = vperp / vt
        sb = jnp.sqrt(bt * (1.0 + (shat * eta) ** 2))
        dj0 = -bt * (shat * shat) * x_perp * eta * bessel_j1(x_perp * sb) / sb
        omega_d = odb * (jnp.cos(eta) + shat * eta * jnp.sin(eta))
        j0 = jnp.where(first, 0.0, bessel_j0(x_perp * sb))
        if dc:
            odi = (qR / vpar) * odb * (jnp.sin(eta) * (1.0 + shat)
                                       - shat * eta * jnp.cos(eta))
            ph = odi * odv
            dcr = jnp.where(first, 0.0, jnp.cos(ph))
            dci = jnp.where(first, 0.0, -jnp.sin(ph))

        a = ost_ref[:] - omega_d * odv
        vq = vpar / qR
        comr = -a * j0 * phii - vq * (j0 * dphir + dj0 * phir)
        comi = a * j0 * phir - vq * (j0 * dphii + dj0 * phii)
        pw = pw_ref[:]
        if dc:
            velr = pw * (dcr * comr + dci * comi)
            veli = pw * (dcr * comi - dci * comr)
        else:
            b = omega_d * odv
            velr = wim_ref[:] * b + pw * comr
            veli = -wre_ref[:] * b + pw * comi

        # ---- RK combo + update; vel carry read BEFORE the overwrite.
        # c_prev == 0 except stage 2, where velre_ref holds stage 1's
        # velocity for this block (solver_pic.h:142-151, 425-435) ----
        combor = c_prev * velre_ref[:] + c_cur * velr
        comboi = c_prev * velim_ref[:] + c_cur * veli
        velre_o[:] = velr
        velim_o[:] = veli
        eta_n = eta + vpar * (sub_dt / qR)
        m = eta_n + L
        eta_n = m - 2.0 * L * jnp.floor(m / (2.0 * L)) - L
        wre_n = wre_ref[:] + combor * sub_dt
        wim_n = wim_ref[:] + comboi * sub_dt
        eta_o[:] = eta_n
        wre_o[:] = wre_n
        wim_o[:] = wim_n

        # ---- deposition at eta_n (solver_pic.h:249-354) ----
        x2 = (eta_n + L) / cw
        i2f = jnp.floor(x2)
        w2 = x2 - i2f
        idx2 = jnp.clip(i2f.astype(jnp.int32), 0, nf - 1)
        idxr = idx2 + 1
        idxr = jnp.where(idxr >= nf, 0, idxr)
        hi2 = jax.lax.shift_right_logical(idx2, jnp.int32(7))
        lo2 = jnp.bitwise_and(idx2, jnp.int32(127))
        hir = jax.lax.shift_right_logical(idxr, jnp.int32(7))
        lor = jnp.bitwise_and(idxr, jnp.int32(127))

        sbn = jnp.sqrt(bt * (1.0 + (shat * eta_n) ** 2))
        j0n = bessel_j0(x_perp * sbn)
        if dc:
            odin = (qR / vpar) * odb * (jnp.sin(eta_n) * (1.0 + shat)
                                        - shat * eta_n * jnp.cos(eta_n))
            phn = odin * odv
            dnr = jnp.cos(phn)
            dni = -jnp.sin(phn)
            denr = j0n * (wre_n * dnr - wim_n * dni)
            deni = j0n * (wre_n * dni + wim_n * dnr)
        else:
            denr = j0n * wre_n
            deni = j0n * wim_n

        acc = _deposit_acc(denr, deni, 1.0 - w2, w2, hi2, lo2, hir, lor,
                           G, NB, prec)

        @pl.when(i == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
        y_ref[:] += acc

        # ---- quasi-neutrality field solve, written to the NEXT buffer;
        # only the last block's write (complete y) is ever read ----
        y = y_ref[:]
        qn = qn_ref[:]
        nfr = (y[0:G] + y[2 * G:3 * G]) * qn
        nfi = (y[G:2 * G] + y[3 * G:4 * G]) * qn

        @pl.when(even)
        def _():
            fb_r[:] = nfr
            fb_i[:] = nfi

        @pl.when(jnp.logical_not(even))
        def _():
            fa_r[:] = nfr
            fa_i[:] = nfi

        fro[:] = nfr
        fio[:] = nfi

        # ---- per-step stats at the end of stage 2 (main.cpp:111-118) ----
        @pl.when((stage == 2) & (i == n_blocks - 1))
        def _():
            inv = 1.0 / float(nf)
            re_m = jnp.sum(nfr) * inv
            im_m = jnp.sum(nfi) * inv
            nrm = jnp.sqrt(jnp.sum(nfr * nfr + nfi * nfi) * inv)
            stats_ref[pl.ds(step, 1), :] = \
                jnp.stack([re_m, im_m, nrm]).reshape(1, 3)

    return kernel


_MIN_MEGA_BLOCKS = 4   # alias-carry needs the output flush to clear the
                       # pipeline before the re-fetch (probe: >= 3 is safe)

_ALIAS_CARRY_OK: bool | None = None


def alias_carry_probe(S: int = 4, nblk: int = _MIN_MEGA_BLOCKS,
                      NB: int = 128):
    """Probe whether the runtime gives sequential semantics to aliased
    in/out blocks revisited across grid steps: every program doubles its
    block, so after S stages the output is x * 2**S iff the (s, i) write
    is visible to the (s+1, i) re-fetch.  Returns (ok, unique_values).
    Shared by the runtime self-check and benchmarks/validate_mega_pic.py
    so the load-bearing probe cannot drift between them."""
    import numpy as np

    def kernel(x_ref, y_ref):
        y_ref[:] = x_ref[:] * 2.0

    f = pl.pallas_call(
        kernel, grid=(S, nblk),
        in_specs=[pl.BlockSpec((8, NB), lambda s, i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, NB), lambda s, i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, nblk * NB), jnp.float32),
        input_output_aliases={0: 0})
    y = jax.jit(f)(jnp.ones((8, nblk * NB), jnp.float32))
    vals = np.unique(np.asarray(y))
    return vals.tolist() == [2.0 ** S], vals


def _alias_carry_selfcheck() -> bool:
    """One-time probe that the runtime still gives sequential semantics to
    aliased in/out blocks revisited across grid steps -- the behavior the
    mega kernel is built on (empirical, not a documented contract; see
    benchmarks/validate_mega_pic.py).  A silent regression here would
    corrupt the physics, so the first mega run per process pays one tiny
    (persistently cached) compile to turn that into a loud signal."""
    global _ALIAS_CARRY_OK
    if _ALIAS_CARRY_OK is None:
        _ALIAS_CARRY_OK = alias_carry_probe()[0]
    return _ALIAS_CARRY_OK


def _mega_call(dc: bool, G: int, nf: int, NB: int, n_blocks: int,
               n_steps: int, precision: str):
    prec = _PRECISIONS[precision]
    kernel = _mega_kernel(dc, G, nf, NB, n_blocks, prec)
    NM = NB * n_blocks

    blk = lambda s, st, i: (0, i)
    marker_spec = pl.BlockSpec((8, NB), blk, memory_space=pltpu.VMEM)
    plane = lambda rows: pl.BlockSpec((rows, 128), lambda s, st, i: (0, 0),
                                      memory_space=pltpu.VMEM)
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2   # consts, stage table
        + [plane(G)] * 3                              # fr_in, fi_in, qn
        + [marker_spec] * 10)                         # markers + vel carry
    out_specs = (
        [marker_spec] * 5                             # eta, wre, wim, vel
        + [plane(G)] * 2                              # final field planes
        + [pl.BlockSpec((n_steps, 3), lambda s, st, i: (0, 0),
                        memory_space=pltpu.VMEM)])    # per-step stats
    out_shape = ([jax.ShapeDtypeStruct((8, NM), jnp.float32)] * 5
                 + [jax.ShapeDtypeStruct((G, 128), jnp.float32)] * 2
                 + [jax.ShapeDtypeStruct((n_steps, 3), jnp.float32)])
    return pl.pallas_call(
        kernel,
        grid=(n_steps, 3, n_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        # carry: eta, w_re, w_im, vel_re, vel_im flow through the aliased
        # HBM buffers (inputs 5, 8, 9, 13, 14 -> outputs 0..4)
        input_output_aliases={5: 0, 8: 1, 9: 2, 13: 3, 14: 4},
        scratch_shapes=[pltpu.VMEM((G, 128), jnp.float32)] * 4
        + [pltpu.VMEM((4 * G, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


_RUN_JIT_CACHE: dict = {}


def _run_fns(fs: "_FusedStep", marker_per_cell: int, n_steps: int):
    """Module-level cache of the jitted prepare/first-step/scan/finish
    functions: repeated ``run`` calls (benchmark repeats, parameter scans)
    must reuse the compiled executables -- a fresh ``@jax.jit`` per call
    recompiles the 180-step scan every time (~26 s through the remote AOT
    helper, the round-5 first-cut mistake)."""
    key = (fs.nf, fs.NB, fs.n_blocks, fs.dc, fs.precision, fs.interpret,
           marker_per_cell, n_steps)
    if key not in _RUN_JIT_CACHE:
        G = fs.G

        @jax.jit
        def prepare(p, key):
            s0 = init_state(p, marker_per_cell, key, dtype=jnp.float32)
            qn = quasi_neutrality_coef(p, dtype=jnp.float32)
            field = (jnp.real(s0.field).reshape(G, 128),
                     jnp.imag(s0.field).reshape(G, 128))
            return state_to_arrs(s0), field, qn.reshape(G, 128)

        @jax.jit
        def first_step(p, arrs, field, qn, dt):
            arrs, field = fs.step(p, arrs, field, qn, dt, first=True)
            return arrs, field, _stats_from_planes(*field)

        @jax.jit
        def rest(p, arrs, field, qn, dt):
            def body(carry, _):
                arrs, field = carry
                arrs, field = fs.step(p, arrs, field, qn, dt, first=False)
                return (arrs, field), _stats_from_planes(*field)

            (arrs, field), stats = jax.lax.scan(
                body, (arrs, field), None, length=n_steps - 1)
            return arrs, field, stats

        finish = jax.jit(lambda p, a, f: arrs_to_state(
            p, a, (f[0] + 1j * f[1]).reshape(-1)))
        _RUN_JIT_CACHE[key] = (prepare, first_step, rest, finish)
    return _RUN_JIT_CACHE[key]


def _mega_run_fns(fs: "_FusedStep", marker_per_cell: int, n_steps: int):
    """Jitted prepare / single-launch run / finish for the mega kernel."""
    key = ("mega", fs.nf, fs.NB, fs.n_blocks, fs.dc, fs.precision,
           marker_per_cell, n_steps)
    if key not in _RUN_JIT_CACHE:
        G = fs.G
        call = _mega_call(fs.dc, G, fs.nf, fs.NB, fs.n_blocks, n_steps,
                          fs.precision)

        @jax.jit
        def prepare(p, key):
            s0 = init_state(p, marker_per_cell, key, dtype=jnp.float32)
            qn = quasi_neutrality_coef(p, dtype=jnp.float32)
            field = (jnp.real(s0.field).reshape(G, 128),
                     jnp.imag(s0.field).reshape(G, 128))
            return state_to_arrs(s0), field, qn.reshape(G, 128)

        @jax.jit
        def whole_run(p, arrs, field, qn, dt):
            base, dtf = fs.params_vec(p, dt)
            stab = jnp.array(
                [[float(RK_COEF[0][1]), 0.0, float(RK_COEF[0][0])],
                 [float(RK_COEF[1][2]), 0.0, float(RK_COEF[1][1])],
                 [float(RK_COEF[2][3]), float(RK_COEF[2][1]),
                  float(RK_COEF[2][2])]], jnp.float32)
            stab = stab.at[:, 0].mul(dtf)     # sub_dt per stage
            # the vel-carry init values are only ever multiplied by
            # c_prev == 0 before stage 1 overwrites them, so any finite
            # values work -- make the two DISTINGUISHABLE (zeros vs ones)
            # so no CSE/buffer-sharing can ever collapse the two aliased
            # operands onto one buffer (which would clobber the re/im
            # velocity carry)
            vz_re = jnp.zeros_like(arrs["eta"])
            vz_im = jnp.ones_like(arrs["eta"])
            eta, wre, wim, _vr, _vi, fr, fi, stats = call(
                base, stab, field[0], field[1], qn,
                arrs["eta"], arrs["v_para"], arrs["v_perp"],
                arrs["w_re"], arrs["w_im"], arrs["odv"], arrs["ost"],
                arrs["pw"], vz_re, vz_im)
            return dict(arrs, eta=eta, w_re=wre, w_im=wim), (fr, fi), stats

        finish = jax.jit(lambda p, a, f: arrs_to_state(
            p, a, (f[0] + 1j * f[1]).reshape(-1)))
        _RUN_JIT_CACHE[key] = (prepare, whole_run, finish)
    return _RUN_JIT_CACHE[key]


def run(p, marker_per_cell: int, n_steps: int, dt, key=None,
        precision: str = "default", interpret: bool | None = None,
        launch: str = "auto"):
    """Full PIC run on the fused Pallas path.  Same contract as ``pic.run``
    (stats (n_steps, 3), final state, None); the reference trajectory is the
    XLA path (``pic.run``) -- equivalence validated in
    tests/test_pallas_pic.py.

    ``launch``: "single" runs the ENTIRE time loop as one pallas_call
    (grid (n_steps, 3, n_blocks); per-launch overhead amortized away);
    "stages" launches one kernel per RK stage under lax.scan; "auto"
    (default) picks "single" whenever its alias-carry preconditions hold
    (compiled mode, n_blocks >= 4 -- see _mega_kernel)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    dtype = jnp.asarray(p.length).dtype
    if dtype != jnp.float32:
        raise ValueError("fused PIC is f32-only (Pallas TPU kernel)")
    if launch not in ("auto", "single", "stages"):
        raise ValueError(f"launch must be auto|single|stages, got {launch}")
    m = marker_per_cell * p.npoints
    interp = interpret_default() if interpret is None else interpret
    want_mega = launch in ("auto", "single") and not interp
    fs = _FusedStep(p, m, dt, precision=precision, interpret=interp,
                    min_blocks=_MIN_MEGA_BLOCKS if want_mega else 1)

    # interpret mode executes grid steps against the ORIGINAL input
    # buffers (no alias carry), so the mega kernel is compiled-only
    mega_ok = (not fs.interpret) and fs.n_blocks >= _MIN_MEGA_BLOCKS \
        and n_steps >= 1
    if launch == "single" and not mega_ok:
        raise ValueError(
            "launch='single' needs compiled (non-interpret) mode and "
            f"markers/8/NB >= {_MIN_MEGA_BLOCKS} blocks "
            f"(got interpret={fs.interpret}, n_blocks={fs.n_blocks})")
    if mega_ok and not _alias_carry_selfcheck():
        if launch == "single":
            raise RuntimeError(
                "single-launch PIC disabled: this runtime no longer gives "
                "sequential semantics to aliased in/out blocks across grid "
                "steps (alias-carry probe failed; see "
                "benchmarks/validate_mega_pic.py)")
        mega_ok = False   # auto: quietly use the per-stage launches,
        # rebuilt without the mega block-count constraint (min_blocks
        # would otherwise shrink NB and quadruple the stage grid)
        fs = _FusedStep(p, m, dt, precision=precision, interpret=interp)

    dtf = jnp.asarray(dt, jnp.float32)
    if launch == "single" or (launch == "auto" and mega_ok):
        prepare, whole_run, finish = _mega_run_fns(fs, marker_per_cell,
                                                   n_steps)
        arrs, field, qn = prepare(p, key)
        arrs, field, stats = whole_run(p, arrs, field, qn, dtf)
        return stats, finish(p, arrs, field), None

    prepare, first_step, rest, finish = _run_fns(fs, marker_per_cell,
                                                 n_steps)
    arrs, field, qn = prepare(p, key)
    arrs, field, st0 = first_step(p, arrs, field, qn, dtf)
    arrs, field, sts = rest(p, arrs, field, qn, dtf)
    stats = jnp.concatenate([st0[None], sts], axis=0)
    state = finish(p, arrs, field)
    return stats, state, None
