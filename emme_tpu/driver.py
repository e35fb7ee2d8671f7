"""Parameter-scan driver: the framework's equivalent of the reference's
``main()`` (``src/main.cpp:182-338``).

Any top-level input value of the form ``{"head": h, "step": s, "tail": t}``
(or ``"tail": [t_l, t_r]``) declares a scan dimension (main.cpp:225-242).
The bidirectional scan generator walks head -> tail, then restarts toward the
other tail (main.cpp:139-172), carrying eigenvalue continuation: each point
seeds the next with its converged omega; on direction flip the omega re-seeds
from the first result; failures record ``{"eigenvalue": "NaN", "reason"}``
and the scan continues (main.cpp:262-324).

Additions over the reference: checkpoint/resume of completed scan points, a
selectable output directory, structured per-point timing, and a
device-parallel scan mode (``scan_workers > 1``) that fans scan points out
over the available devices -- by default in continuation-preserving
wavefront batches (see ``_run_scan_parallel``).
"""

from __future__ import annotations

import concurrent.futures
import itertools
import json
import math
import os
import pathlib
import threading

import numpy as np
import jax
import jax.numpy as jnp

from . import params as params_mod
from .solvers import eigen, pic, sparse_eigen
from .utils import provenance
from .utils.transfer import fetch
from .utils.timer import Timer, section


def _is_scan_spec(v) -> bool:
    return isinstance(v, dict) and "head" in v and "step" in v and "tail" in v


def scan_values(spec) -> tuple[list[float], list[bool]]:
    """Materialize the reference's bidirectional scan walk
    (main.cpp:139-172, 225-242).  Returns (values, turning_flags)."""
    head = float(spec["head"])
    step = float(spec["step"])
    tail = spec["tail"]
    if isinstance(tail, list):
        left_tail, right_tail = float(tail[0]), float(tail[1])
    else:
        left_tail = float(tail)
        right_tail = head + 0.5 * math.copysign(step, head - left_tail)

    values, turning = [], []

    def within(cur, cur_tail):
        # the reference's 0.01*|step| slack absorbs float error (main.cpp:151)
        return abs(cur - head) <= abs(cur_tail - head) + 0.01 * abs(step)

    cur, cur_tail = head, left_tail
    first = True
    flipped = False
    while True:
        if not first:
            cur += math.copysign(step, cur_tail - head)
        first = False
        if within(cur, cur_tail):
            values.append(cur)
            turning.append(False)
        else:
            if flipped:
                break
            flipped = True
            cur_tail = right_tail
            cur = head + math.copysign(step, cur_tail - head)
            if not within(cur, cur_tail):
                break
            values.append(cur)
            turning.append(True)
    return values, turning


def filter_input(cfg: dict) -> dict:
    """Replace scan specs by their head value (main.cpp:174-180)."""
    out = dict(cfg)
    for k, v in out.items():
        if _is_scan_spec(v):
            out[k] = v["head"]
    return out


def _typed_array(vec) -> list:
    """Complex vector -> [[re, im], ...] matching the reference's typed-array
    output extension (JsonParser.h:260-278)."""
    v = fetch(vec)
    return [[float(x.real), float(x.imag)] for x in v]


def solve_once_eigen(cfg: dict, omega_guess: complex, matrix_file=None,
                     dtype=jnp.float64, quad=None, chunk: int = 2048,
                     host64: bool = False, mesh=None) -> dict:
    """One eigen-method solve (main.cpp:19-80).  Returns the single-result
    object and the converged omega for continuation.

    ``mesh`` (a jax.sharding.Mesh with a ``rows`` axis, from the driver's
    mesh config): dense backend -> mesh-sharded assembly
    (parallel/sharded.solve); sparse backend -> the FULLY distributed
    SPIKE Newton solve (parallel/spike.solve: sharded assembly + per-shard
    banded LU + exact Woodbury trace)."""
    timer = Timer.get_timer()
    p = params_mod.from_config(cfg, dtype=dtype)
    tol = float(cfg.get("iteration_precision", 1e-6))

    backend = cfg.get("eigen_backend", "dense")
    method = cfg.get("iteration_method", "TraceSecant")
    stats: dict = {}
    M_dump = None
    with section("Iteration"):
        if backend == "sparse" and mesh is not None:
            # TraceSecant = the reference iteration; QRSecant routes to the
            # distributed bordered-Newton update (same mapping as the
            # single-device sparse backend -- the banded path has no dense
            # column-pivoted QR to mirror)
            from .parallel import spike
            omega, vec, n_steps, M_dump = spike.solve(
                p, omega_guess, mesh, tol=tol, quad=quad, chunk=chunk,
                host64=host64, method=method,
                band_deta=cfg.get("band_deta"),
                block=cfg.get("band_block"),
                tiered=cfg.get("quad_tiered"),
                fused=cfg.get("fused_assembly"),
                stats=stats)
        elif backend == "sparse":
            # block-banded end-to-end path: the dense operator never exists
            omega, vec, n_steps, state = sparse_eigen.solve(
                p, omega_guess, tol=tol, quad=quad, chunk=chunk,
                host64=host64,
                band_deta=cfg.get("band_deta"),
                block=cfg.get("band_block"),
                m_krylov=int(cfg.get("m_krylov", 0)),
                method=method,
                tiered=cfg.get("quad_tiered"),
                spmv=cfg.get("spmv_method"),
                fused=cfg.get("fused_assembly"),
                stats=stats)
            M_dump = state.M
        elif backend == "dense" and mesh is not None:
            if method != "TraceSecant":
                # QRSecant stays single-device on the dense backend: the
                # column-pivoted QR's greedy pivot sweep is a sequential
                # whole-matrix recursion (ops/linalg.qr_column_pivoted) with
                # no row-sharded formulation that preserves the reference
                # trajectory; use the sparse backend for distributed
                # non-trace iterations.  (Documented + tested error.)
                raise ValueError(
                    "mesh-sharded dense solve supports "
                    f"iteration_method='TraceSecant' only, got {method!r}; "
                    "QRSecant is single-device on the dense backend "
                    "(sequential pivoted-QR recursion) -- use "
                    "eigen_backend='sparse' for a distributed bordered "
                    "iteration")
            from .parallel import sharded
            omega, vec, n_steps, state = sharded.solve(
                p, omega_guess, mesh, tol=tol, quad=quad, chunk=chunk,
                host64=host64)
            M_dump = state.M
        elif backend == "dense":
            omega, vec, n_steps, state = eigen.solve(
                p, omega_guess, tol=tol, quad=quad, chunk=chunk,
                method=method, host64=host64,
                tiered=cfg.get("quad_tiered"),
                timed=bool(cfg.get("eigen_timers", False)),
                fused=cfg.get("fused_assembly"))
            M_dump = state.M
        else:
            raise ValueError(
                f"eigen_backend must be 'dense' or 'sparse', got {backend!r}")

    with section("Output"):
        if matrix_file is not None:
            if backend == "sparse":
                # banded dump: the BDIA planes (the dense matrix never
                # existed) + JSON sidecar; load_bdia_dump reads it back
                from .ops.sparse import save_bdia_dump
                save_bdia_dump(M_dump, matrix_file)
            else:
                fetch(M_dump).astype(np.complex128).tofile(matrix_file)

    # runtime quadrature-accuracy guard (VERDICT r1 item 6): check the
    # static panel mesh against the reference's own adaptive acceptance
    # criterion AT THE CONVERGED omega; warn -- or refine once on a denser
    # mesh -- when an off-golden regime under-resolves.
    guard_mode = cfg.get("quad_guard", "warn")
    guard_stats = None
    if guard_mode not in ("warn", "refine", "off"):
        raise ValueError(
            f"quad_guard must be 'warn', 'refine' or 'off', got {guard_mode!r}")
    if guard_mode != "off":
        from .grid import Grid
        from .ops import kernels
        grid = Grid.create(p.length, p.npoints, dtype=dtype)
        # guard with the SAME tier meshes assembly used (a tiered f32 run
        # evaluates far pairs on 2-4x coarser meshes; guarding only the base
        # mesh would miss their under-resolution) and, on the sparse
        # backend, only the kept band (pairs beyond it are never assembled)
        tiered = cfg.get("quad_tiered")
        if tiered is None:
            tiered = dtype == jnp.float32
        tiers = None
        if tiered:
            dxf = 2.0 * float(p.length) / (p.npoints - 1)
            tiers = kernels.tier_thresholds_ij(dxf, p.npoints)
        max_dij = None
        if backend == "sparse":
            # the sharded path picked its own (smaller) block; stats records
            # the one actually used
            block = stats.get("block") or cfg.get("band_block") or \
                sparse_eigen.pick_block(
                    2 * p.npoints if p.electromagnetic else p.npoints)
            h = stats.get("h") or sparse_eigen.band_halfwidth(
                p, grid, block,
                cfg.get("band_deta") or sparse_eigen.DEFAULT_BAND_DETA)
            max_dij = sparse_eigen.em_de_max(p.npoints, h, block) \
                if p.electromagnetic else (h + 1) * block - 1
        guard_stats = eigen.quadrature_guard(p, grid, omega, quad=quad,
                                             chunk=chunk, tiers=tiers,
                                             max_dij=max_dij)
        if guard_stats["frac_flagged"] > 0:
            import warnings
            msg = (f"quadrature guard: {guard_stats['frac_flagged']:.1%} of "
                   f"sampled kernel integrals fail the reference acceptance "
                   f"test at omega={omega:.6g} (max_abs_err="
                   f"{guard_stats['max_abs_err']:.3g})")
            if guard_mode == "refine":
                quad2 = eigen.refine_quad(quad, dtype)
                warnings.warn(msg + " -- re-solving on a 2x denser mesh")
                cfg2 = dict(cfg, quad_guard="off")
                res2, omega2 = solve_once_eigen(
                    cfg2, omega, matrix_file=matrix_file, dtype=dtype,
                    quad=quad2, chunk=chunk, host64=host64, mesh=mesh)
                res2["quadrature_guard"] = dict(guard_stats, refined=True)
                res2["eigenvalue_coarse_mesh"] = [omega.real, omega.imag]
                return res2, omega2
            warnings.warn(msg)

    result = {
        "eigenvalue": [omega.real, omega.imag],
        "eigenvector": _typed_array(vec),
        "iteration_steps": n_steps,
    }
    if guard_stats is not None:
        result["quadrature_guard"] = guard_stats
    if stats:
        result["sparse_stats"] = {
            k: (v if not isinstance(v, complex) else [v.real, v.imag])
            for k, v in stats.items()}
    return result, omega


def solve_once_pic(cfg: dict, omega_guess: complex, matrix_file=None,
                   dtype=jnp.float64, seed: int = 0, mesh=None, **_) -> dict:
    """One PIC-method solve (main.cpp:82-137).

    Config surface beyond the reference: ``pic_backend`` ('auto' | 'fused' |
    'xla': the hand-fused Pallas marker kernel -- default on TPU for
    f32 / npoints%128==0 runs -- vs the XLA chain), ``pic_precision``
    ('default' | 'high' | 'highest' MXU passes in the fused kernel),
    ``pic_launch`` ('auto' | 'single' | 'stages': the whole time loop as
    ONE pallas_call vs one call per RK stage; see solvers/pallas_pic.py),
    ``gather_method`` ('take' | 'matmul'), ``deposit_method`` ('segment' |
    'matmul'), ``pic_timers``
    (per-phase Particle Pushing / Field Solve / Diagnostics sections via a
    host-driven loop), ``time_step_adaptive`` (embedded-error step control,
    the reference Integrator's step_adaptive that its main() never wires
    up).  ``mesh``: markers shard over the ``rows`` axis with psum
    deposition (parallel/sharded.pic_sharded_run)."""
    p = params_mod.from_config(cfg, dtype=dtype)
    mpc = int(cfg["marker_per_cell"])
    nt = int(cfg["step_number"])
    dt = float(cfg["time_step"])

    fits = {"peak": pic.calculate_omega,
            "peak_views": lambda s, dt: pic.calculate_omega(s, dt,
                                                            views=True),
            "fft": pic.calculate_omega_fft}
    fit_name = cfg.get("omega_fit", "peak")
    if fit_name not in fits:
        raise ValueError(
            f"omega_fit must be one of {list(fits)}, got {fit_name!r}")

    adaptive = bool(cfg.get("time_step_adaptive", False))
    stream = bool(cfg.get("stream_fields", True)) and matrix_file is not None
    key = jax.random.PRNGKey(seed)
    times = None
    fields = None
    with section("PIC run"):
        if mesh is not None:
            if adaptive:
                # adaptive stays host-driven by design (embedded-error dt
                # control needs per-step host decisions); run it unsharded
                raise ValueError("mesh-sharded PIC does not support "
                                 "time_step_adaptive (host-driven dt "
                                 "control); drop the mesh for adaptive "
                                 "runs")
            from .parallel import sharded
            with mesh:
                if cfg.get("pic_timers"):
                    # per-phase sections, sharded (r5: the mesh path keeps
                    # the observability surface)
                    stats, state, fields = sharded.pic_sharded_run_timed(
                        p, mpc, nt, dt, mesh, key=key,
                        record_fields=matrix_file is not None)
                elif stream:
                    stats, state = sharded.pic_sharded_run_streaming(
                        p, mpc, nt, dt, mesh, matrix_file, key=key,
                        chunk_steps=int(cfg.get("stream_chunk_steps", 16)))
                    stats = np.asarray(stats)
                else:
                    state, stats = sharded.pic_sharded_run(
                        p, mpc, nt, dt, mesh, key=key)
                    stats = fetch(stats)
        elif adaptive:
            times, stats, state = pic.run_adaptive(
                p, mpc, nt * dt, dt, key=key,
                upper_err_bound=float(cfg.get("adaptive_upper_err", 1e-7)),
                lower_err_bound=float(cfg.get("adaptive_lower_err", 1e-10)))
        elif cfg.get("pic_timers"):
            stats, state, fields = pic.run_timed(
                p, mpc, nt, dt, key=key,
                record_fields=matrix_file is not None)
        elif cfg.get("pic_sorted"):
            # sorted-window marker path (cell-local one-hot CIC over
            # W-cell windows; exact, with a zero-violation runtime proof)
            stats, state, viols = pic.run_sorted(
                p, mpc, nt, dt, key=key,
                resort_every=int(cfg.get("pic_resort_every", 30)),
                window=int(cfg.get("pic_window", 384)),
                chunk_markers=int(cfg.get("pic_chunk_markers", 8192)))
            if int(viols):
                # clamped markers deposit at WRONG cells -- silently wrong
                # physics.  Hard error by default (the guard derivation
                # should make this unreachable); opt out explicitly with
                # pic_allow_window_violations to accept clamped runs.
                msg = (f"pic_sorted: {int(viols)} marker-stage window "
                       "violations (markers clamped to their chunk window "
                       "-- deposits landed at wrong cells); widen "
                       "pic_window or lower pic_resort_every")
                if not cfg.get("pic_allow_window_violations"):
                    raise RuntimeError(msg)
                import warnings
                warnings.warn(msg)
        elif stream:
            # per-step field history flushed DURING the run (parity with
            # main.cpp:105-110: a killed run keeps the flushed steps)
            stats, state = pic.run_streaming(
                p, mpc, nt, dt, matrix_file, key=key,
                chunk_steps=int(cfg.get("stream_chunk_steps", 16)),
                gather_method=cfg.get("gather_method"),
                deposit_method=cfg.get("deposit_method"))
        else:
            backend = cfg.get("pic_backend", "auto")
            if backend not in ("auto", "fused", "xla"):
                raise ValueError(f"pic_backend must be auto|fused|xla, "
                                 f"got {backend!r}")
            m = mpc * int(p.npoints)
            fused_ok = (jnp.dtype(dtype) == jnp.float32
                        and int(p.npoints) % 128 == 0 and m % 1024 == 0)
            if backend == "fused" and not fused_ok:
                raise ValueError(
                    "pic_backend='fused' needs f32, npoints % 128 == 0 "
                    "and markers % 1024 == 0")
            # auto never drops the buffered field dump silently; explicit
            # 'fused' trades the dump for speed (streaming runs keep the
            # XLA path either way)
            use_fused = backend == "fused" or (
                backend == "auto" and fused_ok and matrix_file is None
                and jax.default_backend() == "tpu")
            if use_fused:
                # hand-fused Pallas marker pass (solvers/pallas_pic.py):
                # ~7x the XLA path on TPU, statistically identical
                from .solvers import pallas_pic
                stats, state, fields = pallas_pic.run(
                    p, mpc, nt, dt, key=key,
                    precision=cfg.get("pic_precision", "default"),
                    launch=cfg.get("pic_launch", "auto"))
            else:
                # run_jitted: the eager composition is not runnable on the
                # TPU backend (eager complex ops unimplemented) and would
                # recompile per scan point
                stats, state, fields = pic.run_jitted(
                    p, mpc, nt, dt, key=key,
                    record_fields=matrix_file is not None,
                    gather_method=cfg.get("gather_method"),
                    deposit_method=cfg.get("deposit_method"))

    if matrix_file is not None and fields is not None:
        fetch(fields).astype(np.complex128).tofile(matrix_file)

    # omega_fit: "peak" reproduces the reference's peak-count fit (unsigned
    # frequency, solver_pic.h:514-527); "peak_views" its EMME_USE_VIEWS
    # gamma time-weight convention (solver_pic.h:479-489); "fft" resolves
    # the frequency sign.
    if adaptive:
        omega = pic.calculate_omega_nonuniform(times, stats)
    else:
        omega = fits[fit_name](np.asarray(stats), dt)
    result = {
        "eigenvalue": [omega.real, omega.imag],
        "eigenvector": _typed_array(state.field),
    }
    if adaptive:
        result["adaptive_steps"] = int(len(times))
        result["adaptive_final_time"] = float(times[-1])
    return result, omega_guess  # PIC does not update the continuation seed


_SOLVERS = {"eigen": solve_once_eigen, "PIC": solve_once_pic}


def _run_scan_parallel(solver, input_cfg, key, spec, guess, outdir, done,
                       record_ckpt, scan_workers, verbose, solver_kw,
                       mode: str = "wavefront", meshes=None):
    """Device-parallel scan: scan points fan out over the available devices
    (the SURVEY §2 plan's embarrassingly-parallel scan axis, realized at
    driver level).

    ``mode="wavefront"`` (default) KEEPS eigenvalue continuation -- the
    reference scan's core semantic (main.cpp:263, 281-291) -- while still
    filling ``scan_workers`` devices: the walk order is processed in
    batches of ``scan_workers`` points, every point in a batch seeded from
    the last converged omega of the previous batch (on a direction flip the
    seed resets to the first result, exactly like the sequential walk).
    The seed lags at most ``scan_workers`` points behind, vs the sequential
    walk's one.

    ``mode="independent"`` seeds every point from the user guess -- maximal
    parallelism for scans where the guess converges everywhere.

    jax.default_device is a thread-local config context, so each worker
    pins its arrays (and hence its jitted executions) to its own device;
    compiled executables are shared across workers.

    ``meshes`` (the rows x scan topology, ``"mesh": {"rows": R, "scan": S}``):
    a list of S disjoint R-device ``rows`` meshes; worker i solves its scan
    point DISTRIBUTED over mesh i mod S instead of pinned to one device --
    the driver-level realization of the 2-D mesh (scan axis = concurrent
    scan points across device groups, rows axis = in-solve sharding)."""
    import contextlib
    import queue

    devices = jax.devices()
    values, turnings = scan_values(spec)
    cfg0 = filter_input(input_cfg)
    lock = threading.Lock()
    # free-mesh pool: keeps in-flight solves on DISTINCT device groups --
    # with i % S assignment a worker finishing point i could pick up point
    # i+S and contend with a still-running solve on the same group
    # (ADVICE r4; bites in "independent" mode, where map order is free)
    mesh_pool = None
    if meshes is not None:
        mesh_pool = queue.Queue()
        for m in meshes:
            mesh_pool.put(m)

    def solve_point(i, value, seed_omega):
        ck = f"{key}={value!r}"
        with lock:
            if ck in done:
                return i, value, done[ck]
        cfg = dict(cfg0)
        cfg[key] = value
        mfile = outdir / "eigenMatrics" / f"{key}Eq{value:.6f}.bin"
        if mesh_pool is not None:
            ctx = contextlib.nullcontext()
            kw = dict(solver_kw, mesh=mesh_pool.get())
        else:
            ctx = jax.default_device(devices[i % len(devices)])
            kw = solver_kw
        try:
            with ctx:
                try:
                    res, _ = solver(cfg, seed_omega, matrix_file=mfile, **kw)
                    res["eigenMatrix"] = str(mfile)
                    res["scan_value"] = value
                except Exception as e:  # scan-level fault tolerance
                    res = {"eigenvalue": "NaN", "reason": str(e)}
        finally:
            if mesh_pool is not None:
                mesh_pool.put(kw["mesh"])
        with lock:
            done[ck] = res
            snapshot = dict(done)  # shallow: completed entries are not mutated
            seq = record_ckpt.next_seq()   # ordered WITH the snapshot
            if verbose:
                print(f"    {key}:{value}  ->  {res.get('eigenvalue')}")
        # serialize OUTSIDE the lock: dumping full eigenvectors for every
        # completed point is O(scan), and doing it under the global lock
        # would serialize all workers on I/O
        record_ckpt(snapshot, seq)
        return i, value, res

    results = []
    with concurrent.futures.ThreadPoolExecutor(scan_workers) as ex:
        if mode == "independent":
            results = list(ex.map(
                lambda iv: solve_point(iv[0], iv[1], guess),
                enumerate(values)))
        else:  # wavefront
            omega = guess
            i = 0
            while i < len(values):
                # a direction flip starts a new chain: reseed from the
                # first result (main.cpp:281-291) and a fresh batch
                batch = []
                for j in range(i, min(i + scan_workers, len(values))):
                    if turnings[j] and j > i:
                        break
                    batch.append(j)
                if turnings[batch[0]]:
                    first = results[0][2] if results else None
                    if first and isinstance(first.get("eigenvalue"), list):
                        omega = complex(*first["eigenvalue"])
                    else:
                        omega = guess
                out = list(ex.map(
                    lambda j, om=omega: solve_point(j, values[j], om),
                    batch))
                results.extend(out)
                # continuation: seed the next batch from the last
                # converged point of this one (NaN resets to the guess)
                ev = out[-1][2].get("eigenvalue")
                omega = complex(*ev) if isinstance(ev, list) else guess
                i = batch[-1] + 1
    results.sort(key=lambda r: r[0])
    return {"scan_key": key,
            "scan_values": [v for _, v, _ in results],
            "scan_result": [r for _, _, r in results]}


def run(input_cfg: dict | str | pathlib.Path, output_dir=".",
        dtype=jnp.float64, checkpoint: bool = True, verbose: bool = True,
        quad=None, chunk: int = 2048, host64: bool = False,
        scan_workers: int = 1, scan_mode: str = "wavefront",
        mesh_rows: int | None = None, mesh_scan: int | None = None,
        debug: bool = False) -> dict:
    """Execute the full (possibly scanning) job; writes output.json and
    binary matrix dumps under ``output_dir``; returns the result object.

    ``scan_mode`` (with scan_workers > 1): "wavefront" keeps eigenvalue
    continuation in batches of scan_workers; "independent" seeds every
    point from the user guess.

    ``mesh_rows`` (or a top-level input key ``"mesh": {"rows": N}``):
    distribute every solve over an N-device ``rows`` mesh -- sharded
    kernel-integral assembly for the dense backend, the fully distributed
    SPIKE banded Newton solve for the sparse backend, marker-sharded psum
    deposition for PIC.

    ``mesh_scan`` / ``"mesh": {"rows": R, "scan": S}``: the 2-D topology --
    the R*S devices split into S disjoint R-device row groups; scan points
    (or ``"shifts"``) run S at a time in continuation-preserving wavefront
    batches, each solve sharded over its group's rows axis (BASELINE
    config 5: shifts across hosts, operator across each host's chips).

    ``"shifts": [[re, im], ...]`` (eigen method): multi-shift run -- every
    shift seeds an independent solve (add ``"m_krylov"`` for a shift-invert
    Arnoldi stage per shift on the sparse backend); results land under
    result["shifts"] in shift order."""
    if scan_mode not in ("wavefront", "independent"):
        raise ValueError(f"scan_mode must be 'wavefront' or 'independent', "
                         f"got {scan_mode!r}")
    if not isinstance(input_cfg, dict):
        with open(input_cfg) as f:
            input_cfg = json.load(f)

    if debug or input_cfg.get("debug"):
        # the reference's EMME_DEBUG analogue: NaN-raising jits + input
        # dimension/positivity validation (utils/debug.py)
        from .utils import debug as debug_mod
        debug_mod.enable_nan_checks()
        debug_mod.validate_problem(
            params_mod.from_config(filter_input(input_cfg), dtype=dtype),
            filter_input(input_cfg))

    mesh_cfg = input_cfg.get("mesh") or {}
    rows = mesh_rows if mesh_rows is not None else mesh_cfg.get("rows")
    scan_groups = int(mesh_scan if mesh_scan is not None
                      else mesh_cfg.get("scan", 1))
    mesh = None
    meshes = None
    if rows:
        if scan_workers > 1 and scan_groups <= 1:
            raise ValueError(
                "mesh with scan_workers > 1 needs an explicit scan axis: "
                'use "mesh": {"rows": R, "scan": S} (the rows and scan '
                "axes partition the same devices)")
        from .parallel import mesh as mesh_mod
        devices = jax.devices()
        need = int(rows) * scan_groups
        if len(devices) < need:
            # fall back to the (possibly virtual) CPU backend, as
            # dryrun_multichip does on single-accelerator hosts
            devices = jax.devices("cpu")
        if len(devices) < need:
            raise ValueError(
                f"mesh rows={rows} x scan={scan_groups} needs {need} "
                f"devices, have {len(devices)}")
        if scan_groups > 1:
            # rows x scan: S disjoint R-device row-meshes; scan points (or
            # shifts) fan out over the groups in wavefront batches while
            # every solve shards over its group's rows axis
            meshes = [
                mesh_mod.make_mesh(
                    n_rows=int(rows),
                    devices=devices[g * int(rows):(g + 1) * int(rows)])
                for g in range(scan_groups)]
            mesh = meshes[0]
            scan_workers = scan_groups
        else:
            mesh = mesh_mod.make_mesh(n_rows=int(rows), devices=devices)

    outdir = pathlib.Path(output_dir)
    (outdir / "eigenMatrics").mkdir(parents=True, exist_ok=True)
    ckpt_path = outdir / "checkpoint.json"

    method = input_cfg.get("method")
    if method not in _SOLVERS:
        raise ValueError(f"Method '{method}' is not supported, yet.")
    solver = _SOLVERS[method]

    timer = Timer.get_timer()
    timer.start_timing("All")

    guess = complex(input_cfg["initial_guess"][0], input_cfg["initial_guess"][1]) \
        if "initial_guess" in input_cfg else 0j

    result = {
        "input": input_cfg,
        "git_commit_hash": provenance.git_commit_hash(),
        "build_time": provenance.build_time(),
        "run_time": provenance.date_string(),
        "framework": "emme_tpu",
        "result": {},
    }

    done = {}
    if checkpoint and ckpt_path.exists():
        with open(ckpt_path) as f:
            done = json.load(f)

    scan_config = {k: v for k, v in input_cfg.items() if _is_scan_spec(v)}

    ckpt_seq = itertools.count()
    ckpt_written = [-1]
    ckpt_write_lock = threading.Lock()

    def record_ckpt(snapshot=None, seq=None):
        if checkpoint:
            data = done if snapshot is None else snapshot
            # atomic replace: concurrent writers (scan_workers > 1) can't
            # interleave partial JSON in the checkpoint file.  The O(scan)
            # json.dump stays outside any lock; only the replace is ordered
            # by ``seq`` (taken under the caller's lock with the snapshot)
            # so a slow worker's OLDER snapshot can never overwrite a newer
            # checkpoint -- that would drop completed entries and force
            # their re-solve on resume
            tmp = ckpt_path.with_suffix(f".tmp{threading.get_ident()}")
            with open(tmp, "w") as f:
                json.dump(data, f)
            with ckpt_write_lock:
                if seq is not None and seq <= ckpt_written[0]:
                    os.remove(tmp)   # stale snapshot lost the race
                    return
                os.replace(tmp, ckpt_path)
                if seq is not None:
                    ckpt_written[0] = seq

    record_ckpt.next_seq = lambda: next(ckpt_seq)

    shifts = input_cfg.get("shifts")
    if shifts is not None:
        # multi-shift eigensolve (BASELINE config 5): every shift seeds its
        # own solve; shifts fan out over the scan device groups (rows x scan
        # mesh) or over plain devices.  Use "m_krylov" in the input for a
        # shift-invert Arnoldi stage per shift (sparse backend).
        if method != "eigen":
            raise ValueError('"shifts" requires method "eigen"')
        if scan_config:
            raise ValueError('"shifts" and scan dimensions are mutually '
                             "exclusive (one batch axis per run)")
        sigmas = [complex(s[0], s[1]) for s in shifts]
        workers = scan_workers if scan_workers > 1 else \
            (len(meshes) if meshes else 1)
        cfg0 = filter_input(input_cfg)
        devices = jax.devices()
        lock = threading.Lock()
        # free-mesh pool (same contention fix as _run_scan_parallel)
        mesh_pool = None
        if meshes is not None:
            import queue
            mesh_pool = queue.Queue()
            for m in meshes:
                mesh_pool.put(m)

        def one_shift(item):
            import contextlib
            i, sig = item
            ck = f"shift={i}"
            with lock:
                if ck in done:   # resume: shifts checkpoint like scan points
                    return done[ck]
            mfile = outdir / "eigenMatrics" / f"shift{i}.bin"
            if mesh_pool is not None:
                ctx = contextlib.nullcontext()
                m_i = mesh_pool.get()
            else:
                ctx = jax.default_device(devices[i % len(devices)])
                m_i = mesh
            try:
                with ctx:
                    try:
                        res, _ = solver(cfg0, sig, matrix_file=mfile,
                                        dtype=dtype, quad=quad, chunk=chunk,
                                        host64=host64, mesh=m_i)
                        res["eigenMatrix"] = str(mfile)
                    except Exception as e:
                        res = {"eigenvalue": "NaN", "reason": str(e)}
            finally:
                if mesh_pool is not None:
                    mesh_pool.put(m_i)
            res["shift"] = [sig.real, sig.imag]
            with lock:
                done[ck] = res
                snapshot = dict(done)
                seq = record_ckpt.next_seq()   # ordered WITH the snapshot
                if verbose:
                    print(f"    shift {sig}  ->  {res.get('eigenvalue')}")
            record_ckpt(snapshot, seq)   # interrupted multi-shift runs resume
            return res

        items = list(enumerate(sigmas))
        if workers > 1:
            with concurrent.futures.ThreadPoolExecutor(workers) as ex:
                out = list(ex.map(one_shift, items))
        else:
            out = [one_shift(it) for it in items]
        result["result"]["shifts"] = {
            "scan_key": "shifts",
            "scan_values": [[s.real, s.imag] for s in sigmas],
            "scan_result": out}
    elif not scan_config:
        unit = {"scan_key": "(None)", "scan_result": []}
        mfile = outdir / "eigenMatrics" / "eigenMatrix.bin"
        res, _ = solver(input_cfg, guess, matrix_file=mfile, dtype=dtype,
                        quad=quad, chunk=chunk, host64=host64, mesh=mesh)
        unit["scan_result"].append(res)
        result["result"]["(None)"] = unit
    elif scan_workers > 1:
        solver_kw = dict(dtype=dtype, quad=quad, chunk=chunk, host64=host64)
        if meshes is None:
            solver_kw["mesh"] = mesh
        for key, spec in scan_config.items():
            if verbose:
                print(f"\nScanning {key} ({scan_workers} workers, "
                      f"{len(jax.devices())} devices"
                      + (f", {len(meshes)}x{meshes[0].shape['rows']}-device "
                         f"row meshes" if meshes else "") + ")")
            result["result"][key] = _run_scan_parallel(
                solver, input_cfg, key, spec, guess, outdir, done,
                record_ckpt, scan_workers, verbose, solver_kw,
                mode=scan_mode, meshes=meshes)
    else:
        for key, spec in scan_config.items():
            cfg = filter_input(input_cfg)
            values, turnings = scan_values(spec)
            unit = {"scan_key": key, "scan_values": [], "scan_result": []}
            omega = guess
            if verbose:
                print(f"\nScanning {key}")
            for value, turning in zip(values, turnings):
                cfg[key] = value
                unit["scan_values"].append(value)
                if turning:
                    first = unit["scan_result"][0] if unit["scan_result"] else None
                    if first and isinstance(first.get("eigenvalue"), list):
                        omega = complex(*first["eigenvalue"])
                    else:
                        omega = guess
                if verbose:
                    print(f"    {key}:{value}")
                ck = f"{key}={value!r}"
                mfile = outdir / "eigenMatrics" / f"{key}Eq{value:.6f}.bin"
                if ck in done:
                    unit["scan_result"].append(done[ck])
                    ev = done[ck].get("eigenvalue")
                    if isinstance(ev, list):
                        omega = complex(*ev)
                    continue
                try:
                    res, omega = solver(cfg, omega, matrix_file=mfile,
                                        dtype=dtype, quad=quad, chunk=chunk,
                                        host64=host64, mesh=mesh)
                    res["eigenMatrix"] = str(mfile)
                    res["scan_value"] = value
                    if verbose:
                        print(f"        eigenvalue: {res['eigenvalue']}")
                except Exception as e:  # scan-level fault tolerance
                    res = {"eigenvalue": "NaN", "reason": str(e)}
                    omega = guess
                    if verbose:
                        print(f"        {e}")
                unit["scan_result"].append(res)
                done[ck] = res
                record_ckpt()
            result["result"][key] = unit

    timer.start_timing("Output")
    with open(outdir / "output.json", "w") as f:
        json.dump(result, f, indent=1)
    timer.pause_timing("Output")
    timer.pause_timing("All")
    if verbose:
        print()
        timer.print()
    if checkpoint and ckpt_path.exists():
        ckpt_path.unlink()  # completed cleanly
    return result
