"""Command-line driver: ``python -m emme_tpu.cli [input.json]``.

Unlike the reference's hard-coded ``input.json`` in the cwd (main.cpp:183),
the input path, output directory, compute device, and dtype are selectable.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="emme_tpu",
        description="TPU-native gyrokinetic eigensolver (EMME-compatible inputs)")
    ap.add_argument("input", nargs="?", default="input.json",
                    help="input JSON file (default: input.json)")
    ap.add_argument("-o", "--output-dir", default=".",
                    help="directory for output.json and eigenMatrics/")
    ap.add_argument("--device", choices=["auto", "cpu", "tpu"], default="auto",
                    help="compute platform (default: auto)")
    ap.add_argument("--f32", action="store_true",
                    help="single precision (complex64) -- the fast TPU path")
    ap.add_argument("--host64", action="store_true",
                    help="hybrid polish: device assembly + host complex128 "
                         "linalg (reference tolerance on f32 TPU)")
    ap.add_argument("--no-checkpoint", action="store_true",
                    help="disable scan checkpoint/resume")
    ap.add_argument("--chunk", type=int, default=2048,
                    help="assembly pair-chunk size")
    ap.add_argument("--scan-mode", choices=["wavefront", "independent"],
                    default="wavefront",
                    help="parallel-scan seeding: wavefront keeps eigenvalue "
                         "continuation in batches; independent seeds every "
                         "point from the user guess")
    ap.add_argument("--scan-workers", type=int, default=1,
                    help="device-parallel scan: fan this many concurrent "
                         "scan points out over the available devices "
                         "(disables eigenvalue continuation)")
    ap.add_argument("--mesh-rows", type=int, default=None,
                    help="distribute every solve over an N-device 'rows' "
                         "mesh: sharded assembly (dense), SPIKE-distributed "
                         "banded Newton solve (sparse), marker-sharded PIC; "
                         "equivalent to input key \"mesh\": {\"rows\": N}")
    ap.add_argument("--mesh-scan", type=int, default=None,
                    help="2-D rows x scan topology: split rows*scan devices "
                         "into scan disjoint row groups and run that many "
                         "scan points (or shifts) concurrently, each solve "
                         "sharded over its group; equivalent to "
                         "\"mesh\": {\"rows\": R, \"scan\": S}")
    ap.add_argument("--debug", action="store_true",
                    help="EMME_DEBUG analogue: NaN-raising jits + input "
                         "dimension/positivity validation")
    ap.add_argument("-q", "--quiet", action="store_true")
    args = ap.parse_args(argv)

    if args.mesh_scan and not args.mesh_rows:
        # a scan axis without a rows axis was silently ignored (ADVICE r4)
        ap.error("--mesh-scan requires --mesh-rows (use --mesh-rows 1 for "
                 "a pure scan-parallel topology)")

    # the topology may come from the CLI or the input JSON "mesh" key, or a
    # MIX (CLI rows + JSON scan) -- replicate driver.run's per-axis merge
    # exactly, because a CPU mesh needs virtual devices and the XLA flag
    # must be set before jax initializes (ADVICE r4: the JSON-sourced
    # topology used to skip this and die later with 'needs N devices')
    try:
        import json
        with open(args.input) as f:
            mesh_cfg = json.load(f).get("mesh") or {}
    except Exception:
        mesh_cfg = {}   # driver.run reports input errors properly
    rows = args.mesh_rows if args.mesh_rows is not None \
        else mesh_cfg.get("rows")
    scan = args.mesh_scan if args.mesh_scan is not None \
        else mesh_cfg.get("scan", 1)
    need = int(rows or 1) * int(scan or 1)
    import os
    if need > 1 and args.device != "tpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count"
                        f"={need}").strip()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif args.device == "tpu":
        jax.config.update("jax_platforms", "tpu,cpu")
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from . import driver
    dtype = jnp.float32 if args.f32 else jnp.float64
    driver.run(args.input, output_dir=args.output_dir, dtype=dtype,
               checkpoint=not args.no_checkpoint, verbose=not args.quiet,
               chunk=args.chunk, host64=args.host64,
               scan_workers=args.scan_workers, scan_mode=args.scan_mode,
               mesh_rows=args.mesh_rows, mesh_scan=args.mesh_scan,
               debug=args.debug)
    return 0


if __name__ == "__main__":
    sys.exit(main())
