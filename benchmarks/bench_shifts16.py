"""BASELINE config 5 end-to-end: 16 shifts through the driver's
``"shifts"`` surface on the 2-D rows x scan mesh (rows=2 shards each
SPIKE solve, scan=4 concurrent shift groups -- the multi-host topology,
executed here on the virtual 8-device CPU mesh; tests/test_distributed.py
proves the same collectives across real OS processes).

Writes benchmarks/results_shifts16.json and prints one JSON line.
"""
import json
import os
import pathlib
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def main():
    from emme_tpu import driver

    with open(REPO / "tests" / "goldens" / "inputs" / "tokamak.json") as f:
        base = json.load(f)
    # 16 shifts on a ring around the tok128 eigenvalue neighbourhood
    center = complex(-0.75, 0.28)
    shifts = [[center.real + 0.06 * np.cos(t), center.imag + 0.04 * np.sin(t)]
              for t in np.linspace(0, 2 * np.pi, 16, endpoint=False)]
    cfg = dict(base, npoints=128, method="eigen", eigen_backend="sparse",
               band_block=8, band_deta=10.0, iteration_precision=1e-6,
               quad_guard="off", shifts=shifts,
               mesh={"rows": 2, "scan": 4})
    quad = {"n_shoulder": 8, "n_osc": 16, "n_tail": 4}
    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        r = driver.run(cfg, output_dir=td, verbose=False, quad=quad)
    wall = time.time() - t0
    out = r["result"]["shifts"]["scan_result"]
    evs = [complex(*o["eigenvalue"]) for o in out
           if isinstance(o.get("eigenvalue"), list)]
    ok = len(evs)
    # all shifts in this basin converge to the same banded tok128 eigenpair
    ref = evs[0]
    spread = max(abs(e - ref) / abs(ref) for e in evs)
    rec = {"n_shifts": len(shifts), "converged": ok,
           "wall_s": round(wall, 2),
           "eigenvalue": [ref.real, ref.imag],
           "max_rel_spread": float(f"{spread:.3g}"),
           "mesh": {"rows": 2, "scan": 4}}
    with open(REPO / "benchmarks" / "results_shifts16.json", "w") as f:
        json.dump({"shifts": shifts, **rec}, f, indent=1)
    print(json.dumps(rec), flush=True)
    assert ok == 16 and spread < 1e-4


if __name__ == "__main__":
    main()
