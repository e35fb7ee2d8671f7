"""Hardware validation for the single-launch PIC mega kernel.

The CI suite forces CPU (tests/conftest.py) and the mega kernel is
compiled-only -- interpret mode replays every grid step against the
ORIGINAL input buffers, so the aliased in/out marker carry that the kernel
is built on does not exist there (see solvers/pallas_pic.py::_mega_kernel).
This script is the TPU-side counterpart of tests/test_pallas_pic.py:

1. probes the alias-carry semantics the kernel relies on (a block written
   at grid step (s, i) must be re-fetchable at (s+1, i)) across block
   counts, asserting correctness at n_blocks >= _MIN_MEGA_BLOCKS and
   reporting the raw behavior below it;
2. asserts trajectory parity single-launch vs per-stage launches at a
   small size and at the canonical 1024x1024 case (stats over all steps +
   final state, f32-rounding tolerance).

Run: python benchmarks/validate_mega_pic.py   (needs a TPU backend)
"""
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def parity(npoints, mpc, n_steps, precision):
    import jax
    import jax.numpy as jnp
    import emme_tpu
    from emme_tpu.solvers import pallas_pic
    from emme_tpu.utils.transfer import fetch

    with open(REPO / "tests" / "goldens" / "inputs" / "tokamak.json") as f:
        cfg = json.load(f)
    cfg["npoints"] = npoints
    p = emme_tpu.from_config(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(3)

    def timed(launch):
        # warm-up compiles first so the reported seconds are kernel time
        np.asarray(pallas_pic.run(p, mpc, n_steps, 0.25, key=key,
                                  precision=precision, launch=launch,
                                  interpret=False)[0])
        t0 = time.time()
        s, fin, _ = pallas_pic.run(p, mpc, n_steps, 0.25, key=key,
                                   precision=precision, launch=launch,
                                   interpret=False)
        s = np.asarray(s)
        return s, fin, time.time() - t0

    s_st, fin_st, t_st = timed("stages")
    s_mg, fin_mg, t_mg = timed("single")
    d_stats = np.abs(s_st - s_mg).max() / np.abs(s_st).max()
    d_state = {}
    for name in ("eta", "weight", "field"):
        a = np.asarray(fetch(getattr(fin_st, name)))
        b = np.asarray(fetch(getattr(fin_mg, name)))
        d_state[name] = float(np.abs(a - b).max() / max(np.abs(a).max(),
                                                        1e-30))
    return d_stats, d_state, t_st, t_mg


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    if jax.default_backend() in ("cpu",):
        print("needs a TPU backend; skipping")
        return
    from emme_tpu.solvers.pallas_pic import (_MIN_MEGA_BLOCKS,
                                             alias_carry_probe)

    print("== alias-carry probe ==")
    ok_at_min, _ = alias_carry_probe(nblk=_MIN_MEGA_BLOCKS)
    for nblk in (1, 2, 3, 4, 16):
        ok, vals = alias_carry_probe(nblk=nblk)
        print(f"  n_blocks={nblk:2d}: {'sequential' if ok else 'STALE'}"
              f"  (values {vals})")
    assert ok_at_min, (
        f"alias-carry broke at n_blocks={_MIN_MEGA_BLOCKS}: the mega "
        "kernel's precondition no longer holds on this runtime")

    print("== trajectory parity (single launch vs per-stage) ==")
    for npoints, mpc, n_steps, prec, tol in (
            (128, 64, 8, "highest", 2e-5),
            (1024, 1024, 180, "default", 5e-4)):
        d_stats, d_state, t_st, t_mg = parity(npoints, mpc, n_steps, prec)
        print(f"  n={npoints} mpc={mpc} steps={n_steps} prec={prec}: "
              f"stats rel {d_stats:.2e}, state {d_state}, "
              f"stages {t_st:.3f}s vs single {t_mg:.3f}s")
        assert d_stats < tol, d_stats
        for k, v in d_state.items():
            assert v < 10 * tol, (k, v)
    print("OK")


if __name__ == "__main__":
    main()
