"""Fused Pallas PIC kernel vs the XLA path (interpret mode on CPU).

The fused kernel (solvers/pallas_pic.py) must walk the SAME trajectory as
the XLA chain (solvers/pic.py) -- same RK tableau, same CIC stencils, same
j0-zero-init first stage (solver_pic.h:34-47), same drift-center branch --
to f32 rounding.  TPU-side statistical gamma/omega validation runs in
benchmarks/bench_pic.py."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import emme_tpu
from emme_tpu.solvers import pic, pallas_pic


@pytest.fixture(scope="module")
def small_case(tokamak_cfg):
    cfg = dict(tokamak_cfg)
    cfg["npoints"] = 128
    p = emme_tpu.from_config(cfg, dtype=jnp.float32)
    return p


def _run_pair(p, mpc, n_steps, dt, key):
    stats_x, s_x, _ = pic.run(p, mpc, n_steps, dt, key=key)
    stats_f, s_f, _ = pallas_pic.run(p, mpc, n_steps, dt, key=key,
                                     precision="highest", interpret=True)
    return (np.asarray(stats_x), s_x), (np.asarray(stats_f), s_f)


def test_fused_matches_xla_trajectory(small_case):
    """Stats and full state match the XLA path to f32 rounding over several
    steps (covers the gather, physics, RK combos, deposit, field solve, and
    the first-stage j0 == 0 quirk)."""
    p = small_case
    (sx, st_x), (sf, st_f) = _run_pair(p, 8, 2, 0.25, jax.random.PRNGKey(3))
    assert np.abs(sx - sf).max() / np.abs(sx).max() < 1e-5
    # dc_pb = exp(-i phase) with a 1/v_para division in the phase: f32
    # rounding there lands on the unit circle amplified, hence the looser
    # bar for it
    tols = {"dc_pb": 1e-4}
    for name in ("eta", "weight", "field", "j0", "dc_pb"):
        a = np.asarray(getattr(st_x, name))
        b = np.asarray(getattr(st_f, name))
        scale = max(np.abs(a).max(), 1e-30)
        assert np.abs(a - b).max() / scale < tols.get(name, 2e-5), name


def test_fused_nondc_branch(tokamak_cfg):
    """The non-drift-center weight equation (solver_pic.h:120-124 else
    branch) matches too."""
    cfg = dict(tokamak_cfg)
    cfg["npoints"] = 128
    cfg["drift_center_transformation_switch"] = False
    p = emme_tpu.from_config(cfg, dtype=jnp.float32)
    (sx, _), (sf, _) = _run_pair(p, 8, 2, 0.25, jax.random.PRNGKey(5))
    assert np.abs(sx - sf).max() / np.abs(sx).max() < 1e-5


def test_fused_shape_guards(tokamak_cfg):
    cfg = dict(tokamak_cfg)
    cfg["npoints"] = 96   # not a lane multiple
    p = emme_tpu.from_config(cfg, dtype=jnp.float32)
    with pytest.raises(ValueError, match="npoints"):
        pallas_pic.run(p, 16, 2, 0.25, interpret=True)
    cfg["npoints"] = 128
    p64 = emme_tpu.from_config(cfg)   # f64 under the test x64 config
    with pytest.raises(ValueError, match="f32"):
        pallas_pic.run(p64, 16, 2, 0.25, interpret=True)


def test_driver_fused_backend(tmp_path, tokamak_cfg):
    """pic_backend='fused' end-to-end through the driver (interpret on
    CPU); matches the xla backend's fitted eigenvalue closely."""
    from emme_tpu import driver

    cfg = dict(tokamak_cfg)
    cfg.update(method="PIC", npoints=128, marker_per_cell=8,
               step_number=3, stream_fields=False)
    out_f = driver.run(dict(cfg, pic_backend="fused"),
                       output_dir=tmp_path / "f", dtype=jnp.float32,
                       verbose=False, checkpoint=False)
    out_x = driver.run(dict(cfg, pic_backend="xla"),
                       output_dir=tmp_path / "x", dtype=jnp.float32,
                       verbose=False, checkpoint=False)
    ev_f = out_f["result"]["(None)"]["scan_result"][0]["eigenvalue"]
    ev_x = out_x["result"]["(None)"]["scan_result"][0]["eigenvalue"]
    assert ev_f == pytest.approx(ev_x, rel=1e-3)


def test_single_launch_guard(tokamak_cfg):
    """launch='single' (the whole run as ONE pallas_call) is compiled-only:
    interpret mode has no alias carry between grid steps, so requesting it
    there fails clearly, and launch='auto' falls back to per-stage
    launches (hardware parity: benchmarks/validate_mega_pic.py)."""
    from emme_tpu.solvers import pallas_pic

    cfg = dict(tokamak_cfg)
    cfg["npoints"] = 128
    p = emme_tpu.from_config(cfg, dtype=jnp.float32)
    with pytest.raises(ValueError, match="single"):
        pallas_pic.run(p, 8, 2, 0.25, launch="single", interpret=True)
    with pytest.raises(ValueError, match="launch"):
        pallas_pic.run(p, 8, 2, 0.25, launch="nope", interpret=True)
    # auto in interpret mode = the per-stage path, same trajectory
    sa, _, _ = pallas_pic.run(p, 8, 2, 0.25, key=jax.random.PRNGKey(3),
                              launch="auto", interpret=True,
                              precision="highest")
    sb, _, _ = pallas_pic.run(p, 8, 2, 0.25, key=jax.random.PRNGKey(3),
                              launch="stages", interpret=True,
                              precision="highest")
    assert np.abs(np.asarray(sa) - np.asarray(sb)).max() == 0.0


def test_driver_fused_guard(tmp_path, tokamak_cfg):
    """Explicit pic_backend='fused' with unmet requirements fails clearly."""
    from emme_tpu import driver

    cfg = dict(tokamak_cfg)
    cfg.update(method="PIC", npoints=96, marker_per_cell=8, step_number=2,
               pic_backend="fused", stream_fields=False)
    with pytest.raises(ValueError, match="fused"):
        driver.run(cfg, output_dir=tmp_path, dtype=jnp.float32,
                   verbose=False, checkpoint=False)
