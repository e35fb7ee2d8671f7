"""Mesh-sharded paths on the 8-device virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from emme_tpu import from_config
from emme_tpu.grid import Grid
from emme_tpu.ops.singularity import singularity_coeff_matrix
from emme_tpu.parallel import mesh as mesh_mod
from emme_tpu.parallel import sharded
from emme_tpu.solvers import eigen, pic


def test_virtual_mesh():
    assert len(jax.devices()) == 8
    m = mesh_mod.make_mesh()
    assert m.shape == {"rows": 8, "scan": 1}


def test_sharded_assembly_matches_single(tokamak_cfg):
    cfg = dict(tokamak_cfg, npoints=32)
    p = from_config(cfg)
    grid = Grid.create(p.length, p.npoints)
    coeff = singularity_coeff_matrix(p.npoints)
    m = mesh_mod.make_mesh()
    om = jnp.complex128(-0.8 + 0.25j)
    M_single = np.asarray(eigen.assemble_matrix(p, grid, coeff, om))
    M_sharded = np.asarray(jax.jit(
        lambda: sharded.sharded_assemble(p, grid, coeff, om, m))())
    assert np.abs(M_sharded - M_single).max() < 1e-12


def test_sharded_newton_converges(tokamak_cfg, golden_eigenvalues):
    cfg = dict(tokamak_cfg, npoints=32)
    p = from_config(cfg)
    grid = Grid.create(p.length, p.npoints)
    coeff = singularity_coeff_matrix(p.npoints)
    m = mesh_mod.make_mesh()

    state = sharded.sharded_init_state(p, grid, coeff,
                                       jnp.complex128(-0.8 + 0.25j), m)
    step = jax.jit(lambda s: sharded.sharded_newton_step(p, grid, coeff, s, m))
    for j in range(p.iteration_step_limit + 1):
        state = step(state)
        if abs(complex(state.d_omega)) < 1e-6 * abs(complex(state.omega)):
            break
    ref = complex(*golden_eigenvalues["tok32"]["omega"])
    assert abs(complex(state.omega) - ref) / abs(ref) < 2e-6


def test_pic_sharded_deposition_matches_single(tokamak_cfg):
    cfg = dict(tokamak_cfg, npoints=64)
    p = from_config(cfg)
    m = mesh_mod.make_mesh()
    key = jax.random.PRNGKey(7)
    qn = pic.quasi_neutrality_coef(p)
    s0 = pic.init_state(p, 16, key)   # 1024 markers, divisible by 8

    s_single, _ = pic.rk3_step(p, s0, 0.25, qn)
    s_shard = jax.jit(lambda s: sharded.pic_sharded_step(p, m, qn, s, 0.25))(s0)
    f1 = np.asarray(s_single.field)
    f2 = np.asarray(s_shard.field)
    assert np.abs(f1 - f2).max() < 1e-10 * (np.abs(f1).max() + 1e-30)
