import os
import json
import pathlib

# Force CPU with a virtual 8-device mesh BEFORE jax initializes, so sharded
# code paths are testable without TPU hardware.
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache (same as bench.py): the suite is compile-
# dominated -- repeated runs on a host reuse every jitted solve instead of
# recompiling ~100 programs (round-5 suite-time work, VERDICT r4 #4)
jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


@pytest.fixture(scope="session")
def goldens_dir():
    return GOLDEN_DIR


@pytest.fixture(scope="session")
def golden_eigenvalues():
    with open(GOLDEN_DIR / "eigenvalues.json") as f:
        return json.load(f)


def load_input(name):
    with open(GOLDEN_DIR / "inputs" / name) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def tokamak_cfg():
    return load_input("tokamak.json")


@pytest.fixture(scope="session")
def stellarator_cfg():
    return load_input("stellarator.json")
