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
