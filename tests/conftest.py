import os

# Tests run the JAX engine on a virtual 8-device CPU mesh so multi-chip
# sharding is exercised without TPU hardware.  The environment may pin
# JAX_PLATFORMS to a TPU plugin (sitecustomize), so force via config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

BENCH = pathlib.Path("/root/reference/benchmarks")


@pytest.fixture(scope="session")
def bench_dir():
    return BENCH
