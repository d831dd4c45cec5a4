"""Test config: run everything on CPU with 8 virtual devices.

Mirrors the reference's kernel-equivalence test strategy (SURVEY.md §4) but
adds what it lacked: CPU-runnable multi-device tests via XLA host-platform
device spoofing, so sharding code is exercised without a TPU pod.
"""

import os

# force CPU: the session environment may preset JAX_PLATFORMS to a TPU
# transport (e.g. axon), and multi-device tests need the virtual CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
# XLA's default matmul/conv precision is bf16-level even for fp32 inputs;
# parity tests against fp32 torch oracles need true fp32 accumulation.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_default_matmul_precision", "highest")
# some TPU transport plugins (axon) register regardless of JAX_PLATFORMS;
# pin the default platform explicitly so tests run on the virtual CPU mesh
jax.config.update("jax_platform_name", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
