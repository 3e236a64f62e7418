"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment boots with a remote-TPU ("axon") PJRT backend pre-registered
by sitecustomize and ``JAX_PLATFORMS=axon`` — and jax is already imported by
the time conftest runs.  Backends initialize lazily, so flipping the *config*
(not just the env var) before first use reliably lands the suite on CPU.
This mirrors SURVEY.md §4: multi-device logic is testable on CPU via
``xla_force_host_platform_device_count``.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
