"""Test config: run on an 8-device virtual CPU mesh by default.

The environment's sitecustomize registers the TPU ('axon') plugin and forces
jax_platforms='axon,cpu'; backend init is lazy, so flipping the config to
'cpu' here (before any array op) keeps tests off the (slow to initialize)
TPU tunnel.  Set CGT_TEST_TPU=1 to run the suite on real hardware.
Pallas kernels run in interpret mode on CPU (handled inside the ops).
"""
import os

import jax

if not os.environ.get("CGT_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
