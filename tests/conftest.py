"""Test harness: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; shardings are validated on
host-platform virtual devices (the standard JAX idiom). Must be set before
the first jax import anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("TPU_CNN_TEST_PLATFORM", "cpu")
# Hermetic tests: no on-disk XLA cache unless a lane opts in explicitly
# (the -m tpu hardware lane may set TPU_CNN_COMPILE_CACHE=1 to cut reruns).
os.environ.setdefault("TPU_CNN_COMPILE_CACHE", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-selects jax_platforms="axon,cpu" at interpreter
# start; override back to CPU for the virtual-mesh test environment.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np
import pytest

from tpu_cnn.models.cnn import DEFAULT_SHIFTS
from tpu_cnn.utils import weights as weights_codec

REFERENCE_WEIGHTS = "/root/reference/weights/weights.bin"


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)


@pytest.fixture(scope="session")
def stock_kernels():
    """Shipped production weights when present, else random stand-ins."""
    if os.path.exists(REFERENCE_WEIGHTS):
        return weights_codec.load_weights_bin(REFERENCE_WEIGHTS)
    return random_kernels(np.random.RandomState(0))


def random_kernels(rs, layer_configs=None):
    from tpu_cnn.models.cnn import LAYER_CONFIGS

    cfgs = layer_configs or LAYER_CONFIGS
    return [
        rs.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        for ic, oc, _ in cfgs
    ]


@pytest.fixture(scope="session")
def shifts():
    return np.asarray(DEFAULT_SHIFTS, dtype=np.int32)


@pytest.fixture(scope="session")
def ramp_image():
    """Deterministic stimulus pixel[i] = (13*i + 5) mod 256 — the reference
    testbench's closed-form image (sim/top/tb.v:478-530 idiom)."""
    i = np.arange(128 * 128, dtype=np.int64)
    return ((13 * i + 5) % 256).astype(np.uint8).reshape(128, 128)
