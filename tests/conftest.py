"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4 "fake backend"); the real-TPU
path is driven separately by the verify skill / bench harness. A persistent
compilation cache keeps repeated runs fast (big unrolled CQT pyramids compile
in tens of seconds cold).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# force CPU regardless of the ambient platform (axon/TPU): the unit suite is
# the multi-device-simulation tier; TPU runs go through bench/verify. NOTE the
# axon plugin ignores the JAX_PLATFORMS env var — only the config flag works.
# Set NNAUDIO_TEST_PLATFORM=tpu to run the suite on the real chip instead
# (sharding tests then skip unless enough devices exist).
if os.environ.get("NNAUDIO_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/nnaudio_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

# the fused-kernel work gate exists to keep tiny TPU workloads on the
# fast-compiling XLA path; interpret-mode kernel tests use tiny inputs
# deliberately, so disable it for the suite
from nnaudio_tpu.ops import framed_matmul as _fm

_fm._MIN_FUSED_FRAMES = 0

REFERENCE_GT = "/root/reference/Installation/tests/ground-truths"


@pytest.fixture(scope="session")
def ground_truth_dir():
    if not os.path.isdir(REFERENCE_GT):
        pytest.skip("reference ground-truth artifacts not mounted")
    return REFERENCE_GT


@pytest.fixture(scope="session")
def chirp_signals():
    """The reference test inputs: 1s log/linear chirps 55 Hz -> 22.05 kHz at
    44.1 kHz (test_cqt.py:33-39)."""
    from scipy.signal import chirp

    fs = 44100
    s = np.linspace(0, 1, fs)
    return {
        "fs": fs,
        "log": chirp(s, 55, 1, 22050, method="logarithmic").astype(np.float32),
        "linear": chirp(s, 55, 1, 22050, method="linear").astype(np.float32),
    }
