"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests exercise numerics and sharding semantics; the real-TPU path is covered
by bench.py and __graft_entry__.py.  The axon sitecustomize forces
``jax_platforms='axon,cpu'``, so we override to CPU after import.
"""

import os

# Must be set before the first backend initialization
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(440)


@pytest.fixture(scope="session")
def tone_440():
    import librosa_tpu as lt

    return lt.tone(440, duration=1.0).astype(np.float32)


@pytest.fixture(scope="session")
def chirp_signal():
    import librosa_tpu as lt

    return lt.chirp(fmin=220, fmax=640, duration=1.0).astype(np.float32)


@pytest.fixture(scope="session")
def noise():
    # independent seed: the shared rng's draw order varies with test selection
    return np.random.RandomState(1234).randn(22050).astype(np.float32) * 0.1
