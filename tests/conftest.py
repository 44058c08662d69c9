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


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_code_maps():
    """Keep the process under the kernel's vm.max_map_count ceiling.

    Every XLA:CPU compile mmaps JIT code segments (~6 maps for a tiny
    program, hundreds for the fused whole-ladder programs), and the
    suite compiles thousands — around test ~690 the process crossed
    vm.max_map_count (65530) and LLVM's JIT segfaulted inside
    ``backend_compile_and_load`` instead of failing cleanly.  Dropping
    jax's executable caches between modules un-maps retired programs;
    gated on the live map count so cheap modules don't pay recompiles.
    """
    yield
    try:
        n_maps = sum(1 for _ in open("/proc/self/maps"))
    except OSError:
        return
    if n_maps > 25000:
        jax.clear_caches()


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
