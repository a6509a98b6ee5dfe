"""Test configuration: force an 8-device virtual CPU mesh so DP/TP/SP
sharding paths run in CI without TPU hardware (SURVEY.md §4).

NB: the session environment may pre-import jax with a TPU platform selected
(site customization), so setting JAX_PLATFORMS here is too late — we override
via ``jax.config`` before any backend is initialized. XLA_FLAGS must also be
set before first backend use for the host-device-count to apply.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# XLA:CPU's thunk runtime is unstable under OVERLAPPING in-process
# executions on an emulated multi-device host: collective programs can
# deadlock splitting the device thread pool (Runner._throttle documents
# the observed hang) and a long test session can segfault inside the
# Eigen execution pool mid-compile (observed at ~92% of this suite on a
# 2-vCPU host, jaxlib 0.9.0). Synchronous dispatch removes the overlap;
# per-test runtime is unaffected because tests block on results anyway.
jax.config.update("jax_cpu_enable_async_dispatch", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got "
    f"{jax.default_backend()!r}")
assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled-executable state between test modules.

    A full suite run compiles hundreds of distinct programs into one
    process; at ~92% (twice, deterministically at the next large GSPMD
    compile) jaxlib 0.9.0's CPU backend segfaulted inside
    backend_compile_and_load / the Eigen pool. Bounding accumulated JIT
    state avoids the crash; modules don't share jit signatures, so the
    recompile cost is negligible."""
    yield
    import jax

    jax.clear_caches()
