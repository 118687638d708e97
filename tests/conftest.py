"""Test config: force an 8-device virtual CPU mesh + float64.

Mirrors the reference's determinism discipline (seeded RNG threaded
through every test, ref: src/theia/sfm/pose/test_util.h) and adds what
it lacks: multi-chip tests on a virtual device mesh (SURVEY.md §4).

Note: this environment preloads jax at interpreter startup with the
axon/TPU platform pinned via JAX_PLATFORMS, so env-var-only overrides
don't work — we switch the platform through jax.config before any
backend is initialized.
"""
import os

# Must be set before the CPU backend initializes (still true even though
# jax itself is already imported by the interpreter preload).
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NOTE: the persistent compilation cache (jax_compilation_cache_dir) is
# deliberately NOT enabled: on this runner the XLA:CPU AOT loader
# segfaults deserializing its own entries (spurious "+prefer-no-scatter
# … not supported on the host machine" feature mismatch in
# cpu_aot_loader), even for caches written by the same host/process.
# Compile times are acceptable without it; do not re-enable unless the
# jaxlib loader is fixed.

assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# The XLA:CPU backend on this runner segfaults/aborts inside
# backend_compile after ~90-100 compile-heavy tests in one process
# (reproduced with native code disabled, solo runs, bigger stacks, and
# with test_large_scale excluded — always the same stack in
# jaxlib's compiler). Dropping the accumulated executables/JIT state
# every N tests keeps the process under the threshold; the shared-op
# recompiles cost ~1-2 min over the suite.
_TESTS_SINCE_CLEAR = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_jax_cache_clear():
    yield
    _TESTS_SINCE_CLEAR["n"] += 1
    if _TESTS_SINCE_CLEAR["n"] >= 25:
        _TESTS_SINCE_CLEAR["n"] = 0
        jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)
