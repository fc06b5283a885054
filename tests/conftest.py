"""Test configuration.

Two jobs, both done before any jax compute:

1. Neutralize the environment's axon (remote-TPU tunnel) PJRT plugin: an
   interpreter-level sitecustomize registers it in EVERY python process,
   which flakily deadlocks host-to-device transfers in CPU-only runs
   (measured 8/10 hangs on a trivial op). Registration happens at
   interpreter start — before pytest — so the only reliable fix is to
   re-exec pytest once with a scrubbed environment. The re-exec happens in
   pytest_configure, after stopping pytest's fd-level capture so the child
   process writes to the real stdout/stderr.

2. Force CPU with 8 virtual devices so sharding/mesh tests run without
   real multi-chip hardware.
"""

import os
import sys

_NEEDS_SCRUB = ".axon_site" in os.environ.get("PYTHONPATH", "")

if not _NEEDS_SCRUB:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np
import pytest


def pytest_configure(config):
    if not _NEEDS_SCRUB:
        return
    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + list(config.invocation_params.args),
        env,
    )


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables between test modules.

    The suite compiles hundreds of distinct XLA:CPU programs; with all of
    them held live in one process, a later large compile (vi_ba_two_phase
    in test_e2e_vi) segfaults inside backend_compile_and_load
    deterministically — the same test passes standalone or after any
    subset of modules. Dropping the executable/tracing caches per module
    bounds that accumulation; each module mostly compiles its own programs
    anyway, so the recompile cost across module boundaries is small."""
    yield
    import jax

    jax.clear_caches()
