"""Test bootstrap: force an 8-device virtual CPU mesh.

The container registers a TPU ("axon") PJRT backend at interpreter start via
sitecustomize and pins JAX_PLATFORMS=axon.  Unit tests want a deterministic
8-device CPU mesh (the JAX-native way to exercise multi-chip sharding
without a slice — SURVEY.md section 4).  jax is already *imported* when this
conftest runs (the jaxtyping pytest plugin pulls it in) but its backends are
not yet *initialized*, so overriding ``jax.config.jax_platforms`` and
XLA_FLAGS here still takes effect.
"""

import os
import sys

_WANT_XLA = "--xla_force_host_platform_device_count=8"

if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _WANT_XLA).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache makes repeated suite runs cheap (host-CPU-keyed
# inside enable_compile_cache — stale cross-host AOT entries can SIGILL)
from grit_tpu.utils.misc import enable_compile_cache  # noqa: E402

enable_compile_cache("/tmp/jax_test_cache", min_compile_secs=1.0)

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# test tiers: `make test` runs the fast tier (-m "not slow", parallel,
# < 5 min), `make test-all` the full pyramid.  Slow = interpret-mode kernel
# suites, e2e CLI drives, multi-process/multichip runs, and individual
# long-compile tests — marked here centrally so module files stay clean.
# ---------------------------------------------------------------------------
SLOW_FILES = {
    "test_window_attention.py",   # interpret-mode Pallas kernel parity
    "test_ops.py",                # MSDA kernel parity + finite differences
    "test_multiprocess.py",       # real 2-process e2e
    "test_multichip.py",          # dp8 / dp4tp2 dryruns
    "test_overfit.py",            # memorization loops
    "test_cli.py",                # every L5 surface end-to-end
    "test_convert_parity.py",     # torch converted-weight parity
    "test_caption_model.py",      # full-model fwd/grad compiles
}
SLOW_NODES = ("TestFrozenStages", "TestSCSTConvergence", "TestDetectorCLIResume")


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in SLOW_FILES or any(n in item.nodeid for n in SLOW_NODES):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
