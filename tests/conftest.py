"""Test bootstrap: force an 8-device virtual CPU mesh.

The container registers a TPU ("axon") PJRT backend at interpreter start via
sitecustomize, which overrides JAX_PLATFORMS.  Unit tests want a deterministic
8-device CPU mesh (the JAX-native way to exercise multi-chip sharding without
a slice — SURVEY.md section 4).  Since backend registration happens before
pytest imports us, we re-exec the interpreter once with the axon pool disabled
and the CPU flags set.
"""

import os
import sys

_WANT_XLA = "--xla_force_host_platform_device_count=8"

if (
    os.environ.get("_GRIT_TPU_TEST_REEXEC") != "1"
    and "jax" not in sys.modules
    and os.environ.get("PALLAS_AXON_POOL_IPS")
):
    os.environ["_GRIT_TPU_TEST_REEXEC"] = "1"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (xla_flags + " " + _WANT_XLA).strip()
    os.execv(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:])

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _WANT_XLA).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
