"""Test env: CPU backend with 8 virtual devices (the analog of the
reference's `mpirun --oversubscribe` single-node multi-rank testing,
Utilities/run_exastencils.py:49-58) and float64 enabled for golden-parity
residual sequences."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the machine default is the
# single-chip 'axon' TPU tunnel, but tests need f64 + 8 virtual devices
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon sitecustomize hook sets jax_platforms="axon,cpu" at interpreter
# start, overriding the env var — force CPU again here (before any backend
# is initialized)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not mounted")
    return REFERENCE


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running suite — the quick gate (ci.sh) deselects these; "
        "the full tier (ci.sh full / nightly) runs everything",
    )
    config.addinivalue_line(
        "markers",
        "huge: 576^3-scale goldens (~20 min each) — nightly tier only "
        "(ci.sh nightly)",
    )
