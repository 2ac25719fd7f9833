"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``--xla_force_host_platform_device_count=8`` (the driver separately dry-runs
the multichip path; benches run on the real chip).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import jax

# Force the local CPU backend. NOTE: the JAX_PLATFORMS env var is overridden
# to "axon" by this machine's sitecustomize, so tests must switch platforms
# via jax.config *after* import — otherwise every op runs through the remote
# TPU tunnel with multi-second dispatch latency.
jax.config.update("jax_platforms", "cpu")

# Golden tests compare against fp32 PyTorch: pin full-precision matmuls
# (the backend default uses bf16 passes even on CPU).
jax.config.update("jax_default_matmul_precision", "highest")
# XLA compiles are very slow in this environment; cache them across runs.
from conditioned_nerf_gan_tpu.utils import setup_compile_cache  # noqa: E402

setup_compile_cache(REPO_ROOT / ".jax_cache")

def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: jit-heavy integration/golden tests "
        "(deselect with `-m 'not slow'` for a <60s unit loop)",
    )


REFERENCE_ROOT = Path("/root/reference")


def reference_available() -> bool:
    return REFERENCE_ROOT.exists()


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="PyTorch reference repo not mounted at /root/reference",
)


@pytest.fixture(scope="session")
def reference_path():
    """Put the reference repo on sys.path so its modules import as oracles."""
    if not reference_available():
        pytest.skip("reference repo unavailable")
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    return REFERENCE_ROOT
