"""Test harness setup: force an 8-device virtual CPU mesh.

This container boots JAX onto the axon TPU platform via sitecustomize
(JAX_PLATFORMS=axon); jax is already imported by the time conftest runs,
but no backend has been initialized yet, so flipping the platform via
jax.config still works.  Set MUDIFF_TESTS_ON_TPU=1 to run the suite on
the live TPU backend instead.
"""

import os

# torch (used in optional cross-checks) and XLA both spin OpenMP thread
# pools; unbounded they deadlock each other on this image.
os.environ.setdefault("OMP_NUM_THREADS", "1")

import jax  # noqa: E402

if os.environ.get("MUDIFF_TESTS_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _mudiff_env_hygiene():
    """Isolate MUDIFF_* trace-time knobs between tests.

    parse_config(mode="test"/"test_volume") publishes the serving
    attention lowering via MUDIFF_ATTN (nn/blocks reads it at trace
    time); without restore, a CLI-parsing test would silently flip
    later parity tests off the exact einsum path.
    """
    keys = [k for k in os.environ if k.startswith("MUDIFF_")]
    saved = {k: os.environ[k] for k in keys}
    yield
    for k in [k for k in os.environ if k.startswith("MUDIFF_")]:
        if k not in saved:
            del os.environ[k]
    os.environ.update(saved)
