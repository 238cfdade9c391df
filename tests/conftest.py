"""Test configuration: force the CPU platform with 8 virtual devices so
multi-chip sharding tests run without TPU hardware.

Note: this environment's axon TPU plugin overrides JAX_PLATFORMS at import
time, so we must also set the config explicitly after importing jax.
"""
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: production-scale tests (tens of seconds)"
    )
