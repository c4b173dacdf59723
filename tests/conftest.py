"""Test configuration: run on a virtual 8-device CPU mesh in float64.

The axon sitecustomize in this image force-registers a remote TPU backend and
overrides JAX_PLATFORMS from the environment, so we switch platforms via
jax.config *after* import (which wins), plus set the host-device-count flag
before the backend is initialized.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the full-solver graph takes minutes to compile
# on 2 vCPUs; cache hits bring reruns down to seconds.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run slow tests (full-size solves, multi-process; ~25 min "
             "on a 2-vCPU box).  Default tier is the <2 min fast set.",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
