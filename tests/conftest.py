"""Test harness config: force a virtual 8-device CPU mesh.

Tests never touch real TPU hardware; sharding/collective tests run on the
forced-host-platform CPU mesh (the fake backend the reference never had,
SURVEY.md section 4).

Note: the surrounding environment may have registered a tunneled-TPU PJRT
plugin at interpreter start (sitecustomize gated on PALLAS_AXON_POOL_IPS) and
latched jax's platform config — `os.environ['JAX_PLATFORMS']` is too late, so
we override through `jax.config.update` before any backend initializes.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: model-init/forward compiles dominate suite
# time on CPU; repeat runs (and the driver's fresh invocations on the same
# machine) reuse cached executables.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
