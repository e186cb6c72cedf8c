"""Test environment: force CPU with 8 virtual devices for sharding tests.

Must run before any jax import (pytest imports conftest first)."""

import os
import sys

# Hard override: the outer environment pins JAX_PLATFORMS=axon (the real
# TPU tunnel), and the baked sitecustomize's axon.register() additionally
# sets jax_platforms="axon,cpu" through jax.config — overriding the env
# var. Unit tests must run on local CPU with a virtual 8-device mesh, so
# set both the env var (for subprocesses) and the live config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (must come after the env setup above)

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compile cache: the suite is dominated by CPU compiles
# (22:48 cold in round 1); warm runs hit the on-disk cache instead.
from v2x_sim_tpu.utils.jit_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
