"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4).

The harness pre-sets JAX_PLATFORMS (e.g. to the TPU tunnel), so we must
force-override rather than setdefault.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# the axon TPU plugin overrides the env var, so force via the config API too
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
