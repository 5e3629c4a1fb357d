import os

# Tests run on a virtual 8-device CPU mesh: sharding/collective code paths
# compile and execute without TPU hardware (SURVEY.md §4 test strategy).
# The axon TPU plugin ignores JAX_PLATFORMS, so also force via jax.config.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
