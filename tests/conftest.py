import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (SURVEY.md §4: multi-host tests simulated on CPU).
# NOTE: the environment preloads jax with an "axon" TPU platform via
# sitecustomize, so the env var JAX_PLATFORMS is too late here — use the
# config API (backends initialize lazily, so this still takes effect).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
