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

# Persistent compilation cache: the end-to-end preset sweeps re-jit one
# solver per problem shape; caching cuts repeat suite runs from ~15 min to
# seconds of compile time.  The cache dir is CPU-specific and distinct from
# the TPU bench cache (.jax_cache): cache entries include XLA:CPU AOT code
# compiled on the machine that populated them — the remote TPU host has
# different CPU features, and loading its AOT results here SIGILLs
# (cpu_aot_loader "machine type doesn't match" -> fatal signal mid-suite).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
