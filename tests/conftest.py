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
# key the cache directory by a host-CPU fingerprint: XLA:CPU AOT entries are
# machine-specific, and the TPU-host machine shares this repo checkout — its
# entries loaded here trip "machine type doesn't match" AOT errors (and can
# SIGILL).
import hashlib  # noqa: E402

def _cpu_fingerprint():
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:8]

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               f".jax_cache_cpu_{_cpu_fingerprint()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------------------
# slow tier: full-library sweeps (97-problem e2e, scipy cross-validation)
# run with `pytest --runslow`; the default run keeps a representative core
# subset so the suite stays under ~5 minutes (tools/sweep.py still covers
# the full library out-of-band).
# ---------------------------------------------------------------------------
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run slow full-library tests")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-library sweep tests (deselected by default)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(reason="slow tier: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
