"""Test harness: force an 8-device CPU mesh before JAX initializes.

The reference delegates distributed correctness entirely to accelerate/NCCL
and has no tests (SURVEY.md §4); our equivalent of "multi-node without a
cluster" is XLA's virtual host devices — every sharding/mesh test runs on 8
fake CPU devices, and the driver separately dry-runs the multi-chip path.
"""

import os

# NOTE: the environment exports JAX_PLATFORMS=axon (a remote-TPU tunnel) and
# a sitecustomize.py imports jax at interpreter start, freezing that choice
# into jax.config before this file runs. Env vars alone are therefore NOT
# enough — the config must be updated post-import, or tests silently run on
# the remote TPU (where interpret-mode Pallas hangs and fp32 matmuls drop to
# bf16 precision).
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: XLA:CPU cold compiles dominate test wall-clock.
# The dir is keyed by the host's CPU feature set: this box is a VM that
# migrates between physical hosts, and XLA:CPU AOT artifacts cached on a
# host with different ISA extensions load with a "machine type doesn't
# match" warning and can SIGILL mid-suite (cpu_aot_loader.cc) — a stale
# shared cache took down a full pytest run with 'Fatal Python error'.


def _cpu_feature_tag() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(l for l in f if l.startswith("flags"))
        return hashlib.sha1(flags.encode()).hexdigest()[:10]
    except Exception:
        import platform

        return platform.machine()


os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", f"/tmp/jax_test_cache_{_cpu_feature_tag()}"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (sitecustomize already imported it anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")


# ---------------------------------------------------------------------------
# Fast lane: `pytest -m fast` is the <5-min dev gate (measured 4m31s warm-
# cache on this box). Membership is by MODULE — these are the pure-math /
# IO / core modules with no XLA:CPU SPMD compiles, which dominate the full
# suite's 45-55 min wall-clock (docs/ENVIRONMENT_NOTES.md #6).
# ---------------------------------------------------------------------------
_FAST_MODULES = {
    "test_schedules",
    "test_solvers",
    "test_sampling",
    "test_convert",
    "test_lora",
    "test_data",
    "test_params_io",
    "test_hub",
    "test_families",
    "test_torch_block_parity",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.module.__name__ in _FAST_MODULES:
            item.add_marker(pytest.mark.fast)
