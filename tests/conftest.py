"""Test harness configuration.

Tests run on a *virtual 8-device CPU mesh* by default so sharding logic is
exercised without TPU hardware (the strategy SURVEY.md §4 prescribes for
"multi-node without a real cluster"). Set ARK_TPU_TESTS=1 to run on the real
attached TPU instead (single chip).

This must run before anything imports jax, hence the env mutation at module
import time — pytest imports conftest.py before collecting test modules.
"""

import os
import sys

_USE_TPU = os.environ.get("ARK_TPU_TESTS", "0") == "1"

if not _USE_TPU:
    # The container's axon sitecustomize force-registers the remote-TPU
    # backend and overrides jax_platforms in every process, so setting the
    # env var is not enough — override the config after import, before any
    # backend is initialized.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not _USE_TPU:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the limb-engine graphs are expensive to
# compile on CPU; caching makes repeat pytest runs cheap.
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
