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

if os.environ.get("ARK_TPU_TESTS", "0") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
