"""Multi-host runtime tests (ark_blst_tpu/distributed.py).

jax.distributed.initialize is process-global (can only run once, and the
conftest CPU-mesh env must be set before jax import), so the cluster test
runs in a SUBPROCESS: a 1-process cluster over the virtual 8-device CPU
mesh, sharded MSM checked against the host oracle — the honest single-box
stand-in for a pod (SURVEY.md §4: "multi-node without a real cluster").
"""

import pytest

pytestmark = pytest.mark.slow  # subprocess multi-device compile (minutes)
import os
import subprocess
import sys

_SCRIPT = r"""
import os, random, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
sys.path.insert(0, os.environ["ARK_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from ark_blst_tpu import distributed as DD
from ark_blst_tpu.oracle import curve as OC, field as OF
from ark_blst_tpu.ops import convert as CV

DD.initialize("localhost:12357", num_processes=1, process_id=0)
DD.initialize()  # idempotent second call must not raise
assert jax.process_count() == 1
mesh = DD.global_mesh()
assert mesh.devices.size == 8, mesh

rng = random.Random(5)
n = 64
pts = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(n)]
scs = [rng.randrange(OF.R) for _ in range(n)]
out = DD.msm_distributed(
    CV.g1_to_dev(pts), CV.fr_to_dev(scs), c=8, lanes=8, mesh=mesh
)
assert CV.g1_from_dev(out) == [OC.msm(OC.FP_OPS, pts, scs)], "distributed MSM mismatch"
print("DISTRIBUTED-OK")
"""


def test_distributed_cluster_msm():
    env = dict(os.environ)
    env["ARK_REPO"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT], env=env, capture_output=True,
        text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "DISTRIBUTED-OK" in r.stdout
