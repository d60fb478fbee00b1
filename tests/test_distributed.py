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


_SCRIPT2 = r"""
import os, random, sys
pid = int(os.environ["ARK_PID"])
port = os.environ["ARK_PORT"]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.environ["ARK_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from ark_blst_tpu import distributed as DD
from ark_blst_tpu.oracle import curve as OC, field as OF
from ark_blst_tpu.ops import convert as CV

DD.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4, jax.local_devices()
mesh = DD.global_mesh()
assert mesh.devices.size == 8

# identical host data in both processes (same seed): multi-process jit
# treats host inputs as replicated global values and shards them over the
# 2-host x 4-device mesh inside shard_map
rng = random.Random(17)
n = 32
pts = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(n)]
scs = [rng.randrange(OF.R) for _ in range(n)]
pts_dev = jax.tree.map(lambda x: np.asarray(x), CV.g1_to_dev(pts))
scs_dev = np.asarray(CV.fr_to_dev(scs))
out = DD.msm_distributed(
    pts_dev, scs_dev, c=4, lanes=1, mesh=mesh, finish="host"
)
assert CV.g1_from_dev(out) == [OC.msm(OC.FP_OPS, pts, scs)], "2-proc MSM mismatch"
print(f"DISTRIBUTED2-OK pid={pid}")
"""


def test_distributed_two_process_cluster_msm():
    """A REAL 2-process jax.distributed cluster on localhost (2 x 4 virtual
    CPU devices): process 0 is the coordinator; both run the sharded MSM
    over the 8-device global mesh and check it against the host oracle.
    This exercises initialize()'s multi-process arguments for real — the
    honest single-box stand-in for N TPU hosts over DCN (the reference has
    no distributed story at all, /root/reference/src/gpu.rs:233-234)."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["ARK_REPO"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["ARK_PORT"] = str(port)
    env.pop("JAX_PLATFORMS", None)
    procs = []
    for pid in range(2):
        e = dict(env)
        e["ARK_PID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _SCRIPT2], env=e,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = [p.communicate(timeout=900) for p in procs]
    for pid, (p, (so, se)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid={pid}\n{so}\n{se}"
        assert f"DISTRIBUTED2-OK pid={pid}" in so
