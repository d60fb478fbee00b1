"""Multi-chip scaling-efficiency harness (SURVEY §2d / BASELINE scaling row).

Measures the FAST sharded path (msm_pallas2.msm_sharded2: the v2 lazy
VMEM-bucket kernel inside shard_map, interpret-mode off-TPU) wall time and
per-device throughput on a virtual CPU mesh of 1/2/4/8 devices (the
multi-node-without-a-cluster strategy of SURVEY §4), printing a scaling
table. Absolute numbers on XLA:CPU are meaningless; the point is the
COLLECTIVE overhead profile: points are sharded, each device reduces its
shard to stacked window sums, and the cross-device combine is one tiny
gather — so efficiency should stay near 1 as devices double.

On a real multi-chip slice the same entry point shards over ICI; run there
unchanged (drop the env overrides).

Usage: python scripts/scaling_bench.py [log2_n]
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random

import numpy as np

from ark_blst_tpu.curves import msm as M
from ark_blst_tpu.curves.group import G1
from ark_blst_tpu.oracle import curve as OC
from ark_blst_tpu.oracle import field as OF
from ark_blst_tpu.ops import convert as CV


def main(log2n=13):
    from ark_blst_tpu.curves import msm_pallas2 as MP2

    if jax.default_backend() != "tpu":
        MP2.INTERPRET = True  # CPU mesh: kernel runs interpreted
    n = 1 << log2n
    rng = random.Random(13)
    base = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(32)]
    pts = [base[i % 32] for i in range(n)]
    # small scalars so max_windows=2 keeps the off-TPU interpret run sane;
    # on a real slice drop max_windows for full 255-bit scalars
    mw = None if jax.default_backend() == "tpu" else 2
    scs = [rng.randrange(OF.R if mw is None else 1 << 4) for _ in range(n)]
    points = CV.g1_to_dev(pts)
    scalars = CV.fr_to_dev(scs)

    expected = None
    rows = []
    for ndev in (1, 2, 4, 8):
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:ndev]), ("data",))
        t0 = time.perf_counter()
        out = MP2.msm_sharded2(points, scalars, mesh, curve=G1, c=4,
                               max_windows=mw)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        reps = 2
        t0 = time.perf_counter()
        for _ in range(reps):
            out = MP2.msm_sharded2(points, scalars, mesh, curve=G1, c=4,
                                   max_windows=mw)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        got = CV.g1_from_dev(out)
        if expected is None:
            expected = OC.msm(OC.FP_OPS, pts, scs)
        assert got == [expected], f"mismatch at ndev={ndev}"
        rows.append((ndev, dt, n / dt, compile_s))

    base_t = rows[0][1]
    print(f"\nG1 MSM 2^{log2n} scaling on virtual CPU mesh (correctness-checked):")
    print(f"{'devices':>8} {'ms':>10} {'points/s':>12} {'speedup':>8} {'efficiency':>10}")
    for ndev, dt, pps, _ in rows:
        sp = base_t / dt
        print(f"{ndev:>8} {dt*1e3:>10.1f} {pps:>12,.0f} {sp:>8.2f} {sp/ndev:>10.2f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 13)
