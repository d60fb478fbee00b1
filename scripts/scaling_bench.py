"""Multi-chip scaling-efficiency harness (SURVEY §2d / BASELINE scaling row).

Measures the sharded MSM wall time and per-device throughput on a virtual
CPU mesh of 1/2/4/8 devices (the multi-node-without-a-cluster strategy of
SURVEY §4), printing a scaling table and writing SCALING_r04.json.

Off-TPU this drives the fast-kernel sharded path (msm_pallas2.msm_sharded2)
in interpret mode with a truncated window schedule (the full schedule runs
on hardware in tests/test_tpu_lane.py). Absolute XLA:CPU numbers are
meaningless; the point is the COLLECTIVE overhead profile: points are
sharded, each device reduces its shard to window sums, and the cross-device
combine is one tiny gather — efficiency should stay near 1 as devices
double. On a real multi-chip slice run unchanged (drop the env overrides)
for full 255-bit scalars on the real kernel.

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
    import json

    from ark_blst_tpu import distributed as DIST

    from ark_blst_tpu.curves import msm_pallas2 as MP2

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        MP2.INTERPRET = True  # CPU mesh: the kernel runs interpreted
    n = 1 << log2n
    rng = random.Random(13)
    base = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(32)]
    pts = [base[i % 32] for i in range(n)]
    # full scalars on hardware; truncated windows off-TPU (interpret cost)
    mw = None if on_tpu else 2
    c = None if on_tpu else 4
    scs = [rng.randrange(OF.R if on_tpu else 1 << 4) for _ in range(n)]
    points = CV.g1_to_dev(pts)
    scalars = CV.fr_to_dev(scs)

    expected = None
    rows = []
    for ndev in (1, 2, 4, 8):
        if ndev > len(jax.devices()):
            break
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:ndev]), ("data",))
        t0 = time.perf_counter()
        out = MP2.msm_sharded2(points, scalars, mesh, curve=G1, c=c,
                               max_windows=mw)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        reps = 2 if on_tpu else 1
        t0 = time.perf_counter()
        for _ in range(reps):
            out = MP2.msm_sharded2(points, scalars, mesh, curve=G1, c=c,
                                   max_windows=mw)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        got = CV.g1_from_dev(out)
        if expected is None:
            expected = OC.msm(OC.FP_OPS, pts, scs)
        assert got == [expected], f"mismatch at ndev={ndev}"
        rows.append((ndev, dt, n / dt, compile_s))
        print(f"ndev={ndev}: {dt*1e3:.1f} ms (compile+first {compile_s:.1f}s)",
              flush=True)

    base_t = rows[0][1]
    print(f"\nG1 MSM 2^{log2n} scaling on "
          f"{'TPU slice' if on_tpu else 'virtual CPU mesh'} "
          f"(v2 kernel path, correctness-checked):")
    print(f"{'devices':>8} {'ms':>10} {'points/s':>12} {'speedup':>8} {'efficiency':>10}")
    table = []
    for ndev, dt, pps, _ in rows:
        sp = base_t / dt
        print(f"{ndev:>8} {dt*1e3:>10.1f} {pps:>12,.0f} {sp:>8.2f} {sp/ndev:>10.2f}")
        table.append({
            "devices": ndev, "ms": round(dt * 1e3, 1),
            "points_per_s": round(pps), "speedup": round(sp, 3),
            "efficiency": round(sp / ndev, 3),
        })
    out_path = os.path.join(os.path.dirname(__file__), "..", "SCALING_r04.json")
    with open(out_path, "w") as f:
        json.dump({
            "workload": f"G1 MSM 2^{log2n}"
                        + ("" if on_tpu else ", truncated 8-bit schedule"),
            "backend": "msm_sharded2 (v2 kernel"
                       + ("" if on_tpu else ", interpret") + ")",
            "platform": jax.default_backend(),
            "note": "virtual CPU mesh: absolute rates meaningless; the "
                    "efficiency column is the collective-overhead profile",
            "rows": table,
        }, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 13)
