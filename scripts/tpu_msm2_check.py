"""Real-TPU correctness + throughput check for the v2 lazy kernel.

Usage: python scripts/tpu_msm2_check.py [logn] [c]
Runs msm_pallas2 at 2^10 vs the host oracle, then times 2^logn (default 18).
"""

import os
import sys
import time
import random

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

def _enable_compile_cache():
    import jax
    import os as _os
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


_enable_compile_cache()



def log(m):
    print(f"[{time.perf_counter():9.1f}] {m}", flush=True)


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    from ark_blst_tpu.curves import msm_pallas2 as MP2
    from ark_blst_tpu.curves.group import G1
    from ark_blst_tpu.ops import convert as CV
    from ark_blst_tpu.oracle import curve as OC
    from ark_blst_tpu.oracle import field as OF

    log(f"backend={jax.default_backend()} c={c}")
    rng = random.Random(42)

    # correctness at 2^10 (64 distinct points tiled, random scalars)
    base = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(64)]
    n_small = 1 << 10
    pts = (base * (n_small // 64))[:n_small]
    scs = [rng.randrange(OF.R) for _ in range(n_small)]
    dp, ds = CV.g1_to_dev(pts), CV.fr_to_dev(scs)
    log("small msm (compile + run)")
    t0 = time.perf_counter()
    out = MP2.msm_pallas2(dp, ds, curve=G1, c=c)
    jax.block_until_ready(out[0])
    log(f"small msm done in {time.perf_counter()-t0:.1f}s; oracle check")
    got = CV.g1_from_dev(out)
    want = OC.msm(OC.FP_OPS, pts, scs)
    print("ORACLE_OK:", got == [want], flush=True)
    if got != [want]:
        sys.exit(1)

    # throughput at 2^logn
    n = 1 << logn
    reps = n // 64
    pts_b = base * reps
    scs_b = [rng.randrange(OF.R) for _ in range(n)]
    log(f"building 2^{logn} inputs")
    dp, ds = CV.g1_to_dev(pts_b), CV.fr_to_dev(scs_b)
    jax.block_until_ready(dp[0])
    log("warmup run")
    out = MP2.msm_pallas2(dp, ds, curve=G1, c=c)
    jax.block_until_ready(out[0])
    log("timed runs")
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = MP2.msm_pallas2(dp, ds, curve=G1, c=c)
        jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / iters
    # spot-check against a scaled oracle result via distinct-base trick:
    # sum over base points of (sum of their scalars) * base
    agg = [0] * 64
    for i, s in enumerate(scs_b):
        agg[i % 64] = (agg[i % 64] + s) % OF.R
    want = OC.msm(OC.FP_OPS, base, agg)
    got = CV.g1_from_dev(out)
    print(f"BIG_ORACLE_OK: {got == [want]}", flush=True)
    print(f"RESULT logn={logn} c={c} ms={dt*1e3:.1f} points_per_s={n/dt:.0f}",
          flush=True)


if __name__ == "__main__":
    main()
