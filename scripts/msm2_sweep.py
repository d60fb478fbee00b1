"""G1 MSM size sweep on the real TPU: 2^20 .. 2^24, oracle-checked.

Writes MSM_SWEEP.json. Inputs are 64 distinct generator multiples tiled to
size n with fresh random scalars per position (the pipeline is
data-independent — same arithmetic for any point values — and the tiling
lets the host oracle verify the full-size result by aggregating scalars per
distinct base). Scalars are built directly as (16, N) uint16 limb arrays.

Usage: python scripts/msm2_sweep.py [max_logn]
"""

import json
import os
import sys
import time
import random

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def _enable_compile_cache():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


_enable_compile_cache()

import jax.numpy as jnp


def log(m):
    print(f"[{time.perf_counter():9.1f}] {m}", flush=True)


def main():
    max_logn = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    c = 7

    from ark_blst_tpu.curves import msm_pallas2 as MP2
    from ark_blst_tpu.curves.group import G1
    from ark_blst_tpu.ops import convert as CV
    from ark_blst_tpu.oracle import curve as OC
    from ark_blst_tpu.oracle import field as OF

    rng = random.Random(99)
    nprng = np.random.default_rng(99)
    n_base = 64
    base = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(n_base)]
    base_dev = CV.g1_to_dev(base)  # leaves (24, 64)

    rows = []
    for logn in range(20, max_logn + 1):
        n = 1 << logn
        reps = n // n_base
        pts = jax.tree.map(lambda x: jnp.tile(x, (1, reps)), base_dev)
        scs_np = nprng.integers(0, 1 << 16, (16, n), dtype=np.uint16)
        scs_np[15] &= 0x3FFF  # scalars < 2^254 < r
        scalars = jnp.asarray(scs_np.astype(np.uint32))
        jax.block_until_ready(pts[0])
        log(f"2^{logn}: warmup")
        out = MP2.msm_pallas2(pts, scalars, curve=G1, c=c)
        np.asarray(out[0])
        iters = 3 if logn <= 22 else 2
        log(f"2^{logn}: timing x{iters}")
        t0 = time.perf_counter()
        for _ in range(iters):
            out = MP2.msm_pallas2(pts, scalars, curve=G1, c=c)
            np.asarray(out[0])
        dt = (time.perf_counter() - t0) / iters
        # oracle: aggregate scalars per distinct base on host
        log(f"2^{logn}: oracle check")
        cols = scs_np.reshape(16, reps, n_base).astype(np.int64)
        agg = []
        for b in range(n_base):
            v = 0
            for k in range(16):
                v += int(cols[k, :, b].sum()) << (16 * k)
            agg.append(v % OF.R)
        want = OC.msm(OC.FP_OPS, base, agg)
        ok = CV.g1_from_dev(out) == [want]
        pps = n / dt
        log(f"2^{logn}: {dt*1e3:.1f} ms, {pps:.0f} pts/s, oracle_ok={ok}")
        rows.append(
            {
                "logn": logn,
                "ms": round(dt * 1e3, 1),
                "points_per_s": round(pps, 1),
                "oracle_ok": bool(ok),
            }
        )
        art = {
            "kernel": "msm_pallas2 (lazy radix-13, packed c=7 buckets)",
            "c": c,
            "backend": jax.default_backend(),
            "note": (
                "64 distinct bases tiled to n (data-independent pipeline; "
                "tiling enables full-size oracle verification)"
            ),
            "sweep": rows,
        }
        with open(os.path.join(os.path.dirname(__file__), "..", "MSM_SWEEP.json"), "w") as f:
            json.dump(art, f, indent=1)
    log("done")


if __name__ == "__main__":
    main()
