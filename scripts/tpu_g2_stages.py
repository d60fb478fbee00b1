"""Stage-level timing of the v2 MSM pipeline for G2 on the real TPU.

Twin of tpu_msm2_stages.py (VERDICT r4 item 4: G2 had no stage ledger).
Uses the distinct-bases pairwise-sum instance from bench.py, so the
numbers are honest end-to-end G2 figures, oracle-checked exactly.

Usage: python scripts/tpu_g2_stages.py [logn] [c]
"""

import os
import sys
import time

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


def log(m):
    print(f"[{time.perf_counter():9.1f}] {m}", flush=True)


def _sync(out):
    """Force real completion: fetch one element of every leaf to the host
    (the axon tunnel's block_until_ready can return early)."""
    for leaf in jax.tree.leaves(out):
        arr = leaf
        while arr.ndim > 0:
            arr = arr[0]
        np.asarray(arr)
    return out


def timed(tag, fn, *args, iters=2, **kw):
    out = _sync(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = _sync(fn(*args, **kw))
    dt = (time.perf_counter() - t0) / iters
    log(f"STAGE {tag}: {dt*1e3:8.1f} ms")
    return out, dt


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from bench import _random_msm_instance
    from ark_blst_tpu.curves import msm_pallas2 as MP2
    from ark_blst_tpu.curves import msm as M
    from ark_blst_tpu.curves.group import G2
    from ark_blst_tpu.ops import convert as CV

    log(f"backend={jax.default_backend()} curve=g2 logn={logn} c={c}")
    n = 1 << logn
    log("building distinct-base G2 instance (pairwise sums)")
    dp, ds, want = _random_msm_instance("g2", logn, seed=13 + logn)
    dp, ds = M._pad_inputs(G2, dp, ds, MP2.TILE)
    jax.block_until_ready(dp[0][0])
    kc = MP2.KC2_G2

    (pa, da), dt_prep = timed(
        "prepare", MP2._prepare_inputs, dp, ds, curve=G2, c=c
    )
    dump, dt_kern = timed("kernel", MP2._accumulate2, pa, da, kc=kc, c=c)
    ws, dt_red = timed("reduce", MP2._reduce_dump, dump, kc=kc,
                       B=MP2._num_buckets(c))
    out, dt_fin = timed("finish", lambda w: MP2._finish_host(w, kc, c), ws)
    out = MP2._unstack_strict(out, kc)

    total = dt_prep + dt_kern + dt_red + dt_fin
    log(f"TOTAL {total*1e3:.1f} ms -> {n/total:.0f} points/s at 2^{logn}")
    got = CV.g2_from_dev(out)
    print("ORACLE_OK:", got == [want], flush=True)
    print(
        f"STAGES_MS prepare={dt_prep*1e3:.1f} kernel={dt_kern*1e3:.1f} "
        f"reduce={dt_red*1e3:.1f} finish={dt_fin*1e3:.1f} "
        f"kernel_pts_per_s={n/dt_kern:.0f} total_pts_per_s={n/total:.0f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
