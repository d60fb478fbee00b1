"""Stage-level timing of the batched pairing on the real TPU:
prepare (G2 line precomputation) vs Miller loop vs final exponentiation,
plus the prepared-reuse ratio (VERDICT r4 item 8).

The reference amortizes prepare via G2Prepared
(/root/reference/src/g2.rs:650-694); this ledger quantifies what that
amortization is worth on the TPU path and where the rest of the time goes.

Usage: python scripts/tpu_pairing_stages.py [logn_batch]
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
    for leaf in jax.tree.leaves(out):
        arr = leaf
        while arr.ndim > 0:
            arr = arr[0]
        np.asarray(arr)
    return out


def timed(tag, fn, *args, iters=3):
    out = _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = _sync(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    log(f"STAGE {tag}: {dt*1e3:8.1f} ms")
    return out, dt


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    n = 1 << logn
    import random

    import jax.numpy as jnp

    from ark_blst_tpu.curves import pairing as DP
    from ark_blst_tpu.ops import convert as CV
    from ark_blst_tpu.ops import tower_lazy as TL
    from ark_blst_tpu.oracle import curve as OC
    from ark_blst_tpu.oracle import field as OF
    from ark_blst_tpu.oracle import pairing as OP

    log(f"backend={jax.default_backend()} batch=2^{logn} engine=lazy fuse=True")
    rng = random.Random(3)
    ps = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(8)]
    qs = [OC.g2_mul(OF.G2_GEN, rng.randrange(1, OF.R)) for _ in range(8)]
    ps = [ps[i % 8] for i in range(n)]
    qs = [qs[(i * 3 + 1) % 8] for i in range(n)]
    pdev = (CV.fp_to_dev([p[0] for p in ps]), CV.fp_to_dev([p[1] for p in ps]))
    qdev = (CV.fp2_to_dev([q[0] for q in qs]), CV.fp2_to_dev([q[1] for q in qs]))

    # stage jits: same internal reshaping as DP.pairing (lazy 2-D tiles)
    def prep_fn(q):
        dummy_p = (q[0][0], q[0][0])
        _, q2, _, _, _, _ = DP._tile_pad_inputs(dummy_p, q, None, None, n)
        return DP.stack_coeffs(DP.prepare_g2(q2, True, "lazy"))

    def miller_fn(p, stacked):
        qd = ((p[0], p[0]), (p[0], p[0]))
        p2, _, _, _, _, _ = DP._tile_pad_inputs(p, qd, None, None, n)
        coeffs = DP.unstack_coeffs(stacked, "lazy")
        f = DP.miller_loop(p2, coeffs, True, "lazy")
        return jnp.stack(jax.tree.leaves(f))

    def fexp_fn(fstacked):
        treedef = jax.tree.structure(TL.fp12_one((1,)))
        f = jax.tree.unflatten(
            treedef, [fstacked[i] for i in range(fstacked.shape[0])]
        )
        return DP._egress(TL, DP.final_exp(f, True, "lazy"))

    jprep = jax.jit(prep_fn)
    jmil = jax.jit(miller_fn)
    jfexp = jax.jit(fexp_fn)

    stacked, dt_prep = timed("prepare ", jprep, qdev)
    fst, dt_mil = timed("miller  ", jmil, pdev, stacked)
    out, dt_fexp = timed("finalexp", jfexp, fst)

    total = dt_prep + dt_mil + dt_fexp
    log(f"TOTAL {total*1e3:.1f} ms -> {n/total:.0f} pairings/s")
    log(f"prepared path (miller+fexp): {n/(dt_mil+dt_fexp):.0f} pairings/s; "
        f"ratio vs unprepared {total/(dt_mil+dt_fexp):.3f}x")

    got = CV.fp12_from_dev(
        jax.tree.map(lambda x: x.reshape(x.shape[0], -1)[:, :n], out)
    )
    want = OP.pairing(ps[0], qs[0])
    print("ORACLE_OK:", got[0] == want, flush=True)
    print(
        f"STAGES_MS prepare={dt_prep*1e3:.1f} miller={dt_mil*1e3:.1f} "
        f"finalexp={dt_fexp*1e3:.1f} total_pairings_per_s={n/total:.0f} "
        f"prepared_pairings_per_s={n/(dt_mil+dt_fexp):.0f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
