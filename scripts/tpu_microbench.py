"""Honest TPU timing: every rep ends with a host fetch of a small output
slice, forcing the full computation (block_until_ready may be unreliable on
experimental remote-TPU platforms).

Measures:
  1. Fp Montgomery-mul throughput (Pallas kernel) via a chained fori_loop
     (serialized dependency, immune to async-dispatch artifacts).
  2. G1 MSM wall time at a given size with per-rep host fetch.

Usage: python scripts/tpu_microbench.py [fpmul|msm] [log2_n] [c] [lanes]
"""

import random
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax as _jax
_jax.config.update("jax_compilation_cache_dir", __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.abspath(__file__)), "..", ".jax_cache"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)



def bench_fpmul(log2_batch=20, iters=32):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ark_blst_tpu.ops import pallas_field as PF
    from ark_blst_tpu.ops.limbs import FP
    from ark_blst_tpu.ops import convert as CV

    n = 1 << log2_batch
    rng = random.Random(0)
    a = jax.device_put(CV.fp_to_dev([rng.randrange(FP.modulus) for _ in range(n)]))
    b = jax.device_put(CV.fp_to_dev([rng.randrange(FP.modulus) for _ in range(n)]))

    @jax.jit
    def chain(a, b):
        def body(_, x):
            return PF.mont_mul(x, b, FP)

        return lax.fori_loop(0, iters, body, a)

    out = chain(a, b)
    np.asarray(out[:, :1])  # force
    t0 = time.perf_counter()
    out = chain(a, b)
    np.asarray(out[:, :1])
    dt = time.perf_counter() - t0
    muls = n * iters
    print(f"fp_mul: batch 2^{log2_batch} x {iters} chained iters: {dt*1e3:.1f} ms "
          f"-> {muls/dt/1e6:.1f} M muls/s")

    # correctness spot check on 4 elements
    got = CV.fp_from_dev(out[:, :4])
    a_h = CV.fp_from_dev(a[:, :4])
    b_h = CV.fp_from_dev(b[:, :4])
    p = FP.modulus
    for i in range(4):
        exp = a_h[i]
        for _ in range(iters):
            exp = exp * b_h[i] % p
        assert got[i] == exp, f"fp chain mismatch at {i}"
    print("fp chain correctness: OK")


def bench_msm(log2n=18, c=8, lanes=128, reps=3):
    import jax

    from ark_blst_tpu.curves import msm as M
    from ark_blst_tpu.curves.group import G1
    from ark_blst_tpu.oracle import curve as OC
    from ark_blst_tpu.oracle import field as OF
    from ark_blst_tpu.ops import convert as CV

    n = 1 << log2n
    rng = random.Random(7)
    base = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(64)]
    pts_host = [base[i % 64] for i in range(n)]
    scs_sets = []
    for r in range(reps):
        scs_sets.append([rng.randrange(OF.R) for _ in range(n)])
    points = jax.device_put(CV.g1_to_dev(pts_host))
    scalars = [jax.device_put(CV.fr_to_dev(s)) for s in scs_sets]

    def run(s):
        out = M.msm(points, s, curve=G1, c=c, lanes=lanes, use_jit=True)
        np.asarray(out[0])  # force full completion via host fetch
        return out

    t0 = time.perf_counter()
    out = run(scalars[0])
    print(f"first call (incl compile): {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    for r in range(reps):
        out = run(scalars[r % len(scalars)])
    dt = (time.perf_counter() - t0) / reps
    print(f"msm 2^{log2n} c={c} lanes={lanes}: {dt*1e3:.1f} ms -> {n/dt:,.0f} points/s")

    k = 64
    small = M.msm(
        jax.tree.map(lambda x: x[..., :k], points), scalars[0][:, :k],
        curve=G1, c=c, lanes=16, use_jit=True,
    )
    expected = OC.msm(OC.FP_OPS, pts_host[:k], scs_sets[0][:k])
    assert CV.g1_from_dev(small) == [expected], "MSM mismatch vs oracle"
    print("oracle check (prefix 64): OK")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "fpmul"
    if which == "fpmul":
        bench_fpmul(int(sys.argv[2]) if len(sys.argv) > 2 else 20)
    else:
        bench_msm(
            int(sys.argv[2]) if len(sys.argv) > 2 else 18,
            int(sys.argv[3]) if len(sys.argv) > 3 else 8,
            int(sys.argv[4]) if len(sys.argv) > 4 else 128,
        )
