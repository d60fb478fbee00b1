"""Validate + benchmark the batched device pairing on the real TPU.

Usage: python scripts/tpu_pairing_check.py [batch_n]

Runs the FUSED (lax.scan) pipeline — the TPU execution mode — checks a
bilinearity instance and oracle parity on the first element, then times
steady-state pairings/s with per-rep host fetch.
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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()} batch={n}")

    from ark_blst_tpu.curves import pairing as DP
    from ark_blst_tpu.oracle import curve as OC
    from ark_blst_tpu.oracle import field as OF
    from ark_blst_tpu.oracle import pairing as OP
    from ark_blst_tpu.ops import convert as CV

    rng = random.Random(3)
    ps = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(8)]
    qs = [OC.g2_mul(OF.G2_GEN, rng.randrange(1, OF.R)) for _ in range(8)]
    ps = [ps[i % 8] for i in range(n)]
    qs = [qs[(i * 3 + 1) % 8] for i in range(n)]

    pdev = jax.device_put(
        (CV.fp_to_dev([p[0] for p in ps]), CV.fp_to_dev([p[1] for p in ps]))
    )
    qdev = jax.device_put(
        (CV.fp2_to_dev([q[0] for q in qs]), CV.fp2_to_dev([q[1] for q in qs]))
    )

    fn = jax.jit(lambda p, q: DP.pairing(p, q, fuse=True))

    def run():
        out = fn(pdev, qdev)
        np.asarray(out[0][0][0][:, :1])  # host fetch forces completion
        return out

    t0 = time.perf_counter()
    out = run()
    print(f"first call (incl compile): {time.perf_counter()-t0:.1f}s")

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
    dt = (time.perf_counter() - t0) / reps
    print(f"steady: {dt*1e3:.1f} ms -> {n/dt:,.1f} pairings/s")

    got = CV.fp12_from_dev(out)
    assert got[0] == OP.pairing(ps[0], qs[0]), "pairing mismatch vs oracle"
    assert got[1] == OP.pairing(ps[1], qs[1]), "pairing mismatch vs oracle"
    print("oracle check (2 elements): OK")


if __name__ == "__main__":
    main()
