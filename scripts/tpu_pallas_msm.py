"""Validate + benchmark the VMEM-bucket Pallas MSM kernel on the real TPU.

Usage: python scripts/tpu_pallas_msm.py [log2_n] [c] [g1|g2]

Cross-checks the full result against the host oracle for n <= 2^12, else a
64-point prefix; times steady-state with per-rep host fetch (honest under
the remote-TPU platform's unreliable block_until_ready).
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
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    which = sys.argv[3] if len(sys.argv) > 3 else "g1"

    import jax

    print(f"backend={jax.default_backend()} n=2^{log2n} c={c} {which}")

    from ark_blst_tpu.curves import msm_pallas as MP
    from ark_blst_tpu.curves.group import G1, G2
    from ark_blst_tpu.oracle import curve as OC
    from ark_blst_tpu.oracle import field as OF
    from ark_blst_tpu.ops import convert as CV

    if which == "g1":
        mul, to_dev, from_dev, curve, ops, gen = (
            OC.g1_mul, CV.g1_to_dev, CV.g1_from_dev, G1, OC.FP_OPS, OF.G1_GEN,
        )
    else:
        mul, to_dev, from_dev, curve, ops, gen = (
            OC.g2_mul, CV.g2_to_dev, CV.g2_from_dev, G2, OC.FP2_OPS, OF.G2_GEN,
        )

    n = 1 << log2n
    rng = random.Random(7)
    base = [mul(gen, rng.randrange(1, OF.R)) for _ in range(64)]
    pts_host = [base[i % 64] for i in range(n)]
    pts_host[5] = None  # identity input
    scs_host = [rng.randrange(OF.R) for _ in range(n)]
    points = jax.device_put(to_dev(pts_host))
    scalars = jax.device_put(CV.fr_to_dev(scs_host))

    def run():
        out = MP.msm_pallas(points, scalars, curve=curve, c=c)
        np.asarray(out[0])  # force completion via host fetch
        return out

    t0 = time.perf_counter()
    out = run()
    print(f"first call (incl compile): {time.perf_counter()-t0:.1f}s")

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
    dt = (time.perf_counter() - t0) / reps
    print(f"steady: {dt*1e3:.1f} ms -> {n/dt:,.0f} points/s")

    if n <= (1 << 12):
        got = from_dev(out)
        expected = OC.msm(ops, pts_host, scs_host)
        assert got == [expected], "MSM mismatch vs oracle"
        print("oracle check (full): OK")
    else:
        # zero all but the first k scalars: reuses the SAME compiled program
        k = 64
        scs_check = scs_host[:k] + [0] * (n - k)
        small = MP.msm_pallas(
            points, jax.device_put(CV.fr_to_dev(scs_check)), curve=curve, c=c
        )
        expected = OC.msm(ops, pts_host[:k], scs_host[:k])
        assert from_dev(small) == [expected], "MSM mismatch vs oracle"
        print(f"oracle check (prefix {k}): OK")


if __name__ == "__main__":
    main()
