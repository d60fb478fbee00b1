"""Quick TPU sanity: run the fused Pallas MSM on the real chip at a modest
size and cross-check a prefix against the host oracle.

Usage: python scripts/tpu_msm_check.py [log2_n] [c] [lanes]
"""

import random
import sys
import time

sys.path.insert(0, ".")

import jax as _jax
_jax.config.update("jax_compilation_cache_dir", __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.abspath(__file__)), "..", ".jax_cache"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)



def main():
    import jax

    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lanes = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    print(f"backend={jax.default_backend()} n=2^{log2n} c={c} lanes={lanes}")

    from ark_blst_tpu.curves import msm as M
    from ark_blst_tpu.curves.group import G1
    from ark_blst_tpu.oracle import curve as OC
    from ark_blst_tpu.oracle import field as OF
    from ark_blst_tpu.ops import convert as CV

    n = 1 << log2n
    rng = random.Random(7)
    base = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(64)]
    pts_host = [base[i % 64] for i in range(n)]
    scs_host = [rng.randrange(OF.R) for _ in range(n)]
    points = jax.device_put(CV.g1_to_dev(pts_host))
    scalars = jax.device_put(CV.fr_to_dev(scs_host))

    t0 = time.perf_counter()
    out = M.msm(points, scalars, curve=G1, c=c, lanes=lanes, use_jit=True)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    print(f"first call (incl compile): {t_compile:.2f}s")

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = M.msm(points, scalars, curve=G1, c=c, lanes=lanes, use_jit=True)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"steady: {dt*1e3:.1f} ms -> {n/dt:,.0f} points/s")

    if n <= (1 << 12):
        got = CV.g1_from_dev(out)
        expected = OC.msm(OC.FP_OPS, pts_host, scs_host)
        assert got == [expected], "MSM mismatch vs oracle"
        print("oracle check (full): OK")
    else:
        k = 64
        small = M.msm(
            jax.tree.map(lambda x: x[..., :k], points),
            scalars[:, :k],
            curve=G1,
            c=c,
            lanes=min(lanes, 16),
            use_jit=True,
        )
        expected = OC.msm(OC.FP_OPS, pts_host[:k], scs_host[:k])
        assert CV.g1_from_dev(small) == [expected], "MSM mismatch vs oracle"
        print(f"oracle check (prefix {k}): OK")


if __name__ == "__main__":
    main()
