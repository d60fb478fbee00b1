"""Speed-of-light model for the Fp Montgomery multiply + MSM cost model.

Counts the actual vector-op work in one list-level Montgomery multiply by
tracing it and tallying jaxpr primitives (element-ops = primitive count x
elements per tile), then compares the per-chip bound implied by the VPU
throughput against the measured rate (scripts/tpu_microbench.py fpmul).

v5e VPU model: 8x128 lanes, ~4 int32 ALU slots/cycle, ~0.94 GHz
=> ~3.9e12 elementwise u32 ops/s ceiling (vector ops only; ignores
load/store pressure, so the bound is optimistic).

Run: python scripts/perf_model.py            (model only)
     python scripts/perf_model.py --measure  (also run the TPU microbench)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VPU_OPS_PER_S = 3.9e12  # v5e elementwise u32 ceiling (see docstring)


def count_mul_ops():
    import jax
    import jax.numpy as jnp

    from ark_blst_tpu.ops import fieldops as FO
    from ark_blst_tpu.ops.limbs import FP

    def one_mul(a, b):
        al = [a[i] for i in range(FP.num_limbs)]
        bl = [b[i] for i in range(FP.num_limbs)]
        return jnp.stack(FO._mont_mul_list(al, bl, FP))

    shape = (FP.num_limbs, 8, 128)
    jaxpr = jax.make_jaxpr(one_mul)(
        jnp.zeros(shape, jnp.uint32), jnp.zeros(shape, jnp.uint32)
    )

    def tally(jx):
        n = 0
        for eqn in jx.eqns:
            for param in eqn.params.values():
                if hasattr(param, "jaxpr"):
                    n += tally(param.jaxpr)
            n += 1
        return n

    prims = tally(jaxpr.jaxpr)
    return prims


def main():
    prims = count_mul_ops()
    # each primitive touches one (8,128)-element tile per limb-op
    ops_per_elem_mul = prims  # element-ops per field element per multiply
    bound = VPU_OPS_PER_S / ops_per_elem_mul
    print(f"traced primitives per Fp mont_mul: {prims}")
    print(f"speed-of-light Fp mul rate (v5e, VPU-bound): {bound/1e6:.0f} M muls/s")
    print()
    print("MSM cost model (points/s bound at window c, complete adds):")
    for c in (4, 5, 6, 8):
        W = -(-256 // c)
        muls_per_add = 12  # RCB15 complete add
        onehot = 3 * (1 << c) * 72 / 1500.0  # one-hot ops in mul-equivalents
        mul_rate = bound
        pts_bound = mul_rate / (W * (muls_per_add + onehot))
        print(
            f"  c={c}: W={W}, ~{muls_per_add + onehot:.1f} mul-equiv/add"
            f" -> bound ~{pts_bound/1e6:.2f} M points/s/chip"
        )
    if "--measure" in sys.argv:
        from tpu_microbench import bench_fpmul

        bench_fpmul(20)


if __name__ == "__main__":
    main()
