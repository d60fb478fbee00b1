"""Decisive: single-call wall-clock + XLA cost analysis for list-level mont."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, flush=True)


def main():
    rng = np.random.default_rng(1)
    from ark_blst_tpu.ops import fieldops as FO
    from ark_blst_tpu.ops.limbs import FP, ints_to_limbs, limbs_to_ints

    P = FP.modulus
    n = 1 << 18
    vals = [int.from_bytes(rng.bytes(48), "little") % P for _ in range(n // 1024)]
    # distinct value per tile slot position to be safe: build (24, T, 8, 128)
    base = ints_to_limbs(vals, FP.num_limbs)  # (T, 24)
    T = n // 1024
    mat = np.broadcast_to(base.T[:, :, None], (24, T, 1024)).reshape(24, T, 8, 128)
    a = jnp.asarray(np.ascontiguousarray(mat))

    depth = 8

    @jax.jit
    def mulchain_list(x):
        xl = [x[i] for i in range(24)]
        y = xl
        for _ in range(depth):
            y = FO._mont_mul_list(y, xl, FP)
        return jnp.stack(y)

    lowered = mulchain_list.lower(jax.ShapeDtypeStruct((24, T, 8, 128), jnp.uint32))
    comp = lowered.compile()
    try:
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        log(f"XLA cost: flops={ca.get('flops', '?'):.3e} bytes={ca.get('bytes accessed', '?'):.3e}")
    except Exception as e:
        log(f"cost_analysis failed: {e}")

    out = mulchain_list(a)
    jax.block_until_ready(out)
    # verify every tile's first lane
    rinv = pow(FP.mont_r, -1, P)
    ok = True
    outh = np.asarray(out)
    for t in range(0, T, 37):
        want = vals[t]
        for _ in range(depth):
            want = want * vals[t] % P * rinv % P
        got = limbs_to_ints(outh[:, t, 0, :1].T)[0]
        ok &= got == want
    log(f"verified sampled tiles: {ok}")

    for iters in (1, 4, 16, 64):
        x = a
        t0 = time.perf_counter()
        for _ in range(iters):
            x = mulchain_list(x)
        jax.block_until_ready(x)
        wall = time.perf_counter() - t0
        log(f"iters={iters:3d}: wall={wall*1e3:9.2f}ms per-call={wall/iters*1e3:7.3f}ms "
            f"rate={depth*n*iters/wall/1e6:9.1f} M muls/s")


if __name__ == "__main__":
    main()
