"""Verify the suspicious mont_mul rate with random data + correctness check."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from ark_blst_tpu.ops import fieldops as FO
    from ark_blst_tpu.ops.limbs import FP, ints_to_limbs, limbs_to_ints

    rng = np.random.default_rng(0)
    P = FP.modulus

    for logn in (18,):
        n = 1 << logn
        av = [int(rng.integers(0, 1 << 62)) * 12345 % P for _ in range(16)] * (n // 16)
        bv = [int(rng.integers(0, 1 << 62)) * 54321 % P for _ in range(16)] * (n // 16)
        a = jnp.asarray(ints_to_limbs(av, FP.num_limbs).T)  # (24, n)
        b = jnp.asarray(ints_to_limbs(bv, FP.num_limbs).T)

        depth = 8

        @jax.jit
        def mulchain(a, b):
            x = a
            for _ in range(depth):
                x = FO.mul(x, b, FP)
            return x

        out = mulchain(a, b)
        # correctness on first element
        rinv = pow(FP.mont_r, -1, P)
        want = av[0]
        for _ in range(depth):
            want = want * bv[0] % P * rinv % P
        got = limbs_to_ints(np.asarray(out[:, 0]).reshape(1, -1))[0]
        ok = got == want
        dt = timeit(mulchain, a, b)
        rate = depth * n / dt
        print(f"n=2^{logn}: {rate/1e6:8.1f} M muls/s  dt={dt*1e3:.2f}ms  correct={ok}")

    # list-level mont mul on (8,128) tiles stacked along sublanes, like the kernel
    n = 1 << 18
    av = [int(rng.integers(0, P)) for _ in range(64)] * (n // 64)
    bv = [int(rng.integers(0, P)) for _ in range(64)] * (n // 64)
    a = jnp.asarray(ints_to_limbs(av, FP.num_limbs).T).reshape(24, n // 128, 128)
    b = jnp.asarray(ints_to_limbs(bv, FP.num_limbs).T).reshape(24, n // 128, 128)

    @jax.jit
    def mulchain_list(a, b):
        al = [a[i] for i in range(24)]
        bl = [b[i] for i in range(24)]
        x = al
        for _ in range(8):
            x = FO._mont_mul_list(x, bl, FP)
        return jnp.stack(x)

    out = mulchain_list(a, b)
    dt = timeit(mulchain_list, a, b)
    print(f"list-level (24,{n//128},128): {8*n/dt/1e6:8.1f} M muls/s dt={dt*1e3:.2f}ms")

    # how many HLO ops after XLA optimization?
    lowered = jax.jit(lambda a, b: FO.mul(a, b, FP)).lower(
        jax.ShapeDtypeStruct((24, 1 << 16), jnp.uint32),
        jax.ShapeDtypeStruct((24, 1 << 16), jnp.uint32),
    )
    compiled = lowered.compile()
    txt = compiled.as_text()
    import re
    fusions = len(re.findall(r"fusion", txt))
    print(f"compiled HLO: {len(txt.splitlines())} lines, {fusions} fusion mentions")
    try:
        cost = compiled.cost_analysis()
        print({k: v for k, v in cost.items() if "flops" in k or "bytes" in k.lower() or "time" in k})
    except Exception as e:
        print("cost_analysis failed:", e)


if __name__ == "__main__":
    main()
