"""Careful mont_mul rate measurement with random data + correctness check."""

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


def log(msg):
    print(f"[{time.perf_counter():8.1f}s] {msg}", flush=True)


def main():
    from ark_blst_tpu.ops import fieldops as FO
    from ark_blst_tpu.ops.limbs import FP, ints_to_limbs, limbs_to_ints

    rng = np.random.default_rng(0)
    P = FP.modulus
    n = 1 << 18
    log(f"building inputs n=2^18")
    base = ints_to_limbs(
        [int.from_bytes(rng.bytes(48), "little") % P for _ in range(256)],
        FP.num_limbs,
    )
    a = jnp.asarray(np.tile(base.T, (1, n // 256)))  # (24, n)
    b = jnp.asarray(np.tile(base.T[:, ::-1], (1, n // 256)))
    av0 = limbs_to_ints(base[:1])[0]
    bv0 = limbs_to_ints(base[255:256])[0]

    depth = 8

    @jax.jit
    def mulchain(a, b):
        x = a
        for _ in range(depth):
            x = FO.mul(x, b, FP)
        return x

    log("compiling mulchain")
    out = mulchain(a, b)
    jax.block_until_ready(out)
    log("compiled; checking correctness")
    rinv = pow(FP.mont_r, -1, P)
    want = av0
    for _ in range(depth):
        want = want * bv0 % P * rinv % P
    got = limbs_to_ints(np.asarray(out[:, :1]).T)[0]
    log(f"correct={got == want}")
    dt = timeit(mulchain, a, b, iters=10)
    log(f"stacked mont_mul: {depth*n/dt/1e6:8.1f} M muls/s  dt={dt*1e3:.2f}ms")


if __name__ == "__main__":
    main()
