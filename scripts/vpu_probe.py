"""Probe raw VPU/MXU op costs on the real chip.

Measures, per (8,128)-tile element:
  * u32 add throughput
  * u32 mul throughput (16-bit values, full 32-bit result)
  * u32 shift/and throughput
  * bf16 matmul throughput at the Montgomery const-product shapes
  * current fieldops mont_mul rate (for the PERF.md baseline)

Run: python scripts/vpu_probe.py
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def chain_bench(op, n_ops=512, shape=(512, 1024), dtype=jnp.uint32):
    """Time a chain of dependent elementwise ops (defeats fusion-away)."""

    @jax.jit
    def f(a, b):
        x = a
        for i in range(n_ops):
            x = op(x, b)
        return x

    a = jnp.ones(shape, dtype)
    b = jnp.full(shape, 3, dtype)
    dt = timeit(f, a, b)
    elems = np.prod(shape)
    return elems * n_ops / dt  # element-ops/s


def matmul_bench(m, k, n, dtype, acc):
    @jax.jit
    def f(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc
        )

    a = jnp.ones((m, k), dtype)
    b = jnp.ones((k, n), dtype)
    dt = timeit(f, a, b)
    return m * k * n / dt  # MAC/s


def main():
    print(f"backend={jax.default_backend()} dev={jax.devices()[0].device_kind}")
    r_add = chain_bench(lambda x, y: x + y)
    print(f"u32 add      : {r_add/1e12:.2f} T elem-ops/s")
    r_mul = chain_bench(lambda x, y: x * y)
    print(f"u32 mul      : {r_mul/1e12:.2f} T elem-ops/s  (ratio vs add {r_add/r_mul:.2f}x)")
    r_mul16 = chain_bench(lambda x, y: (x & jnp.uint32(0xFFFF)) * y)
    print(f"u32 and+mul  : {r_mul16/1e12:.2f} T elem-ops/s")
    r_shr = chain_bench(lambda x, y: (x >> 16) + y)
    print(f"u32 shr+add  : {r_shr/1e12:.2f} T elem-ops/s")
    r_sel = chain_bench(lambda x, y: jnp.where(x > y, x, y))
    print(f"u32 cmp+sel  : {r_sel/1e12:.2f} T elem-ops/s")
    r_i32 = chain_bench(lambda x, y: x * y, dtype=jnp.int32)
    print(f"i32 mul      : {r_i32/1e12:.2f} T elem-ops/s")

    # mixed mul+add chain like an inner product accumulation
    r_fma = chain_bench(lambda x, y: x * y + x)
    print(f"u32 mul+add  : {r_fma/1e12:.2f} T 2-op-chains/s")

    # MXU shapes: m*p at 8-bit limbs: (1024 batch, 48) x (48, 96)
    for (m, k, n, dt, acc, tag) in [
        (1024, 48, 96, jnp.bfloat16, jnp.float32, "bf16 mont-const"),
        (4096, 48, 96, jnp.bfloat16, jnp.float32, "bf16 mont-const big"),
        (1024, 48, 96, jnp.int8, jnp.int32, "int8 mont-const"),
        (4096, 128, 128, jnp.bfloat16, jnp.float32, "bf16 128x128"),
        (4096, 128, 128, jnp.int8, jnp.int32, "int8 128x128"),
        (8192, 512, 512, jnp.bfloat16, jnp.float32, "bf16 big"),
        (8192, 512, 512, jnp.int8, jnp.int32, "int8 big"),
    ]:
        try:
            r = matmul_bench(m, k, n, dt, acc)
            print(f"matmul {tag:20s} ({m}x{k}x{n}): {r/1e12:.2f} T MAC/s")
        except Exception as e:  # pragma: no cover
            print(f"matmul {tag}: FAILED {type(e).__name__} {e}")

    # current mont_mul rate
    from ark_blst_tpu.ops import fieldops as FO
    from ark_blst_tpu.ops.limbs import FP

    n = 1 << 16
    a = jnp.ones((FP.num_limbs, n), jnp.uint32)
    b = jnp.full((FP.num_limbs, n), 3, jnp.uint32)

    @jax.jit
    def mulchain(a, b):
        x = a
        for _ in range(8):
            x = FO.mul(x, b, FP)
        return x

    dt = timeit(mulchain, a, b, iters=5)
    rate = 8 * n / dt
    print(f"fieldops mont_mul (current): {rate/1e6:.1f} M muls/s")


if __name__ == "__main__":
    main()
