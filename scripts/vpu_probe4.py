"""Architecture-deciding measurements:

1. true VPU sustained element-op rate (unfoldable chains)
2. XLA sort rate at 4M keys (gates sort/partition MSM designs)
3. XLA gather rate for point permutation (gates same)
4. list-level mont_mul rate on (8,128) tiles at XLA level
"""

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
    print(msg, flush=True)


def main():
    rng = np.random.default_rng(1)

    # 1. unfoldable two-op chain: x = x*y + c; y = y ^ x  (mul, add, xor per step)
    shape = (512, 128)
    x0 = jnp.asarray(rng.integers(0, 1 << 32, shape, dtype=np.uint32))
    y0 = jnp.asarray(rng.integers(0, 1 << 32, shape, dtype=np.uint32))
    n_steps = 256

    @jax.jit
    def chain(x, y):
        for i in range(n_steps):
            x = x * y + jnp.uint32(i)
            y = y ^ x
        return x, y

    dt = timeit(chain, x0, y0)
    ops = 3 * n_steps * np.prod(shape)
    log(f"unfoldable chain (mul,add,xor): {ops/dt/1e12:.2f} T elem-ops/s")

    # mul-free variant to compare add/xor rate
    @jax.jit
    def chain2(x, y):
        for i in range(n_steps):
            x = x + y + jnp.uint32(i)
            y = y ^ x
        return x, y

    dt = timeit(chain2, x0, y0)
    log(f"unfoldable chain (add,add,xor): {ops/dt/1e12:.2f} T elem-ops/s")

    # 2. sort 4M u32 keys (+u32 payload)
    for logn in (20, 22):
        n = 1 << logn
        keys = jnp.asarray(rng.integers(0, 1 << 16, n, dtype=np.uint32))
        vals = jnp.arange(n, dtype=jnp.uint32)
        srt = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
        dt = timeit(srt, keys, vals, iters=3)
        log(f"sort 2^{logn} (k,v): {dt*1e3:8.2f} ms  ({n/dt/1e6:.1f} M keys/s)")

    # 3. gather: permute a (rows, N) point array by 4M random indices
    for rows, logn in ((48, 20), (48, 22)):
        n = 1 << logn
        pts = jnp.asarray(rng.integers(0, 1 << 32, (rows, n), dtype=np.uint32))
        idx = jnp.asarray(rng.permutation(n).astype(np.int32))
        g = jax.jit(lambda p, i: jnp.take(p, i, axis=1))
        try:
            dt = timeit(g, pts, idx, iters=3)
            gb = rows * n * 4 / 1e9
            log(f"gather (rows={rows}, 2^{logn}): {dt*1e3:8.2f} ms ({gb/dt:.1f} GB/s eff)")
        except Exception as e:
            log(f"gather 2^{logn} FAILED: {e}")

    # gather with batch-major layout (N, rows)
    n = 1 << 20
    pts = jnp.asarray(rng.integers(0, 1 << 32, (n, 48), dtype=np.uint32))
    idx = jnp.asarray(rng.permutation(n).astype(np.int32))
    g2 = jax.jit(lambda p, i: jnp.take(p, i, axis=0))
    dt = timeit(g2, pts, idx, iters=3)
    log(f"gather batch-major (2^20, 48): {dt*1e3:8.2f} ms ({48*n*4/1e9/dt:.1f} GB/s eff)")

    # 4. list-level mont on (T,8,128) tiles, random data, correctness
    from ark_blst_tpu.ops import fieldops as FO
    from ark_blst_tpu.ops.limbs import FP, ints_to_limbs, limbs_to_ints

    P = FP.modulus
    n = 1 << 18
    base = ints_to_limbs(
        [int.from_bytes(rng.bytes(48), "little") % P for _ in range(256)],
        FP.num_limbs,
    )
    mat = np.tile(base.T, (1, n // 256)).reshape(24, n // 1024, 8, 128)
    a = jnp.asarray(mat)
    b = jnp.asarray(mat[:, ::-1])

    depth = 8

    @jax.jit
    def mulchain_list(a, b):
        al = [a[i] for i in range(24)]
        bl = [b[i] for i in range(24)]
        x = al
        for _ in range(depth):
            x = FO._mont_mul_list(x, bl, FP)
        return jnp.stack(x)

    out = mulchain_list(a, b)
    jax.block_until_ready(out)
    dt = timeit(mulchain_list, a, b, iters=5)
    log(f"list-level mont (24,{n//1024},8,128): {depth*n/dt/1e6:8.1f} M muls/s dt={dt*1e3:.2f}ms")


if __name__ == "__main__":
    main()
