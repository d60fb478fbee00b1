"""Robust re-measurement: dependent iteration chains + output verification."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit_dep(fn, x, iters=5, warmup=1):
    """fn: x -> x-like. Chains outputs so iterations can't overlap/skip."""
    for _ in range(warmup):
        x = fn(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters, x


def log(msg):
    print(msg, flush=True)


def main():
    rng = np.random.default_rng(1)

    # list-level mont on tiles, dependent chain
    from ark_blst_tpu.ops import fieldops as FO
    from ark_blst_tpu.ops.limbs import FP, ints_to_limbs, limbs_to_ints

    P = FP.modulus
    n = 1 << 18
    base = ints_to_limbs(
        [int.from_bytes(rng.bytes(48), "little") % P for _ in range(256)],
        FP.num_limbs,
    )
    v0 = limbs_to_ints(base[:1])[0]
    mat = np.tile(base.T, (1, n // 256)).reshape(24, n // 1024, 8, 128)
    a = jnp.asarray(mat)

    depth = 8

    @jax.jit
    def mulchain_list(x):
        xl = [x[i] for i in range(24)]
        y = xl
        for _ in range(depth):
            y = FO._mont_mul_list(y, xl, FP)
        return jnp.stack(y)

    iters = 5
    dt, out = timeit_dep(mulchain_list, a, iters=iters)
    # verify: after warmup+iters applications of x -> x^(depth+1) in mont form...
    # simpler: recompute expected for lane (0,0,0) on host
    rinv = pow(FP.mont_r, -1, P)
    x = v0
    for _ in range((1 + iters)):
        base_v = x
        y = x
        for _ in range(depth):
            y = y * base_v % P * rinv % P
        x = y
    got = limbs_to_ints(np.asarray(out[:, 0, 0, :1]).T)[0]
    log(f"list mont tiles: {depth*n/dt/1e6:8.1f} M muls/s dt={dt*1e3:.2f}ms correct={got==x}")

    # raw unfoldable chain at bigger shape
    shape = (4096, 128)
    xy = jnp.asarray(rng.integers(0, 1 << 32, (2,) + shape, dtype=np.uint32))
    n_steps = 512

    @jax.jit
    def chain(xy):
        x, y = xy[0], xy[1]
        for i in range(n_steps):
            x = x * y + jnp.uint32(i)
            y = y ^ x
        return jnp.stack([x, y])

    dt, _ = timeit_dep(chain, xy, iters=5)
    ops = 3 * n_steps * np.prod(shape)
    log(f"unfoldable mul/add/xor chain: {ops/dt/1e12:.2f} T elem-ops/s dt={dt*1e3:.2f}ms")

    # sort with dependent chain: re-sort its own output perturbed
    n = 1 << 22
    keys = jnp.asarray(rng.integers(0, 1 << 16, n, dtype=np.uint32))
    vals = jnp.arange(n, dtype=jnp.uint32)

    @jax.jit
    def sortstep(kv):
        k, v = kv
        k2, v2 = jax.lax.sort((k ^ (v & jnp.uint32(0xFFFF)), v), num_keys=1)
        return (k2, v2)

    dt, (ks, vs) = timeit_dep(sortstep, (keys, vals), iters=3)
    ok = bool(jnp.all(ks[1:] >= ks[:-1]))
    log(f"sort 2^22 kv: {dt*1e3:8.2f} ms ({n/dt/1e6:.1f} M keys/s) sorted={ok}")

    # gather with dependent chain: permute repeatedly by data-dependent indices
    rows = 48
    n = 1 << 20
    pts = jnp.asarray(rng.integers(0, 1 << 32, (rows, n), dtype=np.uint32))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    @jax.jit
    def gstep(state):
        p, idx = state
        p2 = jnp.take(p, idx, axis=1)
        # derive next permutation from data (still a valid permutation: rotate)
        idx2 = jnp.roll(idx, 1)
        return (p2, idx2)

    dt, (pout, _) = timeit_dep(gstep, (pts, perm), iters=5)
    s_in = int(jnp.sum(pts[0]))
    s_out = int(jnp.sum(pout[0]))
    gb = rows * n * 4 / 1e9
    log(f"gather rows-major (48, 2^20): {dt*1e3:8.2f} ms ({gb/dt:.1f} GB/s eff) sum_ok={s_in==s_out}")

    n = 1 << 20
    ptsb = jnp.asarray(rng.integers(0, 1 << 32, (n, rows), dtype=np.uint32))

    @jax.jit
    def gstep2(state):
        p, idx = state
        return (jnp.take(p, idx, axis=0), jnp.roll(idx, 1))

    dt, (pout2, _) = timeit_dep(gstep2, (ptsb, perm), iters=5)
    log(f"gather batch-major (2^20, 48): {dt*1e3:8.2f} ms ({gb/dt:.1f} GB/s eff) sum_ok={int(jnp.sum(ptsb[:,0]))==int(jnp.sum(pout2[:,0]))}")


if __name__ == "__main__":
    main()
