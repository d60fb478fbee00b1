"""Measure one lazy full_add round at various batch shapes on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp


def _enable_compile_cache():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


_enable_compile_cache()

from ark_blst_tpu.curves import lazy_group as LG
from ark_blst_tpu.ops import lazy13 as LZ


def log(m):
    print(f"[{time.perf_counter():9.1f}] {m}", flush=True)


def sync(out):
    for leaf in jax.tree.leaves(out):
        a = leaf
        while a.ndim > 0:
            a = a[0]
        np.asarray(a)


def mk_pt(shape, rng):
    def elem():
        return [jnp.asarray(rng.integers(-4000, 4000, shape, np.int32))
                for _ in range(LZ.ELEM)]
    return (elem(), elem(), elem())


@jax.jit
def one_round(lo, hi):
    return LG.full_add(LG.FP_LAZY, lo, hi)


def main():
    rng = np.random.default_rng(0)
    for shape in [(512, 38, 65), (64, 38, 65), (8, 38, 65), (38, 65), (38,), (1,)]:
        lo, hi = mk_pt(shape, rng), mk_pt(shape, rng)
        out = one_round(lo, hi)
        sync(out)
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            out = one_round(lo, hi)
            sync(out)
        dt = (time.perf_counter() - t0) / iters
        n = int(np.prod(shape))
        log(f"full_add batch {shape}: {dt*1e3:8.2f} ms  ({n/dt/1e6:.2f} M adds/s)")


if __name__ == "__main__":
    main()
