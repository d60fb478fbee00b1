"""Is an XLA-level lazy mont_mul fusion-bound? Chain K muls in one jit."""
import os, sys, time, random
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from ark_blst_tpu.ops import lazy13 as LZ

def log(m): print(f"[{time.perf_counter():9.1f}] {m}", flush=True)

rng = np.random.default_rng(0)
for logn, iters in ((18, 16), (20, 16), (22, 8)):
    n = 1 << logn
    S = n // 128
    mat = rng.integers(-4096, 4096, (30, S, 128), dtype=np.int32)
    a = [jnp.asarray(mat[k]) for k in range(30)]
    b = [jnp.asarray(np.roll(mat, 5, axis=0)[k]) for k in range(30)]

    @jax.jit
    def chain(a, b):
        def body(i, x):
            return LZ.mont_mul(x, b)
        return jnp.stack(lax.fori_loop(0, iters, body, a))

    out = chain(a, b); np.asarray(out[0, 0, 0])
    t0 = time.perf_counter()
    out = chain(a, b); np.asarray(out[0, 0, 0])
    dt = time.perf_counter() - t0
    per = dt / iters
    log(f"2^{logn}: {per*1e3:7.2f} ms/mul  {n/per/1e6:8.1f} M mul/s  "
        f"({per/ (n*3500/3.4e12):4.1f}x of ~3.5K-eops compute bound)")
