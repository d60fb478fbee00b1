"""Micro-probe: _prepare_inputs sub-stage timings (2-D shapes)."""
import os, sys, time, random
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from ark_blst_tpu.curves import msm_pallas2 as MP2
from ark_blst_tpu.curves import msm as M
from ark_blst_tpu.curves.group import G1
from ark_blst_tpu.ops import convert as CV, lazy13 as LZ
from ark_blst_tpu.oracle import curve as OC, field as OF

def log(m): print(f"[{time.perf_counter():9.1f}] {m}", flush=True)

def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(out[(0,) * out.ndim])
    log(f"{name}: {(time.perf_counter()-t0)/reps*1e3:8.1f} ms")

logn = 22
n = 1 << logn
S = n // 128
rng = random.Random(42)
base = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(64)]
pts = base * (n // 64)
scs = [rng.randrange(OF.R) for _ in range(n)]
dp, ds = CV.g1_to_dev(pts), CV.fr_to_dev(scs)
jax.block_until_ready(dp[0])
x, y, z = jax.tree.map(lambda a: a.reshape(24, S, 128), dp)
ds2 = ds.reshape(16, S, 128)

@jax.jit
def conv1(x):
    return jnp.stack(MP2._lazy_from_strict(x))

@jax.jit
def splice_only(x):
    return jnp.stack(LZ.from_limbs16([x[i] for i in range(24)]))

@jax.jit
def inv_only(z):
    zl = MP2._lazy_from_strict(z)
    from ark_blst_tpu.curves import lazy_group as LG
    one = LG.FP_LAZY.one(zl)
    return jnp.stack(MP2._batch_inverse(zl, n))

@jax.jit
def digits_only(s):
    return M.window_digits_signed(s, 7)

@jax.jit
def one_mul(x, y):
    xl, yl = MP2._lazy_from_strict(x), MP2._lazy_from_strict(y)
    return jnp.stack(LZ.mont_mul(xl, yl))

@jax.jit
def pack_only(x):
    xl = MP2._lazy_from_strict(x)
    return jnp.stack(MP2.pack30(LZ.store30(xl)))

timeit("splice (bit repack only)", splice_only, x)
timeit("conv1 (splice + mont_mul_const)", conv1, x)
timeit("one mont_mul", one_mul, x, y)
timeit("inversion", inv_only, z)
timeit("digits", digits_only, ds2)
timeit("conv + store30 + pack", pack_only, x)
