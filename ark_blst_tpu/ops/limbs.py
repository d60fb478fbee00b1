"""L1 limb engine: vectorized multi-precision Montgomery arithmetic in JAX.

TPU-native re-creation of blst's 384/256-bit Montgomery arithmetic
(/root/reference relies on blst C/assembly via `Cargo.toml:22`; raw limbs
surface at src/fp.rs:482-491). A TPU is a batch machine with no add-with-carry
instruction, so the design is the opposite of blst's scalar 64-bit assembly:

* **array-of-elements, structure-of-limbs**: a field element batch is a
  `uint32` array of shape (..., L) holding 16-bit limbs, little-endian.
  16-bit limbs make every limb product fit exactly in uint32 — the same
  32-bit re-limbing the reference itself applies for accelerators
  (GpuField at /root/reference/src/gpu.rs:253-285 exports u32 limbs).
* **carry-free accumulation**: products are split into lo/hi halves and
  accumulated "relaxed" (values < 2^31); exact normalization to strict
  16-bit digits uses one digit-fold plus a Kogge–Stone carry-lookahead
  (log2(n) rounds of vector ops) instead of a sequential ripple.
* **Montgomery reduction via full multiplication** (3 schoolbook products:
  a*b, t_lo*N', m*p) rather than word-serial CIOS — no sequential limb
  recurrence, so the whole mul is a short, wide dataflow graph that XLA
  vectorizes over the batch.

All functions are shape-polymorphic over leading batch dimensions and safe
under jit/vmap/shard_map.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp
from jax import lax

LIMB_BITS = 16
MASK = 0xFFFF


def int_to_limbs(x: int, num_limbs: int) -> np.ndarray:
    """Host-side: int -> little-endian 16-bit limbs (uint32 storage)."""
    assert 0 <= x < 1 << (LIMB_BITS * num_limbs)
    return np.array(
        [(x >> (LIMB_BITS * i)) & MASK for i in range(num_limbs)], dtype=np.uint32
    )


def limbs_to_int(a) -> int:
    """Host-side: little-endian 16-bit limbs -> int."""
    a = np.asarray(a)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(a.reshape(-1)))


def ints_to_limbs(xs, num_limbs: int) -> np.ndarray:
    """Host-side: iterable of ints -> (N, L) uint32 limb matrix."""
    return np.stack([int_to_limbs(int(x), num_limbs) for x in xs])


def limbs_to_ints(a) -> list:
    a = np.asarray(a)
    return [limbs_to_int(row) for row in a.reshape(-1, a.shape[-1])]


@dataclass(frozen=True)
class FieldSpec:
    """Montgomery parameters for one prime field, precomputed on host."""

    name: str
    modulus: int
    num_limbs: int
    # derived (filled in __post_init__ via object.__setattr__)
    mont_r: int = field(init=False)
    mont_r2: int = field(init=False)
    ninv: int = field(init=False)  # (-modulus^-1) mod R, full width

    def __post_init__(self):
        r_mod = 1 << (LIMB_BITS * self.num_limbs)
        assert self.modulus < r_mod // 2, "need headroom: 2p < R"
        object.__setattr__(self, "mont_r", r_mod % self.modulus)
        object.__setattr__(self, "mont_r2", self.mont_r**2 % self.modulus)
        object.__setattr__(self, "ninv", (-pow(self.modulus, -1, r_mod)) % r_mod)

    # numpy constant limb vectors (become XLA constants under jit)
    @functools.cached_property
    def p_limbs(self):
        return int_to_limbs(self.modulus, self.num_limbs)

    @functools.cached_property
    def pcomp_limbs(self):
        """0xffff - p[k] per digit: used for borrow-free subtraction."""
        return np.uint32(MASK) - self.p_limbs

    @functools.cached_property
    def ninv_limbs(self):
        return int_to_limbs(self.ninv, self.num_limbs)

    @functools.cached_property
    def one_limbs(self):
        one = np.zeros(self.num_limbs, dtype=np.uint32)
        one[0] = 1
        return one

    @functools.cached_property
    def zero_limbs(self):
        return np.zeros(self.num_limbs, dtype=np.uint32)

    @functools.cached_property
    def mont_one_limbs(self):
        return int_to_limbs(self.mont_r, self.num_limbs)

    @functools.cached_property
    def r2_limbs(self):
        return int_to_limbs(self.mont_r2, self.num_limbs)


# The two BLS12-381 fields. Moduli mirror /root/reference/src/fp.rs:25-32 and
# src/scalar.rs:476-481 (imported from the oracle: single source of truth).
from ..oracle.field import P as _P, R as _R  # noqa: E402

FP = FieldSpec("fp", _P, 24)   # 384 bits of limbs for the 381-bit field
FR = FieldSpec("fr", _R, 16)   # 256 bits of limbs for the 255-bit field


# --- normalization -----------------------------------------------------------

def _pad_last(x, lo, hi):
    if lo == 0 and hi == 0:
        return x
    pads = [(0, 0, 0)] * (x.ndim - 1) + [(lo, hi, 0)]
    return lax.pad(x, jnp.zeros((), x.dtype), pads)


def normalize(t, out_len: int):
    """Exact carry normalization: relaxed digits (values < 2^31) -> strict
    16-bit digits of the same value, truncated to `out_len` limbs (caller
    guarantees the value fits, except where truncation-mod-2^(16k) is the
    intent, e.g. reduction mod R).

    One digit fold (a < 2^16 plus b < 2^15 per digit) then Kogge–Stone
    carry-lookahead — exact for all inputs, no data-dependent ripple.
    """
    n = t.shape[-1]
    width = max(n + 1, out_len)
    a = _pad_last(t & MASK, 0, width - n)
    b = _pad_last(t >> LIMB_BITS, 1, width - n - 1)
    s = a + b  # digit sums < 2^16 + 2^15
    g = s >> LIMB_BITS  # generate: in {0, 1}
    p = ((s & MASK) == MASK).astype(jnp.uint32)  # propagate
    d = 1
    while d < width:
        gs = _pad_last(g[..., :-d], d, 0)
        ps = _pad_last(p[..., :-d], d, 0)
        g = g | (p * gs)
        p = p * ps
        d *= 2
    carry_in = _pad_last(g[..., :-1], 1, 0)
    res = (s + carry_in) & MASK
    return res[..., :out_len]


# --- schoolbook product ------------------------------------------------------

def mul_wide(a, b):
    """Full product of two L-limb strict-digit numbers -> relaxed 2L digits.

    Outer product (exact: 16x16 -> 32 bit), lo/hi split, anti-diagonal
    accumulation via statically shifted row sums. Output digits < 2^22.
    """
    la, lb = a.shape[-1], b.shape[-1]
    out = la + lb
    prod = a[..., :, None] * b[..., None, :]  # (..., la, lb) uint32
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    acc = jnp.zeros(a.shape[:-1] + (out,), jnp.uint32)
    for i in range(la):
        acc = acc + _pad_last(lo[..., i, :], i, out - lb - i)
        acc = acc + _pad_last(hi[..., i, :], i + 1, out - lb - i - 1)
    return acc


def mul_low(a, b, out_len: int):
    """Low `out_len` digits of the product (relaxed), i.e. mod 2^(16*out_len).
    Skips the upper-half limb products entirely."""
    la = a.shape[-1]
    acc = jnp.zeros(a.shape[:-1] + (out_len,), jnp.uint32)
    for i in range(min(la, out_len)):
        w = out_len - i  # digits of b that still land below the cut
        seg = b[..., :w]
        prod = a[..., i : i + 1] * seg
        acc = acc + _pad_last(prod & MASK, i, 0)
        hi = (prod >> LIMB_BITS)[..., : max(w - 1, 0)]
        if hi.shape[-1]:
            acc = acc + _pad_last(hi, i + 1, 0)
    return acc


# --- modular ops (strict digits in [0, p) unless stated) ---------------------

def cond_sub_p(u, spec: FieldSpec):
    """u in [0, 2p) with strict digits -> u mod p."""
    L = spec.num_limbs
    t = u + jnp.asarray(spec.pcomp_limbs)
    t = t.at[..., 0].add(1)  # u + (R - p): carry-out at digit L iff u >= p
    v = normalize(t, L + 1)
    ge = v[..., L:] == 1  # (..., 1) boolean mask
    return jnp.where(ge, v[..., :L], u)


def add_mod(a, b, spec: FieldSpec):
    return cond_sub_p(normalize(a + b, spec.num_limbs), spec)


def sub_mod(a, b, spec: FieldSpec):
    # a - b + p computed borrow-free: a + (0xffff - b[k]) + p + 1 == a-b+p+R
    t = a + (jnp.uint32(MASK) - b) + jnp.asarray(spec.p_limbs)
    t = t.at[..., 0].add(1)
    return cond_sub_p(normalize(t, spec.num_limbs), spec)  # drop the +R carry


def neg_mod(a, spec: FieldSpec):
    # p - a mod p (a == 0 maps to p, which cond_sub_p folds back to 0)
    t = (jnp.uint32(MASK) - a) + jnp.asarray(spec.p_limbs)
    t = t.at[..., 0].add(1)  # (R - 1 - a) + p + 1 = p - a + R
    return cond_sub_p(normalize(t, spec.num_limbs), spec)


def mont_mul(a, b, spec: FieldSpec):
    """Montgomery product abR^-1 mod p for strict inputs in [0, p)."""
    L = spec.num_limbs
    t = normalize(mul_wide(a, b), 2 * L)  # a*b < p^2
    m = normalize(mul_low(t[..., :L], jnp.asarray(spec.ninv_limbs), L), L)
    u = t + _pad_last(mul_wide(m, jnp.asarray(spec.p_limbs)), 0, 0)
    u = normalize(u, 2 * L)  # (t + m*p) exactly divisible by R; < 2pR
    return cond_sub_p(u[..., L:], spec)


def mont_sqr(a, spec: FieldSpec):
    return mont_mul(a, a, spec)


def to_mont(a, spec: FieldSpec):
    return mont_mul(a, jnp.asarray(spec.r2_limbs), spec)


def from_mont(a, spec: FieldSpec):
    one = jnp.broadcast_to(jnp.asarray(spec.one_limbs), a.shape)
    return mont_mul(a, one, spec)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def select(mask, a, b):
    """mask broadcast over the limb axis: where(mask, a, b)."""
    return jnp.where(mask[..., None], a, b)


def pow_fixed(a, exponent: int, spec: FieldSpec):
    """a^exponent (Montgomery form in, Montgomery form out) for a *static*
    Python-int exponent, via an MSB-first square-and-multiply lax.scan —
    small trace regardless of exponent size."""
    bits = np.array([int(c) for c in bin(exponent)[2:]], dtype=np.int32)
    one = jnp.broadcast_to(jnp.asarray(spec.mont_one_limbs), a.shape)

    def body(f, bit):
        f = mont_sqr(f, spec)
        f = select(bit == 1, mont_mul(f, a, spec), f)
        return f, None

    out, _ = lax.scan(body, one, jnp.asarray(bits))
    return out


def inv_mod(a, spec: FieldSpec):
    """Fermat inverse a^(p-2); fully batch-parallel (0 maps to 0)."""
    return pow_fixed(a, spec.modulus - 2, spec)
