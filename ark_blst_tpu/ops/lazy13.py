"""Signed lazy radix-13 Montgomery engine — the round-3 fast field core.

Replaces the strict radix-16 pipeline (ops/fieldops.py) on the MSM hot path.
Measured on the real v5e chip (scripts/vpu_probe6.py, PERF.md): the strict
engine costs ~31K XLA element-ops per Montgomery multiply, ~2/3 of it carry
normalization (Kogge-Stone after every op) and canonical reduction (cond_sub
after every op). This engine cuts the count to ~6K by *never* canonicalizing
inside a computation:

* **Digits are signed int32**, radix 2^13. Subtraction and negation are plain
  digit-wise ops — no borrow handling, no p-complement constants (the strict
  engine pays a full add+normalize chain per subtract).
* **Lazy carries**: a multiply accumulates raw 26-bit digit products in int32
  columns (<= 30 terms x 2^26.02 < 2^31, exact); carries are released by
  cheap O(L) *fold* passes (3 ops/digit) only when the next multiply needs
  its operands "mul-ready". Radix 13 is the signed optimum of
  `2d + log2(L) <= 31`: radix 14 overflows int32 columns, radix 12 costs 13%
  more products. Mul-ready x mul-ready products run a hybrid two-level
  Karatsuba (`mul_wide_f`, -28% eops; the middle products stay schoolbook
  because their operand bound doubles).
* **Redundant values**: elements live in (-3p, 3p) after a Montgomery multiply
  (u = t/R + m'p/R: the map contracts for |inputs| < R/2) and are
  canonicalized exactly once, at the very end of a pipeline.
* **Montgomery domain R13 = 2^390** (not 2^384): conversion to/from the
  strict radix-16 R16 domain is one multiply + a bit-splice repack.

Plays the role of blst's 384-bit assembly on the hot path
(/root/reference/Cargo.toml:22, src/fp.rs:482-491); the 32-bit re-limbing
precedent is the reference's own GPU layer (src/gpu.rs:253-285).

All functions operate on *lists of per-limb int32 arrays* of any common shape
(JAX or Pallas values) — usable inside Mosaic kernels and at the XLA level.

REPRESENTATION CONTRACT (BALANCED digits)
  Folds produce BALANCED digits in [-4096, 4095]+carry — this is the load-
  bearing choice: the digit-string magnitude of an L-digit balanced value is
  at most 4129 * (2^(13L)-1)/8191 < 0.504 * 2^(13L), so a digit string can
  never encode a borrow chain that nets a full +-2^(13L) unit. Consequences:
    * truncating a folded value to 30 digits is PROVABLY exact whenever
      |value| < 0.49 * 2^390 ~ 250p (the dropped net is a multiple of the
      cut weight and strictly smaller in magnitude), and
    * the low 30 digits of the Montgomery u = t + m*p, being divisible by
      R13 and bounded by 0.504*R13, are exactly ZERO-valued — no carry into
      the high part at all (the unbalanced design needs a delta-detection
      pass here and is wrong at the margin).
  element      : 30 signed int32 digits (= ELEM); mul-ready = |d| <= F = 4129.
  sum-of-2     : |d| <= 2F = 8258 — still directly multipliable (schoolbook).
  canonical    : digits in [0, 2^13) (e.g. loaded constants) — also
                 multipliable schoolbook (30*8191*8191 = 2.01e9 < 2^31).
  sum-of-k>=3  : must pass `fold_sum` before multiplying.
  column/wide  : |d| < 2^31 (raw int32 product-column accumulation).
  stored form  : 30 digits via store30 (sound for |value| <= 250p).

Multiply legality (schoolbook): digit bounds (A, B) need 30*A*B < 2^31:
  30*F*F      = 5.1e8    mul-ready x mul-ready (also Karatsuba-legal)
  30*2F*2F    = 2.05e9   sum2 x sum2 (4.6% margin; schoolbook ONLY)
  30*8191^2   = 2.01e9   canonical x canonical (schoolbook ONLY)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..oracle.field import P

RADIX = 13
DMASK = (1 << RADIX) - 1  # 8191
L13 = 30  # digits spanning R13
# In-flight element length. 30 suffices: an element value is < 3p <
# 0.49 * 2^390, and a balanced digit string of a FOLDED value may be
# truncated at n digits exactly whenever |value| < 0.49 * 2^(13n) (module
# docstring) — so the would-be 31st digit is provably zero. (Round 3 kept a
# 31st carry digit; dropping it shaves ~6% off every product and fold.)
ELEM = 30
R13 = 1 << (RADIX * L13)
L16 = 24  # strict engine limb count (16-bit limbs)

NINV13 = (-pow(P, -1, R13)) % R13  # -p^-1 mod R13
R13_MOD_P = R13 % P
R13_SQ = R13_MOD_P * R13_MOD_P % P

HALF = 4096
F_BOUND = 4129  # balanced fold2 digit bound: [-4096-33, 4095+33]
assert 30 * (2 * F_BOUND) * (2 * F_BOUND) < 2**31  # sum2 x sum2 legal


def int_to_digits(x: int, n: int = L13) -> np.ndarray:
    """Host: nonneg int -> n little-endian 13-bit digits (int32)."""
    assert 0 <= x < 1 << (RADIX * n)
    return np.array([(x >> (RADIX * i)) & DMASK for i in range(n)], np.int32)


def digits_to_int(d) -> int:
    """Host: signed digit vector -> int (exact)."""
    return sum(int(v) << (RADIX * i) for i, v in enumerate(np.asarray(d).reshape(-1)))


P_DIGITS = [int(v) for v in int_to_digits(P)]
NINV_DIGITS = [int(v) for v in int_to_digits(NINV13)]
ONE13 = [int(v) for v in int_to_digits(R13_MOD_P)]  # Montgomery one


# --- folds -------------------------------------------------------------------

def fold(t, out_len=None):
    """One BALANCED carry-release pass:
        u = d + 4096;  lo = (u & DMASK) - 4096;  carry = u >> RADIX
        d_k <- lo_k + carry_{k-1}
    Signed-exact (two's-complement & and arithmetic >> give exactly
    d = lo + 2^13 * carry). Low parts land in [-4096, 4095].

    Bounds: |d| < 2^31 in -> carry in [-2^18, 2^18], digit in
    [-4096-2^18, 4095+2^18]. A second fold tightens to [-4129, 4128].

    Output gains one digit unless out_len truncates; truncating a FOLDED
    value at length n is exact whenever |value| < 0.49 * 2^(13n) (balanced
    digit strings cannot net a full 2^(13n) unit — see module docstring).
    """
    n = len(t)
    u = [x + jnp.int32(HALF) for x in t]
    lo = [(x & jnp.int32(DMASK)) - jnp.int32(HALF) for x in u]
    hi = [x >> RADIX for x in u]
    out = [lo[0]] + [lo[k] + hi[k - 1] for k in range(1, n)] + [hi[n - 1]]
    if out_len is not None:
        out = out[:out_len] + [jnp.zeros_like(t[0])] * max(0, out_len - len(out))
    return out


def fold_nn(t, out_len=None):
    """UNbalanced fold (nonneg low parts) — used only by canonicalize,
    where digits must end up nonnegative for the 16-bit repack."""
    n = len(t)
    lo = [x & jnp.int32(DMASK) for x in t]
    hi = [x >> RADIX for x in t]
    out = [lo[0]] + [lo[k] + hi[k - 1] for k in range(1, n)] + [hi[n - 1]]
    if out_len is not None:
        out = out[:out_len] + [jnp.zeros_like(t[0])] * max(0, out_len - len(out))
    return out


def fold2(t, out_len=None):
    """Two balanced folds: int32-relaxed digits -> |d| <= F_BOUND."""
    return fold(fold(t), out_len)


def fold_sum(t):
    """Make a sum of several elements mul-ready: one balanced fold, clamped
    to ELEM digits (exact: summed |value| < 0.49*2^403 trivially)."""
    return fold(t)[:ELEM]


# --- add / sub / scale (free-form; caller tracks bounds) ---------------------

def _pad(a, b):
    n = max(len(a), len(b))
    z = jnp.zeros_like(a[0])
    return a + [z] * (n - len(a)), b + [z] * (n - len(b))


def add(a, b):
    a, b = _pad(a, b)
    return [x + y for x, y in zip(a, b)]


def sub(a, b):
    a, b = _pad(a, b)
    return [x - y for x, y in zip(a, b)]


def neg(a):
    return [-x for x in a]


def scale(a, k: int):
    """Multiply by a small static int (|k| * digit bound must stay < 2^31)."""
    return [x * jnp.int32(k) for x in a]


def select(mask, a, b):
    a, b = _pad(a, b)
    return [jnp.where(mask, x, y) for x, y in zip(a, b)]


# --- products ----------------------------------------------------------------

def mul_wide(a, b):
    """Full product columns, schoolbook (legal up to sum2 x sum2 operands:
    column sums stay <= 30*(2F)^2 < 2^31). Prefer `mul_wide_f` (hybrid
    Karatsuba, -28% eops) when BOTH operands are mul-ready (|d| <= F)."""
    return _school_cols(a, b)


def _school_cols(a, b):
    la, lb = len(a), len(b)
    acc = [None] * (la + lb - 1)
    for i in range(la):
        for j in range(lb):
            prod = a[i] * b[j]
            k = i + j
            acc[k] = prod if acc[k] is None else acc[k] + prod
    z = jnp.zeros_like(a[0])
    return [x if x is not None else z for x in acc]


def _half_sum(lo, hi):
    """Digit-wise lo + hi where len(hi) may exceed len(lo) by one."""
    out = [x + y for x, y in zip(lo, hi)]
    return out + list(hi[len(lo):])


def _kara_combine(m0, m1, m2, h, n_cols):
    """Assemble res = m0 + (m2 - m0 - m1)<<h + m1<<2h.

    Every individual op RESULT is a true partial convolution value (two's
    complement makes a single add/sub exact whenever its RESULT fits int32),
    so the int32 bounds are set by true column values, not by worst-case
    interval composition — see mul_wide_f's legality note."""
    mid = [(x - y) for x, y in zip(m2, m0)] + list(m2[len(m0):])
    mid = [(x - y) for x, y in zip(mid, m1)] + list(mid[len(m1):])
    z = jnp.zeros_like(m0[0])
    acc = [None] * n_cols
    for src, off in ((m0, 0), (mid, h), (m1, 2 * h)):
        for k, v in enumerate(src):
            i = off + k
            acc[i] = v if acc[i] is None else acc[i] + v
    return [x if x is not None else z for x in acc]


def _kara_cols(a, b, depth: int):
    """Karatsuba columns with `depth` further splits on the LOW/HIGH halves
    only; every middle product is schoolbook (its operands' digit bound
    doubles, so a nested middle split would overflow int32 columns)."""
    n = len(a)
    if depth == 0 or n < 8 or len(b) != n:
        return _school_cols(a, b)
    h = n // 2
    a0, a1, b0, b1 = a[:h], a[h:], b[:h], b[h:]
    m0 = _kara_cols(a0, b0, depth - 1)
    m1 = _kara_cols(a1, b1, depth - 1)
    m2 = _school_cols(_half_sum(a0, a1), _half_sum(b0, b1))
    return _kara_combine(m0, m1, m2, h, 2 * n - 1)


def mul_wide_f(a, b):
    """Product columns for MUL-READY operands (|d| <= F_BOUND each): hybrid
    two-level Karatsuba, ~1.27K eops vs ~1.77K schoolbook at 30 digits.

    Legality (everything accumulates raw in int32):
      * middle products are schoolbook on digit bound 2F:
        cols <= 15*(2F)^2 = 1.02e9 (outer), 8*(2F)^2 = 5.5e8 (inner).
      * combination steps: each op's RESULT is a true partial column value
        (single int32 ops are exact iff the result fits — wraparound covers
        any "intermediate" range), all < 1.8e9 < 2^31.
      * assembled columns equal the true convolution, <= 30*F^2 = 5.1e8.
    """
    n = len(a)
    if n != len(b) or n < 16:
        return _school_cols(a, b)
    h = n // 2
    a0, a1, b0, b1 = a[:h], a[h:], b[:h], b[h:]
    m0 = _kara_cols(a0, b0, 1)
    m1 = _kara_cols(a1, b1, 1)
    m2 = _school_cols(_half_sum(a0, a1), _half_sum(b0, b1))  # 2F operands
    return _kara_combine(m0, m1, m2, h, 2 * n - 1)


def mul_const_wide(a, c_digits):
    """Product by a static constant (python-int digits, 0 <= c_d < 2^13),
    schoolbook — legal for canonical operands (30*8191^2 = 2.01e9 < 2^31).
    Prefer `mul_const_wide_f` when `a` is mul-ready."""
    la = len(a)
    acc = [None] * (la + len(c_digits) - 1)
    for i in range(la):
        for j, cj in enumerate(c_digits):
            if cj == 0:
                continue
            prod = a[i] * jnp.int32(cj)
            k = i + j
            acc[k] = prod if acc[k] is None else acc[k] + prod
    z = jnp.zeros_like(a[0])
    return [x if x is not None else z for x in acc]


def _kara_const_cols(a, c, depth: int):
    if depth == 0 or len(a) < 8 or len(c) != len(a):
        return mul_const_wide(a, list(c))
    n = len(a)
    h = n // 2
    m0 = _kara_const_cols(a[:h], c[:h], depth - 1)
    m1 = _kara_const_cols(a[h:], c[h:], depth - 1)
    cs = [int(x) + int(y) for x, y in zip(c[:h], c[h:])] + [
        int(v) for v in c[2 * h:]
    ]
    m2 = mul_const_wide(_half_sum(a[:h], a[h:]), cs)
    return _kara_combine(m0, m1, m2, h, 2 * n - 1)


def mul_const_wide_f(a, c_digits):
    """Two-level Karatsuba product with a static constant, for MUL-READY
    `a` (|d| <= F_BOUND) and canonical constant digits (< 2^13). The
    constant-side half sums are folded at trace time for free.

    Legality: outer middle cols <= 15 * 2F * 2*8191 = 2.03e9 < 2^31; inner
    middle cols <= 8 * 2F * 2*8191 = 1.08e9; combination ops' RESULTS are
    true partial convolution values (cf. mul_wide_f), all < 2.03e9."""
    if len(a) != len(c_digits) or len(a) < 16:
        return mul_const_wide(a, list(c_digits))
    return _kara_const_cols(a, list(c_digits), 2)


def mul_low_const(a, c_digits, out_len):
    """Low `out_len` columns of a product with a constant (mod 2^(13*out_len))."""
    acc = [None] * out_len
    for i in range(min(len(a), out_len)):
        for j, cj in enumerate(c_digits[: out_len - i]):
            if cj == 0:
                continue
            prod = a[i] * jnp.int32(cj)
            k = i + j
            acc[k] = prod if acc[k] is None else acc[k] + prod
    z = jnp.zeros_like(a[0])
    return [x if x is not None else z for x in acc]


# --- Montgomery reduction ----------------------------------------------------

def prered(w):
    """Wide product columns -> 'prered': fold2 so linear combinations of
    several products can be taken (digit growth k*F) before ONE shared
    reduction — the lazy-reduction trick (X3 = b - a costs one reduction,
    not two)."""
    return fold2(w)


def reduce_wide(t):
    """Montgomery-reduce a linear combination of <= 12 prered wides: returns
    (value / R13) mod p as a mul-ready ELEM-digit element in (-3p, 3p).

    Bound walk:
      t (<= 12F digits) --fold1--> |d| <= 4096 + 7 (mul-ready)
      m = t_lo * NINV mod R13: cols <= 30*4103*8191 = 1.01e9; fold2, then
          TRUNCATE to 30 digits (sound: m only matters mod R13).
      u = t + m*p: cols <= 1.02e9 + 4103; fold2 -> |d| <= F_BOUND.
      The low 30 digits' value is divisible by R13 AND bounded in magnitude
      by 4129*(2^390-1)/8191 < 0.504*R13 — hence EXACTLY ZERO (this is the
      balanced-digit payoff: no carry detection needed at all).
      Result = u[30:60]; the truncation at ELEM=30 digits is exact because
      the result value is < 3p < 0.49 * 2^390 (any higher folded digit is
      provably zero).
    """
    t = fold(t)
    m = fold2(mul_low_const(t[:L13], NINV_DIGITS, L13), L13)
    u = fold2(add(t, mul_const_wide_f(m, P_DIGITS)))
    z = jnp.zeros_like(u[0])
    hi = u[L13:] + [z] * max(0, ELEM - (len(u) - L13))
    return hi[:ELEM]


def mont_mul(a, b):
    """Full Montgomery product for mul-ready operands: a*b/R13 mod p."""
    return reduce_wide(prered(mul_wide_f(a, b)))


def mont_mul_const(a, c_digits):
    return reduce_wide(prered(mul_const_wide(a, c_digits)))


# --- stored (30-digit) form --------------------------------------------------

def store30(d):
    """Element (or small sum of elements, |value| <= 20p) -> 30 balanced
    digits of the same value. Exact: 20p < 0.49 * 2^390, so the fold2
    truncation drops a provably-zero net."""
    return fold2(d, L13)


def load_elem(d30):
    """Stored 30-digit value -> ELEM-digit element (identity now that
    ELEM == L13; kept as the codec seam the kernel packers call)."""
    return list(d30)


load31 = load_elem  # round-3 name


# --- representation conversion ----------------------------------------------

def from_limbs16(a16):
    """Strict 16-bit limb list (len 24, canonical uint32 digits) -> mul-ready
    ELEM-digit element (value in [0, 2^384)). Pure bit splicing."""
    out = []
    for k in range(L13):
        lo_bit = k * RADIX
        j, off = divmod(lo_bit, 16)
        d = a16[j] >> off
        if off + RADIX > 16 and j + 1 < L16:
            d = d | (a16[j + 1] << (16 - off))
        out.append((d & jnp.uint32(DMASK)).astype(jnp.int32))
    return out


def to_limbs16_strict(d):
    """STRICT nonneg 13-bit digits (30) -> 24 strict 16-bit limbs (uint32).
    Caller must canonicalize first."""
    du = [x.astype(jnp.uint32) for x in d[:L13]]
    out = []
    for j in range(L16):
        lo_bit = j * 16
        k, off = divmod(lo_bit, RADIX)
        v = du[k] >> off if k < L13 else jnp.zeros_like(du[0])
        bits = RADIX - off
        while bits < 16 and k + 1 < L13:
            k += 1
            v = v | (du[k] << bits)
            bits += RADIX
        out.append(v & jnp.uint32(0xFFFF))
    return out


def _find_nonneg_multiple():
    """Host: smallest k in [8, 24] with all canonical digits of k*p >= 64 —
    used to shift signed folded digits (>= -33) nonneg without changing the
    value mod p. k <= 24 keeps canonicalize's value < 32p."""
    for k in range(8, 25):
        digs = int_to_digits(k * P)
        if all(int(v) >= 64 for v in digs):
            return [int(v) for v in digs]
    raise AssertionError("no all-digits>=64 multiple of p found")


_POS_SHIFT = _find_nonneg_multiple()


def _find_pos_multiple():
    """Host: multiple of p with all canonical digits >= 1 (fixes the [-1,..]
    residue of unbalanced folds in canonicalize). Value <= 8p."""
    for k in range(1, 9):
        digs = int_to_digits(k * P)
        if all(int(v) >= 1 for v in digs):
            return [int(v) for v in digs]
    raise AssertionError("no all-digits>=1 multiple of p found")


_POS_SHIFT2 = _find_pos_multiple()


def canonicalize(d):
    """Mul-ready signed element, |value| < 8p -> STRICT canonical digits of
    (value mod p), 30 digits in [0, 2^13). Total value after shifts < 40p."""
    from . import fieldops as FO

    x = add(d, [jnp.int32(v) for v in _POS_SHIFT])  # value in (0, 32p)
    # unbalanced folds make digits nearly-nonneg: [-1, 8192]; adding a
    # digits>=1 multiple of p then one more fold gives digits in [0, 8192],
    # safe for the relaxed-u32 16-bit repack below. No truncation anywhere.
    x = fold_nn(fold_nn(fold_nn(x)))
    x = add(x, [jnp.int32(v) for v in _POS_SHIFT2])
    x = fold_nn(x)
    # repack to relaxed u32 16-bit limbs (value < 40p < 2^386 -> 26 limbs)
    xu = [v.astype(jnp.uint32) for v in x]
    n16 = 26
    acc = [None] * n16
    for k in range(len(xu)):
        lo_bit = k * RADIX
        j, off = divmod(lo_bit, 16)
        if j >= n16:
            continue
        lo = (xu[k] << off) & jnp.uint32(0xFFFF)
        acc[j] = lo if acc[j] is None else acc[j] + lo
        if off > 0 and j + 1 < n16:
            hi = xu[k] >> (16 - off)
            acc[j + 1] = hi if acc[j + 1] is None else acc[j + 1] + hi
    z = jnp.zeros_like(xu[0])
    acc = [v if v is not None else z for v in acc]
    limbs = FO.normalize_list(acc, n16)  # strict, value < 40p
    # conditional subtractions (borrow-free): x + (2^416 - k*p), keep on carry
    width = 1 << (16 * n16)
    for k in (32, 16, 8, 4, 2, 1):
        comp = [((width - k * P) >> (16 * i)) & 0xFFFF for i in range(n16)]
        t = [limbs[i] + jnp.uint32(comp[i]) for i in range(n16)]
        v = FO.normalize_list(t, n16 + 1)
        ge = v[n16] == 1
        limbs = [jnp.where(ge, v[i], limbs[i]) for i in range(n16)]
    return from_limbs16(limbs[:L16])[:L13]  # strict canonical 13-bit digits


# --- Fp2 layer (for G2) ------------------------------------------------------
# Fp2 = Fp[u]/(u^2+1). Values are pairs (c0, c1) of digit lists.

def fp2_add(a, b):
    return (add(a[0], b[0]), add(a[1], b[1]))


def fp2_sub(a, b):
    return (sub(a[0], b[0]), sub(a[1], b[1]))


def fp2_neg(a):
    return (neg(a[0]), neg(a[1]))


def fp2_scale(a, k: int):
    return (scale(a[0], k), scale(a[1], k))


def fp2_fold_sum(a):
    return (fold_sum(a[0]), fold_sum(a[1]))


def fp2_select(mask, a, b):
    return (select(mask, a[0], b[0]), select(mask, a[1], b[1]))


def fp2_mul_prered(a, b):
    """Karatsuba -> pair of prered-combination wides (digit bounds re: 2F,
    im: 3F — safe to combine once more, up to 6F total, before fp2_reduce)."""
    m0 = prered(mul_wide_f(a[0], b[0]))
    m1 = prered(mul_wide_f(a[1], b[1]))
    sa = fold_sum(add(a[0], a[1]))
    sb = fold_sum(add(b[0], b[1]))
    m2 = prered(mul_wide_f(sa, sb))
    return (sub(m0, m1), sub(m2, add(m0, m1)))


def fp2_reduce(w):
    return (reduce_wide(w[0]), reduce_wide(w[1]))


def fp2_mont_mul(a, b):
    return fp2_reduce(fp2_mul_prered(a, b))
