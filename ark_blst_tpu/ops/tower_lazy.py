"""Batched Fp2/Fp6/Fp12 tower arithmetic on the LAZY radix-13 engine.

Round-4 port of the strict tower (ops/tower.py) onto ops/lazy13.py — the
same op surface, ~6-8x fewer element-ops per multiply. This is the engine
the pairing pipeline (curves/pairing.py) runs on for TPU execution; the
strict tower remains the differential twin.

Representation: an Fp element is ONE stacked int32 array (30, *batch) of
balanced radix-13 digits (lazy Montgomery domain R13 = 2^390), NOT a list
of per-digit arrays. This is load-bearing twice over:
  * trace size — per-digit lists make every fold ~150 primitives and a
    full pairing ~300K XLA statements, which OOM-kills the remote TPU
    compile helper; stacked folds are ~6 whole-array ops and the pairing
    trace collapses ~100x;
  * dispatch — pairing values cross jit boundaries as 18 arrays instead
    of ~1080 (the platform charges ~10 ms per boundary array).
Multiplies are Pallas-resident on TPU (ops/pallas_lazy.py): XLA leaves the
digit-product graphs unfused and memory-bound (13-20x off the compute
bound, scripts/tpu_lazymul_probe.py); the Pallas kernel keeps digit blocks
in VMEM. Off-TPU they fall back to the XLA/eager digit-list multiply.

  fp2  = (c0, c1)        stacked (30, *batch) int32 arrays
  fp6  = (a0, a1, a2)    of fp2
  fp12 = (b0, b1)        of fp6

INVARIANT: every element this module returns is MUL-READY (|digit| <=
F_BOUND) — adds/subs/small-scales fold their outputs, so any two module
outputs multiply via the Karatsuba fast path with no bound bookkeeping.

Re-creates what the reference delegates to blst's C tower
(`blst_fp12_mul` at /root/reference/src/pairing.rs:68, cyclotomic square at
src/pairing.rs:28). Frobenius maps are correct — coefficient tables from
first principles via the oracle — unlike the reference's no-op quirk
(/root/reference/src/fp2.rs:548, fp6.rs:552, fp12.rs:554).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..oracle import field as OF
from . import lazy13 as LZ
from .limbs import FP

_P = OF.P

R16_MOD_P = (1 << (16 * FP.num_limbs)) % _P
R16_TO_R13 = LZ.R13_MOD_P * LZ.R13_MOD_P % _P * pow(R16_MOD_P, -1, _P) % _P
_R16_TO_R13_DIGITS = [int(v) for v in LZ.int_to_digits(R16_TO_R13)]
_R16_DIGITS = [int(v) for v in LZ.int_to_digits(R16_MOD_P)]

# MSB-first bits of p - 2 for the Fermat inversion ladder
_P_MINUS_2_BITS = np.array([int(b) for b in bin(_P - 2)[2:]], np.bool_)

# Python ints (weak-typed literals), NOT jnp scalars: these appear inside
# the fused Pallas kernel bodies, where captured device constants are
# illegal — literals inline into the int32 ops instead.
_HALF = LZ.HALF
_DMASK = LZ.DMASK

# Trace-time flag set by ops/pallas_lazy.py while it traces a FUSED tower
# kernel body: routes _mul/fp_mul_many to the raw digit-list multiply
# (nested pallas_call is illegal) and makes fp_mul_many skip its
# concatenate/slice batching (inside a kernel there is no launch overhead
# to amortize, and the copies would burn VMEM).
_IN_KERNEL = False


def _unstack(a):
    return [a[i] for i in range(a.shape[0])]


# --- stacked-digit primitives -------------------------------------------------

def fold30(t):
    """One balanced carry-release pass on a stacked (30, ...) value,
    truncated back to 30 digits — exact whenever |value| < 0.49 * 2^390
    (~250p; every tower intermediate qualifies). ~6 whole-array ops."""
    u = t + _HALF
    lo = (u & _DMASK) - _HALF
    hi = u >> LZ.RADIX
    return lo + jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)


def _mul(a, b):
    """Full lazy Montgomery product of stacked mul-legal operands:
    Pallas-resident when the batch is kernel-blockable on TPU, digit-list
    XLA/eager otherwise."""
    if not _IN_KERNEL and jax.default_backend() == "tpu":
        from . import pallas_lazy as PLZ

        sh = a.shape
        if len(sh) == 3 and sh[1] % 8 == 0 and sh[2] == 128:
            return PLZ.mont_mul_stacked(a, b)
    return jnp.stack(LZ.mont_mul(_unstack(a), _unstack(b)))


# --- ingest / egress (strict radix-16 <-> lazy radix-13) ---------------------

def fp_ingest(arr):
    """Strict stacked (24, *batch) uint32 Montgomery-R16 -> lazy element."""
    a16 = [arr[i] for i in range(FP.num_limbs)]
    d = LZ.from_limbs16(a16)  # canonical digits of v*R16
    return jnp.stack(LZ.mont_mul_const(d, _R16_TO_R13_DIGITS))


def fp_egress(a):
    """Lazy element -> strict stacked (24, *batch) uint32 Montgomery-R16."""
    y = LZ.mont_mul_const(_unstack(a), _R16_DIGITS)  # v*R13 -> v*R16
    return jnp.stack(LZ.to_limbs16_strict(LZ.canonicalize(y)))


def _ingest_many(arrs):
    """Concatenate strict components along the batch axis and ingest ONCE:
    the per-digit splice+const-mul is ~6K traced statements per call, so
    tower values pay it once, not per component."""
    if len(arrs) == 1:
        return [fp_ingest(arrs[0])]
    A = jnp.concatenate(arrs, axis=1)
    out = fp_ingest(A)
    n = arrs[0].shape[1]
    return [
        lax.slice_in_dim(out, i * n, (i + 1) * n, axis=1)
        for i in range(len(arrs))
    ]


def _egress_many(elems):
    """Concatenated egress (canonicalize is ~11K traced statements)."""
    if len(elems) == 1:
        return [fp_egress(elems[0])]
    A = jnp.concatenate(elems, axis=1)
    out = fp_egress(A)
    n = elems[0].shape[1]
    return [
        lax.slice_in_dim(out, i * n, (i + 1) * n, axis=1)
        for i in range(len(elems))
    ]


def fp2_ingest(a):
    o = _ingest_many([a[0], a[1]])
    return (o[0], o[1])


def fp2_egress(a):
    o = _egress_many([a[0], a[1]])
    return (o[0], o[1])


def fp6_ingest(a):
    o = _ingest_many([a[i][j] for i in range(3) for j in range(2)])
    return tuple((o[2 * i], o[2 * i + 1]) for i in range(3))


def fp6_egress(a):
    o = _egress_many([a[i][j] for i in range(3) for j in range(2)])
    return tuple((o[2 * i], o[2 * i + 1]) for i in range(3))


def fp12_ingest(a):
    o = _ingest_many(
        [a[i][j][k] for i in range(2) for j in range(3) for k in range(2)]
    )
    it = iter(o)
    return tuple(
        tuple((next(it), next(it)) for _ in range(3)) for _ in range(2)
    )


def fp12_egress(a):
    o = _egress_many(
        [a[i][j][k] for i in range(2) for j in range(3) for k in range(2)]
    )
    it = iter(o)
    return tuple(
        tuple((next(it), next(it)) for _ in range(3)) for _ in range(2)
    )


# --- constants ----------------------------------------------------------------

def _const_digits(value: int):
    """Host: plain int -> balanced mul-ready digits of value*R13 mod p."""
    v = value % _P * LZ.R13_MOD_P % _P
    d = [int(x) for x in LZ.int_to_digits(v)]
    out, carry = [], 0
    for k in range(LZ.L13):
        t = d[k] + carry
        carry = 1 if t >= 4096 else 0
        out.append(t - 8192 if t >= 4096 else t)
    assert carry == 0
    return out


def _const_col(value: int, ndim_batch: int):
    """(30, 1, ..) broadcastable constant column."""
    arr = np.array(_const_digits(value), np.int32).reshape(
        (LZ.L13,) + (1,) * ndim_batch
    )
    return jnp.asarray(arr)


def fp_const(value: int, batch_shape):
    return jnp.broadcast_to(
        _const_col(value, len(batch_shape)), (LZ.L13,) + tuple(batch_shape)
    )


def fp_zero(batch_shape):
    return jnp.zeros((LZ.L13,) + tuple(batch_shape), jnp.int32)


def fp2_const(c, batch_shape):
    return (fp_const(c[0], batch_shape), fp_const(c[1], batch_shape))


def batch_shape_of(a):
    return a.shape[1:]


# --- fp -----------------------------------------------------------------------

def fp_add(a, b):
    return fold30(a + b)


def fp_sub(a, b):
    return fold30(a - b)


def fp_neg(a):
    return -a


def fp_mul_small(a, k: int):
    return fold30(a * jnp.int32(k))


def fp_mul_many(pairs):
    """Batched mul-ready products: ONE concatenated multiply (Pallas kernel
    on TPU) — the traced op count is independent of len(pairs)."""
    if _IN_KERNEL or len(pairs) == 1:
        return [_mul(a, b) for a, b in pairs]
    A = jnp.concatenate([a for a, _ in pairs], axis=1)
    B = jnp.concatenate([b for _, b in pairs], axis=1)
    out = _mul(A, B)
    n = pairs[0][0].shape[1]
    return [
        lax.slice_in_dim(out, i * n, (i + 1) * n, axis=1)
        for i in range(len(pairs))
    ]


def fp_mul(a, b):
    return _mul(a, b)


def fp_inv(a, fuse: bool = True):
    """Fermat inversion a^(p-2) (Montgomery). fuse=True scans the exponent
    bits; fuse=False unrolls a Python loop (eager CPU path)."""
    if not fuse:
        r = a
        for bit in _P_MINUS_2_BITS[1:]:
            r = _mul(r, r)
            if bit:
                r = _mul(r, a)
        return r

    bits = jnp.asarray(_P_MINUS_2_BITS[1:])

    def body(r, bit):
        r2 = _mul(r, r)
        r3 = jnp.where(bit, _mul(r2, a), r2)
        return r3, None

    out, _ = lax.scan(body, a, bits)
    return out


def _mul_flat(a, b):
    """Multiply (30, w) flat-batch operands; rides the Pallas kernel when w
    reshapes to a blockable (S, 128) tile, digit-list XLA otherwise."""
    w = a.shape[1]
    if w % 1024 == 0:
        sh3 = (LZ.L13, w // 128, 128)
        return _mul(a.reshape(sh3), b.reshape(sh3)).reshape(LZ.L13, w)
    return _mul(a, b)


def fp_inv_batch(a):
    """Invert EVERY lane of a (30, *batch) element via a log-depth
    Montgomery product tree over the batch axis: pairwise-half products up
    to one root, ONE width-1 Fermat ladder on the root, sibling products
    back down. ~3 full-batch mul-equivalents + a scalar inversion, vs ~570
    sequential full-batch muls for the per-lane Fermat ladder (fp_inv).

    Use this for EAGER batch inversion (host-visible values, setup-time
    normalization). Do NOT wire it into fused device programs: measured
    inside the fused pairing's easy part it LOST 77 ms at batch 8192
    (31.8K -> 24.5K pairings/s) because its sub-1024-wide tree levels and
    width-1 root ladder run on un-fused XLA digit graphs, not the Pallas
    mul kernel (see fp2_inv's docstring for the measurement).

    PRECONDITION: every lane is nonzero mod p. A zero lane poisons the
    whole tree (its zero propagates into the root product), unlike fp_inv
    where only the zero lane returns garbage."""
    sh = a.shape
    n = int(np.prod(sh[1:]))
    flat = a.reshape((LZ.L13, n))
    m = 1 << max(0, n - 1).bit_length()
    if m != n:  # pad to a power of two with rep(1) lanes (self-inverse)
        one = jnp.broadcast_to(_const_col(1, 1), (LZ.L13, m - n))
        flat = jnp.concatenate([flat, one], axis=1)
    levels = [flat]
    w = m
    while w > 1:
        w //= 2
        cur = levels[-1]
        levels.append(_mul_flat(cur[:, :w], cur[:, w:]))
    v = fp_inv(levels[-1], fuse=True)  # width-1 root
    for u in levels[-2::-1]:
        w = u.shape[1] // 2
        # inv(lo) = inv(parent) * hi ; inv(hi) = inv(parent) * lo — one
        # concatenated mul at this level's full width
        v = _mul_flat(
            jnp.concatenate([v, v], axis=1),
            jnp.concatenate([u[:, w:], u[:, :w]], axis=1),
        )
    return v[:, :n].reshape(sh)


# --- fp2 ----------------------------------------------------------------------

def fp2_add(a, b):
    return (fp_add(a[0], b[0]), fp_add(a[1], b[1]))


def fp2_sub(a, b):
    return (fp_sub(a[0], b[0]), fp_sub(a[1], b[1]))


def fp2_neg(a):
    return (-a[0], -a[1])


def fp2_conj(a):
    return (a[0], -a[1])


def fp2_mul_small(a, k: int):
    return (fp_mul_small(a[0], k), fp_mul_small(a[1], k))


def fp2_mul_by_nonresidue(a):
    """xi = 1 + u:  (c0 - c1, c0 + c1)."""
    return (fp_sub(a[0], a[1]), fp_add(a[0], a[1]))


def fp2_mul_many(pairs):
    """Karatsuba from three FULL Montgomery products per pair (linear
    combinations of Montgomery products are exact), all pairs in ONE
    concatenated Pallas multiply."""
    legs = []
    for a, b in pairs:
        legs += [
            (a[0], b[0]),
            (a[1], b[1]),
            (fp_add(a[0], a[1]), fp_add(b[0], b[1])),
        ]
    prods = fp_mul_many(legs)
    out = []
    for i in range(len(pairs)):
        m0, m1, m2 = prods[3 * i : 3 * i + 3]
        out.append((fp_sub(m0, m1), fold30(m2 - m0 - m1)))
    return out


def fp2_mul(a, b):
    return fp2_mul_many([(a, b)])[0]


def fp2_sqr_many(items):
    """(a0+a1)(a0-a1), a0*a1 -> 2 base muls per square."""
    legs = []
    for a in items:
        legs += [(fp_add(a[0], a[1]), fp_sub(a[0], a[1])), (a[0], a[1])]
    prods = fp_mul_many(legs)
    out = []
    for i in range(len(items)):
        s0, s1 = prods[2 * i : 2 * i + 2]
        out.append((s0, fp_add(s1, s1)))
    return out


def fp2_sqr(a):
    return fp2_sqr_many([a])[0]


def fp2_inv(a, fuse: bool = True):
    """(a0 - a1 u) / (a0^2 + a1^2); one norm inversion via the per-lane
    Fermat ladder. Routing large fused batches through the log-depth
    product tree (fp_inv_batch) was tried here and REJECTED by
    measurement: at batch 8192 the fused pairing dropped 31.8K -> 24.5K
    pairings/s (+77 ms end-to-end, tpu_pairing_check.py), because the
    tree's sub-1024-wide levels and its width-1 root ladder fall off the
    Pallas mul path onto un-fused XLA digit graphs (PERF.md §1), which
    cost more in-program than the full-batch ladder's Pallas launches
    save. fp_inv_batch remains the right primitive for eager batch
    inversion outside a fused program."""
    n0, n1 = fp_mul_many([(a[0], a[0]), (a[1], a[1])])
    norm = fp_add(n0, n1)
    inv = fp_inv(norm, fuse)
    c0, c1 = fp_mul_many([(a[0], inv), (a[1], inv)])
    return (c0, -c1)


# --- generic pytree helpers ---------------------------------------------------

def select(mask, a, b):
    """Elementwise select over any tower pytree; mask is batch-shaped
    (trailing-dim broadcasting aligns it under the digit axis)."""
    return jax.tree.map(lambda x, y: jnp.where(mask, x, y), a, b)


# --- fp6 ----------------------------------------------------------------------

def fp6_add(a, b):
    return tuple(fp2_add(x, y) for x, y in zip(a, b))


def fp6_sub(a, b):
    return tuple(fp2_sub(x, y) for x, y in zip(a, b))


def fp6_neg(a):
    return tuple(fp2_neg(x) for x in a)


def fp6_mul_by_nonresidue(a):
    """v * (a0 + a1 v + a2 v^2) = xi*a2 + a0 v + a1 v^2."""
    return (fp2_mul_by_nonresidue(a[2]), a[0], a[1])


def fp6_mul_many(pairs):
    """6 fp2 multiplications per product (Karatsuba/Toom interpolation) —
    same decomposition as the strict tower (ops/tower.py fp6_mul_many)."""
    legs = []
    for a, b in pairs:
        a0, a1, a2 = a
        b0, b1, b2 = b
        legs += [
            (a0, b0),
            (a1, b1),
            (a2, b2),
            (fp2_add(a1, a2), fp2_add(b1, b2)),
            (fp2_add(a0, a1), fp2_add(b0, b1)),
            (fp2_add(a0, a2), fp2_add(b0, b2)),
        ]
    prods = fp2_mul_many(legs)
    out = []
    for i in range(len(pairs)):
        v0, v1, v2, m12, m01, m02 = prods[6 * i : 6 * i + 6]
        c0 = fp2_add(v0, fp2_mul_by_nonresidue(fp2_sub(fp2_sub(m12, v1), v2)))
        c1 = fp2_add(fp2_sub(fp2_sub(m01, v0), v1), fp2_mul_by_nonresidue(v2))
        c2 = fp2_add(fp2_sub(fp2_sub(m02, v0), v2), v1)
        out.append((c0, c1, c2))
    return out


def fp6_mul(a, b):
    return fp6_mul_many([(a, b)])[0]


def fp6_sqr(a):
    return fp6_mul(a, a)


def fp6_mul_by_01_many(items):
    """[(a, b0, b1)] -> a * (b0 + b1 v), sparse (6 fp2 muls)."""
    legs = []
    for a, b0, b1 in items:
        a0, a1, a2 = a
        legs += [(a0, b0), (a1, b0), (a2, b0), (a2, b1), (a0, b1)]
        legs += [(a1, b1)]
    prods = fp2_mul_many(legs)
    out = []
    for i in range(len(items)):
        t00, t10, t20, t21, t01, t11 = prods[6 * i : 6 * i + 6]
        out.append((
            fp2_add(t00, fp2_mul_by_nonresidue(t21)),
            fp2_add(t01, t10),
            fp2_add(t11, t20),
        ))
    return out


def fp6_mul_by_1_many(items):
    """[(a, b1)] -> a * (b1 v), sparse (3 fp2 muls)."""
    legs = []
    for a, b1 in items:
        legs += [(a[2], b1), (a[0], b1), (a[1], b1)]
    prods = fp2_mul_many(legs)
    out = []
    for i in range(len(items)):
        t2, t0, t1 = prods[3 * i : 3 * i + 3]
        out.append((fp2_mul_by_nonresidue(t2), t0, t1))
    return out


def fp6_inv(a, fuse: bool = True):
    a0, a1, a2 = a
    s0, s1, s2 = fp2_sqr_many([a0, a2, a1])  # a0^2, a2^2, a1^2
    m01, m12, m02 = fp2_mul_many([(a0, a1), (a1, a2), (a0, a2)])
    c0 = fp2_sub(s0, fp2_mul_by_nonresidue(m12))
    c1 = fp2_sub(fp2_mul_by_nonresidue(s1), m01)
    c2 = fp2_sub(s2, m02)
    t0, t1, t2 = fp2_mul_many([(a0, c0), (a2, c1), (a1, c2)])
    t = fp2_add(t0, fp2_mul_by_nonresidue(fp2_add(t1, t2)))
    tinv = fp2_inv(t, fuse)
    r0, r1, r2 = fp2_mul_many([(c0, tinv), (c1, tinv), (c2, tinv)])
    return (r0, r1, r2)


# --- fp12 ---------------------------------------------------------------------

_IDX12 = [(i, j, k) for i in range(2) for j in range(3) for k in range(2)]


def _flat12(a):
    return [a[i][j][k] for i, j, k in _IDX12]


def _pack12(comps):
    it = iter(comps)
    return tuple(
        tuple((next(it), next(it)) for _ in range(3)) for _ in range(2)
    )


def _fusable(x):
    """True when x is a kernel-blockable stacked digit component and we are
    not already tracing inside a fused kernel body."""
    return (
        not _IN_KERNEL
        and jax.default_backend() == "tpu"
        and x.ndim == 3
        and x.shape[1] % 8 == 0
        and x.shape[2] == 128
    )


@functools.cache
def _fused_op(name):
    """Fused whole-op Pallas kernels for the fp12 hot path (built lazily,
    one per op). Each body re-enters the SAME public function below — with
    _IN_KERNEL set the dispatcher short-circuits and the XLA digit math
    traces inside the kernel, so fused and unfused paths are one code
    path (bit-identical by construction)."""
    from . import pallas_lazy as PLZ

    if name == "mul12":
        body = lambda A, B: _flat12(fp12_mul(_pack12(A), _pack12(B)))
        return PLZ.tower_fused(body, [12, 12], 12)
    if name == "sqr12":
        body = lambda A: _flat12(fp12_sqr(_pack12(A)))
        return PLZ.tower_fused(body, [12], 12)
    if name == "mul_by_014":

        def body(F, C):
            f = _pack12(F)
            c0, c1, c4 = (C[0], C[1]), (C[2], C[3]), (C[4], C[5])
            out = fp12_mul_by_014_many([(f, c0, c1, c4)])[0]
            return _flat12(out)

        return PLZ.tower_fused(body, [12, 6], 12)
    raise KeyError(name)


def fp12_add(a, b):
    return (fp6_add(a[0], b[0]), fp6_add(a[1], b[1]))


def fp12_sub(a, b):
    return (fp6_sub(a[0], b[0]), fp6_sub(a[1], b[1]))


def fp12_conj(a):
    """Conjugation = cyclotomic inverse (the correct semantics of the
    reference's discarded-copy bug at /root/reference/src/pairing.rs:21)."""
    return (a[0], fp6_neg(a[1]))


def fp12_mul_many(pairs):
    """Karatsuba: 3 fp6 muls = 54 base muls, one concatenated launch."""
    legs = []
    for a, b in pairs:
        legs += [
            (a[0], b[0]),
            (a[1], b[1]),
            (fp6_add(a[0], a[1]), fp6_add(b[0], b[1])),
        ]
    prods = fp6_mul_many(legs)
    out = []
    for i in range(len(pairs)):
        t0, t1, t2 = prods[3 * i : 3 * i + 3]
        c0 = fp6_add(t0, fp6_mul_by_nonresidue(t1))
        c1 = fp6_sub(fp6_sub(t2, t0), t1)
        out.append((c0, c1))
    return out


def fp12_mul(a, b):
    if _fusable(a[0][0][0]):
        out = _fused_op("mul12")(jnp.stack(_flat12(a)), jnp.stack(_flat12(b)))
        return _pack12([out[c] for c in range(12)])
    return fp12_mul_many([(a, b)])[0]


def fp12_sqr(a):
    """Complex squaring: 2 fp6 muls (whole-op fused kernel on TPU)."""
    if _fusable(a[0][0][0]):
        out = _fused_op("sqr12")(jnp.stack(_flat12(a)))
        return _pack12([out[c] for c in range(12)])
    t, m = fp6_mul_many(
        [(a[0], a[1]), (fp6_add(a[0], a[1]), fp6_add(a[0], fp6_mul_by_nonresidue(a[1])))]
    )
    c0 = fp6_sub(fp6_sub(m, t), fp6_mul_by_nonresidue(t))
    c1 = fp6_add(t, t)
    return (c0, c1)


def fp12_inv(a, fuse: bool = True):
    s0, s1 = fp6_mul_many([(a[0], a[0]), (a[1], a[1])])
    t = fp6_sub(s0, fp6_mul_by_nonresidue(s1))
    tinv = fp6_inv(t, fuse)
    c0, c1 = fp6_mul_many([(a[0], tinv), (a[1], tinv)])
    return (c0, fp6_neg(c1))


def fp12_mul_by_014_many(items):
    """[(f, c0, c1, c4)] -> f * ((c0 + c1 v) + (c4 v) w): the sparse line
    multiplication of the Miller loop. All 15 fp2 products per item (the
    aa/bb/mid sub-multiplies) ride ONE concatenated launch — the Miller
    scan is latency-bound below ~2K batch, so launch count is the cost.
    Single items on TPU run as one whole-op fused kernel instead."""
    if len(items) == 1 and _fusable(items[0][0][0][0][0]):
        f, c0, c1, c4 = items[0]
        out = _fused_op("mul_by_014")(
            jnp.stack(_flat12(f)),
            jnp.stack([c0[0], c0[1], c1[0], c1[1], c4[0], c4[1]]),
        )
        return [_pack12([out[c] for c in range(12)])]
    legs = []
    for f, c0, c1, c4 in items:
        a0, a1, a2 = f[0]
        legs += [(a0, c0), (a1, c0), (a2, c0), (a2, c1), (a0, c1), (a1, c1)]
        b0, b1, b2 = f[1]
        legs += [(b2, c4), (b0, c4), (b1, c4)]
        s0, s1, s2 = fp6_add(f[0], f[1])
        c14 = fp2_add(c1, c4)
        legs += [(s0, c0), (s1, c0), (s2, c0), (s2, c14), (s0, c14), (s1, c14)]
    prods = fp2_mul_many(legs)
    out = []
    for i in range(len(items)):
        t = prods[15 * i : 15 * i + 15]
        t00, t10, t20, t21, t01, t11 = t[0:6]
        aa = (
            fp2_add(t00, fp2_mul_by_nonresidue(t21)),
            fp2_add(t01, t10),
            fp2_add(t11, t20),
        )
        m2, m0, m1 = t[6:9]
        bb = (fp2_mul_by_nonresidue(m2), m0, m1)
        u00, u10, u20, u21, u01, u11 = t[9:15]
        mid = (
            fp2_add(u00, fp2_mul_by_nonresidue(u21)),
            fp2_add(u01, u10),
            fp2_add(u11, u20),
        )
        nf1 = fp6_sub(fp6_sub(mid, aa), bb)
        nf0 = fp6_add(fp6_mul_by_nonresidue(bb), aa)
        out.append((nf0, nf1))
    return out


def fp12_one(batch_shape):
    one = fp_const(1, batch_shape)
    zero = fp_zero(batch_shape)
    z2 = (zero, zero)
    return (((one, zero), z2, z2), (z2, z2, z2))


# --- Frobenius ----------------------------------------------------------------

def fp2_frobenius(a, power: int):
    return a if power % 2 == 0 else fp2_conj(a)


def _const_mul_fp2(a, c, batch_shape):
    """Multiply an fp2 batch by a host fp2 constant. The constant rides as
    a broadcast Montgomery operand through the ordinary (Pallas) multiply —
    a static-digit const-mul would be ~2.7x cheaper in eops but costs ~3.5K
    traced statements per use (the round-4 per-digit-trace lesson)."""
    cc = fp2_const(c, batch_shape)
    return fp2_mul(a, cc)


def fp6_frobenius(a, power: int):
    """Apply frobenius^power using host-composed coefficient constants
    (first-principles tables from the oracle, correct unlike the
    reference's no-op at /root/reference/src/fp6.rs:552)."""
    shape = batch_shape_of(a[0][0])
    c1 = OF.FP2_ONE
    c2 = OF.FP2_ONE
    for _ in range(power % 6):
        c1 = OF.fp2_mul(OF.fp2_conj(c1), OF._G1J[2])
        c2 = OF.fp2_mul(OF.fp2_conj(c2), OF._G1J[4])
    a0, a1, a2 = a
    a0 = fp2_frobenius(a0, power)
    a1 = fp2_frobenius(a1, power)
    a2 = fp2_frobenius(a2, power)
    if c1 != OF.FP2_ONE:
        a1 = _const_mul_fp2(a1, c1, shape)
    if c2 != OF.FP2_ONE:
        a2 = _const_mul_fp2(a2, c2, shape)
    return (a0, a1, a2)


def fp12_frobenius(a, power: int):
    shape = batch_shape_of(a[0][0][0])
    c = OF.FP2_ONE
    for _ in range(power % 12):
        c = OF.fp2_mul(OF.fp2_conj(c), OF._G1J[1])
    b0 = fp6_frobenius(a[0], power)
    b1 = fp6_frobenius(a[1], power)
    if c != OF.FP2_ONE:
        b1 = tuple(_const_mul_fp2(x, c, shape) for x in b1)
    return (b0, b1)


# --- cyclotomic ops -----------------------------------------------------------

# Barrett constants for digit-level value contraction: q ~= value/p from the
# top digit alone.  K = round(2^(13*29+S) / p) with S = 16; the estimate
# q = round(d29*K / 2^S) satisfies |value/p - q| <= 0.5 (shift rounding)
# + 0.032 (K quantization: F_BOUND * 0.5 / 2^S) + 0.039 (ignored low-digit
# mass: 0.504 * 2^377/p), so |value - q*p| <= 0.58p.
_BARRETT_S = 16
_BARRETT_K = (2 ** (13 * 29 + _BARRETT_S) + _P // 2) // _P  # ~3343, int32-safe
_BARRETT_HALF = 1 << (_BARRETT_S - 1)


def _contract_many(elems):
    """Digit-level Barrett VALUE contraction: x - round(x/p)*p — the SAME
    residue mod p for ANY quotient estimate (only the magnitude depends on
    its accuracy), magnitude pulled into (-0.58p, 0.58p). Digit folds bound
    DIGITS, not values: an op that reuses its raw input additively across
    iterations (cyclotomic squaring's 3t +- 2z) doubles the value magnitude
    every round until the fold30 truncation bound (~250p) silently breaks —
    the round-4 ladder divergence.

    Round-5 cut: this replaced a Montgomery multiply by rep(1) (12 full
    ~4.3K-eop muls per cyclotomic square = 40% of its cost) with ~100
    elementwise ops per element: q from the top digit, one broadcast
    int32 multiply against p's digit column, two balanced folds (the
    subtract leaves digits <= F_BOUND + 0.58p/p_worst*8191 ~ 2.6e6; fold one
    brings them to <= 4096 + 318, fold two to <= F_BOUND). Exactness: the
    digit weights are linear, so value(x - q*pcol) = value(x) - q*p with no
    wraparound (|columns| < 2^31), and both folds truncate exactly because
    |value| <= 0.58p << 0.49 * 2^390."""
    # p's digits multiply q as Python-int literals (not a broadcast against
    # a device-constant column): the fused kernels may trace this body, and
    # Pallas kernels cannot capture device constants.
    pd = [int(v) for v in LZ.P_DIGITS]
    out = []
    for x in elems:
        q = (x[29] * _BARRETT_K + _BARRETT_HALF) >> _BARRETT_S
        qp = jnp.stack([q * d for d in pd])
        out.append(fold30(fold30(x - qp)))
    return out


def fp12_cyclotomic_sqr(a):
    """Granger-Scott squaring in the cyclotomic subgroup (lazy twin of
    tower.py fp12_cyclotomic_sqr; mirrors blst_fp12_cyclotomic_sqr's role
    at /root/reference/src/pairing.rs:28). On TPU with kernel-blockable
    (30, S, 128) components the WHOLE square runs as one fused Pallas
    kernel (pallas_lazy.cyc_sqr_fp12): the final exponentiation is ~315 of
    these, and at XLA level each one pays ~40 HBM round trips of glue
    (contractions, Karatsuba legs, the 3t±2z recombination) around the 18
    Pallas base muls."""
    if not _IN_KERNEL and jax.default_backend() == "tpu":
        x = a[0][0][0]
        if x.ndim == 3 and x.shape[1] % 8 == 0 and x.shape[2] == 128:
            from . import pallas_lazy as PLZ

            return PLZ.cyc_sqr_fp12(a)
    return _cyc_sqr_core(a)


def _cyc_sqr_core(a):
    """The squaring math itself (jnp on stacked digits; runs inside the
    fused kernel or as the XLA fallback). Inputs are value-contracted
    first: the 3t +- 2z structure feeds the raw input back additively, the
    one unstable recurrence in the pairing pipeline (see _contract_many)."""
    cs = _contract_many(
        [a[0][0][0], a[0][0][1], a[0][1][0], a[0][1][1], a[0][2][0],
         a[0][2][1], a[1][0][0], a[1][0][1], a[1][1][0], a[1][1][1],
         a[1][2][0], a[1][2][1]]
    )
    a = (((cs[0], cs[1]), (cs[2], cs[3]), (cs[4], cs[5])),
         ((cs[6], cs[7]), (cs[8], cs[9]), (cs[10], cs[11])))
    (a0, a1, a2), (b0, b1, b2) = a

    # each fp4 square needs c0^2, c1^2, (c0+c1)^2 — all true fp2 SQUARES,
    # so they ride the 2-base-mul complex-square path (fp2_sqr_many)
    # instead of generic 3-base-mul Karatsuba: 18 base muls per
    # cyclotomic square, not 27 (round-5 cut; final exp is ~315 of these)
    def fp4_sqr_items(c0, c1):
        return [c0, c1, fp2_add(c0, c1)]

    items = fp4_sqr_items(a0, b1) + fp4_sqr_items(b0, a2) + fp4_sqr_items(a1, b2)
    prods = fp2_sqr_many(items)

    def fp4_out(i):
        s0, s1, sboth = prods[3 * i : 3 * i + 3]
        r0 = fp2_add(fp2_mul_by_nonresidue(s1), s0)
        r1 = fp2_sub(fp2_sub(sboth, s0), s1)
        return r0, r1

    t0, t1 = fp4_out(0)
    s0, s1 = fp4_out(1)
    r0, r1 = fp4_out(2)

    def even(t, z):  # 3t - 2z
        return fp2_sub(fp2_mul_small(t, 3), fp2_mul_small(z, 2))

    def odd(t, z):  # 3t + 2z
        return fp2_add(fp2_mul_small(t, 3), fp2_mul_small(z, 2))

    na0 = even(t0, a0)
    nb1 = odd(t1, b1)
    na1 = even(s0, a1)
    nb2 = odd(s1, b2)
    na2 = even(r0, a2)
    nb0 = odd(fp2_mul_by_nonresidue(r1), b0)
    return ((na0, na1, na2), (nb0, nb1, nb2))
