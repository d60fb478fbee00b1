"""Vectorized Montgomery field ops over *stacked limb-major* arrays.

Canonical device representation: a batch of field elements is a uint32 array
of shape ``(L, *batch)`` — limb index first ("structure of limbs"), value in
little-endian 16-bit limbs. This makes every arithmetic step an elementwise
op over ``batch``-shaped arrays (a DAG XLA fuses into a single pass — no
padded-shift tensors, no (L, L) materialization), and maps directly onto
Pallas/Mosaic where the same functions run on VMEM-resident values.

Internally ops use Python lists of per-limb arrays (``a[i]`` of shape
``batch``); the limb loops are unrolled at trace time. Algorithms are as in
`limbs.py` (see its docstring for the carry discipline and the
3-multiplication Montgomery reduction); `limbs.py` remains the array-layout
reference implementation, differentially tested against this one.

Replaces blst's 384/256-bit assembly (/root/reference Cargo.toml:22,
src/fp.rs:482-491) with batch-oriented TPU arithmetic.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

from .limbs import FieldSpec, FP, FR, LIMB_BITS, MASK, int_to_limbs

_U32 = jnp.uint32


# --- list <-> stacked conversions -------------------------------------------

def unstack(a):
    """(L, *batch) array -> list of L batch-shaped arrays."""
    return [a[i] for i in range(a.shape[0])]


def stack(limbs):
    return jnp.stack(limbs, axis=0)


def const_limbs(value: int, num_limbs: int):
    """Python-int constant -> list of python-int limbs (used as scalars in
    jnp arithmetic: no broadcasts materialized)."""
    return [int(v) for v in int_to_limbs(value, num_limbs)]


# --- normalization (exact, Kogge-Stone carry lookahead) ----------------------

def normalize_list(t, out_len):
    """Relaxed digit list (values < 2^31) -> strict 16-bit digit list of
    length `out_len` (value truncated mod 2^(16*out_len))."""
    n = len(t)
    width = max(n + 1, out_len)
    zero = jnp.zeros_like(t[0])
    a = [t[k] & MASK for k in range(n)] + [zero] * (width - n)
    b = [zero] + [t[k] >> LIMB_BITS for k in range(n)] + [zero] * (width - n - 1)
    s = [x + y for x, y in zip(a, b)]  # digit sums < 2^16 + 2^15
    g = [x >> LIMB_BITS for x in s]
    p = [(x & MASK) == MASK for x in s]
    d = 1
    while d < width:
        g = [g[k] | (jnp.where(p[k], g[k - d], _U32(0)) if k >= d else _U32(0))
             for k in range(width)]
        p = [(p[k] & p[k - d]) if k >= d else jnp.zeros_like(p[k]) for k in range(width)]
        d *= 2
    out = []
    for k in range(out_len):
        c = g[k - 1] if k >= 1 else _U32(0)
        out.append((s[k] + c) & MASK if k < width else zero)
    return out


# --- schoolbook products -----------------------------------------------------

def mul_wide_list(a, b):
    """Full product: strict lists (la, lb limbs) -> relaxed list (la+lb)."""
    la, lb = len(a), len(b)
    acc = [None] * (la + lb)

    def accum(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v

    for i in range(la):
        for j in range(lb):
            prod = a[i] * b[j]
            accum(i + j, prod & MASK)
            accum(i + j + 1, prod >> LIMB_BITS)
    zero = jnp.zeros_like(a[0] * b[0]) if la and lb else None
    return [x if x is not None else zero for x in acc]


def mul_const_wide_list(a, c_limbs):
    """Product by a constant given as python-int limbs (scalar multiplies)."""
    la, lc = len(a), len(c_limbs)
    acc = [None] * (la + lc)

    def accum(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v

    for i in range(la):
        for j, cj in enumerate(c_limbs):
            if cj == 0:
                continue
            prod = a[i] * _U32(cj)
            accum(i + j, prod & MASK)
            accum(i + j + 1, prod >> LIMB_BITS)
    zero = jnp.zeros_like(a[0])
    return [x if x is not None else zero for x in acc]


def mul_low_list(a, b_or_const, out_len, const=False):
    """Low `out_len` digits of a product (relaxed), i.e. mod 2^(16*out_len)."""
    acc = [None] * out_len

    def accum(k, v):
        if k < out_len:
            acc[k] = v if acc[k] is None else acc[k] + v

    for i in range(len(a)):
        if i >= out_len:
            break
        if const:
            for j, cj in enumerate(b_or_const[: out_len - i]):
                if cj == 0:
                    continue
                prod = a[i] * _U32(cj)
                accum(i + j, prod & MASK)
                accum(i + j + 1, prod >> LIMB_BITS)
        else:
            for j in range(min(len(b_or_const), out_len - i)):
                prod = a[i] * b_or_const[j]
                accum(i + j, prod & MASK)
                accum(i + j + 1, prod >> LIMB_BITS)
    zero = jnp.zeros_like(a[0])
    return [x if x is not None else zero for x in acc]


# --- modular core (list level) ----------------------------------------------

def _cond_sub_list(u, spec: FieldSpec):
    """u strict digits, value < 2p -> u mod p (list level)."""
    L = spec.num_limbs
    pc = const_limbs((1 << (LIMB_BITS * L)) - 1 - spec.modulus, L)  # R-1-p
    t = [u[k] + _U32(pc[k]) for k in range(L)]
    t[0] = t[0] + _U32(1)
    v = normalize_list(t, L + 1)
    ge = v[L] == 1
    return [jnp.where(ge, v[k], u[k]) for k in range(L)]


def _mont_mul_list(a, b, spec: FieldSpec, b_const=None):
    L = spec.num_limbs
    if b_const is not None:
        t = normalize_list(mul_const_wide_list(a, b_const), 2 * L)
    else:
        t = normalize_list(mul_wide_list(a, b), 2 * L)
    ninv = const_limbs(spec.ninv, L)
    m = normalize_list(mul_low_list(t[:L], ninv, L, const=True), L)
    mp = mul_const_wide_list(m, const_limbs(spec.modulus, L))
    u = [t[k] + mp[k] for k in range(2 * L)]
    u = normalize_list(u, 2 * L)
    return _cond_sub_list(u[L:], spec)


# --- public stacked-array API ------------------------------------------------

@functools.partial(jax.jit, static_argnames=("spec",))
def add(a, b, spec: FieldSpec):
    t = unstack(a + b)  # digits < 2^17
    return stack(_cond_sub_list(normalize_list(t, spec.num_limbs), spec))


@functools.partial(jax.jit, static_argnames=("spec",))
def sub(a, b, spec: FieldSpec):
    L = spec.num_limbs
    p_l = const_limbs(spec.modulus, L)
    t = [a[k] + (_U32(MASK) - b[k]) + _U32(p_l[k]) for k in range(L)]
    t[0] = t[0] + _U32(1)  # a - b + p + R
    return stack(_cond_sub_list(normalize_list(t, L), spec))


@functools.partial(jax.jit, static_argnames=("spec",))
def neg(a, spec: FieldSpec):
    L = spec.num_limbs
    p_l = const_limbs(spec.modulus, L)
    t = [(_U32(MASK) - a[k]) + _U32(p_l[k]) for k in range(L)]
    t[0] = t[0] + _U32(1)  # p - a + R
    return stack(_cond_sub_list(normalize_list(t, L), spec))


@functools.partial(jax.jit, static_argnames=("spec",))
def mul(a, b, spec: FieldSpec):
    """Montgomery product (both operands and result in Montgomery form)."""
    return stack(_mont_mul_list(unstack(a), unstack(b), spec))


@functools.partial(jax.jit, static_argnames=("spec",))
def sqr(a, spec: FieldSpec):
    return mul(a, a, spec)


@functools.partial(jax.jit, static_argnames=("value", "spec"))
def mul_small(a, value: int, spec: FieldSpec):
    """Multiply by a small static plain-integer constant (2, 3, 8, 12, ...)
    via a double-and-add chain of modular additions — far cheaper than a
    full Montgomery multiply for the constants curve formulas need."""
    assert value > 0
    bits = bin(value)[2:]
    r = a
    for bit in bits[1:]:
        r = add(r, r, spec)
        if bit == "1":
            r = add(r, a, spec)
    return r


@functools.partial(jax.jit, static_argnames=("spec",))
def mont_from_int_array(a, spec: FieldSpec):
    """Canonical stacked limbs -> Montgomery form."""
    r2 = const_limbs(spec.mont_r2, spec.num_limbs)
    return stack(_mont_mul_list(unstack(a), None, spec, b_const=r2))


@functools.partial(jax.jit, static_argnames=("spec",))
def mont_to_int_array(a, spec: FieldSpec):
    one = [1] + [0] * (spec.num_limbs - 1)
    return stack(_mont_mul_list(unstack(a), None, spec, b_const=one))


def is_zero(a):
    return jnp.all(a == 0, axis=0)


def eq(a, b):
    return jnp.all(a == b, axis=0)


def select(mask, a, b):
    """mask shaped like batch; broadcast over the leading limb axis."""
    return jnp.where(mask[None], a, b)


def zeros(batch_shape, spec: FieldSpec):
    return jnp.zeros((spec.num_limbs,) + tuple(batch_shape), _U32)


def consts(value_mont: int, batch_shape, spec: FieldSpec):
    """Broadcast a host int (already in desired form) to a stacked batch."""
    limbs = int_to_limbs(value_mont, spec.num_limbs)
    return jnp.broadcast_to(
        jnp.asarray(limbs, _U32).reshape((spec.num_limbs,) + (1,) * len(batch_shape)),
        (spec.num_limbs,) + tuple(batch_shape),
    )
