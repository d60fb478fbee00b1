"""L5: batched optimal-ate pairing on device (Miller loop + final exp).

TPU-native re-creation of the reference's pairing engine
(/root/reference/src/pairing.rs:34-81): `multi_miller_loop` with
identity-pairs-give-one semantics (src/pairing.rs:58-60), G2 line-coefficient
precomputation (the `G2Prepared` analog, src/g2.rs:650-694), and the
final exponentiation (src/pairing.rs:76-80) with a cyclotomic hard part
(cyclotomic squaring mirrors `blst_fp12_cyclotomic_sqr`, src/pairing.rs:28).

Where the reference calls into blst C/assembly (`miller_loop_lines` at
src/pairing.rs:62, `blst_fp12_mul` at :68), we express the whole pipeline as
batched tower array programs over Montgomery arrays: many pairings evaluated
at once, every base-field multiply batched into fused launches.

TWO interchangeable tower engines (round 4):
* engine="lazy"   — ops/tower_lazy.py on the signed radix-13 lazy engine
  (hybrid Karatsuba, ~6-8x fewer eops/mul). The TPU default: inputs are
  ingested strict->lazy once, the whole pipeline runs lazily, outputs are
  canonicalized back to the strict representation at the end.
* engine="strict" — ops/tower.py on the radix-16 strict engine; the
  differential twin and the off-TPU default (its ops are few large cached
  programs, which is what eager CPU execution wants).

Two execution styles, like curves/msm.py:
* fuse=True  — `lax.scan` over the static 68-event Miller schedule and the
  64-bit cyclotomic exponent ladder: compact traces for TPU jit.
* fuse=False — eager Python loops (each primitive its own cached jit):
  keeps XLA:CPU compile times tolerable in tests.

The schedule constants (BLS parameter x bits) come from the oracle — single
source of truth, differentially tested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..oracle import field as OF
from ..oracle import pairing as OP
from ..ops import tower as TS
from ..ops import tower_lazy as TL

# Miller-loop event schedule: one entry per consumed line triple.
# is_dbl=True -> (square f, then ell); False -> (ell only).
# 63 doubling events + 5 addition events = 68, matching the reference's
# G2Prepared coefficient count (/root/reference/src/g2.rs:650-694).
MILLER_EVENTS = []
for _bit in OP.X_BITS:
    MILLER_EVENTS.append(True)
    if _bit:
        MILLER_EVENTS.append(False)
NUM_EVENTS = len(MILLER_EVENTS)


def _event_segments(ev):
    """[(n_doublings, has_addition_after)] static decomposition of an event
    schedule: runs of doubling events separated by single addition events.
    Lets the fused paths scan a doubling-only body and pay the addition
    step only at the 5 real addition events, instead of computing both
    step types at all 68 events and select-discarding one (round-5 cut)."""
    segs = []
    n_dbl = 0
    for is_dbl in ev:
        if is_dbl:
            n_dbl += 1
        else:
            segs.append((n_dbl, True))
            n_dbl = 0
    if n_dbl:
        segs.append((n_dbl, False))
    return segs

# bits of |x| MSB-first for the cyclotomic exponentiation ladder
X_ABS_BITS = [int(b) for b in bin(OP.X_ABS)[2:]]


def _auto_fuse(fuse):
    return jax.default_backend() == "tpu" if fuse is None else fuse


def _tower(engine):
    """Resolve the tower engine module. None = auto: lazy on TPU (fastest
    under jit), strict off-TPU (fastest eagerly)."""
    if engine is None:
        engine = "lazy" if jax.default_backend() == "tpu" else "strict"
    return TL if engine == "lazy" else TS


def _fp2_one_zero_like(T, qx):
    """fp2 value (1, 0) DERIVED from input data (x*0 + const), so it stays
    device-varying under shard_map and scan carries type-check without
    check_vma escape hatches (the round-1 lesson)."""
    if T is TL:
        zero = qx[0] * 0  # stacked (30, *batch)
        one = zero + TL._const_col(1, zero.ndim - 1)
        return (one, zero)
    sh = qx[0].shape[1:]
    zero = qx[0] * 0
    return (zero + T.fp_const(1, sh), zero)


def _fp12_one_like(T, px, sh):
    """fp12 one with every leaf derived from the input batch (x*0 + const):
    vma-correct as a scan carry inside shard_map (cf. _fp2_one_zero_like)."""
    if T is TL:
        zero = px * 0  # stacked (30, *batch)
        one = zero + TL._const_col(1, zero.ndim - 1)
    else:
        zero = px * 0
        one = zero + T.fp_const(1, sh)
    z2 = (zero, zero)
    return (((one, zero), z2, z2), (z2, z2, z2))


# --- G2 line-coefficient precomputation (G2Prepared) --------------------------

def _doubling_step(T, r):
    """Batched twin of oracle _doubling_step (Jacobian over Fp2); returns
    (new_r, (c0, c1, c2)) line coefficients."""
    x, y, z = r
    t0, t1, zsq = T.fp2_sqr_many([x, y, z])
    t2 = T.fp2_sqr(t1)
    s = T.fp2_sqr(T.fp2_add(t1, x))
    t3 = T.fp2_mul_small(T.fp2_sub(T.fp2_sub(s, t0), t2), 2)
    t4 = T.fp2_mul_small(t0, 3)
    t6 = T.fp2_add(x, t4)
    t5 = T.fp2_sqr(t4)
    nx = T.fp2_sub(t5, T.fp2_mul_small(t3, 2))
    nz = T.fp2_sub(T.fp2_sub(T.fp2_sqr(T.fp2_add(z, y)), t1), zsq)
    m0, m1 = T.fp2_mul_many([(T.fp2_sub(t3, nx), t4), (nz, zsq)])
    ny = T.fp2_sub(m0, T.fp2_mul_small(t2, 8))
    c0 = T.fp2_mul_small(m1, 2)
    (m2,) = T.fp2_mul_many([(t4, zsq)])
    c1 = T.fp2_neg(T.fp2_mul_small(m2, 2))
    c2 = T.fp2_sub(
        T.fp2_sub(T.fp2_sub(T.fp2_sqr(t6), t0), t5), T.fp2_mul_small(t1, 4)
    )
    return (nx, ny, nz), (c0, c1, c2)


def _addition_step(T, r, q):
    """Batched twin of oracle _addition_step (mixed add, line coefficients)."""
    x, y, z = r
    qx, qy = q
    zsq, ysq = T.fp2_sqr_many([z, qy])
    t0, m1 = T.fp2_mul_many(
        [(zsq, qx), (T.fp2_sub(T.fp2_sub(T.fp2_sqr(T.fp2_add(qy, z)), ysq), zsq), zsq)]
    )
    t1 = m1
    t2 = T.fp2_sub(t0, x)
    t3 = T.fp2_sqr(t2)
    t4 = T.fp2_mul_small(t3, 4)
    t6 = T.fp2_sub(t1, T.fp2_mul_small(y, 2))
    t5, t9, t7 = T.fp2_mul_many([(t4, t2), (t6, qx), (t4, x)])
    nx = T.fp2_sub(T.fp2_sub(T.fp2_sqr(t6), t5), T.fp2_mul_small(t7, 2))
    nz = T.fp2_sub(T.fp2_sub(T.fp2_sqr(T.fp2_add(z, t2)), zsq), t3)
    t10 = T.fp2_add(qy, nz)
    t8, m2 = T.fp2_mul_many([(T.fp2_sub(t7, nx), t6), (y, t5)])
    ny = T.fp2_sub(t8, T.fp2_mul_small(m2, 2))
    t10 = T.fp2_sub(T.fp2_sub(T.fp2_sqr(t10), ysq), T.fp2_sqr(nz))
    t9 = T.fp2_sub(T.fp2_mul_small(t9, 2), t10)
    c0 = T.fp2_mul_small(nz, 2)
    c1 = T.fp2_mul_small(T.fp2_neg(t6), 2)
    return (nx, ny, nz), (c0, c1, t9)


@functools.cache
def _fused_prepare_step(is_dbl: bool):
    """One whole prepare event as ONE Pallas kernel: the Jacobian
    doubling (or mixed addition) step plus its line triple, VMEM-resident.
    r is the stacked (6, 30, S, 128) Jacobian point; output stacks the new
    point and the coefficient triple as (12, ...)."""
    from ..ops import pallas_lazy as PLZ

    def _r(R):
        return ((R[0], R[1]), (R[2], R[3]), (R[4], R[5]))

    def _flat(r, c):
        (x, y, z), (c0, c1, c2) = r, c
        return [x[0], x[1], y[0], y[1], z[0], z[1],
                c0[0], c0[1], c1[0], c1[1], c2[0], c2[1]]

    if is_dbl:

        def body(R):
            r, c = _doubling_step(TL, _r(R))
            return _flat(r, c)

        return PLZ.tower_fused(body, [6], 12)

    def body(R, Q):
        r, c = _addition_step(TL, _r(R), ((Q[0], Q[1]), (Q[2], Q[3])))
        return _flat(r, c)

    return PLZ.tower_fused(body, [6, 4], 12)


def prepare_g2(q, fuse=None, engine=None, events=None):
    """Affine G2 batch (qx, qy) [STRICT fp2 leaves (L, *batch)] -> stacked
    line coefficients in the chosen ENGINE's representation, leading axis
    NUM_EVENTS. The `G2Prepared` analog (/root/reference/src/g2.rs:650-694).
    Identity inputs produce garbage (finite) coefficients — the Miller loop
    masks those pairs to one, the reference's substitution semantics
    (src/pairing.rs:58-60)."""
    fuse = _auto_fuse(fuse)
    T = _tower(engine)
    ev = MILLER_EVENTS if events is None else MILLER_EVENTS[:events]
    qx, qy = q
    sh = qx[0].shape[1:]
    if T is TL:
        qx, qy = TL.fp2_ingest(qx), TL.fp2_ingest(qy)
    r = (qx, qy, _fp2_one_zero_like(T, qx))

    if not fuse:
        coeffs = []
        for is_dbl in ev:
            r, c = (
                _doubling_step(T, r) if is_dbl else _addition_step(T, r, (qx, qy))
            )
            coeffs.append(c)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *coeffs)

    if T is TL and TL._fusable(qx[0]):
        # whole-event fused path: stacked (6, 30, S, 128) point carry, one
        # kernel per event; coefficients are collected stacked and unpacked
        # to the coeff pytree once at the end
        rs = jnp.stack([r[0][0], r[0][1], r[1][0], r[1][1], r[2][0], r[2][1]])
        qs = jnp.stack([qx[0], qx[1], qy[0], qy[1]])

        def dbl_stk(rs, _):
            out = _fused_prepare_step(True)(rs)
            return out[:6], out[6:]

        chunks = []
        for n_dbl, has_add in _event_segments(ev):
            if n_dbl:
                rs, cs = lax.scan(dbl_stk, rs, None, length=n_dbl)
                chunks.append(cs)
            if has_add:
                out = _fused_prepare_step(False)(rs, qs)
                rs = out[:6]
                chunks.append(out[None, 6:])
        allc = jnp.concatenate(chunks, axis=0)  # (NUM, 6, 30, S, 128)
        return (
            (allc[:, 0], allc[:, 1]),
            (allc[:, 2], allc[:, 3]),
            (allc[:, 4], allc[:, 5]),
        )

    def dbl_body(r, _):
        r, c = _doubling_step(T, r)
        return r, c

    chunks = []
    for n_dbl, has_add in _event_segments(ev):
        if n_dbl:
            r, cs = lax.scan(dbl_body, r, None, length=n_dbl)
            chunks.append(cs)
        if has_add:
            r, c = _addition_step(T, r, (qx, qy))
            chunks.append(jax.tree.map(lambda x: x[None], c))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *chunks)


# --- Miller loop ---------------------------------------------------------------

def _ell_legs(T, coeff, px, py):
    """Scale a line triple into mul_by_014 operand form: (c4=c0*py, c1=c1*px,
    c0=c2). The fp2-by-fp scaling is 2 base muls per component."""
    c0, c1, c2 = coeff
    s0a, s0b, s1a, s1b = T.fp_mul_many(
        [(c0[0], py), (c0[1], py), (c1[0], px), (c1[1], px)]
    )
    return c2, (s1a, s1b), (s0a, s0b)


@functools.cache
def _fused_miller_step(with_sqr: bool):
    """One whole Miller event as ONE Pallas kernel: (optional f^2) + line
    scaling (_ell_legs) + sparse mul_by_014, all VMEM-resident. Inputs are
    stacked digit components: f (12, 30, S, 128), line triple (6, ...),
    (px, py) (2, ...). At XLA level the same event is 3 kernel launches
    plus ~80 HBM-round-tripping glue ops."""
    from ..ops import pallas_lazy as PLZ

    def body(F, C, PXY):
        f = TL._pack12(F)
        c = ((C[0], C[1]), (C[2], C[3]), (C[4], C[5]))
        px, py = PXY
        if with_sqr:
            f = TL.fp12_sqr(f)
        a0, a1, a4 = _ell_legs(TL, c, px, py)
        f = TL.fp12_mul_by_014_many([(f, a0, a1, a4)])[0]
        return TL._flat12(f)

    return PLZ.tower_fused(body, [12, 6, 2], 12)


def miller_loop(p, coeffs, fuse=None, engine=None, ingest=True, events=None):
    """Batched Miller loop: p = (px, py) STRICT affine G1 batch, coeffs from
    prepare_g2 (same engine). Returns an ENGINE fp12 batch (conjugated:
    x < 0). Twin of blstrs `miller_loop_lines`
    (/root/reference/src/pairing.rs:62)."""
    fuse = _auto_fuse(fuse)
    T = _tower(engine)
    px, py = p
    sh = px.shape[1:]
    if T is TL and ingest:
        px, py = TL.fp_ingest(px), TL.fp_ingest(py)
    f = _fp12_one_like(T, px, sh)
    ev = MILLER_EVENTS if events is None else MILLER_EVENTS[:events]

    if not fuse:
        for i, is_dbl in enumerate(ev):
            c = jax.tree.map(lambda x: x[i], coeffs)
            if is_dbl:
                f = T.fp12_sqr(f)
            a0, a1, a4 = _ell_legs(T, c, px, py)
            f = T.fp12_mul_by_014_many([(f, a0, a1, a4)])[0]
        return T.fp12_conj(f)

    if T is TL and TL._fusable(px):
        # whole-event fused path: f carried in stacked (12, 30, S, 128)
        # form across the scan (no per-event repacking), one kernel per
        # event
        c0, c1, c2 = coeffs
        cstk = jnp.stack([c0[0], c0[1], c1[0], c1[1], c2[0], c2[1]], axis=1)
        pxy = jnp.stack([px, py])
        fs = jnp.stack(TL._flat12(f))

        def dbl_stk(fs, c):
            return _fused_miller_step(True)(fs, c, pxy), None

        i = 0
        for n_dbl, has_add in _event_segments(ev):
            if n_dbl:
                fs, _ = lax.scan(dbl_stk, fs, cstk[i : i + n_dbl])
                i += n_dbl
            if has_add:
                fs = _fused_miller_step(False)(fs, cstk[i], pxy)
                i += 1
        return TL.fp12_conj(TL._pack12([fs[c] for c in range(12)]))

    def dbl_body(f, c):
        f = T.fp12_sqr(f)
        a0, a1, a4 = _ell_legs(T, c, px, py)
        f = T.fp12_mul_by_014_many([(f, a0, a1, a4)])[0]
        return f, None

    i = 0
    for n_dbl, has_add in _event_segments(ev):
        if n_dbl:
            cs = jax.tree.map(lambda x: x[i : i + n_dbl], coeffs)
            f, _ = lax.scan(dbl_body, f, cs)
            i += n_dbl
        if has_add:  # addition events: ell only, no squaring
            c = jax.tree.map(lambda x: x[i], coeffs)
            a0, a1, a4 = _ell_legs(T, c, px, py)
            f = T.fp12_mul_by_014_many([(f, a0, a1, a4)])[0]
            i += 1
    return T.fp12_conj(f)


# --- final exponentiation -------------------------------------------------------

# Static segment decomposition of the |x| square-and-multiply ladder:
# after the leading bit, a set bit at gap L costs L squarings then one
# multiply; the trailing zeros are squarings only. |x| has Hamming weight
# 6, so this pays 5 fp12_muls total instead of one per bit (the round-4
# scan multiplied unconditionally and select-discarded 57 of 63 products).
_X_SEGMENTS = []
_run = 0
for _bit in X_ABS_BITS[1:]:
    _run += 1
    if _bit:
        _X_SEGMENTS.append((_run, True))
        _run = 0
if _run:
    _X_SEGMENTS.append((_run, False))
del _run, _bit


def cyclotomic_exp_x_conj(f, fuse=None, engine=None):
    """f^(-x) = conj(f^|x|) in the cyclotomic subgroup (x < 0 for BLS12-381);
    square-and-multiply over the static 64-bit |x| ladder."""
    fuse = _auto_fuse(fuse)
    T = _tower(engine)

    if not fuse:
        r = f
        for bit in X_ABS_BITS[1:]:
            r = T.fp12_cyclotomic_sqr(r)
            if bit:
                r = T.fp12_mul(r, f)
        return T.fp12_conj(r)

    if T is TL and TL._fusable(f[0][0][0]):
        # stacked fused ladder: each segment's n squarings run inside ONE
        # Pallas kernel (VMEM-resident between squarings), segment-boundary
        # multiplies are whole-op fused kernels, and the value never leaves
        # the stacked (12, 30, S, 128) form
        from ..ops import pallas_lazy as PLZ

        base = jnp.stack(TL._flat12(f))
        x = base
        for n_sqr, do_mul in _X_SEGMENTS:
            x = PLZ.cyc_sqr_stacked(x, n_sqr)
            if do_mul:
                x = TL._fused_op("mul12")(x, base)
        return TL.fp12_conj(TL._pack12([x[c] for c in range(12)]))

    r = f
    for n_sqr, do_mul in _X_SEGMENTS:
        # fori_loop: the squaring body is traced ONCE per segment (6
        # segments), keeping the trace compact without the scan's wasted
        # unconditional multiplies
        r = lax.fori_loop(
            0, n_sqr, lambda _, v: T.fp12_cyclotomic_sqr(v), r
        )
        if do_mul:
            r = T.fp12_mul(r, f)
    return T.fp12_conj(r)


def final_exp(f, fuse=None, engine=None):
    """Easy part then the standard BLS12-381 cyclotomic addition chain —
    batched twin of oracle final_exp; role of blstrs final_exponentiation
    (/root/reference/src/pairing.rs:76-80). Input and output are ENGINE
    fp12 values."""
    fuse = _auto_fuse(fuse)
    T = _tower(engine)
    ex = lambda g: cyclotomic_exp_x_conj(g, fuse, engine)
    # easy part: f^((p^6-1)(p^2+1))
    t0 = T.fp12_conj(f)
    t1 = T.fp12_inv(f, fuse) if T is TL else T.fp12_inv(f)
    t2 = T.fp12_mul(t0, t1)
    t1 = t2
    t2 = T.fp12_mul(T.fp12_frobenius(t2, 2), t1)
    # hard part (chain identical to oracle final_exp)
    t1 = T.fp12_conj(T.fp12_cyclotomic_sqr(t2))
    t3 = ex(t2)
    t4 = T.fp12_cyclotomic_sqr(t3)
    t5 = T.fp12_mul(t1, t3)
    t1 = ex(t5)
    t0 = ex(t1)
    t6 = ex(t0)
    t6 = T.fp12_mul(t6, t4)
    t4 = ex(t6)
    t5 = T.fp12_conj(t5)
    t4 = T.fp12_mul(T.fp12_mul(t4, t5), t2)
    t5 = T.fp12_conj(t2)
    t1 = T.fp12_mul(t1, t2)
    t1 = T.fp12_frobenius(t1, 3)
    t6 = T.fp12_mul(t6, t5)
    t6 = T.fp12_frobenius(t6, 1)
    t3 = T.fp12_mul(t3, t0)
    t3 = T.fp12_frobenius(t3, 2)
    t3 = T.fp12_mul(t3, t1)
    t3 = T.fp12_mul(t3, t6)
    return T.fp12_mul(t3, t4)


# --- public pairing surface -----------------------------------------------------

def _fold_mul(T, f, n):
    """Tree-reduce an fp12 batch (product over the batch axis)."""
    size = 1 << max(0, (n - 1)).bit_length()
    if size != n:
        pad = T.fp12_one((size - n,))
        f = jax.tree.map(lambda x, o: jnp.concatenate([x, o], axis=-1), f, pad)
    while size > 1:
        half = size // 2
        lo = jax.tree.map(lambda x: x[..., :half], f)
        hi = jax.tree.map(lambda x: x[..., half:], f)
        f = T.fp12_mul(lo, hi)
        size = half
    return f  # batch (1,)


def _egress(T, f):
    """ENGINE fp12 -> strict stacked representation (no-op for strict)."""
    return TL.fp12_egress(f) if T is TL else f


def multi_miller_loop(p, q, p_inf=None, q_inf=None, fuse=None, engine=None):
    """Product of Miller loops over a batch of (G1 affine, G2 affine) pairs,
    with the reference's identity-pair substitution (pairs containing an
    identity contribute one, /root/reference/src/pairing.rs:49-74).

    p = (px, py) STRICT fp leaves (L, N); q = (qx, qy) strict fp2; *_inf
    optional boolean masks (N,). Returns a STRICT fp12 batch of shape (1,)
    (un-final-exponentiated)."""
    T = _tower(engine)
    px, py = p
    n = px.shape[-1]
    flat = T is TL and px.ndim == 2
    pad_mask = None
    if flat:
        p, q, p_inf, q_inf, pad_mask, n2 = _tile_pad_inputs(
            p, q, p_inf, q_inf, n
        )
    else:
        n2 = n
    coeffs = prepare_g2(q, fuse, engine)
    f = miller_loop(p, coeffs, fuse, engine)
    skip = pad_mask  # padded pairs contribute one to the product
    if p_inf is not None:
        skip = p_inf if skip is None else (skip | p_inf)
    if q_inf is not None:
        skip = q_inf if skip is None else (skip | q_inf)
    if skip is not None:
        f = T.select(skip, T.fp12_one(p[0].shape[1:]), f)
    if flat:
        f = jax.tree.map(lambda x: x.reshape(x.shape[0], n2), f)
    return _egress(T, _fold_mul(T, f, n2))


def _to2d(arr):
    """(L, N) -> (L, N//128, 128): 1-D (N,) batch shapes lay out as (1, N)
    tiles on TPU and waste 7/8 of every VPU op's sublanes."""
    return arr.reshape(arr.shape[0], arr.shape[1] // 128, 128)


def _pad128(arr, n2):
    """Edge-pad the trailing batch axis to n2 (padded entries are valid
    copies of the last element; callers slice or mask them away)."""
    n = arr.shape[-1]
    if n == n2:
        return arr
    pad = [(0, 0)] * (arr.ndim - 1) + [(0, n2 - n)]
    return jnp.pad(arr, pad, mode="edge")


def _tile_pad_inputs(p, q, p_inf, q_inf, n):
    """Lazy-path batch prep: pad the batch to a TILE (1024) multiple and
    reshape to (., S, 128). The Pallas multiply blocks (8, 128) rows; any
    smaller/1-D batch would fall back to the per-digit XLA trace (~919K
    statements — un-compilable on the remote helper). Returns
    (p, q, p_inf, q_inf, pad_mask, n2); pad_mask marks padded entries."""
    n2 = -(-n // 1024) * 1024
    p = (_to2d(_pad128(p[0], n2)), _to2d(_pad128(p[1], n2)))
    q = tuple(
        (_to2d(_pad128(c[0], n2)), _to2d(_pad128(c[1], n2))) for c in q
    )
    sh = (n2 // 128, 128)
    if p_inf is not None:
        p_inf = _pad128(p_inf, n2).reshape(sh)
    if q_inf is not None:
        q_inf = _pad128(q_inf, n2).reshape(sh)
    pad_mask = (
        (jnp.arange(n2) >= n).reshape(sh) if n2 != n else None
    )
    return p, q, p_inf, q_inf, pad_mask, n2


def pairing(p, q, p_inf=None, q_inf=None, fuse=None, engine=None):
    """Batched full pairing e(P_i, Q_i) elementwise (no product reduction):
    returns a STRICT fp12 batch shaped like the inputs. Identity inputs
    yield one. Batches divisible by 128 are reshaped to (N/128, 128)
    internally for full sublane utilization."""
    T = _tower(engine)
    n = p[0].shape[-1]
    # 2-D reshape + padding serve the lazy/TPU path (sublane utilization,
    # and keeping the per-digit trace off the compiler); the strict eager
    # path would only get 64x more work from padding tiny test batches
    flat = T is TL and p[0].ndim == 2
    if flat:
        p, q, p_inf, q_inf, _, n2 = _tile_pad_inputs(p, q, p_inf, q_inf, n)
    coeffs = prepare_g2(q, fuse, engine)
    f = miller_loop(p, coeffs, fuse, engine)
    skip = None
    if p_inf is not None:
        skip = p_inf
    if q_inf is not None:
        skip = q_inf if skip is None else (skip | q_inf)
    if skip is not None:
        f = T.select(skip, T.fp12_one(p[0].shape[1:]), f)
    out = _egress(T, final_exp(f, fuse, engine))
    if flat:
        out = jax.tree.map(lambda x: x.reshape(x.shape[0], -1)[:, :n], out)
    return out


# --- device G2Prepared reuse ----------------------------------------------------

class DeviceG2Prepared:
    """Precomputed Miller-loop line coefficients living on device as ONE
    stacked array — the device analog of `G2Prepared`
    (/root/reference/src/g2.rs:650-694), whose whole point is amortizing the
    precomputation across pairings. `stacked` crosses jit boundaries as a
    single array (the platform charges per-array dispatch overhead), and
    `q_inf` records identity inputs for the substitution semantics."""

    __slots__ = ("engine", "stacked", "q_inf", "n")

    def __init__(self, engine: str, stacked, q_inf, n: int):
        self.engine = engine
        self.stacked = stacked
        self.q_inf = q_inf
        self.n = n


def stack_coeffs(coeffs):
    """Engine coeffs pytree -> single stacked array (leaves axis 0)."""
    return jnp.stack(jax.tree.leaves(coeffs))


def unstack_coeffs(arr, engine=None):
    """Inverse of stack_coeffs (both engines: 3 coefficient fp2 pairs,
    each component one stacked array)."""
    template = tuple((0, 0) for _ in range(3))
    treedef = jax.tree.structure(template)
    leaves = [arr[i] for i in range(arr.shape[0])]
    return jax.tree.unflatten(treedef, leaves)


def prepare_g2_device(q, q_inf=None, fuse=None, engine=None):
    """Public precomputation entry: strict affine G2 batch -> DeviceG2Prepared
    (prepare once, pair many — the reuse the round-3 device path rejected)."""
    if engine is None:
        engine = "lazy" if jax.default_backend() == "tpu" else "strict"
    n = q[0][0].shape[-1]
    if engine == "lazy" and q[0][0].ndim == 2:
        dummy_p = (q[0][0], q[0][0])
        _, q, _, q_inf, pad_mask, _ = _tile_pad_inputs(
            dummy_p, q, None, q_inf, n
        )
        if pad_mask is not None:
            q_inf = pad_mask if q_inf is None else (q_inf | pad_mask)
    coeffs = prepare_g2(q, fuse, engine)
    return DeviceG2Prepared(engine, stack_coeffs(coeffs), q_inf, n)


def pairing_prepared(p, prepared: DeviceG2Prepared, p_inf=None, fuse=None):
    """Batched elementwise pairing against precomputed line coefficients:
    skips the ~40% of the Miller-loop work that prepare_g2 performs."""
    T = _tower(prepared.engine)
    n = p[0].shape[-1]
    assert n == prepared.n, "prepared batch size mismatch"
    flat = T is TL and p[0].ndim == 2
    if flat:
        qd = ((p[0], p[0]), (p[0], p[0]))  # placeholder, shapes only
        p, _, p_inf, _, _, n2 = _tile_pad_inputs(p, qd, p_inf, None, n)
    coeffs = unstack_coeffs(prepared.stacked, prepared.engine)
    f = miller_loop(p, coeffs, fuse, prepared.engine)
    skip = None
    if p_inf is not None:
        skip = p_inf
    if prepared.q_inf is not None:
        skip = prepared.q_inf if skip is None else (skip | prepared.q_inf)
    if skip is not None:
        f = T.select(skip, T.fp12_one(p[0].shape[1:]), f)
    out = _egress(T, final_exp(f, fuse, prepared.engine))
    if flat:
        out = jax.tree.map(lambda x: x.reshape(x.shape[0], -1)[:, :n], out)
    return out


def multi_miller_loop_prepared(p, prepared: DeviceG2Prepared, p_inf=None,
                               fuse=None):
    """multi_miller_loop against precomputed coefficients (product form).
    Padded entries (lazy path) are covered by the prepared q_inf mask."""
    T = _tower(prepared.engine)
    n = p[0].shape[-1]
    assert n == prepared.n, "prepared batch size mismatch"
    flat = T is TL and p[0].ndim == 2
    pad_mask = None
    if flat:
        qd = ((p[0], p[0]), (p[0], p[0]))
        p, _, p_inf, _, pad_mask, n2 = _tile_pad_inputs(p, qd, p_inf, None, n)
    else:
        n2 = n
    coeffs = unstack_coeffs(prepared.stacked, prepared.engine)
    f = miller_loop(p, coeffs, fuse, prepared.engine)
    skip = pad_mask
    if p_inf is not None:
        skip = p_inf if skip is None else (skip | p_inf)
    if prepared.q_inf is not None:
        skip = prepared.q_inf if skip is None else (skip | prepared.q_inf)
    if skip is not None:
        f = T.select(skip, T.fp12_one(p[0].shape[1:]), f)
    if flat:
        f = jax.tree.map(lambda x: x.reshape(x.shape[0], n2), f)
    return _egress(T, _fold_mul(T, f, n2))


# --- sharded multi-pairing ------------------------------------------------------

def multi_pairing_sharded(p, q, mesh, p_inf=None, q_inf=None, axis: str = "data",
                          engine=None, final=True, events=None, fuse=True):
    """prod_i e(P_i, Q_i) with the pairing batch SHARDED over a device mesh:
    each device runs prepare_g2 + Miller + its partial fp12 product inside
    shard_map, the per-device partials are gathered (one fp12 each) and the
    product + single final exponentiation finish on replicated data. This is
    the multi-pairing product reduction SURVEY.md §2d names as a collective
    use case (the reference is single-device everywhere,
    /root/reference/src/gpu.rs:233-234).

    Inputs: strict (px, py), (qx, qy) with batch N divisible by the mesh
    axis size (pad with identity pairs + masks otherwise). Returns a STRICT
    fp12 batch of shape (1,)."""
    from jax.sharding import PartitionSpec as Pspec

    T = _tower(engine)
    eng = "lazy" if T is TL else "strict"
    px, py = p
    n = px.shape[-1]
    ndev = mesh.shape[axis]
    assert n % ndev == 0, "pad the pairing batch to a multiple of the mesh"
    if p_inf is None:
        p_inf = jnp.zeros((n,), jnp.bool_)
    if q_inf is None:
        q_inf = jnp.zeros((n,), jnp.bool_)
    skip = p_inf | q_inf

    def local(px_, py_, qx0, qx1, qy0, qy1, skip_):
        coeffs = prepare_g2(((qx0, qx1), (qy0, qy1)), fuse, eng, events)
        f = miller_loop((px_, py_), coeffs, fuse, eng, events=events)
        m = n // ndev
        one = _fp12_one_like(
            T, (px_ if T is not TL else TL.fp_ingest(px_)), (m,)
        )
        f = T.select(skip_, one, f)
        part = _fold_mul(T, f, m)
        return jax.tree.map(lambda x: x[None], part)  # add device axis

    spec_fp = Pspec(None, axis)
    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_fp, spec_fp, spec_fp, spec_fp, spec_fp, spec_fp,
                  Pspec(axis)),
        out_specs=Pspec(axis),
    )(px, py, q[0][0], q[0][1], q[1][0], q[1][1], skip)

    # fold the ndev per-device partials (tiny) and final-exponentiate once
    f = jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1)[..., 0, :], out)
    f = _fold_mul(T, f, ndev)
    if final:
        f = final_exp(f, fuse, eng)
    return _egress(T, f)
