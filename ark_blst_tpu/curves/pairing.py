"""L5: batched optimal-ate pairing on device (Miller loop + final exp).

TPU-native re-creation of the reference's pairing engine
(/root/reference/src/pairing.rs:34-81): `multi_miller_loop` with
identity-pairs-give-one semantics (src/pairing.rs:58-60), G2 line-coefficient
precomputation (the `G2Prepared` analog, src/g2.rs:650-694), and the
final exponentiation (src/pairing.rs:76-80) with a cyclotomic hard part
(cyclotomic squaring mirrors `blst_fp12_cyclotomic_sqr`, src/pairing.rs:28).

Where the reference calls into blst C/assembly (`miller_loop_lines` at
src/pairing.rs:62, `blst_fp12_mul` at :68), we express the whole pipeline as
batched tower array programs (ops/tower.py) over stacked-limb Montgomery
arrays: many pairings evaluated at once, every base-field multiply batched
into fused kernel launches.

Two execution styles, like curves/msm.py:
* fuse=True  — `lax.scan` over the static 68-event Miller schedule and the
  64-bit cyclotomic exponent ladder: compact traces for TPU jit.
* fuse=False — eager Python loops (each primitive its own cached jit):
  keeps XLA:CPU compile times tolerable in tests.

The schedule constants (BLS parameter x bits) come from the oracle — single
source of truth, differentially tested.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..oracle import field as OF
from ..oracle import pairing as OP
from ..ops import dispatch as D
from ..ops import fieldops as FO
from ..ops import tower as T
from ..ops.limbs import FP

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

# bits of |x| MSB-first for the cyclotomic exponentiation ladder
X_ABS_BITS = [int(b) for b in bin(OP.X_ABS)[2:]]


def _auto_fuse(fuse):
    return jax.default_backend() == "tpu" if fuse is None else fuse


# --- G2 line-coefficient precomputation (G2Prepared) --------------------------

def _doubling_step(r):
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


def _addition_step(r, q):
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


def prepare_g2(q, fuse=None):
    """Affine G2 batch (qx, qy) [fp2 leaves (L, *batch)] -> stacked line
    coefficients, leaves (NUM_EVENTS, L, *batch). The `G2Prepared` analog
    (/root/reference/src/g2.rs:650-694). Identity inputs produce garbage
    (finite) coefficients — the Miller loop masks those pairs to one, the
    reference's substitution semantics (src/pairing.rs:58-60)."""
    fuse = _auto_fuse(fuse)
    qx, qy = q
    sh = qx[0].shape[1:]
    r = (qx, qy, (T.fp_const(1, sh), FO.zeros(sh, FP)))

    if not fuse:
        coeffs = []
        for is_dbl in MILLER_EVENTS:
            r, c = _doubling_step(r) if is_dbl else _addition_step(r, q)
            coeffs.append(c)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *coeffs)

    flags = jnp.asarray(np.array(MILLER_EVENTS, dtype=np.bool_))

    def body(r, is_dbl):
        rd, cd = _doubling_step(r)
        ra, ca = _addition_step(r, q)
        r = T.select(is_dbl, rd, ra)
        c = T.select(is_dbl, cd, ca)
        return r, c

    _, coeffs = lax.scan(body, r, flags)
    return coeffs


# --- Miller loop ---------------------------------------------------------------

def _ell_legs(coeff, px, py):
    """Scale a line triple into mul_by_014 operand form: (c4=c0*py, c1=c1*px,
    c0=c2). The fp2-by-fp scaling is 2 base muls per component."""
    c0, c1, c2 = coeff
    s0a, s0b, s1a, s1b = D.fp_mul_many(
        [(c0[0], py), (c0[1], py), (c1[0], px), (c1[1], px)]
    )
    return c2, (s1a, s1b), (s0a, s0b)


def miller_loop(p, coeffs, fuse=None):
    """Batched Miller loop: p = (px, py) affine G1 batch, coeffs from
    prepare_g2. Returns an fp12 batch (conjugated: x < 0). Twin of
    blstrs `miller_loop_lines` (/root/reference/src/pairing.rs:62)."""
    fuse = _auto_fuse(fuse)
    px, py = p
    sh = px.shape[1:]
    f = T.fp12_one(sh)

    if not fuse:
        for i, is_dbl in enumerate(MILLER_EVENTS):
            c = jax.tree.map(lambda x: x[i], coeffs)
            if is_dbl:
                f = T.fp12_sqr(f)
            a0, a1, a4 = _ell_legs(c, px, py)
            f = T.fp12_mul_by_014_many([(f, a0, a1, a4)])[0]
        return T.fp12_conj(f)

    flags = jnp.asarray(np.array(MILLER_EVENTS, dtype=np.bool_))

    def body(f, xs):
        is_dbl, c = xs
        f = T.select(is_dbl, T.fp12_sqr(f), f)
        a0, a1, a4 = _ell_legs(c, px, py)
        f = T.fp12_mul_by_014_many([(f, a0, a1, a4)])[0]
        return f, None

    f, _ = lax.scan(body, f, (flags, coeffs))
    return T.fp12_conj(f)


# --- final exponentiation -------------------------------------------------------

def cyclotomic_exp_x_conj(f, fuse=None):
    """f^(-x) = conj(f^|x|) in the cyclotomic subgroup (x < 0 for BLS12-381);
    square-and-multiply over the static 64-bit |x| ladder."""
    fuse = _auto_fuse(fuse)

    if not fuse:
        r = f
        for bit in X_ABS_BITS[1:]:
            r = T.fp12_cyclotomic_sqr(r)
            if bit:
                r = T.fp12_mul(r, f)
        return T.fp12_conj(r)

    bits = jnp.asarray(np.array(X_ABS_BITS[1:], dtype=np.bool_))

    def body(r, bit):
        r = T.fp12_cyclotomic_sqr(r)
        r = T.select(bit, T.fp12_mul(r, f), r)
        return r, None

    r, _ = lax.scan(body, f, bits)
    return T.fp12_conj(r)


def final_exp(f, fuse=None):
    """Easy part then the standard BLS12-381 cyclotomic addition chain —
    batched twin of oracle final_exp; role of blstrs final_exponentiation
    (/root/reference/src/pairing.rs:76-80)."""
    fuse = _auto_fuse(fuse)
    ex = lambda g: cyclotomic_exp_x_conj(g, fuse)
    # easy part: f^((p^6-1)(p^2+1))
    t0 = T.fp12_conj(f)
    t1 = T.fp12_inv(f)
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

def _fold_mul(f, n):
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


def multi_miller_loop(p, q, p_inf=None, q_inf=None, fuse=None):
    """Product of Miller loops over a batch of (G1 affine, G2 affine) pairs,
    with the reference's identity-pair substitution (pairs containing an
    identity contribute one, /root/reference/src/pairing.rs:49-74).

    p = (px, py) fp leaves (L, N); q = (qx, qy) fp2; *_inf optional boolean
    masks (N,). Returns an fp12 batch of shape (1,)."""
    px, py = p
    n = px.shape[-1]
    coeffs = prepare_g2(q, fuse)
    f = miller_loop(p, coeffs, fuse)
    skip = None
    if p_inf is not None:
        skip = p_inf
    if q_inf is not None:
        skip = q_inf if skip is None else (skip | q_inf)
    if skip is not None:
        f = T.select(skip, T.fp12_one((n,)), f)
    return _fold_mul(f, n)


def pairing(p, q, p_inf=None, q_inf=None, fuse=None):
    """Batched full pairing e(P_i, Q_i) elementwise (no product reduction):
    returns an fp12 batch shaped like the inputs. Identity inputs yield one."""
    coeffs = prepare_g2(q, fuse)
    f = miller_loop(p, coeffs, fuse)
    skip = None
    if p_inf is not None:
        skip = p_inf
    if q_inf is not None:
        skip = q_inf if skip is None else (skip | q_inf)
    if skip is not None:
        f = T.select(skip, T.fp12_one(p[0].shape[1:]), f)
    return final_exp(f, fuse)
