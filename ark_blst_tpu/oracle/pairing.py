"""Pure-Python BLS12-381 pairing oracle.

Two independent implementations:

* ``pairing_slow`` — first-principles optimal-ate pairing: Miller loop computed
  with *generic* line functions over E(Fp12) on the untwisted G2 point, and a
  final exponentiation by the literal integer (p^12-1)/r. Slow, nearly
  impossible to get wrong; the root of the trust chain.

* ``pairing`` (fast) — the production algorithm the TPU build mirrors
  bit-for-bit: homogeneous/Jacobian line-coefficient Miller loop (Beuchat et
  al., eprint 2010/354, Algorithms 26/27), sparse Fp12 multiplication, and the
  cyclotomic final-exponentiation addition chain. Verified against
  ``pairing_slow`` in tests.

Capability parity: `multi_miller_loop` keeps the reference's identity-pair
semantics (substitute one, /root/reference/src/pairing.rs:58-60); the fast
Miller loop plays the role blstrs `miller_loop_lines` plays at
/root/reference/src/pairing.rs:62, and `G2Prepared` line precomputation the
role of /root/reference/src/g2.rs:650-694.
"""

from __future__ import annotations

from . import field as F
from .field import (
    fp2_add, fp2_conj, fp2_inv, fp2_mul, fp2_mul_by_nonresidue, fp2_neg,
    fp2_scalar, fp2_sqr, fp2_sub, fp6_add, fp6_mul, fp6_mul_by_nonresidue,
    fp6_neg, fp6_sub, fp12_conj, fp12_cyclotomic_sqr, fp12_frobenius,
    fp12_inv, fp12_mul, fp12_pow, fp12_sqr, fp12_sub, FP12_ONE, FP2_ZERO,
    FP6_ZERO,
)

# Bits of |x| below the leading one, MSB-first: the Miller loop schedule.
X_ABS = -F.BLS_X
X_BITS = [int(b) for b in bin(X_ABS)[3:]]
assert len(X_BITS) == 63


# --- Slow path: generic lines in E(Fp12) -------------------------------------

_XI_INV = fp2_inv(F.XI)


def fp12_from_fp(a):
    return (((a, 0), FP2_ZERO, FP2_ZERO), FP6_ZERO)


def untwist(q):
    """psi: E'(Fp2) -> E(Fp12), (x', y') -> (x' * v^2/xi, y' * v*w/xi)."""
    x, y = q
    xt = ((FP2_ZERO, FP2_ZERO, fp2_mul(x, _XI_INV)), FP6_ZERO)
    yt = (FP6_ZERO, (FP2_ZERO, fp2_mul(y, _XI_INV), FP2_ZERO))
    return (xt, yt)


def _fp12_line(t, u, p):
    """Line through t and u (tangent if equal) evaluated at p; all in E(Fp12).
    Vertical lines are skipped (denominator elimination for even k)."""
    xt, yt = t
    xu, yu = u
    xp, yp = p
    if xt == xu and yt == yu:
        lam = fp12_mul(
            fp12_mul(fp12_sqr(xt), fp12_from_fp(3)),
            fp12_inv(fp12_mul(yt, fp12_from_fp(2))),
        )
    elif xt == xu:
        return FP12_ONE  # vertical line: killed by the final exponentiation
    else:
        lam = fp12_mul(fp12_sub(yu, yt), fp12_inv(fp12_sub(xu, xt)))
    return fp12_sub(fp12_mul(lam, fp12_sub(xp, xt)), fp12_sub(yp, yt))


def _fp12_point_add(t, u):
    if t == u:
        lam = fp12_mul(
            fp12_mul(fp12_sqr(t[0]), fp12_from_fp(3)),
            fp12_inv(fp12_mul(t[1], fp12_from_fp(2))),
        )
    else:
        lam = fp12_mul(fp12_sub(u[1], t[1]), fp12_inv(fp12_sub(u[0], t[0])))
    x3 = fp12_sub(fp12_sub(fp12_sqr(lam), t[0]), u[0])
    y3 = fp12_sub(fp12_mul(lam, fp12_sub(t[0], x3)), t[1])
    return (x3, y3)


def miller_slow(p, q):
    """f_{|x|,Q~}(P~) with generic arithmetic; conjugated because x < 0."""
    pt = (fp12_from_fp(p[0]), fp12_from_fp(p[1]))
    qt = untwist(q)
    f = FP12_ONE
    t = qt
    for bit in X_BITS:
        f = fp12_mul(fp12_sqr(f), _fp12_line(t, t, pt))
        t = _fp12_point_add(t, t)
        if bit:
            f = fp12_mul(f, _fp12_line(t, qt, pt))
            t = _fp12_point_add(t, qt)
    return fp12_conj(f)


FINAL_EXP_POWER = (F.P**12 - 1) // F.R


def final_exp_slow(f):
    """Literal f^((p^12-1)/r). NOTE: the production chain (`final_exp`)
    computes f^(3*(p^12-1)/r) — the standard BLS12-381 addition chain shared
    by blst/zkcrypto absorbs a factor of 3 in the hard part (harmless: 3 is
    coprime to r, so it is the same perfect pairing up to a fixed power, and
    it is the value blst-compatible implementations output). Tests relate the
    two via final_exp(f) == final_exp_slow(f)^3."""
    return fp12_pow(f, FINAL_EXP_POWER)


def pairing_slow(p, q):
    if p is None or q is None:
        return FP12_ONE
    return final_exp_slow(miller_slow(p, q))


# --- Fast path: projective line coefficients (the device twin) ---------------

def _doubling_step(r):
    """One Miller doubling step on Jacobian (X, Y, Z) over Fp2.

    Returns (new_r, (c0, c1, c2)) — line coefficients later combined with the
    G1 point as c0*y_P (w^0*v^0), c1*x_P (w^1*v^1... see `ell`).
    Beuchat et al. 2010/354 Algorithm 26 (adapted for BLS12-381 M-twist).
    """
    x, y, z = r
    t0 = fp2_sqr(x)
    t1 = fp2_sqr(y)
    t2 = fp2_sqr(t1)
    t3 = fp2_sub(fp2_sub(fp2_sqr(fp2_add(t1, x)), t0), t2)
    t3 = fp2_scalar(t3, 2)
    t4 = fp2_scalar(t0, 3)
    t6 = fp2_add(x, t4)
    t5 = fp2_sqr(t4)
    zsq = fp2_sqr(z)
    nx = fp2_sub(t5, fp2_scalar(t3, 2))
    nz = fp2_sub(fp2_sub(fp2_sqr(fp2_add(z, y)), t1), zsq)
    ny = fp2_sub(fp2_mul(fp2_sub(t3, nx), t4), fp2_scalar(t2, 8))
    c1 = fp2_neg(fp2_scalar(fp2_mul(t4, zsq), 2))
    c2 = fp2_sub(fp2_sub(fp2_sub(fp2_sqr(t6), t0), t5), fp2_scalar(t1, 4))
    c0 = fp2_scalar(fp2_mul(nz, zsq), 2)
    return (nx, ny, nz), (c0, c1, c2)


def _addition_step(r, q):
    """Mixed addition step (Jacobian r += affine q) with line coefficients.
    Beuchat et al. 2010/354 Algorithm 27."""
    x, y, z = r
    qx, qy = q
    zsq = fp2_sqr(z)
    ysq = fp2_sqr(qy)
    t0 = fp2_mul(zsq, qx)
    t1 = fp2_mul(fp2_sub(fp2_sub(fp2_sqr(fp2_add(qy, z)), ysq), zsq), zsq)
    t2 = fp2_sub(t0, x)
    t3 = fp2_sqr(t2)
    t4 = fp2_scalar(t3, 4)
    t5 = fp2_mul(t4, t2)
    t6 = fp2_sub(t1, fp2_scalar(y, 2))
    t9 = fp2_mul(t6, qx)
    t7 = fp2_mul(t4, x)
    nx = fp2_sub(fp2_sub(fp2_sqr(t6), t5), fp2_scalar(t7, 2))
    nz = fp2_sub(fp2_sub(fp2_sqr(fp2_add(z, t2)), zsq), t3)
    t10 = fp2_add(qy, nz)
    t8 = fp2_mul(fp2_sub(t7, nx), t6)
    t0 = fp2_scalar(fp2_mul(y, t5), 2)
    ny = fp2_sub(t8, t0)
    t10 = fp2_sub(fp2_sub(fp2_sqr(t10), ysq), fp2_sqr(nz))
    t9 = fp2_sub(fp2_scalar(t9, 2), t10)
    c0 = fp2_scalar(nz, 2)
    c1 = fp2_scalar(fp2_neg(t6), 2)
    c2 = t9
    return (nx, ny, nz), (c0, c1, c2)


def prepare_g2(q):
    """G2 line-coefficient precomputation — the analog of `G2Prepared`
    (/root/reference/src/g2.rs:650-694). Returns the coefficient list in
    Miller-loop consumption order: one triple per doubling, then one per
    conditional addition (68 triples total for BLS12-381)."""
    if q is None:
        return None  # identity: Miller contribution substituted by one
    coeffs = []
    r = (q[0], q[1], F.FP2_ONE)
    for bit in X_BITS:
        r, c = _doubling_step(r)
        coeffs.append(c)
        if bit:
            r, c = _addition_step(r, q)
            coeffs.append(c)
    return coeffs


def fp6_mul_by_01(a, b0, b1):
    """a * (b0 + b1 v) sparse Fp6 multiplication."""
    a0, a1, a2 = a
    return (
        fp2_add(fp2_mul(a0, b0), fp2_mul_by_nonresidue(fp2_mul(a2, b1))),
        fp2_add(fp2_mul(a0, b1), fp2_mul(a1, b0)),
        fp2_add(fp2_mul(a1, b1), fp2_mul(a2, b0)),
    )


def fp6_mul_by_1(a, b1):
    """a * (b1 v) sparse Fp6 multiplication."""
    a0, a1, a2 = a
    return (fp2_mul_by_nonresidue(fp2_mul(a2, b1)), fp2_mul(a0, b1), fp2_mul(a1, b1))


def fp12_mul_by_014(f, c0, c1, c4):
    """f * ((c0 + c1 v) + (c4 v) w) — the sparse shape of a line value."""
    f0, f1 = f
    aa = fp6_mul_by_01(f0, c0, c1)
    bb = fp6_mul_by_1(f1, c4)
    o = fp2_add(c1, c4)
    nf1 = fp6_sub(fp6_sub(fp6_mul_by_01(fp6_add(f0, f1), c0, o), aa), bb)
    nf0 = fp6_add(fp6_mul_by_nonresidue(bb), aa)
    return (nf0, nf1)


def ell(f, coeffs, p):
    """Fold one line into the accumulator: scale c0 by y_P, c1 by x_P
    (moving the twisted line into Fp12), then sparse-multiply."""
    c0, c1, c2 = coeffs
    px, py = p
    c0 = (c0[0] * py % F.P, c0[1] * py % F.P)
    c1 = (c1[0] * px % F.P, c1[1] * px % F.P)
    return fp12_mul_by_014(f, c2, c1, c0)


def miller_loop(p, q_or_coeffs):
    """Fast single Miller loop; `q_or_coeffs` is an affine G2 point or a
    prepared coefficient list."""
    coeffs = q_or_coeffs if isinstance(q_or_coeffs, list) else prepare_g2(q_or_coeffs)
    if p is None or coeffs is None:
        return FP12_ONE
    f = FP12_ONE
    idx = 0
    for bit in X_BITS:
        f = fp12_sqr(f)
        f = ell(f, coeffs[idx], p)
        idx += 1
        if bit:
            f = ell(f, coeffs[idx], p)
            idx += 1
    return fp12_conj(f)


def multi_miller_loop(pairs):
    """Product of Miller loops with the reference's identity-skip semantics
    (/root/reference/src/pairing.rs:49-74)."""
    f = FP12_ONE
    for p, q in pairs:
        if p is None or q is None:
            continue  # contributes Fp12::one
        f = fp12_mul(f, miller_loop(p, q))
    return f


def final_exp(f):
    """Fast final exponentiation: easy part then the standard BLS12-381
    cyclotomic addition chain (verified against `final_exp_slow`)."""
    # Easy part: f^((p^6-1)(p^2+1))
    t0 = fp12_conj(f)                      # f^(p^6)
    t1 = fp12_inv(f)
    t2 = fp12_mul(t0, t1)                  # f^(p^6-1)
    t1 = t2
    t2 = fp12_frobenius(t2, 2)
    t2 = fp12_mul(t2, t1)                  # m
    # Hard part
    ex = F.fp12_cyclotomic_exp_bls_x
    t1 = fp12_conj(fp12_cyclotomic_sqr(t2))
    t3 = ex(t2)
    t4 = fp12_cyclotomic_sqr(t3)
    t5 = fp12_mul(t1, t3)
    t1 = ex(t5)
    t0 = ex(t1)
    t6 = ex(t0)
    t6 = fp12_mul(t6, t4)
    t4 = ex(t6)
    t5 = fp12_conj(t5)
    t4 = fp12_mul(fp12_mul(t4, t5), t2)
    t5 = fp12_conj(t2)
    t1 = fp12_mul(t1, t2)
    t1 = fp12_frobenius(t1, 3)
    t6 = fp12_mul(t6, t5)
    t6 = fp12_frobenius(t6, 1)
    t3 = fp12_mul(t3, t0)
    t3 = fp12_frobenius(t3, 2)
    t3 = fp12_mul(t3, t1)
    t3 = fp12_mul(t3, t6)
    return fp12_mul(t3, t4)


def pairing(p, q):
    """e(P, Q): fast Miller loop + fast final exponentiation.
    Identity inputs yield one, matching /root/reference/src/pairing.rs:58-60."""
    if p is None or q is None:
        return FP12_ONE
    return final_exp(miller_loop(p, q))
