"""Pure-Python BLS12-381 curve-group oracle (G1 over Fp, G2 over Fp2).

Affine points are `None` (infinity) or `(x, y)` tuples of field elements.
Implements the capability surface of /root/reference/src/g1.rs and
src/g2.rs (add/double/scalar-mul/cofactor ops/validation) as a slow trusted
reference; the TPU build is differentially tested against it.
"""

from __future__ import annotations

from . import field as F


class _Ops:
    """Field-op bundle so G1 (Fp) and G2 (Fp2) share one curve implementation."""

    def __init__(self, add, sub, mul, sqr, neg, inv, is_zero, zero, one, b):
        self.add, self.sub, self.mul, self.sqr = add, sub, mul, sqr
        self.neg, self.inv, self.is_zero = neg, inv, is_zero
        self.zero, self.one, self.b = zero, one, b

    def scalar_small(self, a, k):
        out = self.zero
        for _ in range(k):
            out = self.add(out, a)
        return out


FP_OPS = _Ops(
    F.fp_add, F.fp_sub, F.fp_mul, lambda a: F.fp_mul(a, a), F.fp_neg,
    F.fp_inv, lambda a: a == 0, 0, 1, F.B_G1,
)

FP2_OPS = _Ops(
    F.fp2_add, F.fp2_sub, F.fp2_mul, F.fp2_sqr, F.fp2_neg,
    F.fp2_inv, F.fp2_is_zero, F.FP2_ZERO, F.FP2_ONE, F.B_G2,
)


def is_on_curve(ops, pt):
    """y^2 == x^3 + b (affine); infinity is on the curve.
    Mirrors the on-curve half of `check()` at /root/reference/src/g1.rs:386-396."""
    if pt is None:
        return True
    x, y = pt
    return ops.sqr(y) == ops.add(ops.mul(ops.sqr(x), x), ops.b)


def neg(ops, pt):
    if pt is None:
        return None
    return (pt[0], ops.neg(pt[1]))


def add(ops, p1, p2):
    """Complete affine addition (chord/tangent with all edge cases)."""
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if y1 == y2:
            if ops.is_zero(y1):
                return None
            lam = ops.mul(
                ops.scalar_small(ops.sqr(x1), 3),
                ops.inv(ops.scalar_small(y1, 2)),
            )
        else:
            return None  # p2 == -p1
    else:
        lam = ops.mul(ops.sub(y2, y1), ops.inv(ops.sub(x2, x1)))
    x3 = ops.sub(ops.sub(ops.sqr(lam), x1), x2)
    y3 = ops.sub(ops.mul(lam, ops.sub(x1, x3)), y1)
    return (x3, y3)


def double(ops, pt):
    return add(ops, pt, pt)


def scalar_mul(ops, pt, k):
    """Double-and-add (mirrors `mul_bigint`, /root/reference/src/g1.rs:513-527)."""
    if k < 0:
        return scalar_mul(ops, neg(ops, pt), -k)
    out = None
    acc = pt
    while k > 0:
        if k & 1:
            out = add(ops, out, acc)
        acc = double(ops, acc)
        k >>= 1
    return out


def is_in_subgroup(ops, pt):
    """Torsion-free check: r * pt == infinity
    (the torsion half of `check()`, /root/reference/src/g1.rs:386-396)."""
    return scalar_mul(ops, pt, F.R) is None


def clear_cofactor(ops, pt, cofactor):
    return scalar_mul(ops, pt, cofactor)


def msm(ops, points, scalars):
    """Naive MSM fold — the differential oracle the reference uses in its own
    10-point MSM test (/root/reference/src/tests.rs:50-67). Handles identity
    points correctly (unlike blst, /root/reference/src/g1.rs:682-689)."""
    out = None
    for pt, s in zip(points, scalars):
        out = add(ops, out, scalar_mul(ops, pt, s % F.R))
    return out


def msm_pippenger(ops, points, scalars, c: int | None = None):
    """Windowed bucket-method MSM on host ints — the production host
    fallback, playing the role of blst's parallel Pippenger on the CPU path
    (/root/reference/src/g1.rs:602-619). O(n + 2^c) group adds per window
    instead of the naive fold's O(n * 255) doublings. Differentially tested
    against `msm` (the oracle above)."""
    n = len(points)
    if n == 0:
        return None
    if c is None:
        # c ~ log2(n) - log2(log2(n)): minimizes (255/c)*(n + 2^c), same
        # spirit as the reference GPU layer's log2(n/work_units)+2 heuristic
        # (/root/reference/src/gpu.rs:218-223)
        logn = max(1, n.bit_length() - 1)
        c = max(2, min(16, logn - logn.bit_length() + 2))
    num_windows = (255 + c - 1) // c
    mask = (1 << c) - 1
    ss = [s % F.R for s in scalars]
    total = None
    for w in range(num_windows - 1, -1, -1):
        if total is not None:
            for _ in range(c):
                total = double(ops, total)
        buckets = [None] * (1 << c)
        for pt, s in zip(points, ss):
            d = (s >> (c * w)) & mask
            if d:
                buckets[d] = add(ops, buckets[d], pt)
        running = None
        window_sum = None
        for b in range(len(buckets) - 1, 0, -1):
            if buckets[b] is not None:
                running = add(ops, running, buckets[b])
            if running is not None:
                window_sum = add(ops, window_sum, running)
        total = add(ops, total, window_sum)
    return total


# Convenience G1/G2 wrappers ---------------------------------------------------

def g1_add(p1, p2):
    return add(FP_OPS, p1, p2)


def g1_mul(pt, k):
    return scalar_mul(FP_OPS, pt, k)


def g2_add(p1, p2):
    return add(FP2_OPS, p1, p2)


def g2_mul(pt, k):
    return scalar_mul(FP2_OPS, pt, k)


def g1_generator():
    return F.G1_GEN


def g2_generator():
    return F.G2_GEN
