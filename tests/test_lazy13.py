"""Differential tests for the signed lazy radix-13 engine (ops/lazy13.py)
against exact Python-int arithmetic, including digit-bound audits.

Role model: the reference's differential testing of blst-backed ops against
ark-bls12-381 (/root/reference/src/tests.rs:73-96) — here the oracle is exact
host integer math.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from ark_blst_tpu.ops import lazy13 as LZ
from ark_blst_tpu.ops import fieldops as FO
from ark_blst_tpu.ops.limbs import FP, ints_to_limbs
from ark_blst_tpu.oracle.field import P

rng = np.random.default_rng(1234)


def rand_vals(n):
    vals = [int.from_bytes(rng.bytes(48), "little") % P for _ in range(n - 4)]
    return [0, 1, P - 1, P - 2] + vals


def to_digits_batch(vals, n_digits=LZ.ELEM):
    """ints -> ELEM-digit element batch (lists of int32 arrays, shape (n,))."""
    mat = np.stack([LZ.int_to_digits(v) for v in vals])  # (n, 30)
    out = [jnp.asarray(mat[:, k]) for k in range(LZ.L13)]
    return out + [jnp.zeros_like(out[0])] * (n_digits - LZ.L13)


def from_digits_batch(d):
    mat = np.stack([np.asarray(x).astype(np.int64) for x in d], axis=-1)  # (n, L)
    return [LZ.digits_to_int(row) for row in mat]


def assert_bound(d, bound, msg=""):
    m = max(int(np.max(np.abs(np.asarray(x)))) for x in d)
    assert m <= bound, f"{msg}: digit magnitude {m} > {bound}"


def test_digit_roundtrip():
    vals = rand_vals(16)
    got = from_digits_batch(to_digits_batch(vals))
    assert got == vals


def test_fold_preserves_value():
    vals = rand_vals(32)
    d = to_digits_batch(vals)
    # inject big relaxed digits: multiply digit-wise by 7 and add noise
    noisy = [x * 7 - jnp.int32(123456) for x in d]
    want = [7 * v - sum(123456 << (13 * k) for k in range(len(d))) for v in vals]
    f1 = LZ.fold(noisy)
    assert from_digits_batch(f1) == want
    f2 = LZ.fold2(noisy)
    assert from_digits_batch(f2) == want
    assert_bound(f2, LZ.F_BOUND, "fold2")


def test_mul_wide_exact():
    a = rand_vals(24)
    b = rand_vals(24)[::-1]
    w = LZ.mul_wide(to_digits_batch(a), to_digits_batch(b))
    got = from_digits_batch(w)
    assert got == [x * y for x, y in zip(a, b)]


def test_mont_mul_vs_oracle():
    a = rand_vals(64)
    b = rand_vals(64)[::-1]
    r_inv = pow(LZ.R13, -1, P)
    res = LZ.mont_mul(to_digits_batch(a), to_digits_batch(b))
    assert_bound(res, LZ.F_BOUND + 2, "mont out")
    got = from_digits_batch(res)
    for g, x, y in zip(got, a, b):
        assert g % P == x * y * r_inv % P
        assert abs(g) < 3 * P


def test_mont_mul_redundant_inputs():
    """Inputs anywhere in (-3p, 3p) with mul-ready digits stay correct."""
    a = rand_vals(32)
    b = rand_vals(32)[::-1]
    # build redundant signed elements the way the pipeline does: element
    # subtraction followed by fold_sum (stays within ELEM digits, top carry
    # captured in digit 30)
    da = LZ.fold_sum(LZ.sub(to_digits_batch(a), to_digits_batch([2 * P] * 32)))
    db = LZ.fold_sum(LZ.add(to_digits_batch(b), to_digits_batch([P] * 32)))
    assert len(da) == LZ.ELEM
    assert_bound(da, LZ.F_BOUND)
    r_inv = pow(LZ.R13, -1, P)
    res = LZ.mont_mul(da, db)
    got = from_digits_batch(res)
    for g, x, y in zip(got, a, b):
        assert g % P == ((x - 2 * P) * (y + P)) * r_inv % P
        assert abs(g) < 3 * P


def test_prered_combination():
    """The lazy-reduction trick: reduce(w1 - w2 + w3) == (v1-v2+v3)/R."""
    vals = [rand_vals(16) for _ in range(6)]
    d = [to_digits_batch(v) for v in vals]
    w1 = LZ.prered(LZ.mul_wide(d[0], d[1]))
    w2 = LZ.prered(LZ.mul_wide(d[2], d[3]))
    w3 = LZ.prered(LZ.mul_wide(d[4], d[5]))
    comb = LZ.add(LZ.sub(w1, w2), w3)
    res = LZ.reduce_wide(comb)
    r_inv = pow(LZ.R13, -1, P)
    got = from_digits_batch(res)
    for i, g in enumerate(got):
        want = (
            (vals[0][i] * vals[1][i] - vals[2][i] * vals[3][i]
             + vals[4][i] * vals[5][i]) * r_inv
        ) % P
        assert g % P == want
        assert abs(g) < 4 * P


def test_add_sub_scale():
    a = rand_vals(16)
    b = rand_vals(16)[::-1]
    da, db = to_digits_batch(a), to_digits_batch(b)
    assert from_digits_batch(LZ.add(da, db)) == [x + y for x, y in zip(a, b)]
    assert from_digits_batch(LZ.sub(da, db)) == [x - y for x, y in zip(a, b)]
    assert from_digits_batch(LZ.neg(da)) == [-x for x in a]
    assert from_digits_batch(LZ.scale(da, 12)) == [12 * x for x in a]


def test_canonicalize():
    vals = rand_vals(32)
    d = to_digits_batch(vals)
    # push into redundant signed form: x - 2p then mont by one... simpler:
    shifted = LZ.fold2(LZ.sub(d, to_digits_batch([5 * P] * 32)))
    out = LZ.canonicalize(shifted)
    got = from_digits_batch(out)
    assert got == [v % P for v in vals]
    assert_bound(out, LZ.DMASK, "canonical digits")
    for x in out:
        assert int(np.min(np.asarray(x))) >= 0


def test_limbs16_roundtrip():
    vals = rand_vals(16)
    a16 = [jnp.asarray(ints_to_limbs(vals, FP.num_limbs)[:, k]) for k in range(24)]
    d = LZ.from_limbs16(a16)
    assert from_digits_batch(d) == vals
    back = LZ.to_limbs16_strict(d)
    mat = np.stack([np.asarray(x) for x in back], axis=-1)
    want = ints_to_limbs(vals, FP.num_limbs)
    assert (mat == want).all()


def test_fp2_mont_mul():
    a0, a1 = rand_vals(16), rand_vals(16)[::-1]
    b0, b1 = rand_vals(16)[2:] + rand_vals(4)[:2], rand_vals(16)
    A = (to_digits_batch(a0), to_digits_batch(a1))
    B = (to_digits_batch(b0), to_digits_batch(b1))
    re, im = LZ.fp2_mont_mul(A, B)
    r_inv = pow(LZ.R13, -1, P)
    gre, gim = from_digits_batch(re), from_digits_batch(im)
    for i in range(16):
        wre = (a0[i] * b0[i] - a1[i] * b1[i]) * r_inv % P
        wim = (a0[i] * b1[i] + a1[i] * b0[i]) * r_inv % P
        assert gre[i] % P == wre
        assert gim[i] % P == wim


def test_worst_case_column_bound():
    """All-max digits through a multiply: audit that int32 columns cannot
    overflow (exactness of the wide product at the ledger's edge)."""
    worst = [(1 << (13 * LZ.L13)) - 1]  # all digits 8191
    d = to_digits_batch(worst)
    w = LZ.mul_wide(d, d)
    got = from_digits_batch(w)
    assert got == [worst[0] * worst[0]]
    # mont-reduce at the |input| < R13/2 contract edge (the Montgomery map
    # contracts only there; ELEM=30 truncation needs |result| < 0.49*2^390)
    edge = [(LZ.R13 >> 1) - 1]
    de = to_digits_batch(edge)
    res = LZ.reduce_wide(LZ.prered(LZ.mul_wide(de, de)))
    r_inv = pow(LZ.R13, -1, P)
    assert from_digits_batch(res)[0] % P == edge[0] ** 2 * r_inv % P


def test_store30_roundtrip():
    """Bucket-storage path: signed sums up to 20p survive store30/load31."""
    vals = rand_vals(32)
    d = to_digits_batch(vals)
    # worst-ish case: x*7 - 10p (signed, |value| < 20p), relaxed digits
    x = LZ.sub(LZ.scale(d, 7), to_digits_batch([10 * P] * 32))
    s30 = LZ.store30(x)
    assert len(s30) == LZ.L13
    assert_bound(s30, LZ.F_BOUND, "store30")
    back = LZ.load31(s30)
    assert from_digits_batch(back) == [7 * v - 10 * P for v in vals]


def _balanced_digits(vals):
    """ints -> balanced mul-ready digit batch (|d| <= 4096)."""
    from ark_blst_tpu.curves.msm_pallas2 import int_to_digits_balanced

    mat = np.stack([int_to_digits_balanced(v) for v in vals])
    return [jnp.asarray(mat[:, k]) for k in range(LZ.L13)]


def test_mul_wide_f_exact_extremes():
    """Hybrid Karatsuba vs exact ints at ADVERSARIAL digit patterns: all +F,
    all -F, alternating +-F, random-signed F — the int32 column-bound edge."""
    F = LZ.F_BOUND
    pats = [
        [F] * 30,
        [-F] * 30,
        [F if k % 2 else -F for k in range(30)],
        [0] * 29 + [F],
        [F] + [0] * 29,
    ]
    for _ in range(6):
        pats.append([int(v) for v in rng.integers(-F, F + 1, 30)])
    n = len(pats)
    mat = np.array(pats, np.int32)
    a = [jnp.asarray(mat[:, k]) for k in range(30)]
    # pair every pattern with the all(+F) pattern and with itself
    worst = [jnp.full((n,), F, jnp.int32) for _ in range(30)]
    for b in (a, worst):
        got = from_digits_batch(LZ.mul_wide_f(a, b))
        av = from_digits_batch(a)
        bv = from_digits_batch(b)
        assert got == [x * y for x, y in zip(av, bv)], "kara mismatch"
        school = from_digits_batch(LZ.mul_wide(a, b))
        assert got == school


def test_mul_const_wide_f_exact():
    """Const Karatsuba (m * p in reduce_wide) vs exact ints at the F bound."""
    F = LZ.F_BOUND
    pats = [[F] * 30, [-F] * 30, [F if k % 2 else -F for k in range(30)]]
    for _ in range(5):
        pats.append([int(v) for v in rng.integers(-F, F + 1, 30)])
    mat = np.array(pats, np.int32)
    a = [jnp.asarray(mat[:, k]) for k in range(30)]
    av = from_digits_batch(a)
    for cd in (LZ.P_DIGITS, LZ.ONE13, [8191] * 30):
        cv = sum(int(c) << (13 * i) for i, c in enumerate(cd))
        got = from_digits_batch(LZ.mul_const_wide_f(a, cd))
        assert got == [x * cv for x in av], "const kara mismatch"


def test_elem_is_30_and_reduce_bound():
    """ELEM=30 invariant: reduce_wide output is 30 digits, |value| < 3p,
    mul-ready — even for worst-case 12-prered combinations."""
    assert LZ.ELEM == 30
    vals = rand_vals(16)
    a, b = to_digits_batch(vals), to_digits_batch(vals[::-1])
    w = LZ.prered(LZ.mul_wide_f(LZ.fold2(a, LZ.ELEM), LZ.fold2(b, LZ.ELEM)))
    t = w
    for _ in range(11):  # 12-fold prered combination (max contract)
        t = LZ.add(t, w)
    out = LZ.reduce_wide(t)
    assert len(out) == LZ.ELEM
    assert_bound(out, LZ.F_BOUND, "reduce_wide")
    r_inv = pow(LZ.R13, -1, P)
    want = [12 * x * y * r_inv % P for x, y in zip(vals, vals[::-1])]
    got = from_digits_batch(out)
    assert [v % P for v in got] == want
    assert all(abs(v) < 3 * P for v in got), "reduce output out of (-3p,3p)"
