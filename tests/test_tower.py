"""Device tower (Fp2/Fp6/Fp12) vs oracle differential tests."""

import pytest

pytestmark = pytest.mark.slow  # Fp12 tower differential sweeps (minutes)
import random

import jax
import numpy as np

from ark_blst_tpu.oracle import field as OF
from ark_blst_tpu.ops import convert as CV
from ark_blst_tpu.ops import tower as T

RNG = random.Random(0x702)
N = 8


def rfp():
    return RNG.randrange(OF.P)


def rfp2():
    return (rfp(), rfp())


def rfp6():
    return (rfp2(), rfp2(), rfp2())


def rfp12():
    return (rfp6(), rfp6())


def test_fp2_ops():
    xs = [rfp2() for _ in range(N)]
    ys = [rfp2() for _ in range(N)]
    xs[0] = OF.FP2_ZERO
    ax, ay = CV.fp2_to_dev(xs), CV.fp2_to_dev(ys)

    def run(ax, ay):
        return dict(
            mul=T.fp2_mul(ax, ay),
            sqr=T.fp2_sqr(ax),
            add=T.fp2_add(ax, ay),
            sub=T.fp2_sub(ax, ay),
            nr=T.fp2_mul_by_nonresidue(ax),
            inv=T.fp2_inv(ay),
            conj=T.fp2_conj(ax),
        )

    r = run(ax, ay)
    assert CV.fp2_from_dev(r["mul"]) == [OF.fp2_mul(x, y) for x, y in zip(xs, ys)]
    assert CV.fp2_from_dev(r["sqr"]) == [OF.fp2_sqr(x) for x in xs]
    assert CV.fp2_from_dev(r["add"]) == [OF.fp2_add(x, y) for x, y in zip(xs, ys)]
    assert CV.fp2_from_dev(r["sub"]) == [OF.fp2_sub(x, y) for x, y in zip(xs, ys)]
    assert CV.fp2_from_dev(r["nr"]) == [OF.fp2_mul_by_nonresidue(x) for x in xs]
    assert CV.fp2_from_dev(r["inv"]) == [OF.fp2_inv(y) for y in ys]
    assert CV.fp2_from_dev(r["conj"]) == [OF.fp2_conj(x) for x in xs]


def test_fp6_ops():
    xs = [rfp6() for _ in range(N)]
    ys = [rfp6() for _ in range(N)]
    ax, ay = CV.fp6_to_dev(xs), CV.fp6_to_dev(ys)

    def run(ax, ay):
        return dict(
            mul=T.fp6_mul(ax, ay),
            nr=T.fp6_mul_by_nonresidue(ax),
            inv=T.fp6_inv(ay),
        )

    r = run(ax, ay)
    assert CV.fp6_from_dev(r["mul"]) == [OF.fp6_mul(x, y) for x, y in zip(xs, ys)]
    assert CV.fp6_from_dev(r["nr"]) == [OF.fp6_mul_by_nonresidue(x) for x in xs]
    assert CV.fp6_from_dev(r["inv"]) == [OF.fp6_inv(y) for y in ys]


def test_fp6_sparse():
    xs = [rfp6() for _ in range(N)]
    b0s = [rfp2() for _ in range(N)]
    b1s = [rfp2() for _ in range(N)]
    ax = CV.fp6_to_dev(xs)
    b0, b1 = CV.fp2_to_dev(b0s), CV.fp2_to_dev(b1s)

    def run(ax, b0, b1):
        return (
            T.fp6_mul_by_01_many([(ax, b0, b1)])[0],
            T.fp6_mul_by_1_many([(ax, b1)])[0],
        )

    r01, r1 = run(ax, b0, b1)
    exp01 = [
        OF.fp6_mul(x, (c0, c1, OF.FP2_ZERO))
        for x, c0, c1 in zip(xs, b0s, b1s)
    ]
    exp1 = [OF.fp6_mul(x, (OF.FP2_ZERO, c1, OF.FP2_ZERO)) for x, c1 in zip(xs, b1s)]
    assert CV.fp6_from_dev(r01) == exp01
    assert CV.fp6_from_dev(r1) == exp1


def test_fp12_ops():
    xs = [rfp12() for _ in range(N)]
    ys = [rfp12() for _ in range(N)]
    ax, ay = CV.fp12_to_dev(xs), CV.fp12_to_dev(ys)

    def run(ax, ay):
        return dict(
            mul=T.fp12_mul(ax, ay),
            sqr=T.fp12_sqr(ax),
            inv=T.fp12_inv(ay),
            conj=T.fp12_conj(ax),
            f1=T.fp12_frobenius(ax, 1),
            f2=T.fp12_frobenius(ax, 2),
            f3=T.fp12_frobenius(ax, 3),
        )

    r = run(ax, ay)
    assert CV.fp12_from_dev(r["mul"]) == [OF.fp12_mul(x, y) for x, y in zip(xs, ys)]
    assert CV.fp12_from_dev(r["sqr"]) == [OF.fp12_sqr(x) for x in xs]
    assert CV.fp12_from_dev(r["inv"]) == [OF.fp12_inv(y) for y in ys]
    assert CV.fp12_from_dev(r["conj"]) == [OF.fp12_conj(x) for x in xs]
    for p in (1, 2, 3):
        assert CV.fp12_from_dev(r[f"f{p}"]) == [OF.fp12_frobenius(x, p) for x in xs]


def test_fp12_sparse_and_cyclotomic():
    # elements of the cyclotomic subgroup: e = final_exp-like construction is
    # expensive; use x^(p^6-1)(p^2+1) via oracle
    from ark_blst_tpu.oracle import pairing as OP

    xs = [rfp12() for _ in range(2)]
    cyc = [
        OF.fp12_mul(
            f := OF.fp12_mul(OF.fp12_conj(x), OF.fp12_inv(x)),
            OF.fp12_frobenius(f, 2),
        )
        for x in xs
    ]
    c0s = [rfp2() for _ in range(2)]
    c1s = [rfp2() for _ in range(2)]
    c4s = [rfp2() for _ in range(2)]
    ax = CV.fp12_to_dev(xs)
    acyc = CV.fp12_to_dev(cyc)
    b0, b1, b4 = CV.fp2_to_dev(c0s), CV.fp2_to_dev(c1s), CV.fp2_to_dev(c4s)

    def run(ax, acyc, b0, b1, b4):
        return (
            T.fp12_mul_by_014_many([(ax, b0, b1, b4)])[0],
            T.fp12_cyclotomic_sqr(acyc),
        )

    sparse, cs = run(ax, acyc, b0, b1, b4)
    exp_sparse = [
        OP.fp12_mul_by_014(x, c0, c1, c4)
        for x, c0, c1, c4 in zip(xs, c0s, c1s, c4s)
    ]
    assert CV.fp12_from_dev(sparse) == exp_sparse
    assert CV.fp12_from_dev(cs) == [OF.fp12_cyclotomic_sqr(c) for c in cyc]
    # and cyclotomic == generic square there
    assert [OF.fp12_cyclotomic_sqr(c) for c in cyc] == [OF.fp12_sqr(c) for c in cyc]
