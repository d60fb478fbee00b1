"""Differential tests: lazy radix-13 tower (ops/tower_lazy.py) vs the
strict tower (ops/tower.py) and the host oracle.

Same role as the reference's cross-implementation testing
(/root/reference/src/tests.rs:73-96): two independent engines must agree
bit-for-bit after canonicalization.
"""

import random

import pytest

from ark_blst_tpu.ops import convert as CV
from ark_blst_tpu.ops import tower as TS
from ark_blst_tpu.ops import tower_lazy as TL
from ark_blst_tpu.oracle import field as OF

rng = random.Random(4242)


def _rand_fp12(n):
    return [
        tuple(
            tuple(
                (rng.randrange(OF.P), rng.randrange(OF.P)) for _ in range(3)
            )
            for _ in range(2)
        )
        for _ in range(n)
    ]


def _rand_fp2(n):
    return [(rng.randrange(OF.P), rng.randrange(OF.P)) for _ in range(n)]


def _to_lazy12(vals):
    return TL.fp12_ingest(CV.fp12_to_dev(vals))


def _from_lazy12(x):
    return CV.fp12_from_dev(TL.fp12_egress(x))


def test_ingest_egress_roundtrip():
    vals = _rand_fp2(8) + [(0, 0), (OF.P - 1, 1)]
    dev = CV.fp2_to_dev(vals)
    back = CV.fp2_from_dev(TL.fp2_egress(TL.fp2_ingest(dev)))
    assert back == vals


def test_fp2_ops_match_strict():
    a_vals, b_vals = _rand_fp2(6), _rand_fp2(6)
    a, b = CV.fp2_to_dev(a_vals), CV.fp2_to_dev(b_vals)
    la, lb = TL.fp2_ingest(a), TL.fp2_ingest(b)
    checks = [
        (TL.fp2_mul(la, lb), TS.fp2_mul(a, b)),
        (TL.fp2_sqr(la), TS.fp2_sqr(a)),
        (TL.fp2_add(la, lb), TS.fp2_add(a, b)),
        (TL.fp2_sub(la, lb), TS.fp2_sub(a, b)),
        (TL.fp2_mul_small(la, 8), TS.fp2_mul_small(a, 8)),
        (TL.fp2_mul_by_nonresidue(la), TS.fp2_mul_by_nonresidue(a)),
        (TL.fp2_conj(la), TS.fp2_conj(a)),
        (TL.fp2_neg(la), TS.fp2_neg(a)),
    ]
    for got_l, want_s in checks:
        assert CV.fp2_from_dev(TL.fp2_egress(got_l)) == CV.fp2_from_dev(want_s)


def test_fp12_mul_sqr_match_oracle():
    from ark_blst_tpu.oracle import pairing as OP

    a_vals, b_vals = _rand_fp12(4), _rand_fp12(4)
    la, lb = _to_lazy12(a_vals), _to_lazy12(b_vals)
    got = _from_lazy12(TL.fp12_mul(la, lb))
    want = [OP.fp12_mul(x, y) for x, y in zip(a_vals, b_vals)]
    assert got == want
    got_sq = _from_lazy12(TL.fp12_sqr(la))
    want_sq = [OP.fp12_mul(x, x) for x in a_vals]
    assert got_sq == want_sq


def test_fp12_frobenius_and_cyclotomic_match_strict():
    vals = _rand_fp12(3)
    dev = CV.fp12_to_dev(vals)
    lz = _to_lazy12(vals)
    for power in (1, 2, 3, 6):
        got = _from_lazy12(TL.fp12_frobenius(lz, power))
        want = CV.fp12_from_dev(TS.fp12_frobenius(dev, power))
        assert got == want, f"frobenius^{power}"
    got = _from_lazy12(TL.fp12_cyclotomic_sqr(lz))
    want = CV.fp12_from_dev(TS.fp12_cyclotomic_sqr(dev))
    assert got == want


def test_fp12_mul_by_014_matches_strict():
    vals = _rand_fp12(3)
    c0v, c1v, c4v = _rand_fp2(3), _rand_fp2(3), _rand_fp2(3)
    dev = CV.fp12_to_dev(vals)
    d0, d1, d4 = CV.fp2_to_dev(c0v), CV.fp2_to_dev(c1v), CV.fp2_to_dev(c4v)
    lz = _to_lazy12(vals)
    l0, l1, l4 = TL.fp2_ingest(d0), TL.fp2_ingest(d1), TL.fp2_ingest(d4)
    got = _from_lazy12(TL.fp12_mul_by_014_many([(lz, l0, l1, l4)])[0])
    want = CV.fp12_from_dev(TS.fp12_mul_by_014_many([(dev, d0, d1, d4)])[0])
    assert got == want


@pytest.mark.slow
def test_fp12_inv_matches_oracle():
    """Fermat-ladder inversion (eager python loop, fuse=False) — ~760
    eager mont muls, hence slow lane."""
    from ark_blst_tpu.oracle import pairing as OP

    vals = _rand_fp12(2)
    lz = _to_lazy12(vals)
    got = _from_lazy12(TL.fp12_inv(lz, fuse=False))
    want = [OP.fp12_inv(x) for x in vals]
    assert got == want


def test_lazy_miller_steps_match_strict():
    """One doubling + one addition step of the G2 line precomputation,
    lazy vs strict engines (the pairing pipeline's inner loop)."""
    from ark_blst_tpu.curves import pairing as DP
    from ark_blst_tpu.oracle import curve as OC

    qs = [OC.g2_mul(OF.G2_GEN, rng.randrange(1, OF.R)) for _ in range(3)]
    qx = CV.fp2_to_dev([q[0] for q in qs])
    qy = CV.fp2_to_dev([q[1] for q in qs])
    sh = qx[0].shape[1:]

    # strict
    rs = (qx, qy, TS.fp2_const((1, 0), sh))
    rs2, cs2 = DP._doubling_step(TS, rs)
    rs3, cs3 = DP._addition_step(TS, rs2, (qx, qy))
    # lazy
    lqx, lqy = TL.fp2_ingest(qx), TL.fp2_ingest(qy)
    rl = (lqx, lqy, TL.fp2_const((1, 0), sh))
    rl2, cl2 = DP._doubling_step(TL, rl)
    rl3, cl3 = DP._addition_step(TL, rl2, (lqx, lqy))

    for sv, lv, tag in ((rs2, rl2, "r_dbl"), (cs2, cl2, "c_dbl"),
                        (rs3, rl3, "r_add"), (cs3, cl3, "c_add")):
        for i, (s_c, l_c) in enumerate(zip(sv, lv)):
            assert CV.fp2_from_dev(s_c) == CV.fp2_from_dev(TL.fp2_egress(l_c)), (
                tag, i
            )


def test_barrett_contraction_contract():
    """_contract_many must (a) preserve the residue mod p EXACTLY, (b) pull
    the value magnitude under 0.6p, (c) return mul-ready digits — for inputs
    across the whole legal magnitude range (up to ~250p, the fold30
    truncation bound), both balanced and canonical digit forms, both signs."""
    import numpy as np
    import jax.numpy as jnp

    from ark_blst_tpu.ops import lazy13 as LZ

    cases = []
    for k in (0, 1, -1, 9, -17, 120, -199, 249, -249):
        r = rng.randrange(OF.P)
        cases.append(k * OF.P + r if k >= 0 else k * OF.P + r - OF.P)
    arrs = []
    for v in cases:
        # exact 30-digit string of v: canonical digits of |v|, negated for
        # v < 0 (negation keeps |d| <= 8191 — legal contraction input)
        d = LZ.int_to_digits(abs(v)).astype(np.int32)
        if v < 0:
            d = -d
        arrs.append(jnp.asarray(d).reshape(30, 1))
    outs = TL._contract_many(arrs)
    for v, o in zip(cases, outs):
        got = LZ.digits_to_int(np.asarray(o).reshape(30))
        assert (got - v) % OF.P == 0, v
        assert abs(got) < (6 * OF.P) // 10, (v, got)
        assert int(np.max(np.abs(np.asarray(o)))) <= LZ.F_BOUND, v


@pytest.mark.slow  # the width-1 Fermat scan costs ~90s of XLA:CPU compile
def test_fp_inv_batch_tree_matches_fermat():
    """The log-depth product-tree inversion must equal the per-lane Fermat
    ladder lane-for-lane, including at a non-power-of-two batch (padding
    lanes must not leak)."""
    import numpy as np

    vals = [rng.randrange(1, OF.P) for _ in range(6)]  # 6 -> padded to 8
    dev = CV.fp_to_dev(vals)
    lz = TL.fp_ingest(dev)
    got_tree = TL.fp_inv_batch(lz)
    got_fermat = TL.fp_inv(lz, fuse=False)
    a = CV.fp_from_dev(TL.fp_egress(got_tree))
    b = CV.fp_from_dev(TL.fp_egress(got_fermat))
    assert a == b
    assert a == [pow(v, OF.P - 2, OF.P) for v in vals]


@pytest.mark.slow
def test_cyclotomic_iteration_value_stability():
    """REGRESSION (round 4): iterated cyclotomic squaring must not diverge.
    The 3t +- 2z structure feeds the raw input back additively; without
    value contraction the lazy magnitude doubles per round and silently
    breaks the fold30 truncation bound after ~10-16 rounds (caught on
    hardware as a final-exp mismatch). 18 rounds covers the failure zone."""
    from ark_blst_tpu.oracle import pairing as OP

    val = _rand_fp12(2)
    lz = _to_lazy12(val)
    host = list(val)
    for _ in range(18):
        lz = TL.fp12_cyclotomic_sqr(lz)
        host = [OP.fp12_cyclotomic_sqr(h) for h in host]
    assert _from_lazy12(lz) == host


@pytest.mark.slow  # interpret-mode Pallas over 18 digit muls: minutes
def test_fused_cyc_sqr_kernel_matches_core():
    """The fused cyclotomic-square Pallas kernel (pallas_lazy.cyc_sqr_fp12)
    must be BIT-IDENTICAL to the XLA digit path (_cyc_sqr_core): same math,
    different residency. Random mul-ready digit strings (the contraction
    runs first inside both paths, so arbitrary bounded digits are legal)."""
    import numpy as np
    import jax.numpy as jnp

    from ark_blst_tpu.ops import lazy13 as LZ
    from ark_blst_tpu.ops import pallas_lazy as PLZ

    nrng = np.random.default_rng(7)
    comps = [
        jnp.asarray(
            nrng.integers(-LZ.F_BOUND, LZ.F_BOUND + 1, size=(LZ.ELEM, 8, 128)),
            jnp.int32,
        )
        for _ in range(12)
    ]
    a = PLZ._pack12(comps)
    ref = TL._cyc_sqr_core(a)
    PLZ.INTERPRET = True
    try:
        out = PLZ.cyc_sqr_fp12(a)
    finally:
        PLZ.INTERPRET = False
    for i, j, k in PLZ._FP12_IDX:
        assert np.array_equal(
            np.asarray(ref[i][j][k]), np.asarray(out[i][j][k])
        ), (i, j, k)
