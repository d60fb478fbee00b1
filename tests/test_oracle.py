"""Oracle self-consistency tests (L0 of SURVEY.md §7).

The oracle is the root of the trust chain for the whole build, so it is
validated by mathematical properties + known-answer vectors rather than by
another implementation: group laws, bilinearity, non-degeneracy, the slow/fast
pairing cube relation, and the publicly known compressed generator encodings.
"""

import random

import pytest

from ark_blst_tpu.oracle import curve as C
from ark_blst_tpu.oracle import field as F
from ark_blst_tpu.oracle import pairing as PR
from ark_blst_tpu.oracle import serialize as S

RNG = random.Random(0xB15)


def rand_fp():
    return RNG.randrange(F.P)


def rand_fp2():
    return (rand_fp(), rand_fp())


def rand_fp6():
    return (rand_fp2(), rand_fp2(), rand_fp2())


def rand_fp12():
    return (rand_fp6(), rand_fp6())


def rand_scalar():
    return RNG.randrange(F.R)


# --- field axioms (mirrors field_test, /root/reference/src/tests.rs:9-26) ----

def test_fp2_field_axioms():
    for _ in range(10):
        a, b = rand_fp2(), rand_fp2()
        assert F.fp2_add(a, b) == F.fp2_add(b, a)
        assert F.fp2_mul(a, b) == F.fp2_mul(b, a)
        assert F.fp2_add(F.fp2_neg(a), a) == F.FP2_ZERO
        assert F.fp2_mul(a, F.fp2_inv(a)) == F.FP2_ONE
        assert F.fp2_sqr(a) == F.fp2_mul(a, a)


def test_fp6_field_axioms():
    for _ in range(5):
        a, b, c = rand_fp6(), rand_fp6(), rand_fp6()
        assert F.fp6_mul(a, b) == F.fp6_mul(b, a)
        assert F.fp6_mul(F.fp6_mul(a, b), c) == F.fp6_mul(a, F.fp6_mul(b, c))
        assert F.fp6_mul(a, F.fp6_inv(a)) == F.FP6_ONE
        # distributivity
        assert F.fp6_mul(a, F.fp6_add(b, c)) == F.fp6_add(
            F.fp6_mul(a, b), F.fp6_mul(a, c)
        )


def test_fp12_field_axioms():
    for _ in range(3):
        a, b = rand_fp12(), rand_fp12()
        assert F.fp12_mul(a, b) == F.fp12_mul(b, a)
        assert F.fp12_mul(a, F.fp12_inv(a)) == F.FP12_ONE
        assert F.fp12_sqr(a) == F.fp12_mul(a, a)


def test_frobenius_is_p_power():
    a2, a6, a12 = rand_fp2(), rand_fp6(), rand_fp12()
    assert F.fp2_frobenius(a2) == F.fp2_pow(a2, F.P)
    # fp6/fp12 p-power via generic pow is expensive; use pow on fp12 only once
    assert F.fp12_frobenius(a12, 1) == F.fp12_pow(a12, F.P)
    # frobenius composes
    assert F.fp12_frobenius(a12, 2) == F.fp12_frobenius(F.fp12_frobenius(a12, 1), 1)
    assert F.fp6_frobenius(a6, 6) == a6
    assert F.fp12_frobenius(a12, 12) == a12


def test_fp2_sqrt():
    for _ in range(5):
        a = rand_fp2()
        sq = F.fp2_sqr(a)
        s = F.fp2_sqrt(sq)
        assert s is not None and F.fp2_sqr(s) == sq
    # non-residue: xi*(square) where xi is a non-square? verify behavior on a
    # known non-square by construction: find one by trial
    a = (5, 1)
    while F.fp2_sqrt(a) is not None:
        a = (a[0] + 1, a[1])
    assert F.fp2_sqrt(F.fp2_sqr(a)) is not None


# --- group laws (mirrors group_test, /root/reference/src/tests.rs:28-68) -----

@pytest.mark.parametrize("ops,gen", [(C.FP_OPS, F.G1_GEN), (C.FP2_OPS, F.G2_GEN)])
def test_group_laws(ops, gen):
    r = C.scalar_mul(ops, gen, rand_scalar())
    s = C.scalar_mul(ops, gen, rand_scalar())
    rps = C.add(ops, r, s)
    assert C.add(ops, C.neg(ops, rps), rps) is None
    assert C.add(ops, s, r) == rps
    assert C.is_on_curve(ops, rps)
    k = rand_scalar()
    rk = C.scalar_mul(ops, r, k)
    assert C.add(ops, rk, C.scalar_mul(ops, r, F.R - k)) is None
    # order
    assert C.scalar_mul(ops, r, F.R) is None
    # identity handling
    assert C.add(ops, None, r) == r
    assert C.add(ops, r, None) == r
    assert C.scalar_mul(ops, None, k) is None


@pytest.mark.parametrize("ops,gen", [(C.FP_OPS, F.G1_GEN), (C.FP2_OPS, F.G2_GEN)])
def test_msm_differential(ops, gen):
    pts = [C.scalar_mul(ops, gen, rand_scalar()) for _ in range(10)]
    pts[3] = None  # identity point must be handled (unlike blst,
    # /root/reference/src/g1.rs:682-689)
    scalars = [rand_scalar() for _ in range(10)]
    acc = None
    for p, k in zip(pts, scalars):
        acc = C.add(ops, acc, C.scalar_mul(ops, p, k))
    assert C.msm(ops, pts, scalars) == acc


def test_cofactor_values():
    # BLS12 structural identities already asserted at import; check the
    # hardcoded reference value for G1 (/root/reference/src/g1.rs:35-52).
    assert F.H_G1 == 0x396C8C005555E1568C00AAAB0000AAAB
    assert F.H_G1 * F.H_G1_INV_MOD_R % F.R == 1


# --- serialization (SURVEY.md §3.5 formats) ----------------------------------

def test_g1_generator_compressed_kat():
    assert S.g1_compress(F.G1_GEN).hex() == (
        "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
        "6c55e83ff97a1aeffb3af00adb22c6bb"
    )


def test_g2_generator_compressed_kat():
    assert S.g2_compress(F.G2_GEN).hex() == (
        "93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049"
        "334cf11213945d57e5ac7d055d042b7e024aa2b2f08f0a91260805272dc51051"
        "c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8"
    )


def test_g1_serialization_roundtrip():
    for _ in range(5):
        pt = C.scalar_mul(C.FP_OPS, F.G1_GEN, rand_scalar())
        assert S.g1_decompress(S.g1_compress(pt)) == pt
        assert S.g1_from_uncompressed(S.g1_uncompressed(pt)) == pt
    assert S.g1_decompress(S.g1_compress(None)) is None
    assert S.g1_from_uncompressed(S.g1_uncompressed(None)) is None
    # negated point flips only the sign flag
    pt = C.scalar_mul(C.FP_OPS, F.G1_GEN, 7)
    a, b = S.g1_compress(pt), S.g1_compress(C.neg(C.FP_OPS, pt))
    assert a[1:] == b[1:] and a[0] ^ b[0] == S.SIGN_FLAG


def test_g2_serialization_roundtrip():
    for _ in range(3):
        pt = C.scalar_mul(C.FP2_OPS, F.G2_GEN, rand_scalar())
        assert S.g2_decompress(S.g2_compress(pt)) == pt
        assert S.g2_from_uncompressed(S.g2_uncompressed(pt)) == pt
    assert S.g2_decompress(S.g2_compress(None)) is None


def test_non_subgroup_point_rejected():
    # A point on the curve but outside the r-torsion: start from a random x.
    x = 9
    while True:
        y = F.fp_sqrt((x * x % F.P * x + F.B_G1) % F.P)
        if y is not None:
            pt = (x, y)
            if not C.is_in_subgroup(C.FP_OPS, pt):
                break
        x += 1
    with pytest.raises(ValueError):
        S.g1_decompress(S.g1_compress(pt), validate=True)
    assert S.g1_decompress(S.g1_compress(pt), validate=False) == pt


def test_field_serialization():
    a = rand_fp()
    assert S.fp_from_bytes(S.fp_to_bytes(a)) == a
    k = rand_scalar()
    assert S.scalar_from_bytes(S.scalar_to_bytes(k)) == k
    a12 = rand_fp12()
    assert S.fp12_from_bytes(S.fp12_to_bytes(a12)) == a12
    assert len(S.fp12_to_bytes(a12)) == 576  # /root/reference/src/fp12.rs:258-273


# --- pairing ----------------------------------------------------------------

def test_pairing_fast_matches_slow_cubed():
    f = PR.miller_slow(F.G1_GEN, F.G2_GEN)
    e_slow = PR.final_exp_slow(f)
    assert PR.final_exp(f) == F.fp12_pow(e_slow, 3)
    # and the fast miller loop agrees with the slow one after final exp
    assert PR.final_exp(PR.miller_loop(F.G1_GEN, F.G2_GEN)) == F.fp12_pow(e_slow, 3)


def test_pairing_bilinear():
    e = PR.pairing(F.G1_GEN, F.G2_GEN)
    a, b = rand_scalar(), rand_scalar()
    pa = C.g1_mul(F.G1_GEN, a)
    qb = C.g2_mul(F.G2_GEN, b)
    assert PR.pairing(pa, qb) == F.fp12_pow(e, a * b % F.R)
    assert PR.pairing(pa, F.G2_GEN) == PR.pairing(F.G1_GEN, C.g2_mul(F.G2_GEN, a))
    assert F.fp12_pow(e, F.R) == F.FP12_ONE
    assert not F.fp12_is_one(e)


def test_pairing_identity_semantics():
    # identity pairs give one (/root/reference/src/pairing.rs:58-60)
    assert PR.pairing(None, F.G2_GEN) == F.FP12_ONE
    assert PR.pairing(F.G1_GEN, None) == F.FP12_ONE
    f = PR.multi_miller_loop([(None, F.G2_GEN), (F.G1_GEN, F.G2_GEN)])
    assert PR.final_exp(f) == PR.pairing(F.G1_GEN, F.G2_GEN)


def test_multi_miller_product():
    a, b = rand_scalar(), rand_scalar()
    pa, qb = C.g1_mul(F.G1_GEN, a), C.g2_mul(F.G2_GEN, b)
    f = PR.multi_miller_loop([(pa, F.G2_GEN), (F.G1_GEN, qb)])
    e = PR.final_exp(f)
    expected = F.fp12_mul(
        PR.pairing(pa, F.G2_GEN), PR.pairing(F.G1_GEN, qb)
    )
    assert e == expected


def test_cyclotomic_ops():
    e = PR.pairing(C.g1_mul(F.G1_GEN, 5), F.G2_GEN)
    assert F.fp12_cyclotomic_sqr(e) == F.fp12_sqr(e)
    # conjugate is inverse on the cyclotomic subgroup
    # (real `cyclotomic_inverse`, unlike the reference's discarded-copy bug at
    # /root/reference/src/pairing.rs:21)
    assert F.fp12_mul(e, F.fp12_conj(e)) == F.FP12_ONE
    assert F.fp12_cyclotomic_exp_bls_x(e) == F.fp12_pow(e, F.BLS_X % F.R)
