"""L6 API surface tests — the twin of the reference's generic harness
(/root/reference/src/tests.rs): `field_test` (:9-26), `group_test` (:28-68)
incl. the 10-point MSM differential, serialization round-trips, plus the
pairing engine's algebraic laws (src/pairing.rs:91-101) and the sponge
Absorb semantics (src/scalar.rs:661-671).

These are pure host-value tests (no device round-trips except the msm
device-backend check), so they run fast everywhere.
"""

import random

import pytest

from ark_blst_tpu import (
    Bls12,
    Fp,
    Fp2,
    Fp6,
    Fp12,
    G1Affine,
    G1Projective,
    G2Affine,
    G2Prepared,
    G2Projective,
    Gt,
    Scalar,
    field_cast,
)
from ark_blst_tpu.oracle import field as OF
from ark_blst_tpu.oracle import pairing as OP

FIELDS = [Fp, Scalar, Fp2, Fp6, Fp12]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f._name)
def test_field_laws(F):
    """= field_test (/root/reference/src/tests.rs:9-26)."""
    rng = random.Random(17)
    a, b = F.rand(rng), F.rand(rng)
    assert a + b == b + a
    assert a * b == b * a
    assert (a + (-a)).is_zero()
    assert a - a == F.zero()
    if not a.is_zero():
        assert (a / a).is_one()
        assert (a * a.inverse()).is_one()
    assert a * F.one() == a
    assert (a * F.zero()).is_zero()
    assert a.double() == a + a
    assert a.square() == a * a
    # distributivity
    c = F.rand(rng)
    assert a * (b + c) == a * b + a * c


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f._name)
def test_field_serialization_roundtrip(F):
    rng = random.Random(3)
    for _ in range(4):
        a = F.rand(rng)
        data = a.serialize()
        assert len(data) == F.serialized_size()
        assert F.deserialize(data) == a
    # compress flag ignored for fields (src/fp.rs:258-273)
    a = F.rand(rng)
    assert a.serialize(compress=False) == a.serialize(compress=True)


def test_field_serialized_sizes():
    """Byte widths of /root/reference: Fp=48, Scalar=32, Fp2=96, Fp6=288,
    Fp12=576."""
    assert Fp.serialized_size() == 48
    assert Scalar.serialized_size() == 32
    assert Fp2.serialized_size() == 96
    assert Fp6.serialized_size() == 288
    assert Fp12.serialized_size() == 576


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f._name)
def test_frobenius_is_correct(F):
    """x^(p^k) == frobenius_map(k); the reference no-ops these for towers
    (quirk ledger). Verified against pow for the cheap fields, and
    structurally (frobenius^degree == identity) for all."""
    rng = random.Random(5)
    a = F.rand(rng)
    deg = F.EXTENSION_DEGREE
    out = a
    for _ in range(deg):
        out = out.frobenius_map(1)
    assert out == a
    if F is Fp2:
        assert a.frobenius_map(1) == a.pow(OF.P)


def test_fp_sqrt_legendre():
    rng = random.Random(9)
    a = Fp.rand(rng)
    sq = a.square()
    assert sq.legendre() == 1
    s = sq.sqrt()
    assert s is not None and s.square() == sq
    # a known non-residue: legendre(-1)? p % 4 == 3 for BLS12-381 -> -1 is NQR
    assert (-Fp.one()).legendre() == -1
    assert (-Fp.one()).sqrt() is None


def test_fp2_sqrt():
    rng = random.Random(11)
    a = Fp2.rand(rng)
    sq = a.square()
    s = sq.sqrt()
    assert s is not None and s.square() == sq


def test_scalar_sqrt_and_fft_constants():
    rng = random.Random(13)
    a = Scalar.rand(rng)
    sq = a.square()
    s = sq.sqrt()
    assert s is not None and s.square() == sq
    # FFT constants (src/scalar.rs:465-471)
    assert Scalar.TWO_ADICITY == 32
    w = Scalar.TWO_ADIC_ROOT_OF_UNITY
    assert w.pow(1 << 32).is_one()
    assert not w.pow(1 << 31).is_one()
    assert Scalar.GENERATOR == Scalar(7)


def test_scalar_absorb_and_field_cast():
    """Sponge Absorb semantics (/root/reference/src/scalar.rs:661-671):
    to_sponge_bytes = serialize_compressed; to_sponge_field_elements =
    field_cast via LE bytes."""
    rng = random.Random(15)
    a = Scalar.rand(rng)
    assert a.to_sponge_bytes() == a.serialize()
    (elem,) = a.to_sponge_field_elements()
    assert elem == a
    # cross-characteristic cast must fail (the reference returns None)
    with pytest.raises(ValueError):
        field_cast(a, Fp)
    # same-characteristic cast: Fp -> Fp identity
    b = Fp.rand(rng)
    assert field_cast(b, Fp) == b


def test_fp6_from_base_prime_field_elems_fixed():
    """The reference mis-slices c1/c2 (src/fp6.rs:490-493); ours is correct."""
    rng = random.Random(19)
    elems = [Fp.rand(rng) for _ in range(6)]
    a = Fp6.from_base_prime_field_elems(elems)
    assert a.c0 == Fp2.new(elems[0], elems[1])
    assert a.c1 == Fp2.new(elems[2], elems[3])
    assert a.c2 == Fp2.new(elems[4], elems[5])
    assert Fp6.from_base_prime_field_elems(elems[:5]) is None


def test_gt_cyclotomic_ops():
    """Cyclotomic square/inverse agree with generic ops inside the
    cyclotomic subgroup (CyclotomicMultSubgroup, src/pairing.rs:14-32)."""
    g = Bls12.pairing(G1Affine.generator(), G2Affine.generator(), backend="host")
    assert g.cyclotomic_square() == g.square()
    assert g.cyclotomic_inverse() == g.inverse()
    assert Gt.INVERSE_IS_FAST
    e = 0xDEADBEEF
    assert g.cyclotomic_exp(e) == g.pow(e)


GROUPS = [
    (G1Affine, G1Projective),
    (G2Affine, G2Projective),
]


@pytest.mark.parametrize("Aff,Proj", GROUPS, ids=["g1", "g2"])
def test_group_laws(Aff, Proj):
    """= group_test (/root/reference/src/tests.rs:28-49)."""
    rng = random.Random(23)
    a, b, c = Proj.rand(rng), Proj.rand(rng), Proj.rand(rng)
    assert a + b == b + a
    assert (a + b) + c == a + (b + c)
    assert (a + (-a)).is_zero()
    assert a + Proj.zero() == a
    assert a.double() == a + a
    s = Scalar.rand(rng)
    # mul(s) vs mul_bigint agreement (src/tests.rs:42-43)
    assert a.mul(s) == a.mul_bigint(s.v)
    assert a * 2 == a.double()
    g = Aff.generator()
    assert g.is_on_curve() and g.is_in_correct_subgroup_assuming_on_curve()
    assert (g * Scalar(OF.R - 1)) + g == Proj.zero()


@pytest.mark.parametrize("Aff,Proj", GROUPS, ids=["g1", "g2"])
def test_group_serialization(Aff, Proj):
    """Round-trips in both modes + validation behavior
    (src/g1.rs:358-431)."""
    rng = random.Random(29)
    for pt in [Aff.generator(), Aff.rand(rng), Aff.zero()]:
        comp = pt.serialize_compressed()
        assert len(comp) == Aff.serialized_size(True)
        assert Aff.deserialize_compressed(comp) == pt
        unc = pt.serialize_uncompressed()
        assert len(unc) == Aff.serialized_size(False)
        assert Aff.deserialize_uncompressed(unc) == pt
    # projective serializes via affine values
    p = Proj.rand(rng)
    assert Proj.deserialize_compressed(p.serialize_compressed()) == p


def test_group_serialization_rejects_bad_subgroup():
    """validate=True must reject an on-curve point outside the r-torsion."""
    # find a curve point with small-ish x not in the subgroup
    x = 0
    while True:
        x += 1
        y2 = (x * x * x + 4) % OF.P
        y = OF.fp_sqrt(y2)
        if y is None:
            continue
        from ark_blst_tpu.oracle import curve as OC

        if not OC.is_in_subgroup(OC.FP_OPS, (x, y)):
            break
    bad = bytearray((x).to_bytes(48, "big"))
    bad[0] |= 0x80
    if y > (OF.P - 1) // 2:
        bad[0] |= 0x20
    with pytest.raises(ValueError):
        G1Affine.deserialize_compressed(bytes(bad), validate=True)
    # validate=False accepts it (deserialize_unchecked semantics)
    pt = G1Affine.deserialize_compressed(bytes(bad), validate=False)
    assert pt.is_on_curve() and not pt.is_in_correct_subgroup_assuming_on_curve()


@pytest.mark.parametrize("Aff,Proj", GROUPS, ids=["g1", "g2"])
def test_cofactor_ops(Aff, Proj):
    rng = random.Random(31)
    a = Aff.rand(rng)
    assert a.mul_by_cofactor_to_group() == a.mul_bigint(Aff.COFACTOR)
    if Aff is G1Affine:
        assert a.mul_by_cofactor().mul_by_cofactor_inv() == a


@pytest.mark.parametrize("Aff,Proj", GROUPS, ids=["g1", "g2"])
def test_msm_api(Aff, Proj):
    """10-point MSM vs naive fold (= src/tests.rs:50-67), host backend,
    including an identity point in the bases (the case blst fails,
    src/g1.rs:682-689)."""
    rng = random.Random(37)
    n = 10
    bases = [Aff.rand(rng) for _ in range(n)]
    bases[4] = Aff.zero()
    scalars = [Scalar.rand(rng) for _ in range(n)]
    expected = Proj.zero()
    for b, s in zip(bases, scalars):
        expected = expected + b.mul(s)
    got = Proj.msm(bases, scalars, backend="host")
    assert got == expected


def test_msm_api_device_backend():
    """Same MSM through the device pipeline (CPU mesh in tests)."""
    rng = random.Random(41)
    n = 8
    bases = [G1Affine.rand(rng) for _ in range(n)]
    bases[2] = G1Affine.zero()
    scalars = [Scalar.rand(rng) for _ in range(n)]
    host = G1Projective.msm(bases, scalars, backend="host")
    dev = G1Projective.msm(bases, scalars, backend="device", c=4, lanes=4)
    assert dev == host


def test_batch_normalize():
    rng = random.Random(43)
    pts = [G1Projective.rand(rng) for _ in range(4)] + [G1Projective.zero()]
    affs = G1Projective.batch_normalize(pts)
    assert all(isinstance(a, G1Affine) for a in affs)
    assert [a.p for a in affs] == [p.p for p in pts]


def test_pairing_bilinearity():
    """e(aP, bQ) == e(P, Q)^(ab) (= src/pairing.rs:91-101)."""
    rng = random.Random(47)
    a, b = Scalar.rand(rng), Scalar.rand(rng)
    P, Q = G1Affine.generator(), G2Affine.generator()
    lhs = Bls12.pairing(P.mul(a), Q.mul(b), backend="host")
    rhs = Bls12.pairing(P, Q, backend="host").pow((a.v * b.v) % OF.R)
    assert lhs == rhs
    assert not lhs.is_one()


def test_pairing_identity_semantics():
    """Identity inputs give one (src/pairing.rs:58-60)."""
    P, Q = G1Affine.generator(), G2Affine.generator()
    assert Bls12.pairing(G1Affine.zero(), Q, backend="host").is_one()
    assert Bls12.pairing(P, G2Affine.zero(), backend="host").is_one()
    # multi_pairing skips identity pairs but keeps the rest
    out = Bls12.multi_pairing([P, G1Affine.zero()], [Q, Q], backend="host")
    assert out == Bls12.pairing(P, Q, backend="host")


def test_multi_pairing_product():
    """prod e(P_i, Q_i) == e(P1,Q1)*e(P2,Q2)."""
    rng = random.Random(53)
    P1, P2 = G1Affine.rand(rng), G1Affine.rand(rng)
    Q1, Q2 = G2Affine.rand(rng), G2Affine.rand(rng)
    prod = Bls12.multi_pairing([P1, P2], [Q1, Q2], backend="host")
    sep = Bls12.pairing(P1, Q1, backend="host") * Bls12.pairing(P2, Q2, backend="host")
    assert prod == sep


def test_g2_prepared():
    """First-class reusable G2Prepared (src/g2.rs:650-694), with working
    serialization (reference todo!()s it, src/g2.rs:696-726)."""
    rng = random.Random(59)
    q = G2Affine.rand(rng)
    prep = G2Prepared.from_affine(q)
    assert not prep.is_identity()
    assert len(prep.coeffs) == G2Prepared.NUM_COEFFS
    # pairing via prepared == pairing via affine
    p = G1Affine.rand(rng)
    via_prep = Bls12.final_exponentiation(Bls12.multi_miller_loop([p], [prep]))
    direct = Bls12.pairing(p, q, backend="host")
    assert via_prep == direct
    # default = prepared generator (src/g2.rs:660-664)
    assert G2Prepared.default() == G2Prepared.from_affine(G2Affine.generator())
    # identity handling
    assert G2Prepared.from_affine(G2Affine.zero()).is_identity()
    # serialization round-trip
    data = prep.serialize()
    assert len(data) == G2Prepared.serialized_size()
    assert G2Prepared.deserialize(data) == prep
    assert G2Prepared.deserialize(G2Prepared.from_affine(G2Affine.zero()).serialize()).is_identity()


def test_pairing_matches_slow_oracle():
    """Host pairing path agrees with the first-principles slow pairing
    (cubed — the production chain absorbs a factor 3, see oracle/pairing.py)."""
    rng = random.Random(61)
    p, q = G1Affine.rand(rng), G2Affine.rand(rng)
    fast = Bls12.pairing(p, q, backend="host")
    slow = Fp12(OP.pairing_slow(p.p, q.p))
    assert fast == slow.pow(3)


def test_hash_and_eq():
    rng = random.Random(67)
    a = Fp.rand(rng)
    assert hash(a) == hash(Fp(a.v))
    g = G1Affine.generator()
    assert hash(g) == hash(G1Affine(g.p))
    assert len({Fp(1), Fp(1), Fp(2)}) == 2


def test_api_long_tail_conversions():
    """from_str / from_bigint / from_random_bytes(_with_flags) / batch_check
    (= /root/reference/src/fp.rs:289-467, src/scalar.rs:553-560,
    src/g1.rs:565-580)."""
    import random

    import pytest as _pytest

    from ark_blst_tpu import G1Projective, G2Projective, Scalar
    from ark_blst_tpu.fields import Fp
    from ark_blst_tpu.oracle import field as OF

    assert Fp.from_str(str(OF.P - 1)).v == OF.P - 1
    with _pytest.raises(ValueError):
        Fp.from_str(str(OF.P))
    assert Fp.from_bigint(OF.P) is None
    assert Scalar.from_bigint(OF.R - 1).v == OF.R - 1

    # 2 flag bits -> arkworks reads flags from byte 32 of a 33-byte buffer
    s, flags = Scalar.from_random_bytes_with_flags(
        b"\x2a" + b"\x00" * 31 + b"\xc0", 0xC0
    )
    assert s.v == 42 and flags == 0xC0
    # flag bits placed at byte 31 are VALUE bits for a nonzero flag type:
    # bit 255 is shaved, bit 254 stays in the value (ADVICE r4)
    s2, flags2 = Scalar.from_random_bytes_with_flags(
        b"\x2a" + b"\x00" * 30 + b"\xc0", 0xC0
    )
    assert s2.v == 42 + (1 << 254) and flags2 == 0
    assert Scalar.from_random_bytes((OF.R).to_bytes(32, "little")) is None
    assert Scalar.from_random_bytes((7).to_bytes(16, "little")).v == 7

    rng = random.Random(5)
    G1Projective.batch_check([G1Projective.rand(rng) for _ in range(3)])
    G2Projective.batch_check([G2Projective.rand(rng) for _ in range(2)])
    bad = G1Projective.rand(rng)
    bad.p = (1, 1)  # not on curve
    with _pytest.raises(ValueError):
        G1Projective.batch_check([bad])


def test_field_pow_edge_cases():
    """pow with a negative exponent inverts first (x^-1 * x = 1) and raises
    cleanly (not AttributeError) on zero."""
    import pytest as _pytest

    from ark_blst_tpu.fields import Fp, Scalar

    for F in (Fp, Scalar):
        x = F(12345)
        assert x.pow(-1) * x == F.one()
        assert x.pow(-3) * x.pow(3) == F.one()
        with _pytest.raises(ZeroDivisionError):
            F.zero().pow(-1)
        assert F.zero().pow(0) == F.one()


def test_from_random_bytes_arkworks_semantics():
    """Arkworks parity (ADVICE r3/r4): empty input is zero; bit 255 is
    shaved BEFORE the canonicality check; the flag byte is arkworks'
    output_byte_size-1 — byte 31 for empty flags, byte 32 for a 2-bit
    flag type (33-byte buffer)."""
    from ark_blst_tpu.fields import Scalar
    from ark_blst_tpu.oracle import field as OF

    assert Scalar.from_random_bytes(b"").v == 0
    # value with bit 255 set: arkworks shaves it and then succeeds
    v = 5 | (1 << 255)
    s = Scalar.from_random_bytes(v.to_bytes(32, "little"))
    assert s is not None and s.v == 5
    # flags live past the serialized size for a nonzero flag type; short
    # input zero-pads, so the flags come back empty
    out = Scalar.from_random_bytes_with_flags(b"\x07", 0xC0)
    assert out is not None and out[0].v == 7 and out[1] == 0
    # empty flags: >32 bytes rejected; 2-bit flags: 33 accepted, 34 rejected
    assert Scalar.from_random_bytes(b"\x00" * 33) is None
    assert Scalar.from_random_bytes_with_flags(b"\x01" + b"\x00" * 32, 0xC0) is not None
    assert Scalar.from_random_bytes_with_flags(b"\x00" * 34, 0xC0) is None


def test_g2_cofactor_inv():
    """G2 COFACTOR_INV parity (/root/reference/src/g2.rs:56-58): h^-1 mod r
    undoes clear_cofactor on subgroup points, for G1 and G2."""
    import random

    from ark_blst_tpu import G1Projective, G2Projective
    from ark_blst_tpu.oracle import field as OF

    rng = random.Random(9)
    for Proj, h in ((G1Projective, OF.H_G1), (G2Projective, OF.H_G2)):
        p = Proj.rand(rng)  # in the r-torsion subgroup by construction
        q = p.mul_by_cofactor().mul_by_cofactor_inv()
        assert q == type(q)(p.p)
        assert Proj._cofactor_inv == pow(h, -1, OF.R)


def test_host_pippenger_matches_oracle():
    """The production host MSM (windowed buckets) against the naive fold
    oracle, with identity points and zero scalars in the mix
    (/root/reference/src/g1.rs:602-619 role)."""
    import random

    from ark_blst_tpu.oracle import curve as OC
    from ark_blst_tpu.oracle import field as OF

    rng = random.Random(21)
    for ops, gen in ((OC.FP_OPS, OF.G1_GEN), (OC.FP2_OPS, OF.G2_GEN)):
        pts = [OC.scalar_mul(ops, gen, rng.randrange(1, OF.R)) for _ in range(9)]
        pts[3] = None  # identity point
        scs = [rng.randrange(OF.R) for _ in range(9)]
        scs[5] = 0
        for c in (None, 2, 8):
            got = OC.msm_pippenger(ops, pts, scs, c=c)
            assert got == OC.msm(ops, pts, scs)
    assert OC.msm_pippenger(OC.FP_OPS, [], []) is None


def test_msm_rejects_tiny_window():
    import pytest as _pytest

    from ark_blst_tpu import G1Affine, G1Projective, Scalar

    with _pytest.raises(ValueError):
        G1Projective.msm([G1Affine.generator()], [Scalar(1)], c=1)


def test_fp_from_random_bytes():
    """Fp::from_random_bytes is implemented with arkworks semantics (the
    reference panics, /root/reference/src/fp.rs:568-579): shave bits >= 381,
    flags at the fixed byte 47, empty input is zero."""
    from ark_blst_tpu.fields import Fp
    from ark_blst_tpu.oracle import field as OF

    assert Fp.from_random_bytes(b"").v == 0
    v = 77 | (1 << 381)  # bit 381 shaved before the canonicality check
    assert Fp.from_random_bytes(v.to_bytes(48, "little")).v == 77
    assert Fp.from_random_bytes((OF.P).to_bytes(48, "little")) is None
    out = Fp.from_random_bytes_with_flags(b"\x09", 0xC0)
    assert out is not None and out[0].v == 9 and out[1] == 0
    assert Fp.from_random_bytes(b"\x00" * 49) is None
