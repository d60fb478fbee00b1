"""Differential tests: lazy RCB15 formulas (curves/lazy_group.py) vs the
trusted host oracle (oracle/curve.py), G1 and G2, including completeness
edge cases (identity, doubling-via-add, inverse pairs)."""

import numpy as np
import jax.numpy as jnp

from ark_blst_tpu.curves import lazy_group as LG
from ark_blst_tpu.ops import lazy13 as LZ
from ark_blst_tpu.oracle import curve as OC
from ark_blst_tpu.oracle.field import P

R13 = LZ.R13
RINV = pow(R13, -1, P)


def enc(v):
    """int mod p -> BALANCED lazy element (Montgomery R13 domain), batch (1,).

    The formulas require balanced digits (canonical sums overflow the mul
    legality bound) — mirror the real pipeline, which stores balanced
    digits at ingest (store30) and in buckets."""
    digs = LZ.int_to_digits(v * R13 % P)
    out = [jnp.asarray([int(x)], jnp.int32) for x in digs]
    return LZ.load31(LZ.store30(out))


def dec(d):
    """lazy element (R13 domain) -> int mod p."""
    v = sum(int(np.asarray(x)[0]) << (13 * i) for i, x in enumerate(d))
    return v * RINV % P


def enc2(v):
    return (enc(v[0]), enc(v[1]))


def dec2(d):
    return (dec(d[0]), dec(d[1]))


def _oracle_g1(k):
    return OC.g1_mul(OC.g1_generator(), k)


def _oracle_g2(k):
    return OC.g2_mul(OC.g2_generator(), k)


def to_proj_g1(pt):
    """oracle affine point (or None=infinity) -> lazy projective triple."""
    if pt is None:
        return (enc(0), enc(1), enc(0))
    return (enc(pt[0]), enc(pt[1]), enc(1))


def lazy_to_affine_g1(p3):
    x, y, z = dec(p3[0]), dec(p3[1]), dec(p3[2])
    if z == 0:
        return None
    zi = pow(z, -1, P)
    return (x * zi % P, y * zi % P)


def to_proj_g2(pt):
    if pt is None:
        return (enc2((0, 0)), enc2((1, 0)), enc2((0, 0)))
    return (enc2(pt[0]), enc2(pt[1]), enc2((1, 0)))


def lazy_to_affine_g2(p3):
    x, y, z = dec2(p3[0]), dec2(p3[1]), dec2(p3[2])
    if z == (0, 0):
        return None

    def inv2(c):
        n = (c[0] * c[0] + c[1] * c[1]) % P
        ni = pow(n, -1, P)
        return (c[0] * ni % P, (P - c[1]) * ni % P)

    def mul2(a, b):
        return (
            (a[0] * b[0] - a[1] * b[1]) % P,
            (a[0] * b[1] + a[1] * b[0]) % P,
        )

    zi = inv2(z)
    return (mul2(x, zi), mul2(y, zi))


def test_g1_mixed_add():
    a = _oracle_g1(7)
    b = _oracle_g1(11)
    got = LG.mixed_add(LG.FP_LAZY, to_proj_g1(a), (enc(b[0]), enc(b[1])))
    assert lazy_to_affine_g1(got) == OC.g1_add(a, b)


def test_g1_mixed_add_identity_and_double():
    b = _oracle_g1(5)
    # identity + b = b
    got = LG.mixed_add(LG.FP_LAZY, to_proj_g1(None), (enc(b[0]), enc(b[1])))
    assert lazy_to_affine_g1(got) == b
    # b + b (doubling through the complete add)
    got = LG.mixed_add(LG.FP_LAZY, to_proj_g1(b), (enc(b[0]), enc(b[1])))
    assert lazy_to_affine_g1(got) == _oracle_g1(10)
    # b + (-b) = identity
    nb = (b[0], P - b[1])
    got = LG.mixed_add(LG.FP_LAZY, to_proj_g1(b), (enc(nb[0]), enc(nb[1])))
    assert lazy_to_affine_g1(got) is None


def test_g1_full_add_and_double():
    a, b = _oracle_g1(13), _oracle_g1(29)
    got = LG.full_add(LG.FP_LAZY, to_proj_g1(a), to_proj_g1(b))
    assert lazy_to_affine_g1(got) == _oracle_g1(42)
    got = LG.double(LG.FP_LAZY, to_proj_g1(a))
    assert lazy_to_affine_g1(got) == _oracle_g1(26)
    # chained: ((a+b)+b) compounding redundant representations
    s = LG.full_add(LG.FP_LAZY, to_proj_g1(a), to_proj_g1(b))
    s = LG.full_add(LG.FP_LAZY, s, to_proj_g1(b))
    s = LG.double(LG.FP_LAZY, s)
    assert lazy_to_affine_g1(s) == _oracle_g1(142)


def test_g2_mixed_and_full():
    a = _oracle_g2(3)
    b = _oracle_g2(4)
    got = LG.mixed_add(LG.FP2_LAZY, to_proj_g2(a), (enc2(b[0]), enc2(b[1])))
    assert lazy_to_affine_g2(got) == _oracle_g2(7)
    got = LG.full_add(LG.FP2_LAZY, to_proj_g2(a), to_proj_g2(b))
    assert lazy_to_affine_g2(got) == _oracle_g2(7)
    got = LG.double(LG.FP2_LAZY, to_proj_g2(a))
    assert lazy_to_affine_g2(got) == _oracle_g2(6)
    # identity + b
    got = LG.mixed_add(LG.FP2_LAZY, to_proj_g2(None), (enc2(b[0]), enc2(b[1])))
    assert lazy_to_affine_g2(got) == b


def test_g1_store_load_roundtrip_through_adds():
    """Simulate the kernel loop: store30/load31 between successive adds."""
    f = LG.FP_LAZY
    acc = to_proj_g1(None)
    want = None
    for k in (3, 9, 27, 81):
        b = _oracle_g1(k)
        acc = LG.mixed_add(f, acc, (enc(b[0]), enc(b[1])))
        acc = tuple(f.load31(f.store30(c)) for c in acc)
        want = OC.g1_add(want, b)
    assert lazy_to_affine_g1(acc) == want
