"""Frozen cross-implementation vector tests.

The checked-in tests/vectors/bls12_381.json pins every byte format
(generated once by scripts/gen_vectors.py, anchored to the public
ZCash/blst generator encodings). Any serialization drift fails here —
the role of `serialization_compatibility` vs ark-bls12-381
(/root/reference/src/tests.rs:70-96).
"""

import json
import os

import pytest

from ark_blst_tpu import (
    Bls12,
    Fp,
    Fp2,
    Fp12,
    G1Affine,
    G2Affine,
    G1Projective,
    Scalar,
)
from ark_blst_tpu.oracle import serialize as OS

VEC_PATH = os.path.join(os.path.dirname(__file__), "vectors", "bls12_381.json")

with open(VEC_PATH) as f:
    VECS = json.load(f)


def test_fp_vectors():
    for v in VECS["fp"]:
        a = Fp(int(v["value"], 16))
        assert a.serialize().hex() == v["bytes"]
        assert Fp.deserialize(bytes.fromhex(v["bytes"])) == a


def test_scalar_vectors():
    for v in VECS["scalar"]:
        a = Scalar(int(v["value"], 16))
        assert a.serialize().hex() == v["bytes"]
        assert Scalar.deserialize(bytes.fromhex(v["bytes"])) == a


def test_fp2_vectors():
    for v in VECS["fp2"]:
        a = Fp2((int(v["value"][0], 16), int(v["value"][1], 16)))
        assert a.serialize().hex() == v["bytes"]
        assert Fp2.deserialize(bytes.fromhex(v["bytes"])) == a


@pytest.mark.parametrize("group,Aff", [("g1", G1Affine), ("g2", G2Affine)])
def test_group_vectors(group, Aff):
    gen = Aff.generator()
    for v in VECS[group]:
        if v["scalar"] == "inf":
            pt = Aff.zero()
        else:
            pt = Aff(gen.mul_bigint(int(v["scalar"], 16)).p)
        assert pt.serialize_compressed().hex() == v["compressed"]
        assert pt.serialize_uncompressed().hex() == v["uncompressed"]
        assert Aff.deserialize_compressed(bytes.fromhex(v["compressed"])) == pt
        assert Aff.deserialize_uncompressed(bytes.fromhex(v["uncompressed"])) == pt


def test_g1_generator_is_public_constant():
    """External anchor: the well-known ZCash/blst generator encodings."""
    assert G1Affine.generator().serialize_compressed().hex() == (
        "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
        "6c55e83ff97a1aeffb3af00adb22c6bb"
    )
    assert G2Affine.generator().serialize_compressed().hex() == (
        "93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049"
        "334cf11213945d57e5ac7d055d042b7e024aa2b2f08f0a91260805272dc51051"
        "c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8"
    )


def test_g1_invalid_encodings_rejected():
    for v in VECS["g1_invalid"]:
        with pytest.raises(ValueError):
            G1Affine.deserialize_compressed(bytes.fromhex(v["bytes"]))


def test_pairing_vectors():
    e = Bls12.pairing(G1Affine.generator(), G2Affine.generator(), backend="host")
    assert e.serialize().hex() == VECS["pairing"]["e_g1gen_g2gen"]
    e2 = Bls12.pairing(
        G1Affine.generator().mul(3).into_affine(),
        G2Affine.generator().mul(5).into_affine(),
        backend="host",
    )
    assert e2.serialize().hex() == VECS["pairing"]["e_3g1_5g2"]
    assert e2 == e.pow(15)
    assert Fp12.deserialize(bytes.fromhex(VECS["pairing"]["e_g1gen_g2gen"])) == e


def test_msm_vectors():
    for v in VECS["msm_g1"]:
        pts = [
            G1Affine.deserialize_compressed(bytes.fromhex(h))
            for h in v["points_compressed"]
        ]
        scs = [Scalar(int(s, 16)) for s in v["scalars"]]
        out = G1Projective.msm(pts, scs, backend="host")
        assert out.into_affine().serialize_compressed().hex() == v["result_compressed"]
