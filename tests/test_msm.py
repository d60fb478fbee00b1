"""L4 MSM differential tests vs the pure-Python oracle.

Mirrors the reference's MSM test strategy (10-point differential vs a naive
fold, /root/reference/src/tests.rs:50-67) and makes identity-point inputs a
*passing* case (blst mishandles them — /root/reference/src/g1.rs:682-689).
Plus the multi-device path on the virtual 8-CPU mesh.
"""

import random

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # scan-pipeline MSM on CPU (minutes)

from ark_blst_tpu.oracle import curve as OC
from ark_blst_tpu.oracle import field as OF
from ark_blst_tpu.ops import convert as CV
from ark_blst_tpu.curves import msm as M
from ark_blst_tpu.curves.group import G1, G2

rng = random.Random(1234)


def rand_g1(n):
    return [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(n)]


def rand_scalars(n):
    return [rng.randrange(OF.R) for _ in range(n)]


def oracle_msm_g1(pts, scs):
    return OC.msm(OC.FP_OPS, pts, scs)


def test_window_digits_roundtrip():
    scs = rand_scalars(7)
    digs = np.asarray(M.window_digits(CV.fr_to_dev(scs), 8))
    for i, s in enumerate(scs):
        val = sum(int(digs[w, i]) << (8 * w) for w in range(digs.shape[0]))
        assert val == s


@pytest.mark.parametrize("n,c,lanes", [(10, 4, 4), (37, 8, 8)])
def test_msm_g1_matches_oracle(n, c, lanes):
    pts = rand_g1(n)
    scs = rand_scalars(n)
    expected = oracle_msm_g1(pts, scs)
    out = M.msm(CV.g1_to_dev(pts), CV.fr_to_dev(scs), curve=G1, c=c, lanes=lanes)
    assert CV.g1_from_dev(out) == [expected]


def test_msm_with_identity_and_zero_scalars():
    # The case blst's Pippenger cannot handle (/root/reference/src/g1.rs:682-689).
    pts = rand_g1(6) + [None, None]
    scs = rand_scalars(6) + [rng.randrange(OF.R), 0]
    pts, scs = pts + [pts[0]], scs + [0]  # and a zero scalar on a real point
    expected = oracle_msm_g1(pts, scs)
    out = M.msm(CV.g1_to_dev(pts), CV.fr_to_dev(scs), curve=G1, c=8, lanes=4)
    assert CV.g1_from_dev(out) == [expected]


def test_msm_g2_matches_oracle():
    pts = [OC.g2_mul(OF.G2_GEN, rng.randrange(1, OF.R)) for _ in range(9)]
    scs = rand_scalars(9)
    expected = OC.msm(OC.FP2_OPS, pts, scs)
    out = M.msm(CV.g2_to_dev(pts), CV.fr_to_dev(scs), curve=G2, c=4, lanes=4)
    assert CV.g2_from_dev(out) == [expected]


def test_msm_naive_matches_oracle():
    pts = rand_g1(5)
    scs = rand_scalars(5)
    expected = oracle_msm_g1(pts, scs)
    out = M.msm_naive(CV.g1_to_dev(pts), CV.fr_to_dev(scs), curve=G1)
    assert CV.g1_from_dev(out) == [expected]


def test_msm_sharded_8dev():
    n = 32
    pts = rand_g1(n)
    scs = rand_scalars(n)
    expected = oracle_msm_g1(pts, scs)
    devs = jax.devices()
    mesh = jax.sharding.Mesh(np.array(devs), ("data",))
    out = M.msm_sharded(
        CV.g1_to_dev(pts), CV.fr_to_dev(scs), mesh, curve=G1, c=4, lanes=2
    )
    assert CV.g1_from_dev(out) == [expected]


def test_window_digits_signed_reconstruct():
    """Signed digits (mag | sign<<15) must reconstruct the scalar exactly:
    sum_j (+-mag_j) 2^(cj) == s, magnitudes <= 2^(c-1)."""
    import numpy as np

    from ark_blst_tpu.ops import convert as CV

    rng = random.Random(77)
    scs = [0, 1, OF.R - 1, (1 << 255) - 1] + [rng.randrange(OF.R) for _ in range(8)]
    for c in (4, 5, 6):
        digs = np.asarray(M.window_digits_signed(CV.fr_to_dev(scs), c))
        assert digs.shape[0] == (256 + c - 1) // c
        for i, s in enumerate(scs):
            total = 0
            for j in range(digs.shape[0]):
                d = int(digs[j, i])
                mag, sign = d & 0x7FFF, d >> 15
                assert mag <= 1 << (c - 1)
                total += (-mag if sign else mag) << (c * j)
            assert total == s % OF.R, (c, i)  # fr_to_dev reduces mod r
