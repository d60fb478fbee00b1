"""Device group ops (complete projective formulas) vs the curve oracle.

Mirrors the reference's group_test (/root/reference/src/tests.rs:28-68):
group laws, scalar-mul agreement, identity handling — plus the edge cases
complete formulas must nail: P+P through `add`, P+(-P), identity operands.
"""

import random

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # batched group-law sweeps (minutes)

from ark_blst_tpu.oracle import curve as OC
from ark_blst_tpu.oracle import field as OF
from ark_blst_tpu.ops import convert as CV
from ark_blst_tpu.curves import group as G

RNG = random.Random(0x61)

CASES = [
    ("g1", G.G1, OC.FP_OPS, OF.G1_GEN, CV.g1_to_dev, CV.g1_from_dev),
    ("g2", G.G2, OC.FP2_OPS, OF.G2_GEN, CV.g2_to_dev, CV.g2_from_dev),
]


def rand_pts(ops, gen, n):
    return [OC.scalar_mul(ops, gen, RNG.randrange(OF.R)) for _ in range(n)]


@pytest.mark.parametrize("name,curve,ops,gen,to_dev,from_dev", CASES)
def test_add_double_edge_cases(name, curve, ops, gen, to_dev, from_dev):
    ps = rand_pts(ops, gen, 4)
    qs = rand_pts(ops, gen, 4)
    # edge cases: identity+P, P+identity, P+P (doubling via add), P+(-P)
    ps = ps + [None, ps[0], ps[1], ps[2]]
    qs = qs + [qs[0], None, ps[1], OC.neg(ops, ps[2])]
    dp, dq = to_dev(ps), to_dev(qs)
    got_add = from_dev(curve.add(dp, dq))
    exp_add = [OC.add(ops, p, q) for p, q in zip(ps, qs)]
    assert got_add == exp_add

    got_dbl = from_dev(curve.double(dp))
    exp_dbl = [OC.double(ops, p) for p in ps]
    assert got_dbl == exp_dbl

    got_neg = from_dev(curve.neg(dp))
    assert got_neg == [OC.neg(ops, p) for p in ps]


@pytest.mark.parametrize("name,curve,ops,gen,to_dev,from_dev", CASES)
def test_eq_and_affine(name, curve, ops, gen, to_dev, from_dev):
    ps = rand_pts(ops, gen, 3) + [None]
    dp = to_dev(ps)
    # doubling then eq against itself in a different projective scale
    d1 = curve.add(dp, dp)
    d2 = curve.double(dp)
    assert bool(np.all(np.asarray(curve.eq(d1, d2))))
    # to_affine round trip
    x, y, inf = curve.to_affine(dp)
    back = curve.from_affine(x, y, inf)
    assert from_dev(back) == ps
    assert list(np.asarray(curve.is_identity(dp))) == [p is None for p in ps]


@pytest.mark.parametrize("name,curve,ops,gen,to_dev,from_dev", CASES)
def test_scalar_mul(name, curve, ops, gen, to_dev, from_dev):
    ps = rand_pts(ops, gen, 2) + [gen, None]
    ks = [RNG.randrange(OF.R), 0, 1, OF.R - 1]
    dp = to_dev(ps)
    dk = CV.fr_to_dev(ks)
    got = from_dev(curve.scalar_mul(dp, dk))
    exp = [OC.scalar_mul(ops, p, k) for p, k in zip(ps, ks)]
    assert got == exp


def test_batch_inv_and_to_affine():
    """Montgomery batch inversion (normalize_batch analog,
    /root/reference/src/g1.rs:537-543): one inversion per batch, zeros map
    to zero; to_affine round-trips incl. identity, odd batch sizes."""
    import numpy as np

    G1, G2 = G.G1, G.G2
    rng = random.Random(21)
    for curve, ops, gen, mul in (
        (G1, OC.FP_OPS, OF.G1_GEN, OC.g1_mul),
        (G2, OC.FP2_OPS, OF.G2_GEN, OC.g2_mul),
    ):
        n = 5  # odd: exercises padding
        vals = [rng.randrange(1, OF.P) for _ in range(n)]
        vals[2] = 0
        if curve is G1:
            dev = CV.fp_to_dev(vals)
            inv = curve.batch_inv(dev)
            got = CV.fp_from_dev(inv)
            exp = [0 if v == 0 else pow(v, -1, OF.P) for v in vals]
            assert got == exp
        pts = [mul(gen, rng.randrange(1, OF.R)) for _ in range(n)]
        pts[1] = None
        dev_pts = (CV.g1_to_dev if curve is G1 else CV.g2_to_dev)(pts)
        # scale Z to make projective coords nontrivial
        x, y, z = dev_pts
        xa, ya, inf = curve.to_affine((x, y, z))
        inf = np.asarray(inf)
        back = []
        if curve is G1:
            xs, ys = CV.fp_from_dev(xa), CV.fp_from_dev(ya)
        else:
            xs, ys = CV.fp2_from_dev(xa), CV.fp2_from_dev(ya)
        for i in range(n):
            back.append(None if inf[i] else (xs[i], ys[i]))
        assert back == pts
