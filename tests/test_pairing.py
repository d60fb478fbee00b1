"""Device pairing pipeline tests (curves/pairing.py) — differential vs the
host oracle, mirroring the reference's pairing test surface
(/root/reference/src/pairing.rs:91-101) plus identity-pair semantics
(src/pairing.rs:58-60).

Runs the eager (fuse=False) path on the CPU backend: each primitive is a
small cached jit, so compile stays tolerable (the fused lax.scan path is
exercised on real hardware via scripts/tpu_pairing_check.py and the TPU
lane — compiling it on XLA:CPU takes minutes by design, see
curves/pairing.py docstring).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full pairing towers on CPU (minutes)

from ark_blst_tpu.curves import pairing as DP
from ark_blst_tpu.oracle import curve as OC
from ark_blst_tpu.oracle import field as OF
from ark_blst_tpu.oracle import pairing as OP
from ark_blst_tpu.ops import convert as CV

RNG = random.Random(31)
P1 = OC.g1_mul(OF.G1_GEN, RNG.randrange(1, OF.R))
P2 = OC.g1_mul(OF.G1_GEN, RNG.randrange(1, OF.R))
Q1 = OC.g2_mul(OF.G2_GEN, RNG.randrange(1, OF.R))
Q2 = OC.g2_mul(OF.G2_GEN, RNG.randrange(1, OF.R))


def _p_dev(pts):
    return (CV.fp_to_dev([p[0] for p in pts]), CV.fp_to_dev([p[1] for p in pts]))


def _q_dev(qs):
    return (CV.fp2_to_dev([q[0] for q in qs]), CV.fp2_to_dev([q[1] for q in qs]))


def test_prepare_g2_matches_oracle():
    """Line-coefficient schedule == oracle G2Prepared (68 triples), batch 2."""
    coeffs = DP.prepare_g2(_q_dev([Q1, Q2]), fuse=False)
    exp1 = OP.prepare_g2(Q1)
    exp2 = OP.prepare_g2(Q2)
    assert len(exp1) == DP.NUM_EVENTS == 68
    for i in range(DP.NUM_EVENTS):
        trip = jax.tree.map(lambda x: x[i], coeffs)
        got = [CV.fp2_from_dev(c) for c in trip]  # 3 components, batch 2
        for comp in range(3):
            assert got[comp][0] == exp1[i][comp], (i, comp)
            assert got[comp][1] == exp2[i][comp], (i, comp)


def test_miller_loop_matches_oracle_batch():
    coeffs = DP.prepare_g2(_q_dev([Q1, Q2]), fuse=False)
    f = DP.miller_loop(_p_dev([P1, P2]), coeffs, fuse=False)
    got = CV.fp12_from_dev(f)
    assert got[0] == OP.miller_loop(P1, Q1)
    assert got[1] == OP.miller_loop(P2, Q2)


def test_final_exp_matches_oracle():
    rng = random.Random(5)
    vals = [
        OP.miller_loop(P1, Q1),
        OP.miller_loop(P2, Q2),
    ]
    out = DP.final_exp(CV.fp12_to_dev(vals), fuse=False)
    got = CV.fp12_from_dev(out)
    assert got[0] == OP.final_exp(vals[0])
    assert got[1] == OP.final_exp(vals[1])


def test_pairing_bilinearity_device():
    """e(aP, Q) == e(P, aQ) through the device pipeline (mirror of
    /root/reference/src/pairing.rs:91-101)."""
    a = random.Random(9).randrange(1, OF.R)
    left = DP.pairing(_p_dev([OC.g1_mul(OF.G1_GEN, a)]), _q_dev([OF.G2_GEN]), fuse=False)
    right = DP.pairing(_p_dev([OF.G1_GEN]), _q_dev([OC.g2_mul(OF.G2_GEN, a)]), fuse=False)
    gl = CV.fp12_from_dev(left)
    gr = CV.fp12_from_dev(right)
    assert gl == gr
    assert gl[0] == OP.pairing(OC.g1_mul(OF.G1_GEN, a), OF.G2_GEN)


def test_pairing_identity_masks():
    """Pairs containing an identity yield one (src/pairing.rs:58-60): the
    device path substitutes via masks (inputs hold placeholder generators)."""
    p_inf = jnp.asarray(np.array([True, False]))
    q_inf = jnp.asarray(np.array([False, False]))
    out = DP.pairing(
        _p_dev([OF.G1_GEN, P1]), _q_dev([Q1, Q2]),
        p_inf=p_inf, q_inf=q_inf, fuse=False,
    )
    got = CV.fp12_from_dev(out)
    assert got[0] == OF.FP12_ONE
    assert got[1] == OP.pairing(P1, Q2)


def test_multi_miller_loop_product():
    """Product fold + identity skip == oracle multi_miller_loop."""
    p_inf = jnp.asarray(np.array([False, True, False]))
    q_inf = jnp.asarray(np.array([False, False, False]))
    out = DP.multi_miller_loop(
        _p_dev([P1, OF.G1_GEN, P2]), _q_dev([Q1, Q2, Q2]),
        p_inf=p_inf, q_inf=q_inf, fuse=False,
    )
    got = CV.fp12_from_dev(out)
    expected = OP.multi_miller_loop([(P1, Q1), (None, Q2), (P2, Q2)])
    assert got == [expected]
