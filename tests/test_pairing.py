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


def test_device_g2_prepared_reuse():
    """prepare once, pair twice: DeviceG2Prepared results must equal the
    unprepared device path and the oracle (strict engine, CPU lane; the
    lazy engine twin runs in the TPU lane)."""
    import random

    from ark_blst_tpu import Bls12, G1Affine, G2Affine

    rng = random.Random(31)
    n = 4
    ps1 = [G1Affine.rand(rng) for _ in range(n)]
    ps2 = [G1Affine.rand(rng) for _ in range(n)]
    qs = [G2Affine.rand(rng) for _ in range(n - 1)] + [G2Affine.zero()]
    prep = Bls12.prepare_g2_batch(qs, fuse=False)
    for ps in (ps1, ps2):
        got = Bls12.pairing_batch(ps, prep, fuse=False)
        want = Bls12.pairing_batch(ps, qs, fuse=False)
        assert got == want
        assert got[0] == Bls12.pairing(ps[0], qs[0])
        assert got[-1].is_one()  # identity q -> one


@pytest.mark.slow
def test_multi_pairing_sharded_matches_unsharded():
    """Sharded multi-pairing product over the virtual mesh vs the same
    computation unsharded (SURVEY §2d's collective use case). The Miller
    schedule is truncated to 4 events and final exp skipped — the
    distribution logic (shard_map, per-device partial products, gather +
    fold) is what this validates; the full schedule's correctness is
    covered by the eager/TPU pairing tests, and a mesh(1) full run lives in
    the TPU lane."""
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ark_blst_tpu import G1Affine, G2Affine
    from ark_blst_tpu.curves import pairing as DP
    from ark_blst_tpu.ops import convert as CV
    from ark_blst_tpu.ops import tower_lazy as TL

    if len(jax.devices()) < 2:
        import pytest as _pytest

        _pytest.skip("needs a multi-device mesh")
    ndev = 4
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:ndev]), ("data",))
    rng = random.Random(33)
    n = 8
    ps = [G1Affine.rand(rng) for _ in range(n - 1)] + [G1Affine.zero()]
    qs = [G2Affine.rand(rng) for _ in range(n)]
    gen1 = G1Affine.generator().p
    pv = [gen1 if p.is_zero() else p.p for p in ps]
    pdev = (CV.fp_to_dev([p[0] for p in pv]), CV.fp_to_dev([p[1] for p in pv]))
    qdev = (
        CV.fp2_to_dev([q.p[0] for q in qs]),
        CV.fp2_to_dev([q.p[1] for q in qs]),
    )
    p_inf = jnp.asarray(np.array([p.is_zero() for p in ps]))
    events = 4
    # sharded: lazy engine, fused (compact scan bodies are the only trace
    # XLA:CPU can compile in reasonable time; same engine the TPU runs)
    out = DP.multi_pairing_sharded(
        pdev, qdev, mesh, p_inf=p_inf, engine="lazy", final=False,
        events=events, fuse=True,
    )
    # unsharded twin: eager truncated lazy miller product, same masking
    coeffs = DP.prepare_g2(qdev, fuse=False, engine="lazy", events=events)
    f = DP.miller_loop(pdev, coeffs, fuse=False, engine="lazy", events=events)
    f = TL.select(p_inf, TL.fp12_one((n,)), f)
    want = DP._egress(TL, DP._fold_mul(TL, f, n))
    assert CV.fp12_from_dev(out) == CV.fp12_from_dev(want)
