"""Real-hardware test lane: runs ONLY with ARK_TPU_TESTS=1 on a TPU backend.

`pytest tests/` defaults to the virtual CPU mesh (conftest.py); this module
is the opt-in lane that executes the Pallas kernels on the attached chip —
the coverage whose absence caused round 1's bench crash. Kept small: the
compile of the fused MSM program is minutes on first run (then cached).
"""

import os
import random

import pytest

if os.environ.get("ARK_TPU_TESTS", "0") != "1":
    pytest.skip("TPU lane disabled (set ARK_TPU_TESTS=1)", allow_module_level=True)

import jax

if jax.default_backend() != "tpu":
    pytest.skip("no TPU backend attached", allow_module_level=True)

from ark_blst_tpu.curves import msm_pallas as MP
from ark_blst_tpu.curves.group import G1
from ark_blst_tpu.oracle import curve as OC
from ark_blst_tpu.oracle import field as OF
from ark_blst_tpu.ops import convert as CV


def test_msm_pallas_kernel_oracle():
    rng = random.Random(11)
    n = 1 << 10
    base = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(16)]
    pts = [base[i % 16] for i in range(n)]
    pts[7] = None
    scs = [rng.randrange(OF.R) for _ in range(n)]
    out = MP.msm_pallas(
        jax.device_put(CV.g1_to_dev(pts)),
        jax.device_put(CV.fr_to_dev(scs)),
        curve=G1,
        c=5,
    )
    assert CV.g1_from_dev(out) == [OC.msm(OC.FP_OPS, pts, scs)]


def test_msm_pallas2_g1_oracle():
    """v2 lazy kernel, full window schedule, vs oracle (2^10, identities)."""
    from ark_blst_tpu.curves import msm_pallas2 as MP2

    rng = random.Random(21)
    n = 1 << 10
    base = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(16)]
    pts = [base[i % 16] for i in range(n)]
    pts[3] = None
    scs = [rng.randrange(OF.R) for _ in range(n)]
    scs[5] = 0
    out = MP2.msm_pallas2(
        jax.device_put(CV.g1_to_dev(pts)),
        jax.device_put(CV.fr_to_dev(scs)),
        curve=G1,
    )
    assert CV.g1_from_dev(out) == [OC.msm(OC.FP_OPS, pts, scs)]


def test_msm_pallas2_g2_oracle():
    """v2 lazy kernel on G2 (Fp2 coords) vs oracle."""
    from ark_blst_tpu.curves import msm_pallas2 as MP2
    from ark_blst_tpu.curves.group import G2

    rng = random.Random(22)
    n = 1 << 10
    base = [OC.g2_mul(OF.G2_GEN, rng.randrange(1, OF.R)) for _ in range(8)]
    pts = [base[i % 8] for i in range(n)]
    pts[1] = None
    scs = [rng.randrange(OF.R) for _ in range(n)]
    out = MP2.msm_pallas2(
        jax.device_put(CV.g2_to_dev(pts)),
        jax.device_put(CV.fr_to_dev(scs)),
        curve=G2,
    )
    assert CV.g2_from_dev(out) == [OC.msm(OC.FP2_OPS, pts, scs)]


def test_msm_pallas2_chunked_equals_single():
    """Numeric equality of the multi-chunk accumulation vs one-shot — the
    coverage ADVICE round 2 flagged as monkeypatch-only."""
    from ark_blst_tpu.curves import msm_pallas2 as MP2

    rng = random.Random(23)
    n = 1 << 12
    base = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(16)]
    pts = [base[i % 16] for i in range(n)]
    scs = [rng.randrange(OF.R) for _ in range(n)]
    dp = jax.device_put(CV.g1_to_dev(pts))
    ds = jax.device_put(CV.fr_to_dev(scs))
    one = MP2.msm_pallas2(dp, ds, curve=G1, chunk=1 << 12)
    many = MP2.msm_pallas2(dp, ds, curve=G1, chunk=1 << 10)
    assert CV.g1_from_dev(one) == CV.g1_from_dev(many)


def test_device_pairing_oracle():
    """Fused batched pairing on hardware vs the host oracle."""
    import jax as _jax

    from ark_blst_tpu.curves import pairing as DP
    from ark_blst_tpu.oracle import pairing as OP

    rng = random.Random(24)
    n = 128
    ps = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(4)]
    qs = [OC.g2_mul(OF.G2_GEN, rng.randrange(1, OF.R)) for _ in range(4)]
    ps = [ps[i % 4] for i in range(n)]
    qs = [qs[(i + 1) % 4] for i in range(n)]
    pdev = (CV.fp_to_dev([p[0] for p in ps]), CV.fp_to_dev([p[1] for p in ps]))
    qdev = (CV.fp2_to_dev([q[0] for q in qs]), CV.fp2_to_dev([q[1] for q in qs]))
    out = _jax.jit(lambda p, q: DP.pairing(p, q, fuse=True))(pdev, qdev)
    got = CV.fp12_from_dev(out)
    assert got[0] == OP.pairing(ps[0], qs[0])
    assert got[5] == OP.pairing(ps[5], qs[5])
