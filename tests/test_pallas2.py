"""v2 lazy-kernel MSM: interpret-mode execution vs the host oracle.

Full-pipeline coverage on CPU (ingest -> kernel -> lazy epilogue -> strict
conversion) with truncated window schedules to keep interpret-mode runtime
sane; the untruncated path runs on hardware via tests/test_tpu_lane.py.
"""

import random

import pytest

pytestmark = pytest.mark.slow  # full interpret-mode v2 pipeline (~8 min on CPU)

from ark_blst_tpu.curves import msm_pallas2 as MP2
from ark_blst_tpu.curves.group import G1, G2
from ark_blst_tpu.ops import convert as CV
from ark_blst_tpu.oracle import curve as OC
from ark_blst_tpu.oracle import field as OF

rng = random.Random(777)


@pytest.fixture(autouse=True)
def _interpret():
    MP2.INTERPRET = True
    yield
    MP2.INTERPRET = False


def test_msm2_g1_small_scalars_vs_oracle():
    n = 50
    pts = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(n)]
    scs = [rng.randrange(1 << 8) for _ in range(n)]
    # identity point + zero scalar edge cases (blst's failure case,
    # /root/reference/src/g1.rs:682-689)
    pts += [None, pts[0]]
    scs += [123, 0]
    expected = OC.msm(OC.FP_OPS, pts, scs)
    out = MP2.msm_pallas2(
        CV.g1_to_dev(pts), CV.fr_to_dev(scs), curve=G1, c=4, max_windows=3
    )
    assert CV.g1_from_dev(out) == [expected]


def test_msm2_g2_small_scalars_vs_oracle():
    n = 12
    pts = [OC.g2_mul(OF.G2_GEN, rng.randrange(1, OF.R)) for _ in range(n)]
    scs = [rng.randrange(1 << 8) for _ in range(n)]
    pts += [None]
    scs += [77]
    expected = OC.msm(OC.FP2_OPS, pts, scs)
    out = MP2.msm_pallas2(
        CV.g2_to_dev(pts), CV.fr_to_dev(scs), curve=G2, c=4, max_windows=3
    )
    assert CV.g2_from_dev(out) == [expected]


def test_plan_chunk2_and_empty():
    import jax.numpy as jnp

    assert MP2.plan_chunk2(MP2.KC2_G1, 7) % MP2.TILE == 0
    assert MP2.plan_chunk2(MP2.KC2_G2, 6) % MP2.TILE == 0
    empty_pts = tuple(jnp.zeros((24, 0), jnp.uint32) for _ in range(3))
    empty_scs = jnp.zeros((16, 0), jnp.uint32)
    out = MP2.msm_pallas2(empty_pts, empty_scs, curve=G1)
    assert CV.g1_from_dev(out) == [None]
