"""Multi-chip v2 MSM (fast kernel inside shard_map) on the virtual CPU mesh.

VERDICT round-2 item #4: the sharded path must run the *fast* kernel, not
the scan pipeline. Exercised here on the 8-device CPU mesh (interpret-mode
kernel), numerics vs the host oracle.
"""

import random

import pytest
import jax
from jax.sharding import Mesh

import numpy as np

from ark_blst_tpu.curves import msm_pallas2 as MP2
from ark_blst_tpu.curves.group import G1
from ark_blst_tpu.ops import convert as CV
from ark_blst_tpu.oracle import curve as OC
from ark_blst_tpu.oracle import field as OF

pytestmark = pytest.mark.slow  # shard_map graph compile takes minutes on CPU

rng = random.Random(31337)


def test_msm_sharded2_matches_oracle():
    MP2.INTERPRET = True
    try:
        n = 20
        pts = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(n)]
        scs = [rng.randrange(1 << 4) for _ in range(n)]
        expected = OC.msm(OC.FP_OPS, pts, scs)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        out = MP2.msm_sharded2(
            CV.g1_to_dev(pts), CV.fr_to_dev(scs), mesh, curve=G1, c=4,
            max_windows=2,
        )
        assert CV.g1_from_dev(out) == [expected]
    finally:
        MP2.INTERPRET = False
