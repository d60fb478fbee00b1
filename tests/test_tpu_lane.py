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
