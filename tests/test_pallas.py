"""Pallas-path regression tests.

Round 1 shipped a TPU bench crash (BENCH_r01.json rc=1) because no test ever
exercised the Pallas backend: `mul_many`/`_block_call` flattened operands
before broadcasting, so the MSM bucket-accumulation group add — bucket batch
(lanes, W, 1) plus point batch (lanes, 1, 1) — produced un-broadcastable
flats. Coverage here is two-tier:

* interpret-mode EXECUTION of the field kernels on the mismatched-broadcast
  shapes (values checked against the host oracle);
* TRACE-level shape checks (jax.make_jaxpr, no execution) for the composite
  group-add/bucket pipeline shapes — full interpret-mode execution of group
  ops is prohibitively slow on CPU (hundreds of interpreted kernel calls),
  and the bug class lives in shape handling, which tracing exercises fully.

The real-hardware execution lane is tests/test_tpu_lane.py
(ARK_TPU_TESTS=1).
"""

import random

import jax
import jax.numpy as jnp
import pytest

from ark_blst_tpu.curves import msm as M
from ark_blst_tpu.curves.group import G1
from ark_blst_tpu.ops import convert as CV
from ark_blst_tpu.ops import dispatch as D
from ark_blst_tpu.ops import pallas_field as PF
from ark_blst_tpu.ops.limbs import FP
from ark_blst_tpu.oracle import curve as OC
from ark_blst_tpu.oracle import field as OF


from ark_blst_tpu.ops.limbs import FieldSpec, ints_to_limbs, limbs_to_ints

# Tiny 2-limb field for interpret-mode EXECUTION tests: the shape/broadcast
# logic under test is limb-count agnostic, and interpret-executing the full
# 24-limb Fp body takes minutes per call (vs seconds here). Fp-width
# correctness is covered by tests/test_fieldops.py and the TPU lane.
TSPEC = FieldSpec("tiny", (1 << 30) - 35, 2)  # 30-bit prime 2^30-35


@pytest.fixture(autouse=True)
def _pallas_interpret():
    PF.INTERPRET = True
    D.set_backend("pallas")
    yield
    D.set_backend(None)
    PF.INTERPRET = False


def _rand_t(rng, n):
    return [rng.randrange(TSPEC.modulus) for _ in range(n)]


def _dev_t(vals, batch_shape):
    mont = [v * TSPEC.mont_r % TSPEC.modulus for v in vals]
    arr = jnp.asarray(ints_to_limbs(mont, TSPEC.num_limbs).T)
    return arr.reshape((TSPEC.num_limbs,) + batch_shape)


def _host_t(arr):
    rinv = pow(TSPEC.mont_r, -1, TSPEC.modulus)
    import numpy as np

    vals = limbs_to_ints(np.asarray(arr.reshape(TSPEC.num_limbs, -1)).T)
    return [v * rinv % TSPEC.modulus for v in vals]


def test_mont_mul_mismatched_batch_shapes():
    """The exact round-1 failure shape: (L, lanes, W, 1) * (L, lanes, 1, 1)."""
    rng = random.Random(0)
    lanes, W = 2, 3
    a_vals = _rand_t(rng, lanes * W)
    b_vals = _rand_t(rng, lanes)
    a = _dev_t(a_vals, (lanes, W, 1))
    b = _dev_t(b_vals, (lanes, 1, 1))
    out = PF.mont_mul(a, b, TSPEC)
    assert out.shape == (TSPEC.num_limbs, lanes, W, 1)
    exp = [
        a_vals[l * W + w] * b_vals[l] % TSPEC.modulus
        for l in range(lanes)
        for w in range(W)
    ]
    assert _host_t(out) == exp


def test_add_sub_neg_mismatched_batch_shapes():
    rng = random.Random(1)
    a_vals = _rand_t(rng, 4)
    b_vals = _rand_t(rng, 2)
    a = _dev_t(a_vals, (2, 2))
    b = _dev_t(b_vals, (2, 1))
    add = _host_t(PF.add(a, b, TSPEC))
    sub = _host_t(PF.sub(a, b, TSPEC))
    p = TSPEC.modulus
    exp_add = [(a_vals[2 * i + j] + b_vals[i]) % p for i in range(2) for j in range(2)]
    exp_sub = [(a_vals[2 * i + j] - b_vals[i]) % p for i in range(2) for j in range(2)]
    assert add == exp_add and sub == exp_sub


def test_mul_many_mixed_shapes():
    """Pairs with different (and internally mismatched) batch shapes in one
    fused launch — the tower/MSM usage pattern."""
    rng = random.Random(2)
    a1 = _rand_t(rng, 6)
    b1 = _rand_t(rng, 2)
    a2 = _rand_t(rng, 3)
    b2 = _rand_t(rng, 3)
    pairs = [
        (_dev_t(a1, (2, 3, 1)), _dev_t(b1, (2, 1, 1))),
        (_dev_t(a2, (3,)), _dev_t(b2, (3,))),
    ]
    out = PF.mul_many(pairs, TSPEC)
    assert out[0].shape == (TSPEC.num_limbs, 2, 3, 1)
    assert out[1].shape == (TSPEC.num_limbs, 3)
    p = TSPEC.modulus
    assert _host_t(out[0]) == [
        a1[3 * i + j] * b1[i] % p for i in range(2) for j in range(3)
    ]
    assert _host_t(out[1]) == [x * y % p for x, y in zip(a2, b2)]


def test_group_add_bucket_shapes_trace():
    """Trace (no execution) of the complete group add on bucket-vs-point
    broadcast shapes through the Pallas backend — the composite shape path
    that crashed the round-1 bench."""
    PF.INTERPRET = False  # tracing only; interpret flag irrelevant
    lanes, W = 128, 32
    L = FP.num_limbs
    bk = tuple(
        jax.ShapeDtypeStruct((L, lanes, W, 1), jnp.uint32) for _ in range(3)
    )
    pt = tuple(
        jax.ShapeDtypeStruct((L, lanes, 1, 1), jnp.uint32) for _ in range(3)
    )
    jaxpr = jax.make_jaxpr(G1.add)(bk, pt)
    out_shapes = [v.aval.shape for v in jaxpr.jaxpr.outvars]
    assert out_shapes == [(L, lanes, W, 1)] * 3


def test_bucket_accumulate_shapes_trace():
    """Trace of the full _bucket_accumulate (scan body incl. gather/add/
    scatter) at real bench shapes on the Pallas backend."""
    PF.INTERPRET = False
    n, lanes, c = 1024, 128, 8
    L = FP.num_limbs
    W = 32
    points = tuple(
        jax.ShapeDtypeStruct((L, n), jnp.uint32) for _ in range(3)
    )
    digits = jax.ShapeDtypeStruct((W, n), jnp.uint32)
    jaxpr = jax.make_jaxpr(
        lambda p, d: M._bucket_accumulate(G1, p, d, lanes, c, fuse=True)
    )(points, digits)
    out_shapes = [v.aval.shape for v in jaxpr.jaxpr.outvars]
    assert out_shapes == [(L, lanes, W, 1 << c)] * 3


# --- chunked driver (msm_pallas_chunked) ------------------------------------
#
# The chunk loop's wiring (padding, fixed-shape slicing, window-sum
# accumulation, cancellation) is tested here with the kernel stage replaced
# by a cheap linear fake; numeric chunked-vs-single equality runs on
# hardware via tests/test_tpu_lane.py::test_msm_pallas2_chunked_equals_single.
# `plan_chunk` is pure logic.
