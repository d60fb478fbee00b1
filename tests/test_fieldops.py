"""Differential tests: device limb engine vs the pure-Python oracle.

Covers both layouts (array-based `limbs` and stacked list-based `fieldops`)
for both fields, against Python bignum arithmetic — the role ark-bls12-381
plays for the reference's field types (/root/reference/src/tests.rs:73-96).
"""

import random

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # dual-engine differential sweeps (minutes)
import jax
import jax.numpy as jnp

from ark_blst_tpu.ops import limbs as L
from ark_blst_tpu.ops import fieldops as FO

RNG = random.Random(0xF00D)
N = 8


def _edge_values(p, n):
    xs = [RNG.randrange(p) for _ in range(n)]
    xs[0], xs[1], xs[2] = 0, 1, p - 1
    return xs


def _stacked(xs, spec):
    return jnp.asarray(L.ints_to_limbs(xs, spec.num_limbs).T)


def _ints(arr):
    return L.limbs_to_ints(np.asarray(arr).T)


@pytest.fixture(scope="module", params=["fr", "fp"])
def spec(request):
    return {"fr": FO.FR, "fp": FO.FP}[request.param]


@pytest.fixture(scope="module")
def data(spec):
    p = spec.modulus
    xs, ys = _edge_values(p, N), _edge_values(p, N)[::-1]
    ax, ay = _stacked(xs, spec), _stacked(ys, spec)

    def run(ax, ay):
        mx = FO.mont_from_int_array(ax, spec)
        my = FO.mont_from_int_array(ay, spec)
        return dict(
            rt=FO.mont_to_int_array(mx, spec),
            add=FO.add(ax, ay, spec),
            sub=FO.sub(ax, ay, spec),
            neg=FO.neg(ax, spec),
            mul=FO.mont_to_int_array(FO.mul(mx, my, spec), spec),
            m3=FO.mul_small(ax, 3, spec),
            m12=FO.mul_small(ax, 12, spec),
            ez=FO.eq(ax, ay),
            sel=FO.select(FO.eq(ax, ax), ax, ay),
        )

    return xs, ys, jax.tree.map(np.asarray, run(ax, ay))


def test_mont_roundtrip(spec, data):
    xs, _, r = data
    assert _ints(r["rt"]) == xs


def test_add_sub_neg(spec, data):
    xs, ys, r = data
    p = spec.modulus
    assert _ints(r["add"]) == [(x + y) % p for x, y in zip(xs, ys)]
    assert _ints(r["sub"]) == [(x - y) % p for x, y in zip(xs, ys)]
    assert _ints(r["neg"]) == [(-x) % p for x in xs]


def test_mul(spec, data):
    xs, ys, r = data
    p = spec.modulus
    assert _ints(r["mul"]) == [x * y % p for x, y in zip(xs, ys)]


def test_mul_small(spec, data):
    xs, _, r = data
    p = spec.modulus
    assert _ints(r["m3"]) == [3 * x % p for x in xs]
    assert _ints(r["m12"]) == [12 * x % p for x in xs]


def test_predicates(spec, data):
    xs, ys, r = data
    assert list(r["ez"]) == [x == y for x, y in zip(xs, ys)]
    assert _ints(r["sel"]) == xs


def test_inv_dispatch():
    from ark_blst_tpu.ops import dispatch as D

    for spec in (FO.FR, FO.FP):
        p = spec.modulus
        xs = _edge_values(p, 8)
        mx = FO.mont_from_int_array(_stacked(xs, spec), spec)
        got = _ints(np.asarray(FO.mont_to_int_array(D.fp_inv(mx, spec), spec)))
        assert got == [pow(x, -1, p) if x else 0 for x in xs]


def test_array_engine_matches_list_engine():
    """limbs.py (array layout) and fieldops.py (stacked layout) agree."""
    spec = FO.FR
    p = spec.modulus
    xs, ys = _edge_values(p, 8), _edge_values(p, 8)[::-1]
    a_arr = jnp.asarray(L.ints_to_limbs(xs, spec.num_limbs))
    b_arr = jnp.asarray(L.ints_to_limbs(ys, spec.num_limbs))

    @jax.jit
    def run_arr(a, b):
        ma, mb = L.to_mont(a, spec), L.to_mont(b, spec)
        return L.from_mont(L.mont_mul(ma, mb, spec), spec)

    got = L.limbs_to_ints(np.asarray(run_arr(a_arr, b_arr)))
    assert got == [x * y % p for x, y in zip(xs, ys)]
