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


def _fake_v2_stages(monkeypatch, calls):
    """Linear fake of the v2 chunk stages (sums of scalar limb 0) so the
    chunk slicing/accumulation/abort logic is testable without the kernel."""
    import jax.numpy as jnp

    from ark_blst_tpu.curves import msm_pallas2 as MP2

    def fake_ws(points, scalars, curve, c, max_windows=None):
        calls.append(scalars.shape)
        return jnp.sum(scalars[0].astype(jnp.uint64))

    def fake_add(t, w, kc=None):
        return t + w

    fake_add.__wrapped__ = fake_add
    monkeypatch.setattr(MP2, "_window_sums2", fake_ws)
    monkeypatch.setattr(MP2, "_add_wsums2", fake_add)
    monkeypatch.setattr(MP2, "_finish_any", lambda t, kc, c: t)
    monkeypatch.setattr(MP2, "_unstack_strict", lambda o, kc: o)


def test_v2_chunked_slicing_and_accumulation(monkeypatch):
    import jax.numpy as jnp

    from ark_blst_tpu.curves import msm_pallas2 as MP2
    from ark_blst_tpu.curves.group import G1 as G1OPS

    calls = []
    _fake_v2_stages(monkeypatch, calls)
    n = 3 * MP2.TILE + 5  # pads to 4 chunks of TILE
    pts = G1OPS.identity((n,))
    scs = jnp.zeros((16, n), jnp.uint32).at[0].set(
        jnp.arange(n, dtype=jnp.uint32)
    )
    out = MP2.msm_pallas2(pts, scs, curve=G1OPS, c=6, chunk=MP2.TILE)
    assert len(calls) == 4 and all(s == (16, MP2.TILE) for s in calls)
    assert int(out) == n * (n - 1) // 2  # padding contributed zeros


def test_v2_chunked_maybe_abort(monkeypatch):
    import jax.numpy as jnp
    import pytest as _pytest

    from ark_blst_tpu.curves import msm_pallas2 as MP2
    from ark_blst_tpu.curves.group import G1 as G1OPS
    from ark_blst_tpu.curves.msm import MsmAborted

    calls = []
    _fake_v2_stages(monkeypatch, calls)
    n = 4 * MP2.TILE
    pts = G1OPS.identity((n,))
    scs = jnp.zeros((16, n), jnp.uint32)
    fired = iter([False, False, True])
    with _pytest.raises(MsmAborted):
        MP2.msm_pallas2(
            pts, scs, curve=G1OPS, c=6, chunk=MP2.TILE,
            maybe_abort=lambda: next(fired),
        )
    assert len(calls) == 2  # aborted before the third dispatch
