"""Pallas-resident lazy radix-13 Montgomery multiply (TPU fast path).

XLA does not fuse the ~3.5K-primitive lazy mont_mul graphs: measured at the
XLA level the multiply runs 13-20x above its compute bound (every primitive
round-trips HBM — scripts/tpu_lazymul_probe.py). Inside a Pallas kernel the
digit blocks stay VMEM-resident and the multiply is compute-bound, like the
strict engine's kernel (ops/pallas_field.py) but on the ~6x cheaper lazy
algebra.

One kernel shape serves every caller: stacked (ELEM, M, 128) int32 operands
(M any multiple of 8 — batched tower products concatenate along the M axis),
blocked (ELEM, 8, 128) through a 1-D grid. Plays the role of blst's
assembly multiply (/root/reference/src/fp.rs:482-491) for the XLA-level
pipelines (MSM prepare, pairing tower).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lazy13 as LZ

INTERPRET = False  # test hook

_BLOCK_S = 8


def _mul_kernel(a_ref, b_ref, o_ref):
    a = [a_ref[i] for i in range(LZ.ELEM)]
    b = [b_ref[i] for i in range(LZ.ELEM)]
    out = LZ.mont_mul(a, b)
    o_ref[:] = jnp.stack(out)


@jax.jit
def mont_mul_stacked(a, b):
    """(ELEM, M, 128) int32 x2 -> (ELEM, M, 128): elementwise lazy Montgomery
    product a*b/R13. Operands must satisfy the mul_wide_f digit-bound
    contract (mul-ready x mul-ready, or mul-ready x canonical)."""
    S = a.shape[1]
    assert S % _BLOCK_S == 0, f"batch rows {S} not a multiple of {_BLOCK_S}"
    spec = pl.BlockSpec(
        (LZ.ELEM, _BLOCK_S, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
        grid=(S // _BLOCK_S,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=INTERPRET,
    )(a, b)


_FP12_IDX = [(i, j, k) for i in range(2) for j in range(3) for k in range(2)]


def _pack12(comps):
    it = iter(comps)
    return tuple(
        tuple((next(it), next(it)) for _ in range(3)) for _ in range(2)
    )


def _cyc_sqr_kernel(x_ref, o_ref):
    from . import tower_lazy as TL

    a = _pack12([x_ref[c] for c in range(12)])
    prev = TL._IN_KERNEL
    TL._IN_KERNEL = True  # trace-time: route muls to the raw digit lists
    try:
        out = TL._cyc_sqr_core(a)
    finally:
        TL._IN_KERNEL = prev
    o_ref[:] = jnp.stack([out[i][j][k] for i, j, k in _FP12_IDX])


@jax.jit
def cyc_sqr_stacked(x):
    """Fused fp12 cyclotomic square: x is the (12, ELEM, S, 128) int32
    stack of the element's fp components (lexicographic (i, j, k) order).
    One kernel runs contraction + Granger-Scott (18 base muls) + the
    3t±2z recombination with every intermediate VMEM-resident; at XLA
    level the same square is ~40 HBM-round-tripping glue ops around the
    muls. Digit-bound contract and output representation are identical to
    tower_lazy._cyc_sqr_core (differentially tested)."""
    S = x.shape[2]
    assert S % _BLOCK_S == 0, f"batch rows {S} not a multiple of {_BLOCK_S}"
    spec = pl.BlockSpec(
        (12, LZ.ELEM, _BLOCK_S, 128),
        lambda i: (0, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _cyc_sqr_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        grid=(S // _BLOCK_S,),
        in_specs=[spec],
        out_specs=spec,
        interpret=INTERPRET,
    )(x)


def cyc_sqr_fp12(a):
    """Tower-tuple API over cyc_sqr_stacked."""
    x = jnp.stack([a[i][j][k] for i, j, k in _FP12_IDX])
    out = cyc_sqr_stacked(x)
    return _pack12([out[c] for c in range(12)])


def mont_mul_elem(a, b):
    """Digit-list API over mont_mul_stacked: elements with (S, 128)-shaped
    digit arrays, S a multiple of 8. Falls back to the XLA-level multiply
    for shapes the kernel cannot block."""
    sh = a[0].shape
    if len(sh) == 2 and sh[0] % _BLOCK_S == 0 and sh[1] == 128:
        out = mont_mul_stacked(jnp.stack(a), jnp.stack(b))
        return [out[i] for i in range(LZ.ELEM)]
    return LZ.mont_mul(a, b)
