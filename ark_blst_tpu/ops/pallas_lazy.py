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


def mont_mul_elem(a, b):
    """Digit-list API over mont_mul_stacked: elements with (S, 128)-shaped
    digit arrays, S a multiple of 8. Falls back to the XLA-level multiply
    for shapes the kernel cannot block."""
    sh = a[0].shape
    if len(sh) == 2 and sh[0] % _BLOCK_S == 0 and sh[1] == 128:
        out = mont_mul_stacked(jnp.stack(a), jnp.stack(b))
        return [out[i] for i in range(LZ.ELEM)]
    return LZ.mont_mul(a, b)
