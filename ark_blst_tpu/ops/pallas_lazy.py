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


def tower_fused(body, in_dims, n_out):
    """Build a fused tower kernel: `body` maps lists of stacked digit
    components (one list per input, lengths `in_dims`, each component
    (ELEM, S_blk, 128) int32) to a list of `n_out` components, traced with
    tower_lazy._IN_KERNEL set so every field multiply inside is the raw
    digit-list algebra (no nested pallas_call, no concatenate batching).
    Returns apply(*stacked) -> stacked: each input/output is one
    (n, ELEM, S, 128) int32 array (callers stack/unstack at the
    pipeline boundary, or carry the stacked form across iterations).

    This is what makes the pairing pipeline kernel-resident: at XLA level
    each tower op pays its glue (folds, Karatsuba legs, recombinations) as
    HBM round trips around the Pallas base muls; fused, the whole op chain
    keeps every intermediate in VMEM."""
    from . import tower_lazy as TL

    def kernel(*refs):
        o_ref = refs[-1]
        ins = []
        for r, d in zip(refs[:-1], in_dims):
            ins.append([r[c] for c in range(d)])
        prev = TL._IN_KERNEL
        TL._IN_KERNEL = True
        try:
            outs = body(*ins)
        finally:
            TL._IN_KERNEL = prev
        o_ref[:] = jnp.stack(outs)

    def apply(*xs):
        S = xs[0].shape[2]
        assert S % _BLOCK_S == 0, f"batch rows {S} not a multiple of {_BLOCK_S}"

        def spec(n):
            return pl.BlockSpec(
                (n, LZ.ELEM, _BLOCK_S, 128),
                lambda i: (0, 0, i, 0),
                memory_space=pltpu.VMEM,
            )

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n_out, LZ.ELEM) + xs[0].shape[2:], jnp.int32
            ),
            grid=(S // _BLOCK_S,),
            in_specs=[spec(d) for d in in_dims],
            out_specs=spec(n_out),
            interpret=INTERPRET,
        )(*xs)

    return apply


def _pack12(comps):
    it = iter(comps)
    return tuple(
        tuple((next(it), next(it)) for _ in range(3)) for _ in range(2)
    )


def _cyc_sqr_n_kernel(n, x_ref, o_ref):
    from . import tower_lazy as TL

    comps = [x_ref[c] for c in range(12)]
    prev = TL._IN_KERNEL
    TL._IN_KERNEL = True  # trace-time: route muls to the raw digit lists
    try:
        if n == 1:
            out = TL._cyc_sqr_core(_pack12(comps))
            comps = [out[i][j][k] for i, j, k in _FP12_IDX]
        else:
            # n squarings VMEM-resident: the exponent ladder's long runs
            # (9, 32 and 16 squarings between multiplies) never leave the
            # kernel
            def body(_, cs):
                out = TL._cyc_sqr_core(_pack12(cs))
                return [out[i][j][k] for i, j, k in _FP12_IDX]

            comps = jax.lax.fori_loop(0, n, body, comps)
    finally:
        TL._IN_KERNEL = prev
    o_ref[:] = jnp.stack(comps)


@functools.partial(jax.jit, static_argnums=1)
def cyc_sqr_stacked(x, n=1):
    """Fused fp12 cyclotomic square, applied n times: x is the
    (12, ELEM, S, 128) int32 stack of the element's fp components
    (lexicographic (i, j, k) order). One kernel runs [contraction +
    Granger-Scott (18 base muls) + the 3t±2z recombination] x n with every
    intermediate VMEM-resident; at XLA level each square is ~40
    HBM-round-tripping glue ops around the muls. Digit-bound contract and
    output representation are identical to tower_lazy._cyc_sqr_core
    (differentially tested); the contraction at the top of each square
    makes iterated application value-stable (tower_lazy._contract_many)."""
    S = x.shape[2]
    assert S % _BLOCK_S == 0, f"batch rows {S} not a multiple of {_BLOCK_S}"
    spec = pl.BlockSpec(
        (12, LZ.ELEM, _BLOCK_S, 128),
        lambda i: (0, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_cyc_sqr_n_kernel, n),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        grid=(S // _BLOCK_S,),
        in_specs=[spec],
        out_specs=spec,
        interpret=INTERPRET,
    )(x)


def cyc_sqr_fp12(a):
    """Tower-tuple API over cyc_sqr_stacked."""
    x = jnp.stack([a[i][j][k] for i, j, k in _FP12_IDX])
    out = cyc_sqr_stacked(x, 1)
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
