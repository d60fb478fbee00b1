"""Pallas TPU kernels for the hot field ops.

The list-based limb engine in `fieldops.py` is pure elementwise dataflow, so
the same Python code traces inside a Pallas kernel, where all ~1500 limb
products and carry chains run on VMEM-resident (sublane, lane) tiles — one
HBM read per operand and one write per result, the speed-of-light memory
pattern for these ops. Measured throughput is recorded in PERF.md
(reproduce with `python scripts/tpu_microbench.py fpmul`).

Layout: stacked limb-major (L, N) uint32 arrays are viewed as
(L, N/128, 128) so each limb plane is a stack of full (sublane, lane) tiles.
Wrappers pad the batch to a block multiple and un-pad the result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fieldops as FO
from .limbs import FieldSpec, MASK

DEFAULT_BLOCK_ROWS = 16  # sublane rows of 128 lanes per grid step

# Test hook: when True every pallas_call runs in interpret mode, so the
# Pallas shape/layout logic is exercised on CPU in the test suite (the
# round-1 TPU bench crash was a broadcast bug no CPU test could reach).
INTERPRET = False

_U32 = jnp.uint32


# --- list-level op bodies (shared with fieldops) -----------------------------

def _mul_body(a, b, spec):
    return FO._mont_mul_list(a, b, spec)


def _add_body(a, b, spec):
    t = [x + y for x, y in zip(a, b)]
    return FO._cond_sub_list(FO.normalize_list(t, spec.num_limbs), spec)


def _sub_body(a, b, spec):
    L = spec.num_limbs
    p_l = FO.const_limbs(spec.modulus, L)
    t = [a[k] + (_U32(MASK) - b[k]) + _U32(p_l[k]) for k in range(L)]
    t[0] = t[0] + _U32(1)
    return FO._cond_sub_list(FO.normalize_list(t, L), spec)


def _neg_body(a, spec):
    L = spec.num_limbs
    p_l = FO.const_limbs(spec.modulus, L)
    t = [(_U32(MASK) - a[k]) + _U32(p_l[k]) for k in range(L)]
    t[0] = t[0] + _U32(1)
    return FO._cond_sub_list(FO.normalize_list(t, L), spec)


# --- generic pallas wrappers -------------------------------------------------

def _block_call(body_nargs, body, spec, block_rows, *args):
    """Run `body` (list-level, n-ary) over stacked (L, *batch) operands.

    Operands are broadcast to a common batch shape *before* flattening —
    flattening first destroys axis alignment (round-1 regression: bucket
    (L, lanes, W, 1) + point (L, lanes, 1, 1) group adds crashed the TPU
    bench, BENCH_r01.json)."""
    L = spec.num_limbs
    shape = jnp.broadcast_shapes(*(a.shape for a in args))
    assert shape[0] == L, f"limb axis mismatch: {shape} vs L={L}"
    orig_shape = shape
    flats = [jnp.broadcast_to(a, shape).reshape(L, -1) for a in args]
    n = flats[0].shape[1]
    chunk = 128 * block_rows
    pad = (-n) % chunk
    if pad:
        flats = [jnp.pad(f, ((0, 0), (0, pad))) for f in flats]
    rows = (n + pad) // 128
    views = [f.reshape(L, rows, 128) for f in flats]
    bspec = pl.BlockSpec(
        (L, block_rows, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )

    def kernel(*refs):
        in_refs, o_ref = refs[:-1], refs[-1]
        lists = [[r[i] for i in range(L)] for r in in_refs]
        out = body(*lists, spec)
        for i in range(L):
            o_ref[i] = out[i]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, rows, 128), jnp.uint32),
        grid=(rows // block_rows,),
        in_specs=[bspec] * len(views),
        out_specs=bspec,
        interpret=INTERPRET,
    )(*views)
    out = out.reshape(L, rows * 128)
    if pad:
        out = out[:, :n]
    return out.reshape((L,) + orig_shape[1:]) if orig_shape[1:] else out.reshape(L)


@functools.partial(jax.jit, static_argnames=("spec", "block_rows"))
def mont_mul(a, b, spec: FieldSpec, block_rows: int = DEFAULT_BLOCK_ROWS):
    return _block_call(2, _mul_body, spec, block_rows, a, b)


@functools.partial(jax.jit, static_argnames=("spec", "block_rows"))
def add(a, b, spec: FieldSpec, block_rows: int = DEFAULT_BLOCK_ROWS):
    return _block_call(2, _add_body, spec, block_rows, a, b)


@functools.partial(jax.jit, static_argnames=("spec", "block_rows"))
def sub(a, b, spec: FieldSpec, block_rows: int = DEFAULT_BLOCK_ROWS):
    return _block_call(2, _sub_body, spec, block_rows, a, b)


@functools.partial(jax.jit, static_argnames=("spec", "block_rows"))
def neg(a, spec: FieldSpec, block_rows: int = DEFAULT_BLOCK_ROWS):
    return _block_call(1, _neg_body, spec, block_rows, a)


def mul_many(pairs, spec: FieldSpec):
    """Batch several independent Montgomery products into ONE kernel launch
    by concatenating along the batch axis: [(a, b), ...] -> [a*b, ...].
    Used by tower multiplication (Karatsuba legs) to keep the VPU fed.

    Each pair is broadcast to its own common batch shape first — pairs may
    have mismatched operand shapes (e.g. bucket (L, lanes, W, 1) times point
    (L, lanes, 1, 1) in MSM accumulation)."""
    L = spec.num_limbs
    shapes = [jnp.broadcast_shapes(a.shape, b.shape) for a, b in pairs]
    flat_a = jnp.concatenate(
        [jnp.broadcast_to(a, s).reshape(L, -1) for (a, _), s in zip(pairs, shapes)],
        axis=1,
    )
    flat_b = jnp.concatenate(
        [jnp.broadcast_to(b, s).reshape(L, -1) for (_, b), s in zip(pairs, shapes)],
        axis=1,
    )
    out = mont_mul(flat_a, flat_b, spec)
    res = []
    ofs = 0
    for shp in shapes:
        cnt = 1
        for d in shp[1:]:
            cnt *= d
        res.append(out[:, ofs : ofs + cnt].reshape(shp))
        ofs += cnt
    return res
