"""Backend dispatch for batched field primitives.

Two engines, one calling convention (stacked limb-major (L, *batch) arrays):

* **TPU**: Pallas kernels (pallas_field) — the list-based limb engine runs
  VMEM-resident inside Mosaic; fast and cheap for XLA to compile around
  (each kernel is one custom call).
* **CPU/other**: the array-layout engine (limbs.py) behind a transpose
  adapter. Its graphs are ~10x smaller than the list engine's, which keeps
  XLA:CPU compile times tolerable for the test suite; runtime speed is
  irrelevant there.

Force a backend with `set_backend("pallas"|"jnp")`; default auto-detects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import fieldops as FO
from . import limbs as L
from . import pallas_field as PF
from .limbs import FieldSpec, FP, FR

_FORCED = None


def set_backend(name):
    """Force 'pallas' or 'jnp', or None to auto-detect."""
    global _FORCED
    assert name in (None, "pallas", "jnp")
    _FORCED = name


def use_pallas() -> bool:
    if _FORCED is not None:
        return _FORCED == "pallas"
    return jax.default_backend() == "tpu"


# --- array-engine adapters (CPU path) ---------------------------------------

def _rm(a):  # stacked (L, *batch) -> row-major (*batch, L)
    return jnp.moveaxis(a, 0, -1)


def _st(a):  # row-major -> stacked
    return jnp.moveaxis(a, -1, 0)


@functools.partial(jax.jit, static_argnames=("spec",))
def _arr_mul(a, b, spec):
    return L.mont_mul(a, b, spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def _arr_add(a, b, spec):
    return L.add_mod(a, b, spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def _arr_sub(a, b, spec):
    return L.sub_mod(a, b, spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def _arr_neg(a, spec):
    return L.neg_mod(a, spec)


# --- public primitives -------------------------------------------------------

def fp_mul(a, b, spec: FieldSpec = FP):
    if use_pallas():
        return PF.mont_mul(a, b, spec)
    # symmetric broadcast: either operand may be the larger one
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    return _st(_arr_mul(_rm(a), _rm(b), spec))


def fp_sqr(a, spec: FieldSpec = FP):
    return fp_mul(a, a, spec)


def fp_add(a, b, spec: FieldSpec = FP):
    if use_pallas():
        return PF.add(a, b, spec)
    return _st(_arr_add(_rm(a), _rm(b), spec))


def fp_sub(a, b, spec: FieldSpec = FP):
    if use_pallas():
        return PF.sub(a, b, spec)
    return _st(_arr_sub(_rm(a), _rm(b), spec))


def fp_neg(a, spec: FieldSpec = FP):
    if use_pallas():
        return PF.neg(a, spec)
    return _st(_arr_neg(_rm(a), spec))


def fp_mul_many(pairs, spec: FieldSpec = FP):
    """[(a, b), ...] -> [a*b, ...] with one fused launch on TPU."""
    if use_pallas():
        return PF.mul_many(pairs, spec)
    return [fp_mul(a, b, spec) for a, b in pairs]


def fp_mul_small(a, value: int, spec: FieldSpec = FP):
    """Multiply by a small static integer constant via an add chain."""
    assert value > 0
    r = a
    for bit in bin(value)[3:]:
        r = fp_add(r, r, spec)
        if bit == "1":
            r = fp_add(r, a, spec)
    return r


@functools.partial(jax.jit, static_argnames=("exponent", "spec"))
def fp_pow(a, exponent: int, spec: FieldSpec = FP):
    """a^e (Montgomery in/out), static exponent, backend-dispatched muls."""
    bits = np.array([int(c) for c in bin(exponent)[2:]], dtype=np.int32)
    one = FO.consts(spec.mont_r, a.shape[1:], spec)

    def body(f, bit):
        f = fp_mul(f, f, spec)
        f = FO.select(bit == 1, fp_mul(f, a, spec), f)
        return f, None

    out, _ = lax.scan(body, one, jnp.asarray(bits))
    return out


def fp_inv(a, spec: FieldSpec = FP):
    """Fermat inverse (0 -> 0), batch-parallel."""
    return fp_pow(a, spec.modulus - 2, spec)


def fp_sqrt_candidate(a, spec: FieldSpec = FP):
    """a^((p+1)/4) — the square root when one exists (p = 3 mod 4);
    caller checks candidate^2 == a."""
    return fp_pow(a, (spec.modulus + 1) // 4, spec)
