"""Backend dispatch for batched field primitives.

TPU -> Pallas kernels (pallas_field); CPU/other -> the fused-jnp list engine
(fieldops). The choice is made at trace time from `jax.default_backend()`
and can be forced via `set_backend("pallas"|"jnp")` (tests use jnp on the
virtual CPU mesh; benches use pallas on real TPU).
"""

from __future__ import annotations

import jax

from . import fieldops as FO
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


def fp_mul(a, b, spec: FieldSpec = FP):
    return PF.mont_mul(a, b, spec) if use_pallas() else FO.mul(a, b, spec)


def fp_sqr(a, spec: FieldSpec = FP):
    return fp_mul(a, a, spec)


def fp_add(a, b, spec: FieldSpec = FP):
    return PF.add(a, b, spec) if use_pallas() else FO.add(a, b, spec)


def fp_sub(a, b, spec: FieldSpec = FP):
    return PF.sub(a, b, spec) if use_pallas() else FO.sub(a, b, spec)


def fp_neg(a, spec: FieldSpec = FP):
    return PF.neg(a, spec) if use_pallas() else FO.neg(a, spec)


def fp_mul_many(pairs, spec: FieldSpec = FP):
    """[(a, b), ...] -> [a*b, ...] with one fused launch on TPU."""
    if use_pallas():
        return PF.mul_many(pairs, spec)
    return [FO.mul(a, b, spec) for a, b in pairs]
