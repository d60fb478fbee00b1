"""Host-side conversions: oracle (Python-int) values <-> device batches.

Device batches are stacked limb-major Montgomery-form uint32 arrays (see
fieldops.py). All Montgomery conversion happens on host with Python bignums
so these helpers are exact and need no device round-trips.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..oracle import field as OF
from .limbs import FP, FR, ints_to_limbs, limbs_to_ints


def fp_to_dev(values):
    """list of ints in [0,p) -> stacked (L, N) Montgomery array."""
    mont = [v * FP.mont_r % FP.modulus for v in values]
    return jnp.asarray(ints_to_limbs(mont, FP.num_limbs).T)


def fp_from_dev(arr):
    """stacked Montgomery array -> list of ints."""
    rinv = pow(FP.mont_r, -1, FP.modulus)
    return [v * rinv % FP.modulus for v in limbs_to_ints(np.asarray(arr).T)]


def fr_to_dev(values, mont=False):
    """Scalars; MSM wants them plain (not Montgomery) for digit extraction."""
    vs = [v * FR.mont_r % FR.modulus for v in values] if mont else [v % FR.modulus for v in values]
    return jnp.asarray(ints_to_limbs(vs, FR.num_limbs).T)


def fr_from_dev(arr, mont=False):
    vals = limbs_to_ints(np.asarray(arr).T)
    if mont:
        rinv = pow(FR.mont_r, -1, FR.modulus)
        vals = [v * rinv % FR.modulus for v in vals]
    return vals


def fp2_to_dev(values):
    """list of oracle fp2 tuples -> device fp2 batch."""
    return (fp_to_dev([v[0] for v in values]), fp_to_dev([v[1] for v in values]))


def fp2_from_dev(a):
    return list(zip(fp_from_dev(a[0]), fp_from_dev(a[1])))


def fp6_to_dev(values):
    return tuple(fp2_to_dev([v[i] for v in values]) for i in range(3))


def fp6_from_dev(a):
    cs = [fp2_from_dev(a[i]) for i in range(3)]
    return [tuple(c[n] for c in cs) for n in range(len(cs[0]))]


def fp12_to_dev(values):
    return tuple(fp6_to_dev([v[i] for v in values]) for i in range(2))


def fp12_from_dev(a):
    cs = [fp6_from_dev(a[i]) for i in range(2)]
    return [tuple(c[n] for c in cs) for n in range(len(cs[0]))]


# --- curve points ------------------------------------------------------------

def g1_to_dev(points):
    """Oracle affine points (None = identity) -> device projective batch."""
    xs = [0 if p is None else p[0] for p in points]
    ys = [1 if p is None else p[1] for p in points]
    zs = [0 if p is None else 1 for p in points]
    return (fp_to_dev(xs), fp_to_dev(ys), fp_to_dev(zs))


def g1_from_dev(pt):
    """Device projective batch -> oracle affine points (host-side division)."""
    xs, ys, zs = (fp_from_dev(c) for c in pt)
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, OF.P)
            out.append((x * zi % OF.P, y * zi % OF.P))
    return out


def g2_to_dev(points):
    xs = [OF.FP2_ZERO if p is None else p[0] for p in points]
    ys = [OF.FP2_ONE if p is None else p[1] for p in points]
    zs = [OF.FP2_ZERO if p is None else OF.FP2_ONE for p in points]
    return (fp2_to_dev(xs), fp2_to_dev(ys), fp2_to_dev(zs))


def g2_from_dev(pt):
    xs, ys, zs = (fp2_from_dev(c) for c in pt)
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == (0, 0):
            out.append(None)
        else:
            zi = OF.fp2_inv(z)
            out.append((OF.fp2_mul(x, zi), OF.fp2_mul(y, zi)))
    return out
