"""ark-blst-tpu: a TPU-native BLS12-381 framework.

Public API mirrors the reference crate's exports
(/root/reference/src/lib.rs:12-16): `Gt, G1Affine, G1Projective, G2Affine,
G2Projective, Bls12, Scalar` plus the `fp` tower types. Layering:

  oracle/   L0  trusted pure-Python reference + serialization formats
  ops/      L1-L2  limb engine (Pallas/JAX) + Fp2/Fp6/Fp12 tower
  curves/   L3-L5  group law, Pippenger MSM (single- & multi-chip), pairing
  fields/groups/bls12  L6  arkworks-equivalent value classes (this surface)
"""

from .fields import Fp, Fp2, Fp6, Fp12, Gt, Scalar, field_cast
from .groups import G1Affine, G1Projective, G2Affine, G2Prepared, G2Projective
from .bls12 import Bls12, MillerLoopOutput

__all__ = [
    "Fp",
    "Fp2",
    "Fp6",
    "Fp12",
    "Gt",
    "Scalar",
    "field_cast",
    "G1Affine",
    "G1Projective",
    "G2Affine",
    "G2Projective",
    "G2Prepared",
    "Bls12",
    "MillerLoopOutput",
]
