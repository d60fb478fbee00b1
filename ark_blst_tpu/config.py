"""Typed configuration + memory-budgeted MSM planning.

The reference sizes its GPU launches from device memory
(`calc_chunk_size`, /root/reference/src/gpu.rs:64-85) and hardcodes window
heuristics (`MAX_WINDOW_SIZE=10`, work-unit scaling, src/gpu.rs:16-42,
218-223); multi-chunk execution is left as a TODO (src/gpu.rs:238-240).
This module is the TPU-native completion of that component: a typed plan
(window bits `c`, point streams `lanes`) chosen from an explicit HBM budget
and a Pippenger cost model, replacing the reference's compile-time consts
with data.

Cost model (batched complete group adds, see curves/msm.py):
  accumulate: n * W            (W = ceil(256/c) windows)
  lane fold:  (lanes-1) * W * B  (B = 2^c buckets)
  bucket red: 2 * B * W
  horner:     c*W doublings + W adds (sequential tail, negligible)
Bucket memory: lanes * W * B * coords * limbs * 4 bytes.
"""

from __future__ import annotations

from dataclasses import dataclass

LIMB_BYTES = 4  # uint32 storage per 16-bit limb
SCALAR_BITS = 256


@dataclass(frozen=True)
class MsmPlan:
    """A fully determined single-chip MSM execution plan."""

    n: int
    c: int  # window bits
    lanes: int  # parallel point streams (power of two)
    coords: int  # projective coordinates (3)
    limbs: int  # base-field limbs per coordinate value (G1: 24, G2: 48)

    @property
    def windows(self) -> int:
        return (SCALAR_BITS + self.c - 1) // self.c

    @property
    def buckets(self) -> int:
        return 1 << self.c

    @property
    def bucket_bytes(self) -> int:
        return (
            self.lanes * self.windows * self.buckets * self.coords
            * self.limbs * LIMB_BYTES
        )

    @property
    def est_adds(self) -> int:
        W, B = self.windows, self.buckets
        return self.n * W + (self.lanes - 1) * W * B + 2 * B * W

    @property
    def steps(self) -> int:
        return -(-self.n // self.lanes)


def plan_msm(
    n: int,
    hbm_budget_bytes: int = 6 << 30,
    coords: int = 3,
    limbs: int = 24,
    max_lanes: int = 1024,
    min_lanes: int = 8,
    max_c: int = 16,
) -> MsmPlan:
    """Pick (c, lanes) minimizing estimated group adds subject to the bucket
    array fitting the HBM budget and the scan staying reasonably shallow.

    The role of the reference's window heuristic + chunk sizing
    (/root/reference/src/gpu.rs:64-85,218-223), computed instead of tuned.
    """
    assert n >= 1
    best = None
    lanes_cap = max(min_lanes, min(max_lanes, n))
    for c in range(4, max_c + 1):
        lanes = 1 << (lanes_cap.bit_length() - 1)  # largest pow2 <= cap
        while lanes >= min_lanes:
            p = MsmPlan(n=n, c=c, lanes=lanes, coords=coords, limbs=limbs)
            if p.bucket_bytes <= hbm_budget_bytes:
                if best is None or p.est_adds < best.est_adds:
                    best = p
                break  # smaller lanes only raises steps at same c
            lanes //= 2
    assert best is not None, "no plan fits the HBM budget"
    return best


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh description for sharded entry points."""

    shape: tuple = (1,)
    axis_names: tuple = ("data",)
