"""RCB15 group formulas over the lazy radix-13 engine (ops/lazy13.py).

The round-3 hot-path group layer: complete projective addition/doubling and
the Z2=1 mixed variant, restructured for lazy reduction — round-2 products
stay in "prered" wide form and each output coordinate pays ONE Montgomery
reduction for its two-product linear combination (X3 = b - a etc.), instead
of one reduction per product. Combined with the balanced-digit engine this
cuts a complete add from ~12 x 31K to ~11 x ~4K element-ops.

Formulas: Renes-Costello-Batina 2015 (eprint 2015/1060) Algorithm 7 (a=0)
and Algorithm 9, with the standard Z2=1 substitutions t2 = Z1,
t4 = Y1 + Y2*Z1, ty = X1 + X2*Z1. Completeness is inherited from Alg 7 —
valid for every projective P1 and every AFFINE P2 (padding (0,0) inputs are
routed to the dropped bucket 0 by construction, matching how the one-hot
kernel uses these formulas).

Mirrors the strict-engine layer curves/group.py (RCB15 over FieldAdapter);
replaces blst's Jacobian C/asm pipeline (/root/reference/src/g1.rs:85-226).

A `LazyOps` adapter makes the same code serve Fp (G1) and Fp2 (G2); `mulp`
batches all of a round's products into one concatenated wide multiply and
`red` one concatenated reduction, so the traced program stays small.

Digit-bound ledger per step is annotated inline; classes from lazy13:
F (mul-ready, 4129), 2F (sum-of-2, legal), >2F must fold_sum first.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp

from ..ops import lazy13 as LZ


def _concat(vals):
    """Concatenate digit lists along axis 0 of every digit array."""
    n = len(vals[0])
    return [jnp.concatenate([v[k] for v in vals], axis=0) for k in range(n)]


def _split(val, parts):
    rows = val[0].shape[0] // parts
    return [
        [d[i * rows : (i + 1) * rows] for d in val] for i in range(parts)
    ]


@dataclass(frozen=True)
class LazyOps:
    """Field adapter over lazy13 lists: name 'fp' or 'fp2'."""

    name: str

    @property
    def is_fp2(self):
        return self.name == "fp2"

    def add(self, a, b):
        return LZ.fp2_add(a, b) if self.is_fp2 else LZ.add(a, b)

    def sub(self, a, b):
        return LZ.fp2_sub(a, b) if self.is_fp2 else LZ.sub(a, b)

    def neg(self, a):
        return LZ.fp2_neg(a) if self.is_fp2 else LZ.neg(a)

    def scale(self, a, k):
        return LZ.fp2_scale(a, k) if self.is_fp2 else LZ.scale(a, k)

    def fold_sum(self, a):
        return LZ.fp2_fold_sum(a) if self.is_fp2 else LZ.fold_sum(a)

    def select(self, m, a, b):
        return LZ.fp2_select(m, a, b) if self.is_fp2 else LZ.select(m, a, b)

    def mul_b3(self, a):
        """3b = 12 (G1); 12*(1+u) (G2: b = 4(1+u)). Returns UNFOLDED sums
        (bound 24F) — callers fold_sum before multiplying."""
        if self.is_fp2:
            nr = (LZ.sub(a[0], a[1]), LZ.add(a[0], a[1]))  # *(1+u)
            return (LZ.scale(nr[0], 12), LZ.scale(nr[1], 12))
        return LZ.scale(a, 12)

    def mulp(self, pairs):
        """Batched product round: pairs of MUL-READY operands (|d| <= F;
        callers fold_sum any sum-of-2 first) -> list of prered values (Fp) /
        prered pairs (Fp2). One concatenated wide multiply keeps the traced
        op count independent of len(pairs); mul-ready operands let it run
        the hybrid Karatsuba (-28% product eops vs schoolbook)."""
        if not self.is_fp2:
            a = _concat([p[0] for p in pairs])
            b = _concat([p[1] for p in pairs])
            return _split(LZ.prered(LZ.mul_wide_f(a, b)), len(pairs))
        # Karatsuba batched at the leg level: 3 legs per pair
        legs_a, legs_b = [], []
        for (a, b) in pairs:
            legs_a += [a[0], a[1], LZ.fold_sum(LZ.add(a[0], a[1]))]
            legs_b += [b[0], b[1], LZ.fold_sum(LZ.add(b[0], b[1]))]
        outs = _split(
            LZ.prered(LZ.mul_wide_f(_concat(legs_a), _concat(legs_b))),
            3 * len(pairs),
        )
        res = []
        for i in range(len(pairs)):
            m0, m1, m2 = outs[3 * i : 3 * i + 3]
            res.append((LZ.sub(m0, m1), LZ.sub(m2, LZ.add(m0, m1))))
        return res

    def red(self, wides):
        """Batched reduction of prered combinations -> elements."""
        if not self.is_fp2:
            return _split(LZ.reduce_wide(_concat(wides)), len(wides))
        flat = [w[0] for w in wides] + [w[1] for w in wides]
        outs = _split(LZ.reduce_wide(_concat(flat)), len(flat))
        n = len(wides)
        return [(outs[i], outs[n + i]) for i in range(n)]

    def wadd(self, a, b):
        return LZ.fp2_add(a, b) if self.is_fp2 else LZ.add(a, b)

    def wsub(self, a, b):
        return LZ.fp2_sub(a, b) if self.is_fp2 else LZ.sub(a, b)

    def zero(self, like):
        # derived from `like` (x*0, not a fresh constant) so the value is
        # device-varying under shard_map — scan carries then type-check
        # without check_vma escape hatches
        ref = like[0] if not self.is_fp2 else like[0][0]
        z = [ref * 0] * LZ.ELEM
        return (list(z), list(z)) if self.is_fp2 else list(z)

    def one(self, like):
        ref = like[0] if not self.is_fp2 else like[0][0]
        zero = ref * 0
        o = [zero + jnp.int32(v) if v else zero for v in LZ.ONE13]
        if self.is_fp2:
            return (o, [zero] * LZ.ELEM)
        return o

    def store30(self, a):
        if self.is_fp2:
            return (LZ.store30(a[0]), LZ.store30(a[1]))
        return LZ.store30(a)

    def load31(self, a):
        if self.is_fp2:
            return (LZ.load_elem(a[0]), LZ.load_elem(a[1]))
        return LZ.load_elem(a)


FP_LAZY = LazyOps("fp")
FP2_LAZY = LazyOps("fp2")


def mixed_add(f: LazyOps, p1, p2):
    """Complete addition P1 (projective) + P2 (affine, Z2=1).

    11 field muls in two batched rounds; 3 reductions saved by combining
    round-2 product pairs in prered form. Bound classes bracketed.
    """
    X1, Y1, Z1 = p1   # elements: F
    X2, Y2 = p2       # elements: F (ingest stores balanced digits)
    r1 = f.mulp([
        (X1, X2),                                # t0
        (Y1, Y2),                                # t1
        (Y2, Z1),                                # u1
        (X2, Z1),                                # u2
        (f.fold_sum(f.add(X1, Y1)),
         f.fold_sum(f.add(X2, Y2))),             # m3: folded to F (Karatsuba)
    ])
    t0, t1, u1, u2, m3 = f.red(r1)                           # all F
    t3 = f.fold_sum(f.sub(f.sub(m3, t0), t1))                # 3F -> F
    t4 = f.add(Y1, u1)                                       # Y1 + Y2 Z1: 2F
    ty = f.add(X1, u2)                                       # X1 + X2 Z1: 2F
    t0t = f.fold_sum(f.scale(t0, 3))                         # 3F -> F
    t2b = f.fold_sum(f.mul_b3(Z1))                           # <=24F -> F
    z3 = f.fold_sum(f.add(t1, t2b))                          # 2F -> F
    t1m = f.fold_sum(f.sub(t1, t2b))                         # 2F -> F
    t4 = f.fold_sum(t4)                                      # 2F -> F
    tyb = f.fold_sum(f.mul_b3(ty))                           # <=48F -> F
    r2 = f.mulp([
        (t4, tyb),    # a
        (t3, t1m),    # b
        (tyb, t0t),   # c
        (t1m, z3),    # d
        (t0t, t3),    # e
        (z3, t4),     # g
    ])
    a, b, c, d, e, g = r2
    X3, Y3, Z3 = f.red([f.wsub(b, a), f.wadd(d, c), f.wadd(g, e)])
    return (X3, Y3, Z3)


def full_add(f: LazyOps, p1, p2):
    """Complete projective+projective addition (RCB15 Alg 7, a=0), lazily
    reduced: 12 muls, 9 reductions."""
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    r1 = f.mulp([
        (X1, X2),
        (Y1, Y2),
        (Z1, Z2),
        (f.fold_sum(f.add(X1, Y1)), f.fold_sum(f.add(X2, Y2))),  # -> F
        (f.fold_sum(f.add(Y1, Z1)), f.fold_sum(f.add(Y2, Z2))),
        (f.fold_sum(f.add(X1, Z1)), f.fold_sum(f.add(X2, Z2))),
    ])
    t0, t1, t2, m3, m4, m5 = f.red(r1)
    t3 = f.fold_sum(f.sub(f.sub(m3, t0), t1))      # X1Y2 + X2Y1
    t4 = f.fold_sum(f.sub(f.sub(m4, t1), t2))      # Y1Z2 + Y2Z1
    ty = f.fold_sum(f.sub(f.sub(m5, t0), t2))      # X1Z2 + X2Z1
    t0t = f.fold_sum(f.scale(t0, 3))
    t2b = f.fold_sum(f.mul_b3(t2))
    z3 = f.fold_sum(f.add(t1, t2b))
    t1m = f.fold_sum(f.sub(t1, t2b))
    tyb = f.fold_sum(f.mul_b3(ty))
    a, b, c, d, e, g = f.mulp([
        (t4, tyb), (t3, t1m), (tyb, t0t), (t1m, z3), (t0t, t3), (z3, t4),
    ])
    X3, Y3, Z3 = f.red([f.wsub(b, a), f.wadd(d, c), f.wadd(g, e)])
    return (X3, Y3, Z3)


def double(f: LazyOps, p):
    """Complete doubling (RCB15 Alg 9, a=0), lazily reduced: 8 muls."""
    X, Y, Z = p
    t0, tyz, tzz, txy = f.red(f.mulp([(Y, Y), (Y, Z), (Z, Z), (X, Y)]))
    y8 = f.fold_sum(f.scale(t0, 8))
    t2 = f.fold_sum(f.mul_b3(tzz))
    ysum = f.fold_sum(f.add(t0, t2))                       # 2F -> F
    tdiff = f.fold_sum(f.sub(t0, f.scale(t2, 3)))          # 4F -> F
    x3m, Z3, aa, bb = f.mulp([(t2, y8), (tyz, y8), (tdiff, ysum), (tdiff, txy)])
    X3w = f.wadd(bb, bb)
    Y3w = f.wadd(x3m, aa)
    X3, Y3, Z3 = f.red([X3w, Y3w, Z3])
    return (X3, Y3, Z3)
