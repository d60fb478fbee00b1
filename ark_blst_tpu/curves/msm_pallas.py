"""Pallas MSM bucket-accumulation kernel: VMEM-resident buckets.

Round-1's MSM expressed bucket accumulation as an XLA `lax.scan` whose carry
was the full (lanes, W, B) bucket array in HBM, updated with
gather/`scatter` each step. Measured on a real v5e chip that runs at ~17K
points/s at 2^18 — the scatter rewrites hundreds of MB of HBM per step.

This kernel is the TPU-shaped answer, the same role as ec-gpu's multiexp
CUDA kernel (/root/reference/src/gpu.rs:126-210; per-thread bucket arrays in
registers/local memory, window x group decomposition at :138-146):

* Buckets live in **VMEM scratch** for the whole pass — zero HBM bucket
  traffic. One grid step per (window, point-block); the scratch persists
  across the point-block axis and is re-initialized when the window
  advances.
* Each grid step consumes a (8 sublanes x 128 lanes) tile of points: 1024
  independent point streams, each with its own bucket set — the analog of
  ec-gpu's `num_groups` work partition. TPUs cannot scatter per-lane, so
  bucket read/update is **one-hot select** over the bucket axis: O(B) vector
  ops per step, cheap for the small-window sizes this kernel targets.
* The group add is the same complete RCB15 formula as curves/group.py,
  instantiated over a *list-level* field adapter (ops/fieldops.py) whose
  values are per-limb (8, 128) VMEM tiles; the 6-multiplication rounds are
  batched into single wide Montgomery multiplies on (48, 128) tiles.
* On the last point-block of a window the kernel reduces its buckets to a
  per-stream window sum (suffix accumulation: `running += bucket[b];
  total += running`) and writes ONE (72, 8, 128) tile — the on-device twin
  of the reference's host window reduction (/root/reference/src/gpu.rs:193-209).

The XLA epilogue folds the 1024 streams (log2 rounds) and Horner-combines
windows, reusing curves/msm.py machinery.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import fieldops as FO
from ..ops.limbs import FP, FieldSpec, int_to_limbs
from .group import CurveOps, FieldAdapter, G1, G2
from . import msm as M

SLOTS = 8  # sublane rows per point tile
LANES = 128
TILE = SLOTS * LANES  # 1024 point streams

# Test hook (same convention as ops/pallas_field.INTERPRET).
INTERPRET = False


# --- list-level field adapters (in-kernel use) --------------------------------

def _list_add(a, b, spec):
    return FO._cond_sub_list(
        FO.normalize_list([x + y for x, y in zip(a, b)], spec.num_limbs), spec
    )


def _list_sub(a, b, spec):
    L = spec.num_limbs
    p_l = FO.const_limbs(spec.modulus, L)
    t = [a[k] + (jnp.uint32(0xFFFF) - b[k]) + jnp.uint32(p_l[k]) for k in range(L)]
    t[0] = t[0] + jnp.uint32(1)
    return FO._cond_sub_list(FO.normalize_list(t, L), spec)


def _list_neg(a, spec):
    L = spec.num_limbs
    p_l = FO.const_limbs(spec.modulus, L)
    t = [(jnp.uint32(0xFFFF) - a[k]) + jnp.uint32(p_l[k]) for k in range(L)]
    t[0] = t[0] + jnp.uint32(1)
    return FO._cond_sub_list(FO.normalize_list(t, L), spec)


def _list_mul_many(pairs, spec):
    """Batch the independent products of one formula round into ONE wide
    Montgomery multiply by concatenating along the sublane axis."""
    if len(pairs) == 1:
        return [FO._mont_mul_list(pairs[0][0], pairs[0][1], spec)]
    L = spec.num_limbs
    a = [jnp.concatenate([p[0][k] for p in pairs], axis=0) for k in range(L)]
    b = [jnp.concatenate([p[1][k] for p in pairs], axis=0) for k in range(L)]
    out = FO._mont_mul_list(a, b, spec)
    rows = pairs[0][0][0].shape[0]
    return [
        [out[k][i * rows : (i + 1) * rows] for k in range(L)]
        for i in range(len(pairs))
    ]


def _list_mul_small(a, value, spec):
    r = a
    for bit in bin(value)[3:]:
        r = _list_add(r, r, spec)
        if bit == "1":
            r = _list_add(r, a, spec)
    return r


def _fp_list_adapter(shape):
    """FieldAdapter over per-limb lists of `shape` tiles (G1/Fp)."""
    spec = FP

    def zero(_):
        return [jnp.zeros(shape, jnp.uint32)] * spec.num_limbs

    def one(_):
        return [
            jnp.full(shape, np.uint32(v), jnp.uint32) if v else jnp.zeros(shape, jnp.uint32)
            for v in int_to_limbs(spec.mont_r, spec.num_limbs)
        ]

    return FieldAdapter(
        name="fp_list",
        add=lambda a, b: _list_add(a, b, spec),
        sub=lambda a, b: _list_sub(a, b, spec),
        neg=lambda a: _list_neg(a, spec),
        mul_many=lambda pairs: _list_mul_many(pairs, spec),
        mul_b3=lambda a: _list_mul_small(a, 12, spec),  # 3*b, b=4
        inv=None,
        sqr_many=lambda xs: _list_mul_many([(x, x) for x in xs], spec),
        eq=None,
        is_zero=None,
        zero=zero,
        one=one,
        batch_shape=lambda a: a[0].shape,
    )


def _fp2_list_adapter(shape):
    """Fp2 = Fp[u]/(u^2+1) over list values (pairs of limb lists), for G2.
    Karatsuba: 3 base muls per product, batched across the round."""
    spec = FP
    base = _fp_list_adapter(shape)

    def add(a, b):
        return (base.add(a[0], b[0]), base.add(a[1], b[1]))

    def sub(a, b):
        return (base.sub(a[0], b[0]), base.sub(a[1], b[1]))

    def neg(a):
        return (base.neg(a[0]), base.neg(a[1]))

    def mul_many(pairs):
        legs = []
        for (a0, a1), (b0, b1) in pairs:
            legs += [
                (a0, b0),
                (a1, b1),
                (base.add(a0, a1), base.add(b0, b1)),
            ]
        outs = base.mul_many(legs)
        res = []
        for i in range(len(pairs)):
            t0, t1, t2 = outs[3 * i : 3 * i + 3]
            res.append((base.sub(t0, t1), base.sub(t2, base.add(t0, t1))))
        return res

    def mul_b3(a):
        # b3 = 12 * (u + 1): (c0 - c1, c0 + c1) * 12
        nr = (base.sub(a[0], a[1]), base.add(a[0], a[1]))
        return (
            _list_mul_small(nr[0], 12, spec),
            _list_mul_small(nr[1], 12, spec),
        )

    return FieldAdapter(
        name="fp2_list",
        add=add,
        sub=sub,
        neg=neg,
        mul_many=mul_many,
        mul_b3=mul_b3,
        inv=None,
        sqr_many=lambda xs: mul_many([(x, x) for x in xs]),
        eq=None,
        is_zero=None,
        zero=lambda s: (base.zero(s), base.zero(s)),
        one=lambda s: (base.one(s), base.zero(s)),
        batch_shape=lambda a: a[0][0].shape,
    )


@dataclass(frozen=True)
class _KernelCurve:
    """Per-curve kernel layout: row count and (rows <-> point tuple) codecs."""

    name: str
    rows: int  # sublane rows per point (G1: 3*24=72; G2: 3*48=144)

    def adapter(self, shape):
        return _fp_list_adapter(shape) if self.name == "g1" else _fp2_list_adapter(shape)

    def ops(self, shape) -> CurveOps:
        return CurveOps(self.name + "_k", self.adapter(shape))

    def rows_to_point(self, mat_rows):
        """List of `rows` (8,128) arrays -> (X, Y, Z) list-level tuple."""
        L = FP.num_limbs
        if self.name == "g1":
            return tuple(mat_rows[c * L : (c + 1) * L] for c in range(3))
        return tuple(
            (
                mat_rows[c * 2 * L : c * 2 * L + L],
                mat_rows[c * 2 * L + L : (c + 1) * 2 * L],
            )
            for c in range(3)
        )

    def point_to_rows(self, pt):
        if self.name == "g1":
            return [l for coord in pt for l in coord]
        return [l for coord in pt for part in coord for l in part]


KC_G1 = _KernelCurve("g1", 3 * FP.num_limbs)
KC_G2 = _KernelCurve("g2", 6 * FP.num_limbs)


def _kernel_curve(curve: CurveOps) -> _KernelCurve:
    return KC_G1 if curve.name.startswith("g1") else KC_G2


# --- the kernel ----------------------------------------------------------------

def _list_select(mask, a, b):
    """Elementwise select on list-level field values (fp lists or fp2 tuples)."""
    if isinstance(a, tuple):
        return tuple(_list_select(mask, x, y) for x, y in zip(a, b))
    return [jnp.where(mask, x, y) for x, y in zip(a, b)]


SIGN_BIT = 15  # window_digits_signed packs sign at bit 15
MAG_MASK = (1 << SIGN_BIT) - 1


def _make_kernel(kc: _KernelCurve, B: int, t_blocks: int, signed: bool):
    """Bucket ACCUMULATION only (gather/add/scatter against VMEM scratch);
    the bucket array is dumped to HBM on the last point-block and reduced at
    the XLA level — keeps the Mosaic kernel small enough to compile fast.

    With `signed`, the digit stream is `mag | sign<<15` and the point is
    negated (free: flip Y) when the digit is negative — halves the bucket
    count for a given window size."""
    rows = kc.rows
    kcurve = kc.ops((SLOTS, LANES))

    # identity column: (rows,) limb values of (0 : mont_one : 0)
    ident = np.zeros(rows, np.uint32)
    one_limbs = int_to_limbs(FP.mont_r, FP.num_limbs)
    y_off = rows // 3  # first Y row (G1: 24; G2: 48 with c0 = one, c1 = 0)
    ident[y_off : y_off + FP.num_limbs] = one_limbs

    def kernel(pts_ref, digs_ref, out_ref, buckets, dma_sem):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            # scalar fills only: pallas kernels cannot capture array constants
            mat = jnp.stack(
                [jnp.full((SLOTS, LANES), np.uint32(v), jnp.uint32) for v in ident]
            )
            buckets[:] = jnp.broadcast_to(mat[None], (B, rows, SLOTS, LANES))

        idx = digs_ref[0, 0]  # (8, 128) u32 digit per stream
        if signed:
            sign = (idx >> SIGN_BIT) != 0
            idx = idx & jnp.uint32(MAG_MASK)
        bio = lax.broadcasted_iota(jnp.uint32, (B, 1, SLOTS, LANES), 0)
        mask = bio == idx[None, None]

        bks = buckets[:]  # (B, rows, 8, 128)
        # one-hot gather; int32 view for the reduction (Mosaic has no u32
        # reductions; limbs < 2^16 and exactly one term is nonzero, so the
        # sum is exact in int32)
        cur_mat = jnp.sum(
            jnp.where(mask, bks.astype(jnp.int32), jnp.int32(0)), axis=0
        ).astype(jnp.uint32)  # (rows, 8, 128)
        cur = kc.rows_to_point([cur_mat[i] for i in range(rows)])
        ptv = kc.rows_to_point([pts_ref[0, i] for i in range(rows)])
        if signed:
            x, y, z = ptv
            ptv = (x, _list_select(sign, kcurve.f.neg(y), y), z)
        new = kcurve.add(cur, ptv)
        new_mat = jnp.stack(kc.point_to_rows(new))  # (rows, 8, 128)
        buckets[:] = jnp.where(mask, new_mat[None], bks)

        @pl.when(t == t_blocks - 1)
        def _flush():
            # DMA the bucket scratch straight to HBM (an output block this
            # large would double-buffer through VMEM and overflow it)
            w = pl.program_id(0)
            dma = pltpu.make_async_copy(buckets, out_ref.at[w], dma_sem)
            dma.start()
            dma.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("kc", "c", "signed"))
def _accumulate(pts_arr, digs_arr, kc: _KernelCurve, c: int, signed: bool):
    """pts_arr (T, rows, 8, 128); digs_arr (W, T, 8, 128) ->
    buckets (W, B, rows, 8, 128)."""
    W, T = digs_arr.shape[0], digs_arr.shape[1]
    B = _num_buckets(c, signed)
    rows = kc.rows
    grid = (W, T)
    kernel = _make_kernel(kc, B, T, signed)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((W, B, rows, SLOTS, LANES), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, rows, SLOTS, LANES), lambda w, t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, SLOTS, LANES), lambda w, t: (w, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((B, rows, SLOTS, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=INTERPRET,
    )(pts_arr, digs_arr)


# --- host/XLA wrapper ------------------------------------------------------------

def _pack_points(points, kc: _KernelCurve, n: int):
    """Coord-tuple leaves (L, n) -> (T, rows, 8, 128)."""
    leaves = jax.tree.leaves(points)  # ordered: coords (then fp2 parts)
    mat = jnp.concatenate(leaves, axis=0)  # (rows, n)
    T = n // TILE
    return jnp.transpose(mat.reshape(kc.rows, T, SLOTS, LANES), (1, 0, 2, 3))


def _num_buckets(c: int, signed: bool) -> int:
    return (1 << (c - 1)) + 1 if signed else 1 << c


@functools.partial(
    jax.jit, static_argnames=("curve", "c", "max_windows", "signed")
)
def _window_sums_jit(points, scalars, curve: CurveOps, c: int,
                     max_windows: int | None, signed: bool):
    """Everything up to (but not including) the Horner fold: digit slice,
    bucket kernel, stream fold, bucket suffix-sum. Returns window sums with
    batch shape (W,). Split out so the chunked driver can reuse ONE
    compiled program per fixed chunk shape across arbitrarily large n."""
    kc = _kernel_curve(curve)
    B = _num_buckets(c, signed)
    n = scalars.shape[-1]
    digits = (
        M.window_digits_signed(scalars, c) if signed else M.window_digits(scalars, c)
    )
    if max_windows is not None:
        digits = digits[:max_windows]
    W = digits.shape[0]
    T = n // TILE
    pts_arr = _pack_points(points, kc, n)
    digs_arr = digits.reshape(W, T, SLOTS, LANES)
    buckets = _accumulate(pts_arr, digs_arr, kc, c, signed)  # (W, B, rows, 8, 128)

    # unpack to coord leaves with batch (TILE, W, B)
    mat = jnp.transpose(buckets, (2, 3, 4, 0, 1)).reshape(kc.rows, TILE, W, B)
    L = FP.num_limbs
    if kc.name == "g1":
        pt = tuple(mat[i * L : (i + 1) * L] for i in range(3))
    else:
        pt = tuple(
            (
                mat[i * 2 * L : i * 2 * L + L],
                mat[i * 2 * L + L : (i + 1) * 2 * L],
            )
            for i in range(3)
        )
    # fold the 1024 per-stream partial bucket arrays FIRST (log-depth, W*B
    # batch per round — half the adds of reduce-then-fold), then suffix-sum
    # the B buckets per window, then Horner over windows.
    folded = _fold_leading(curve, pt, TILE)  # batch (W, B)
    return M._bucket_reduce(curve, folded, fuse=True)  # batch (W,)


@functools.partial(
    jax.jit, static_argnames=("curve", "c", "max_windows", "signed")
)
def _msm_pallas_jit(points, scalars, curve: CurveOps, c: int,
                    max_windows: int | None, signed: bool):
    wsums = _window_sums_jit(points, scalars, curve, c, max_windows, signed)
    return M._horner(curve, wsums, c, fuse=True)


def msm_pallas(points, scalars, curve: CurveOps = G1, c: int = 5,
               max_windows: int | None = None, signed: bool = True):
    """Single-chip Pippenger MSM with the VMEM bucket kernel; the whole
    pipeline (digit slice, kernel, fold, bucket reduce, Horner) is ONE jit
    program — per-op dispatch over the remote-TPU tunnel is the dominant
    cost otherwise.

    points: projective batch (leaves (L, N)); scalars: (16, N) plain FR
    limbs. Returns a projective point with batch shape (1,). Window size `c`
    is small by design (one-hot bucket access is O(buckets) per point);
    signed digits halve the bucket count, so c=5..6 signed are the sweet
    spots (G1; G2's doubled rows halve the VMEM budget).

    `max_windows` truncates the window schedule — ONLY sound when every
    scalar < 2^(c*(max_windows-1)); used by interpret-mode tests to keep
    the grid small.
    """
    kc = _kernel_curve(curve)
    B = _num_buckets(c, signed)
    assert B * kc.rows * SLOTS * LANES * 4 <= 12 << 20, "bucket scratch exceeds VMEM"
    points, scalars = M._pad_inputs(curve, points, scalars, TILE)
    return _msm_pallas_jit(points, scalars, curve, c, max_windows, signed)


class MsmAborted(RuntimeError):
    """Raised when a `maybe_abort` callback requests cancellation between
    chunk dispatches — the TPU analog of ec-gpu's EcError::Aborted
    (/root/reference/src/gpu.rs:58,133-137)."""


def _num_windows(c: int, signed: bool) -> int:
    # matches msm.window_digits{,_signed}: both span ceil(256/c) windows
    # (the signed transform needs no carry window — scalars are < 2^255)
    return (256 + c - 1) // c


def plan_chunk(kc: _KernelCurve, c: int, signed: bool = True,
               hbm_budget_bytes: int = 8 << 30) -> int:
    """Largest power-of-two chunk (multiple of TILE) whose per-launch HBM
    footprint fits the budget — the completed analog of the reference's
    `calc_chunk_size` (/root/reference/src/gpu.rs:64-85), whose multi-chunk
    execution was left as a TODO (src/gpu.rs:238-240).

    Footprint per launch of C points: input coord leaves (C*rows*4) + the
    packed/transposed copy (same) + digits (W*C*4) + the fixed bucket dump
    and its transposed unpack (2 * W*B*rows*TILE*4)."""
    W = _num_windows(c, signed)
    B = _num_buckets(c, signed)
    fixed = 2 * W * B * kc.rows * TILE * 4
    per_point = 2 * kc.rows * 4 + W * 4
    budget = hbm_budget_bytes - fixed
    assert budget > per_point * TILE, "HBM budget below one tile"
    chunk = TILE
    while chunk * 2 * per_point <= budget:
        chunk *= 2
    return chunk


@functools.partial(jax.jit, static_argnames=("curve",))
def _add_wsums(total, ws, curve: CurveOps):
    return curve.add(total, ws)


@functools.partial(jax.jit, static_argnames=("curve", "c"))
def _horner_jit(wsums, curve: CurveOps, c: int):
    return M._horner(curve, wsums, c, fuse=True)


def msm_pallas_chunked(points, scalars, curve: CurveOps = G1, c: int | None = None,
                       signed: bool = True, chunk: int | None = None,
                       hbm_budget_bytes: int = 8 << 30, maybe_abort=None):
    """HBM-budgeted multi-chunk MSM: the input is split into fixed-shape
    chunks, each run through `_window_sums_jit` (ONE compiled program,
    reused for every chunk and every total size n), window sums accumulated
    on device, Horner applied once at the end.

    This completes the two things the reference's GPU driver left undone:
    multi-chunk execution (/root/reference/src/gpu.rs:238-240 TODO) and the
    cancellation hook between dispatches (`maybe_abort`,
    src/gpu.rs:58,133-137): pass a zero-arg callable; a truthy return
    raises MsmAborted before the next chunk is dispatched."""
    kc = _kernel_curve(curve)
    if c is None:
        c = 6 if kc.name == "g1" else 5
    # VMEM budget check hoisted from msm_pallas so oversized c fails with a
    # clear assert on the chunked path too (not an opaque Mosaic error)
    B = _num_buckets(c, signed)
    assert B * kc.rows * SLOTS * LANES * 4 <= 12 << 20, "bucket scratch exceeds VMEM"
    n = scalars.shape[-1]
    if n == 0:
        return curve.identity((1,))
    if chunk is None:
        chunk = plan_chunk(kc, c, signed, hbm_budget_bytes)
    # never pad a small input up to a multi-GB planned chunk (maybe_abort
    # used to force the padded path for tiny inputs)
    chunk = min(chunk, -(-n // TILE) * TILE)
    assert chunk % TILE == 0, "chunk must be a multiple of the point tile"
    if n <= chunk and (maybe_abort is None or not maybe_abort()):
        return msm_pallas(points, scalars, curve=curve, c=c, signed=signed)
    points, scalars = M._pad_inputs(curve, points, scalars, chunk)
    n_chunks = scalars.shape[-1] // chunk
    total = None
    for i in range(n_chunks):
        if maybe_abort is not None and maybe_abort():
            raise MsmAborted(f"aborted before chunk {i}/{n_chunks}")
        sl = lambda x: lax.slice_in_dim(x, i * chunk, (i + 1) * chunk, axis=-1)
        ws = _window_sums_jit(
            jax.tree.map(sl, points), sl(scalars), curve, c, None, signed
        )
        total = ws if total is None else _add_wsums(total, ws, curve=curve)
    return _horner_jit(total, curve=curve, c=c)


def _fold_leading(curve: CurveOps, pt, size: int):
    """Tree-fold the first batch axis (leaves (L, size, W) -> (L, W))."""
    while size > 1:
        half = size // 2
        lo = jax.tree.map(lambda x: x[:, :half], pt)
        hi = jax.tree.map(lambda x: x[:, half:], pt)
        pt = curve.add(lo, hi)
        size = half
    return jax.tree.map(lambda x: x[:, 0], pt)
