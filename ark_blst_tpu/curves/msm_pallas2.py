"""Pallas MSM kernel v2: lazy radix-13 arithmetic + packed VMEM buckets.

Round-3 rebuild of the VMEM bucket kernel (msm_pallas.py) for ~2.5-3x
single-chip throughput. Same architecture — buckets resident in VMEM scratch,
one grid step per (window, point-tile), per-stream one-hot bucket access,
window x group decomposition mirroring ec-gpu's multiexp kernel
(/root/reference/src/gpu.rs:126-210, groups at :138-146) — but:

* Field math is the signed balanced radix-13 lazy engine (ops/lazy13.py):
  ~5-6K element-ops per Montgomery multiply vs ~31K for the strict radix-16
  XLA pipeline (no Kogge-Stone normalization, no cond_sub, free signed subs,
  one reduction per output coordinate).
* Buckets and points are stored PACKED: two balanced 13-bit digits per
  uint32 (bias 4129). A G1 bucket point is 45 rows instead of 72, so the
  c=7 signed window (B = 65 buckets) fits the ~12 MB VMEM scratch budget:
  W = 38 windows instead of 44.
* The pipeline is exactly THREE jit programs per chunk (prepare, kernel,
  reduce) plus one finish program, each with a handful of STACKED array
  inputs/outputs. This matters independently of compute: the remote-TPU
  platform charges milliseconds of dispatch overhead per array crossing a
  jit boundary (measured ~2.3 s for a single no-op-sized call carrying a
  ~280-array lazy-point pytree — scripts/tpu_fold_probe.py), so lazy points
  only ever cross boundaries as single stacked arrays.
* Kernel inputs are PROJECTIVE (complete RCB15 add, 12 muls): an affine
  conversion would save one multiply per bucket add but costs a batched
  Montgomery inversion at ingest whose eager-composed dispatch overhead
  dwarfs the saving on this platform. Identity inputs are absorbed by the
  complete formulas (the blst failure case, /root/reference/src/g1.rs:682-689,
  remains a passing case here).

Layouts (G1; G2 doubles the per-coord rows and drops to c=5):
  points  HBM: (T, 45, 8, 128) uint32   — x,y,z packed balanced digits
  digits  HBM: (W, T, 8, 128)  uint32   — magnitude | sign<<15
  buckets VMEM: (B, 45, 8, 128) uint32  — x,y,z packed
  dump    HBM: (W, B, 45, 8, 128) uint32
  wsums   (stacked): (3*ELEM, W) int32  — lazy window sums, one array
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

from ..ops import lazy13 as LZ
from ..ops import fieldops as FO
from ..ops.limbs import FP, FR, int_to_limbs
from ..oracle.field import P
from . import lazy_group as LG
from . import msm as M
from .group import CurveOps, G1, G2

SLOTS = 8
LANES = 128
TILE = SLOTS * LANES

BIAS = 4129  # balanced digits in [-4129, 4128] -> packed [0, 8257]
SIGN_BIT = 15
MAG_MASK = (1 << SIGN_BIT) - 1

INTERPRET = False  # test hook: run the Pallas kernel in interpreter mode

R16_MOD_P = (1 << (16 * FP.num_limbs)) % P
# v*R16 -> v*R13 under lazy mont (x*C/R13): C = R13^2 / R16 mod p
R16_TO_R13 = LZ.R13_MOD_P * LZ.R13_MOD_P % P * pow(R16_MOD_P, -1, P) % P
R16_TO_R13_DIGITS = [int(v) for v in LZ.int_to_digits(R16_TO_R13)]
R16_DIGITS = [int(v) for v in LZ.int_to_digits(R16_MOD_P)]


def _eager() -> bool:
    """Off-TPU the pipeline runs EAGERLY (each jnp op dispatched as-is):
    XLA:CPU takes minutes to compile the ~10K-statement lazy graphs, while
    eager execution of the same ops finishes in seconds. On TPU everything
    is jitted (and the compiles are cached across chunks and runs)."""
    return jax.default_backend() != "tpu"


def _call(jitted, *args, **kwargs):
    fn = jitted.__wrapped__ if _eager() else jitted
    return fn(*args, **kwargs)


def int_to_digits_balanced(x: int) -> np.ndarray:
    """Host: value in [0, p) -> 30 balanced digits (|d| <= 4096)."""
    d = [int(v) for v in LZ.int_to_digits(x)]
    out = []
    carry = 0
    for k in range(LZ.L13):
        v = d[k] + carry
        carry = 0
        if v >= 4096:
            v -= 8192
            carry = 1
        out.append(v)
    assert carry == 0, "value must be < 0.49 * 2^390"
    return np.array(out, np.int32)


# --- packing -----------------------------------------------------------------

def pack30(d30):
    """30 balanced int32 digit arrays -> 15 packed uint32 arrays."""
    out = []
    for r in range(15):
        lo = (d30[2 * r] + jnp.int32(BIAS)).astype(jnp.uint32)
        hi = (d30[2 * r + 1] + jnp.int32(BIAS)).astype(jnp.uint32)
        out.append(lo | (hi << 16))
    return out


def unpack15(words):
    """15 packed uint32 arrays -> ELEM-digit element (int32, balanced)."""
    d = []
    for w in words:
        d.append((w & jnp.uint32(0xFFFF)).astype(jnp.int32) - jnp.int32(BIAS))
        d.append((w >> 16).astype(jnp.int32) - jnp.int32(BIAS))
    return LZ.load31(d)


@dataclass(frozen=True)
class KernelCurve2:
    """Per-curve v2 kernel layout + codecs."""

    name: str
    c_default: int

    @property
    def f(self) -> LG.LazyOps:
        return LG.FP2_LAZY if self.name == "g2" else LG.FP_LAZY

    @property
    def coord_rows(self) -> int:  # packed rows per field coordinate
        return 30 if self.name == "g2" else 15

    @property
    def pt_rows(self) -> int:  # projective point (x, y, z)
        return 3 * self.coord_rows

    bk_rows = pt_rows

    @property
    def n_fp(self) -> int:  # Fp components per point (3 coords x ext degree)
        return 6 if self.name == "g2" else 3

    def _coord_from_rows(self, rows):
        if self.name == "g2":
            return (unpack15(rows[:15]), unpack15(rows[15:30]))
        return unpack15(rows)

    def _coord_to_rows(self, coord):
        cs = self.f.store30(coord)
        if self.name == "g2":
            return pack30(cs[0]) + pack30(cs[1])
        return pack30(cs)

    def rows_to_point(self, rows):
        cr = self.coord_rows
        return tuple(
            self._coord_from_rows(rows[i * cr : (i + 1) * cr]) for i in range(3)
        )

    def point_to_rows(self, pt):
        return [r for coord in pt for r in self._coord_to_rows(coord)]

    # -- stacked lazy-point codec (single-array jit boundaries) --

    def stack_point(self, pt):
        """Lazy projective point -> ONE int32 array (n_fp*ELEM, *batch)."""
        leaves = []
        for coord in pt:
            comps = coord if self.name == "g2" else (coord,)
            for comp in comps:
                leaves.extend(comp)
        return jnp.stack(leaves)

    def unstack_point(self, arr):
        k = LZ.ELEM
        comps = [
            [arr[i * k + j] for j in range(k)] for i in range(self.n_fp)
        ]
        if self.name == "g2":
            return (
                (comps[0], comps[1]),
                (comps[2], comps[3]),
                (comps[4], comps[5]),
            )
        return (comps[0], comps[1], comps[2])

    def identity_rows(self) -> np.ndarray:
        """Host: packed rows of the identity (0 : one : 0)."""
        zero = np.full(15, BIAS | (BIAS << 16), np.uint32)
        oneb = int_to_digits_balanced(LZ.R13_MOD_P)
        onep = np.array(
            [
                np.uint32(int(oneb[2 * r]) + BIAS)
                | (np.uint32(int(oneb[2 * r + 1]) + BIAS) << 16)
                for r in range(15)
            ],
            np.uint32,
        )
        if self.name == "g2":
            coords = [zero, zero, onep, zero, zero, zero]
        else:
            coords = [zero, onep, zero]
        return np.concatenate(coords)


KC2_G1 = KernelCurve2("g1", 7)
KC2_G2 = KernelCurve2("g2", 5)  # c=6 (12.2MB scratch) crashes the Mosaic compile


def _kernel_curve2(curve: CurveOps) -> KernelCurve2:
    return KC2_G1 if curve.name.startswith("g1") else KC2_G2


def _num_buckets(c: int) -> int:
    return (1 << (c - 1)) + 1  # signed windows only in v2


def _num_windows(c: int) -> int:
    return (256 + c - 1) // c + 1  # + carry window (window_digits_signed)


# --- the kernel ---------------------------------------------------------------

def _make_kernel2(kc: KernelCurve2, B: int, t_blocks: int):
    rows = kc.pt_rows
    ident = kc.identity_rows()
    f = kc.f

    def kernel(pts_ref, digs_ref, out_ref, buckets, dma_sem):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            mat = jnp.stack(
                [jnp.full((SLOTS, LANES), np.uint32(v), jnp.uint32) for v in ident]
            )
            buckets[:] = jnp.broadcast_to(mat[None], (B, rows, SLOTS, LANES))

        idx = digs_ref[0, 0]  # (8, 128) u32: mag | sign<<15
        sign = (idx >> SIGN_BIT) != 0
        idx = idx & jnp.uint32(MAG_MASK)
        bio = lax.broadcasted_iota(jnp.uint32, (B, 1, SLOTS, LANES), 0)
        mask = bio == idx[None, None]

        bks = buckets[:]  # (B, rows, 8, 128) packed u32
        # one-hot gather of the addressed bucket (packed words < 2^29: the
        # int32 one-hot sum is exact — exactly one term is nonzero)
        cur_rows_mat = jnp.sum(
            jnp.where(mask, bks.astype(jnp.int32), jnp.int32(0)), axis=0
        ).astype(jnp.uint32)
        cur = kc.rows_to_point([cur_rows_mat[i] for i in range(rows)])
        x2, y2, z2 = kc.rows_to_point([pts_ref[0, i] for i in range(rows)])
        y2 = f.select(sign, f.neg(y2), y2)
        new = LG.full_add(f, cur, (x2, y2, z2))
        new_mat = jnp.stack(kc.point_to_rows(new))  # (rows, 8, 128) u32
        buckets[:] = jnp.where(mask, new_mat[None], bks)

        w = pl.program_id(0)  # hoisted: program_id inside pl.when breaks interpret

        @pl.when(t == t_blocks - 1)
        def _flush():
            dma = pltpu.make_async_copy(buckets, out_ref.at[w], dma_sem)
            dma.start()
            dma.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("kc", "c"))
def _accumulate2(pts_arr, digs_arr, *, kc: KernelCurve2, c: int):
    """pts_arr (T, pt_rows, 8, 128) u32; digs_arr (W, T, 8, 128) u32 ->
    packed bucket dump (W, B, pt_rows, 8, 128) u32."""
    W, T = digs_arr.shape[0], digs_arr.shape[1]
    B = _num_buckets(c)
    rows = kc.pt_rows
    kernel = _make_kernel2(kc, B, T)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((W, B, rows, SLOTS, LANES), jnp.uint32),
        grid=(W, T),
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


# --- prepare: strict projective points -> kernel layout (ONE jit) -------------

@functools.partial(jax.jit, static_argnames=("curve", "c"))
def _prepare_inputs(points, scalars, *, curve: CurveOps, c: int):
    """points: projective batch in the strict radix-16 engine's Montgomery
    form, coord leaves (24, N) u32 (Fp2 coords as pairs); scalars (16, N)
    plain FR limbs. N must be a multiple of TILE.

    Returns (pts_arr (T, pt_rows, 8, 128) u32, digs_arr (W, T, 8, 128) u32).

    The domain conversion runs in the LAZY engine (one mont_mul_const per Fp
    component, ~4.5K traced ops) — the strict engine's multiply would triple
    the compile size for no benefit.
    """
    kc = _kernel_curve2(curve)
    n = scalars.shape[-1]

    def coord_rows(coord):
        def one_fp(arr):
            a16 = [arr[i] for i in range(FP.num_limbs)]
            d = LZ.from_limbs16(a16)  # canonical digits of v*R16
            d13 = LZ.mont_mul_const(d, R16_TO_R13_DIGITS)  # v*R13, mul-ready
            return pack30(LZ.store30(d13))

        if kc.name == "g2":
            return one_fp(coord[0]) + one_fp(coord[1])
        return one_fp(coord)

    rows = []
    for coord in points:
        rows.extend(coord_rows(coord))
    mat = jnp.stack(rows)  # (pt_rows, N)
    T = n // TILE
    pts_arr = jnp.transpose(
        mat.reshape(kc.pt_rows, T, SLOTS, LANES), (1, 0, 2, 3)
    )
    digits = M.window_digits_signed(scalars, c)  # (W, N); identity points
    # need no masking: adding the identity is absorbed by the complete add
    W = digits.shape[0]
    digs_arr = digits.reshape(W, T, SLOTS, LANES)
    return pts_arr, digs_arr


# --- reduce: dump -> stacked lazy window sums (ONE jit) -----------------------

def _dump_to_points(dump, kc: KernelCurve2):
    """(W, B, rows, 8, 128) packed dump -> lazy bucket points with batch
    (TILE, W, B) (digit arrays)."""
    W, B, rows = dump.shape[0], dump.shape[1], dump.shape[2]
    mat = jnp.transpose(dump, (2, 3, 4, 0, 1)).reshape(rows, TILE, W, B)
    return kc.rows_to_point([mat[i] for i in range(rows)])


def _tree_map_pt(fn, pt):
    """Apply fn to every digit array of a lazy point (nested lists/tuples)."""
    if isinstance(pt, tuple):
        return tuple(_tree_map_pt(fn, x) for x in pt)
    if isinstance(pt, list) and pt and not isinstance(pt[0], (list, tuple)):
        return [fn(x) for x in pt]
    return [_tree_map_pt(fn, x) for x in pt]


def _fold_body(kc: KernelCurve2):
    def body(acc, q):
        return LG.full_add(kc.f, acc, tuple(q)), None

    return body


def _fold_streams_traced(pt, kc: KernelCurve2, scan_chunk: int = 64):
    """Fold the leading TILE axis to 1 inside a traced program: a lax.scan
    over `scan_chunk` groups (one traced add body) followed by an unrolled
    tree over the remaining TILE/scan_chunk (keeps the traced size at
    ~(1 + log2(TILE/scan_chunk)) add bodies while the scan's sequential
    steps stay wide enough to be compute-bound)."""
    group = TILE // scan_chunk
    # (TILE, W, B) -> (scan_chunk, group, W, B)
    pt = _tree_map_pt(
        lambda x: x.reshape((scan_chunk, group) + x.shape[1:]), pt
    )
    first = _tree_map_pt(lambda x: x[0], pt)
    rest = _tree_map_pt(lambda x: x[1:], pt)
    acc, _ = lax.scan(_fold_body(kc), first, rest)
    size = group
    while size > 1:
        half = size // 2
        lo = _tree_map_pt(lambda x: x[:half], acc)
        hi = _tree_map_pt(lambda x: x[half:], acc)
        acc = LG.full_add(kc.f, lo, hi)
        size = half
    return _tree_map_pt(lambda x: x[0], acc)


def _fold_streams_eager(pt, kc: KernelCurve2, size: int):
    """Eager tree fold (CPU tests): plain python loop, no compiles."""
    while size > 1:
        half = size // 2
        lo = _tree_map_pt(lambda x: x[:half], pt)
        hi = _tree_map_pt(lambda x: x[half:], pt)
        pt = LG.full_add(kc.f, lo, hi)
        size = half
    return _tree_map_pt(lambda x: x[0], pt)


def _bucket_suffix_seq(pt, kc: KernelCurve2, B: int):
    """Suffix-accumulate buckets (highest magnitude first; bucket 0 dropped):
    window sums = sum_b b * S_b — the on-device analog of the reference's
    host window reduction (/root/reference/src/gpu.rs:193-209). Python loop:
    B-1 complete adds, traced inline (inside the reduce program on TPU,
    eager on CPU)."""
    f = kc.f
    running = _tree_map_pt(lambda x: x[..., B - 1], pt)
    total = tuple(running)
    for b in range(B - 2, 0, -1):
        bucket_b = _tree_map_pt(lambda x: x[..., b], pt)
        running = LG.full_add(f, tuple(running), tuple(bucket_b))
        total = LG.full_add(f, total, running)
    return total


def _bucket_suffix_scan(pt, kc: KernelCurve2):
    """Scan form of the bucket suffix (ONE traced double-add body)."""
    f = kc.f
    seq = _tree_map_pt(lambda x: jnp.moveaxis(x[..., 1:], -1, 0)[::-1], pt)
    first = _tree_map_pt(lambda x: x[0], seq)
    rest = _tree_map_pt(lambda x: x[1:], seq)

    def body(carry, bucket_b):
        running, total = carry
        running = LG.full_add(f, running, tuple(bucket_b))
        total = LG.full_add(f, total, running)
        return (running, total), None

    (_, total), _ = lax.scan(body, (tuple(first), tuple(first)), rest)
    return total


@functools.partial(jax.jit, static_argnames=("kc",))
def _reduce_dump(dump, *, kc: KernelCurve2):
    """dump (W, B, rows, 8, 128) -> stacked lazy window sums (n_fp*ELEM, W)."""
    pt = _dump_to_points(dump, kc)
    folded = _fold_streams_traced(pt, kc)  # batch (W, B)
    ws = _bucket_suffix_scan(folded, kc)  # batch (W,)
    return kc.stack_point(ws)


@functools.partial(jax.jit, static_argnames=("kc",))
def _add_wsums2(a, b, *, kc: KernelCurve2):
    """Accumulate stacked window sums across chunks (2 arrays in, 1 out)."""
    out = LG.full_add(kc.f, kc.unstack_point(a), kc.unstack_point(b))
    return kc.stack_point(out)


# --- finish: stacked window sums -> strict projective point (ONE jit) ---------

@functools.partial(jax.jit, static_argnames=("kc", "c"))
def _finish(ws_stacked, *, kc: KernelCurve2, c: int):
    """Horner over windows + conversion back to the strict engine's
    Montgomery-R16 canonical limbs. Output: stacked (n_fp, 24, 1) u32.

    The Horner recurrence is a lax.scan whose body holds ONE fori-doubling
    and one add (traced once); ~W*(c+1) sequential group ops run entirely
    on-device — sequential-but-tiny is fine inside a single program, the
    catastrophic cost is only per-dispatch (see module docstring)."""
    f = kc.f
    wsums = kc.unstack_point(ws_stacked)
    # digit arrays (W,) -> scan sequence (W, 1), highest window first
    seq = _tree_map_pt(lambda x: x[::-1][..., None], wsums)
    first = _tree_map_pt(lambda x: x[0], seq)
    rest = _tree_map_pt(lambda x: x[1:], seq)

    def body(acc, s_w):
        acc = lax.fori_loop(0, c, lambda i, p: LG.double(f, p), acc)
        return LG.full_add(f, acc, tuple(s_w)), None

    acc, _ = lax.scan(body, tuple(first), rest)
    return _to_strict_stacked(acc, kc)


def _finish_any(ws_stacked, kc: KernelCurve2, c: int):
    if _eager():
        return _finish_eager(ws_stacked, kc, c)
    return _finish(ws_stacked, kc=kc, c=c)


def _finish_eager(ws_stacked, kc: KernelCurve2, c: int):
    """Eager (CPU test) variant: plain python loops, no scan/fori compiles."""
    f = kc.f
    wsums = kc.unstack_point(ws_stacked)
    W = ws_stacked.shape[-1]
    acc = None
    for w in range(W - 1, -1, -1):
        s_w = _tree_map_pt(lambda x: x[..., w : w + 1], wsums)
        if acc is None:
            acc = tuple(s_w)
            continue
        for _ in range(c):
            acc = LG.double(f, acc)
        acc = LG.full_add(f, acc, tuple(s_w))
    return _to_strict_stacked(acc, kc)


def _to_strict_stacked(pt, kc: KernelCurve2):
    def conv_fp(x):
        y = LZ.mont_mul_const(x, R16_DIGITS)  # v*R13 -> v*R16
        return jnp.stack(LZ.to_limbs16_strict(LZ.canonicalize(y)))

    out = []
    for coord in pt:
        comps = coord if kc.name == "g2" else (coord,)
        out.extend(conv_fp(comp) for comp in comps)
    return jnp.stack(out)  # (n_fp, 24, batch)


def _unstack_strict(arr, kc: KernelCurve2):
    """(n_fp, 24, batch) -> strict projective coord leaves (24, batch)."""
    if kc.name == "g2":
        return ((arr[0], arr[1]), (arr[2], arr[3]), (arr[4], arr[5]))
    return (arr[0], arr[1], arr[2])


# --- drivers ------------------------------------------------------------------

def _window_sums2(points, scalars, curve: CurveOps, c: int,
                  max_windows: int | None = None):
    """Full v2 pipeline up to (and including) bucket reduction: returns
    STACKED lazy window sums (n_fp*ELEM, W). Inputs must be TILE-padded.
    `max_windows` truncates the window schedule — ONLY sound when every
    scalar is below 2^(c*(max_windows-1)); used by interpret-mode tests."""
    kc = _kernel_curve2(curve)
    pts_arr, digs_arr = _call(_prepare_inputs, points, scalars, curve=curve, c=c)
    if max_windows is not None:
        digs_arr = digs_arr[:max_windows]
    dump = _call(_accumulate2, pts_arr, digs_arr, kc=kc, c=c)
    if _eager():
        pt = _dump_to_points(dump, kc)
        folded = _fold_streams_eager(pt, kc, TILE)
        ws = _bucket_suffix_seq(folded, kc, dump.shape[1])
        return kc.stack_point(ws)
    return _reduce_dump(dump, kc=kc)


def plan_chunk2(kc: KernelCurve2, c: int, hbm_budget_bytes: int = 8 << 30) -> int:
    """Largest power-of-two chunk (multiple of TILE) fitting the HBM budget.
    Footprint: input leaves + packed copy + digits + dump + its transpose.
    Analog of the reference's calc_chunk_size (/root/reference/src/gpu.rs:64-85)."""
    W = _num_windows(c)
    B = _num_buckets(c)
    fixed = 2 * W * B * kc.pt_rows * TILE * 4
    coords16 = kc.n_fp * 24  # strict projective input rows
    per_point = (coords16 + 2 * kc.pt_rows + W + 2) * 4
    budget = hbm_budget_bytes - fixed
    assert budget > per_point * TILE, "HBM budget below one tile"
    chunk = TILE
    while chunk * 2 * per_point <= budget:
        chunk *= 2
    return chunk


def msm_pallas2(points, scalars, curve: CurveOps = G1, c: int | None = None,
                chunk: int | None = None, hbm_budget_bytes: int = 8 << 30,
                maybe_abort=None, max_windows: int | None = None):
    """Single-chip MSM v2: lazy-engine VMEM bucket kernel, HBM-budget chunked.

    points: projective batch in strict-Montgomery form (coord leaves (24, N));
    scalars: (16, N) plain FR limbs. Returns a strict-Montgomery projective
    point with batch shape (1,) — drop-in compatible with curves/msm.py
    consumers. `maybe_abort`: zero-arg callable polled between chunk
    dispatches (ec-gpu's cancellation hook, /root/reference/src/gpu.rs:58,133-137).
    """
    from .msm_pallas import MsmAborted

    kc = _kernel_curve2(curve)
    if c is None:
        c = kc.c_default
    if c < 2:
        raise ValueError(f"MSM window c must be >= 2, got {c}")
    # clear failure for oversized windows instead of an opaque Mosaic error
    # (empirical ceiling: G1 c=7 scratch = 11.98 MB compiles; G2 c=6 =
    # 12.16 MB crashes the Mosaic compile)
    assert _num_buckets(c) * kc.pt_rows * TILE * 4 <= 12_000_000, (
        f"c={c} bucket scratch exceeds the VMEM budget for {kc.name}"
    )
    n = scalars.shape[-1]
    if n == 0:
        return curve.identity((1,))
    if chunk is None:
        chunk = plan_chunk2(kc, c, hbm_budget_bytes)
    chunk = min(chunk, -(-n // TILE) * TILE)
    points, scalars = M._pad_inputs(curve, points, scalars, chunk)
    n_chunks = scalars.shape[-1] // chunk
    total = None
    for i in range(n_chunks):
        if maybe_abort is not None and maybe_abort():
            raise MsmAborted(f"aborted before chunk {i}/{n_chunks}")
        sl = lambda x: lax.slice_in_dim(x, i * chunk, (i + 1) * chunk, axis=-1)
        ws = _window_sums2(jax.tree.map(sl, points), sl(scalars), curve, c,
                           max_windows)
        total = ws if total is None else _call(_add_wsums2, total, ws, kc=kc)
    out = _finish_any(total, kc, c)
    return _unstack_strict(out, kc)


# --- multi-chip: the fast kernel inside shard_map -----------------------------

def msm_sharded2(points, scalars, mesh, curve: CurveOps = G1,
                 c: int | None = None, axis: str = "data",
                 max_windows: int | None = None):
    """Multi-chip MSM with the *fast* v2 kernel on every device.

    Points are sharded over `mesh` axis `axis`; each device runs the VMEM
    bucket kernel + lazy fold + bucket suffix on its shard, producing
    stacked lazy window sums; the per-device sums are gathered (tiny: one
    (n_fp*ELEM, W) array each) and tree-folded, then Horner'd. This is the
    multi-device execution the reference left as a TODO
    (/root/reference/src/gpu.rs:233-240), applied to the fast path (round 2
    sharded only the slow scan pipeline).
    """
    from jax.sharding import PartitionSpec as Pspec

    kc = _kernel_curve2(curve)
    if c is None:
        c = kc.c_default
    ndev = mesh.shape[axis]
    points, scalars = M._pad_inputs(curve, points, scalars, TILE * ndev)
    pts_arr, digs_arr = _call(
        _prepare_inputs, points, scalars, curve=curve, c=c
    )
    if max_windows is not None:
        digs_arr = digs_arr[:max_windows]

    def local(pa, da):
        dump = _accumulate2.__wrapped__(pa, da, kc=kc, c=c)
        pt = _dump_to_points(dump, kc)
        folded = _fold_streams_traced(pt, kc)
        ws = _bucket_suffix_scan(folded, kc)
        return kc.stack_point(ws)[None]  # add device axis

    @jax.jit
    def run(pa, da):
        # check_vma=False: pallas_call does not yet thread the varying-
        # manual-axes annotation through its out_shape, so the type check
        # cannot pass; everything inside `local` is strictly per-device data
        # (no collectives), so the check has nothing to catch here.
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(Pspec(axis), Pspec(None, axis)),
            out_specs=Pspec(axis),
            check_vma=False,
        )(pa, da)

    ws = run(pts_arr, digs_arr)  # (ndev, n_fp*ELEM, W)
    total = ws[0]
    for d in range(1, ndev):
        total = _call(_add_wsums2, total, ws[d], kc=kc)
    out = _finish_any(total, kc, c)
    return _unstack_strict(out, kc)
