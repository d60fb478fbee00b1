"""Pallas MSM kernel v2: lazy radix-13 arithmetic + packed VMEM buckets.

Round-3 rebuild of the VMEM bucket kernel (msm_pallas.py), round-4 tightened.
Same architecture — buckets resident in VMEM scratch, one grid step per
(window, point-tile), per-stream one-hot bucket access, window x group
decomposition mirroring ec-gpu's multiexp kernel
(/root/reference/src/gpu.rs:126-210, groups at :138-146) — with:

* Field math in the signed balanced radix-13 lazy engine (ops/lazy13.py):
  hybrid-Karatsuba products, one Montgomery reduction per output coordinate.
* AFFINE kernel inputs + complete MIXED addition (round 4): the bucket add
  drops from 12 to 11 field muls and a point streams 30 packed rows instead
  of 45. The affine conversion runs INSIDE the prepare program as a blocked
  Montgomery batch inversion (~3 muls/point) — the round-3 objection to
  affine ingest was the eager-composed inversion tree's per-dispatch cost,
  which a single fused program does not pay. Identity points cannot be
  represented affinely; their window digits are masked to the dropped
  bucket 0 instead (the blst failure case, /root/reference/src/g1.rs:682-689,
  remains a passing case here).
* Buckets and points are stored PACKED: two balanced 13-bit digits per
  uint32 (bias 4129). A G1 bucket point is 45 rows; the c=7 signed window
  (B = 65 buckets) fits VMEM as two half-size scratch tensors.
* The pipeline is exactly THREE jit programs per chunk (prepare, kernel,
  reduce) plus one finish program, each with a handful of STACKED array
  inputs/outputs. This matters independently of compute: the remote-TPU
  platform charges milliseconds of dispatch overhead per array crossing a
  jit boundary (measured ~2.3 s for a single no-op-sized call carrying a
  ~280-array lazy-point pytree — scripts/tpu_fold_probe.py), so lazy points
  only ever cross boundaries as single stacked arrays.

Layouts (G1; G2 doubles the per-coord rows):
  points  HBM: (aff_rows, T, 8, 128) uint32 — x,y packed balanced digits
  digits  HBM: (W, T, 8, 128)  uint32   — magnitude | sign<<15
  buckets VMEM: parts of (B_p, pt_rows, 8, 128) uint32 — x,y,z packed
  dump    HBM: (W, B, pt_rows, 8, 128) uint32
  wsums   (stacked): (n_fp*ELEM, W) int32 — lazy window sums, one array
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

# empirical Mosaic ceiling is ~12MB of VMEM scratch; keep every scratch
# tensor comfortably below it by splitting the bucket array into parts
PART_BYTES = 8 << 20

R16_MOD_P = (1 << (16 * FP.num_limbs)) % P
# v*R16 -> v*R13 under lazy mont (x*C/R13): C = R13^2 / R16 mod p
R16_TO_R13 = LZ.R13_MOD_P * LZ.R13_MOD_P % P * pow(R16_MOD_P, -1, P) % P
R16_TO_R13_DIGITS = [int(v) for v in LZ.int_to_digits(R16_TO_R13)]
R16_DIGITS = [int(v) for v in LZ.int_to_digits(R16_MOD_P)]

# MSB-first bits of p - 2 for the Fermat ladder at the batch-inversion root
_P_MINUS_2_BITS = np.array([int(b) for b in bin(P - 2)[2:]], np.bool_)


def _mul(a, b):
    """Lazy Montgomery multiply for the prepare pipeline: Pallas-resident on
    TPU (XLA leaves the ~3.5K-primitive graph unfused and memory-bound,
    scripts/tpu_lazymul_probe.py), plain XLA/eager elsewhere."""
    if not _eager():
        from ..ops import pallas_lazy as PLZ

        return PLZ.mont_mul_elem(a, b)
    return LZ.mont_mul(a, b)


def _fp2_mul(a, b):
    """Fp2 product from three Pallas Montgomery muls (Karatsuba): linear
    combinations of full Montgomery products are exact, so this matches
    LZ.fp2_mont_mul at one extra reduction in exchange for VMEM-resident
    multiplies."""
    sa = LZ.fold_sum(LZ.add(a[0], a[1]))
    sb = LZ.fold_sum(LZ.add(b[0], b[1]))
    m0 = _mul(a[0], b[0])
    m1 = _mul(a[1], b[1])
    m2 = _mul(sa, sb)
    re = LZ.fold_sum(LZ.sub(m0, m1))
    im = LZ.fold_sum(LZ.sub(m2, LZ.add(m0, m1)))
    return (re, im)


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
    return LZ.load_elem(d)


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
    def pt_rows(self) -> int:  # projective bucket point (x, y, z)
        return 3 * self.coord_rows

    @property
    def aff_rows(self) -> int:  # affine streamed point (x, y)
        return 2 * self.coord_rows

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

    def rows_to_affine(self, rows):
        cr = self.coord_rows
        return tuple(
            self._coord_from_rows(rows[i * cr : (i + 1) * cr]) for i in range(2)
        )

    def affine_to_rows(self, pt):
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
        """Host: packed rows of the projective identity (0 : one : 0)."""
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
# G2 cap is c=5: the 16MB VMEM budget is TOTAL (hardware-measured via the
# compiler's scoped-vmem error), and the G2 mixed-add kernel body needs
# ~7-8MB of scoped stack on top of the bucket scratch — c=6's 12.16MB
# scratch overflows by 4.18MB even split into parts. (A two-pass
# bucket-half grid would fit but costs 2x the kernel passes, losing to
# c=5 outright: 86 vs 52 window-passes.)
KC2_G2 = KernelCurve2("g2", 5)


def _kernel_curve2(curve: CurveOps) -> KernelCurve2:
    return KC2_G1 if curve.name.startswith("g1") else KC2_G2


def _num_buckets(c: int) -> int:
    return (1 << (c - 1)) + 1  # signed windows only in v2


def _num_windows(c: int) -> int:
    return (256 + c - 1) // c  # no carry window (window_digits_signed)


def _bucket_parts(kc: KernelCurve2, B: int):
    """Split B buckets into VMEM scratch parts each under PART_BYTES."""
    part_bytes = lambda n: n * kc.pt_rows * TILE * 4
    n_parts = max(1, -(-part_bytes(B) // PART_BYTES))
    base, rem = divmod(B, n_parts)
    sizes = [base + (1 if i < rem else 0) for i in range(n_parts)]
    offs = [sum(sizes[:i]) for i in range(n_parts)]
    return list(zip(offs, sizes))


# --- the kernel ---------------------------------------------------------------

def _make_kernel2(kc: KernelCurve2, B: int, t_blocks: int):
    rows = kc.pt_rows
    ident = kc.identity_rows()
    f = kc.f
    parts = _bucket_parts(kc, B)

    def kernel(pts_ref, digs_ref, out_ref, *scratch):
        bucket_refs, dma_sem = scratch[:-1], scratch[-1]
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            mat = jnp.stack(
                [jnp.full((SLOTS, LANES), np.uint32(v), jnp.uint32) for v in ident]
            )
            for (off, bp), ref in zip(parts, bucket_refs):
                ref[:] = jnp.broadcast_to(mat[None], (bp, rows, SLOTS, LANES))

        idx = digs_ref[0, 0]  # (8, 128) u32: mag | sign<<15
        sign = (idx >> SIGN_BIT) != 0
        idx = idx & jnp.uint32(MAG_MASK)

        # one-hot gather of the addressed bucket across the scratch parts.
        # Exactness argument: at most ONE term across all parts is nonzero
        # (bucket indices are unique), and every packed word fits int32 —
        # the max biased word is BIAS | ((2*BIAS-1) << 16) ~= 5.41e8 < 2^31.
        # (A uniform < 2^29 bound would NOT hold — 5.41e8 > 2^29; the sum
        # is exact by the single-nonzero-term argument, not digit headroom.)
        cur_rows_mat = None
        masks = []
        for (off, bp), ref in zip(parts, bucket_refs):
            bio = lax.broadcasted_iota(jnp.uint32, (bp, 1, SLOTS, LANES), 0)
            mask = (bio + jnp.uint32(off)) == idx[None, None]
            masks.append(mask)
            part = jnp.sum(
                jnp.where(mask, ref[:].astype(jnp.int32), jnp.int32(0)), axis=0
            )
            cur_rows_mat = part if cur_rows_mat is None else cur_rows_mat + part
        cur_rows_mat = cur_rows_mat.astype(jnp.uint32)
        cur = kc.rows_to_point([cur_rows_mat[i] for i in range(rows)])

        x2, y2 = kc.rows_to_affine(
            [pts_ref[i, 0] for i in range(kc.aff_rows)]
        )
        y2 = f.select(sign, f.neg(y2), y2)
        new = LG.mixed_add(f, cur, (x2, y2))
        new_mat = jnp.stack(kc.point_to_rows(new))  # (rows, 8, 128) u32
        for (off, bp), ref, mask in zip(parts, bucket_refs, masks):
            ref[:] = jnp.where(mask, new_mat[None], ref[:])

        w = pl.program_id(0)  # hoisted: program_id inside pl.when breaks interpret

        @pl.when(t == t_blocks - 1)
        def _flush():
            for (off, bp), ref in zip(parts, bucket_refs):
                dma = pltpu.make_async_copy(
                    ref, out_ref.at[w, pl.ds(off, bp)], dma_sem
                )
                dma.start()
                dma.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("kc", "c"))
def _accumulate2(pts_arr, digs_arr, *, kc: KernelCurve2, c: int):
    """pts_arr (aff_rows, T, 8, 128) u32; digs_arr (W, T, 8, 128) u32 ->
    packed bucket dump (W, B, pt_rows, 8, 128) u32."""
    W, T = digs_arr.shape[0], digs_arr.shape[1]
    B = _num_buckets(c)
    rows = kc.pt_rows
    kernel = _make_kernel2(kc, B, T)
    scratch = [
        pltpu.VMEM((bp, rows, SLOTS, LANES), jnp.uint32)
        for _, bp in _bucket_parts(kc, B)
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((W, B, rows, SLOTS, LANES), jnp.uint32),
        grid=(W, T),
        in_specs=[
            pl.BlockSpec(
                (kc.aff_rows, 1, SLOTS, LANES), lambda w, t: (0, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, SLOTS, LANES), lambda w, t: (w, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch + [pltpu.SemaphoreType.DMA],
        interpret=INTERPRET,
    )(pts_arr, digs_arr)


# --- batched field inversion (inside the prepare program) ---------------------



def _fermat_inv(z):
    """Elementwise z^(p-2) (Montgomery) via a scan over the 381 exponent
    bits — used only at the root of the blocked batch inversion, on a
    vector of <= ~2K elements, so its serial depth is irrelevant."""
    bits = jnp.asarray(_P_MINUS_2_BITS[1:])

    def body(r, bit):
        r2 = _mul(r, r)
        r3 = LZ.select(bit, _mul(r2, z), r2)
        return r3, None

    out, _ = lax.scan(body, [x for x in z], bits)
    return out


def _batch_inverse_host(z):
    """Eager-mode twin of `_batch_inverse`: values are concrete off-TPU, so
    invert exactly on host ints (the scans' XLA:CPU compiles take minutes —
    the same reason the whole pipeline runs eagerly off-TPU). Montgomery
    bookkeeping: rep = v*R13, so inv_rep = inv(v)*R13 = pow(rep_val, -1, p)
    * R13^2."""
    shape = z[0].shape
    mat = np.stack(
        [np.asarray(x).astype(np.int64).reshape(-1) for x in z], axis=-1
    )
    out = []
    for row in mat:
        val = LZ.digits_to_int(row) % P
        w = pow(val, -1, P) * LZ.R13_SQ % P
        out.append(int_to_digits_balanced(w))
    omat = np.stack(out)  # (n, 30)
    return [jnp.asarray(omat[:, k].reshape(shape)) for k in range(LZ.L13)]


def _inverse_any(z, n: int):
    if _eager():
        return _batch_inverse_host(z)
    return _batch_inverse(z, n)


def _batch_inverse(z, n: int):
    """Blocked Montgomery batch inversion of a lazy Fp vector (digit arrays
    shaped (S, 128), S*128 = n elements — 2-D so the VPU's 8 sublanes stay
    full; 1-D (N,) arrays lay out as (1, N) and run at 1/8 rate): ~3
    Montgomery muls per element + a single Fermat ladder at the recursion
    root. Caller must pre-substitute nonzero values for any zero entries.
    Plays the role of blst's batch `normalize_batch` inversion
    (/root/reference/src/g1.rs:537-543) at MSM-ingest scale."""
    S = z[0].shape[0]
    if S <= 16:  # <= 2048 elements: Fermat at the root
        return _fermat_inv(z)
    g = next((cand for cand in (64, 32, 16, 8, 4, 2) if S % cand == 0), None)
    if g is None:  # odd row count (never on TILE-padded inputs): Fermat
        return _fermat_inv(z)
    m = S // g
    rows = [x.reshape(g, m, 128) for x in z]
    one = LG.FP_LAZY.one([rows[0][0]])

    def up(carry, zg):
        return _mul(carry, list(zg)), carry  # exclusive prefix

    total, pre = lax.scan(
        up, [jnp.broadcast_to(o, (m, 128)) for o in one], rows
    )
    inv_total = _batch_inverse(total, m * 128)

    def down(T, xs):
        zg, pre_g = xs
        inv_g = _mul(T, list(pre_g))
        T = _mul(T, list(zg))
        return T, inv_g

    _, invs = lax.scan(down, inv_total, (rows, pre), reverse=True)
    return [x.reshape(S, 128) for x in invs]


def _lazy_from_strict(arr):
    """One strict (24, N) coord -> mul-ready lazy digits of v*R13."""
    a16 = [arr[i] for i in range(FP.num_limbs)]
    d = LZ.from_limbs16(a16)  # canonical digits of v*R16
    return LZ.mont_mul_const(d, R16_TO_R13_DIGITS)  # v*R13, mul-ready


def _spliced_f(arr):
    """Strict (24, N) coord -> mul-ready digits of the RAW value v*R16 (no
    domain conversion — one balanced fold turns the canonical splice into
    mul-ready digits; value < 2^384 < 0.49*2^390, so the 30-digit clamp is
    exact). Used where the R16 factors cancel (x/z, y/z below)."""
    return LZ.fold(LZ.from_limbs16([arr[i] for i in range(FP.num_limbs)]))[
        : LZ.ELEM
    ]


# --- prepare: strict projective points -> kernel layout (ONE jit) -------------

@functools.partial(jax.jit, static_argnames=("curve", "c"))
def _prepare_inputs(points, scalars, *, curve: CurveOps, c: int):
    """points: projective batch in the strict radix-16 engine's Montgomery
    form, coord leaves (24, N) u32 (Fp2 coords as pairs); scalars (16, N)
    plain FR limbs. N must be a multiple of TILE.

    Returns (pts_arr (aff_rows, T, 8, 128) u32, digs_arr (W, T, 8, 128) u32).

    Affine conversion happens HERE (blocked batch inversion, ~3 muls/pt):
    the kernel runs the cheaper mixed addition and streams 2 coords instead
    of 3. Identity points (z = 0) have no affine form — their digits are
    masked to the dropped bucket 0, which is also what makes them correct
    (identity contributes nothing; blst mishandles exactly this,
    /root/reference/src/g1.rs:682-689).
    """
    kc = _kernel_curve2(curve)
    n = scalars.shape[-1]
    S = n // LANES  # all lazy math on (S, 128) 2-D shapes: 1-D (N,) arrays
    # lay out as (1, N) on TPU and run at 1/8 of the VPU rate
    x, y, z = jax.tree.map(
        lambda a: a.reshape(a.shape[0], S, LANES), points
    )

    # DOMAIN-CANCELLATION: work on the raw spliced values v*R16 — in the
    # quotient x/z (and y/z) the R16 factors cancel, so the affine result
    # mont_mul(x_raw, inv(z_raw)) lands directly in the lazy R13 domain
    # with ZERO explicit conversion multiplies (3 muls saved per point).
    if kc.name == "g2":
        ident = FO.is_zero(z[0]) & FO.is_zero(z[1])
        zl = (_spliced_f(z[0]), _spliced_f(z[1]))
        # 1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 + a1^2): one Fp batch inversion
        n0 = _mul(zl[0], zl[0])
        n1 = _mul(zl[1], zl[1])
        norm = LZ.fold_sum(LZ.add(n0, n1))
        one = LG.FP_LAZY.one(norm)
        norm = LZ.select(ident, one, norm)
        inv_norm = _inverse_any(norm, n)
        inv_z = (
            _mul(zl[0], inv_norm),
            LZ.neg(_mul(zl[1], inv_norm)),
        )
        aff = []
        for coord in (x, y):
            cl = (_spliced_f(coord[0]), _spliced_f(coord[1]))
            aff.append(_fp2_mul(cl, inv_z))
        rows = [r for coord in aff for comp in coord for r in pack30(LZ.store30(comp))]
    else:
        ident = FO.is_zero(z)
        zl = _spliced_f(z)
        one = LG.FP_LAZY.one(zl)
        zsafe = LZ.select(ident, one, zl)
        inv_z = _inverse_any(zsafe, n)
        aff = [_mul(_spliced_f(coord), inv_z) for coord in (x, y)]
        rows = [r for comp in aff for r in pack30(LZ.store30(comp))]

    mat = jnp.stack(rows)  # (aff_rows, S, 128)
    T = n // TILE
    pts_arr = mat.reshape(kc.aff_rows, T, SLOTS, LANES)
    digits = M.window_digits_signed(
        scalars.reshape(scalars.shape[0], S, LANES), c
    )  # (W, S, 128)
    digits = jnp.where(ident[None], jnp.uint32(0), digits)  # identity -> bucket 0
    W = digits.shape[0]
    digs_arr = digits.reshape(W, T, SLOTS, LANES)
    return pts_arr, digs_arr


# --- reduce: dump -> stacked lazy window sums (ONE jit) -----------------------

def _dump_to_points(dump, kc: KernelCurve2):
    """(W, B, rows, 8, 128) packed dump -> lazy bucket points with batch
    (TILE, W*B) (digit arrays). The W and B axes are FLATTENED so the
    stream fold below runs on lane-full (., W*B) batches instead of a
    (., W, B) layout whose 65-wide minor axis pads to 128 (round-3 reduce
    spent ~49% of its VPU ops on that padding)."""
    W, B, rows = dump.shape[0], dump.shape[1], dump.shape[2]
    mat = jnp.transpose(dump, (2, 3, 4, 0, 1)).reshape(rows, TILE, W * B)
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
    # (TILE, WB) -> (scan_chunk, group, WB)
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
    """Unrolled binary-tree fold of the leading axis: log2(size) add
    bodies on halving batches (eager CPU path; tried traced on TPU in
    round 5 and measured 3.7x SLOWER than the scan fold — see
    _reduce_dump)."""
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


@functools.partial(jax.jit, static_argnames=("kc", "B"))
def _reduce_dump(dump, *, kc: KernelCurve2, B: int):
    """dump (W, B, rows, 8, 128) -> stacked lazy window sums (n_fp*ELEM, W)."""
    W = dump.shape[0]
    pt = _dump_to_points(dump, kc)
    # scan fold, NOT the unrolled tree: measured on hardware (round 5),
    # the tree's big-batch adds ((512, W*B) level-0 temporaries) run the
    # reduce at 483 ms vs the scan's 129 ms — the scan's (chunk, W*B)
    # working set stays cache-resident while the tree thrashes HBM
    folded = _fold_streams_traced(pt, kc)  # batch (W*B,)
    folded = _tree_map_pt(lambda x: x.reshape(W, B), folded)
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


@functools.partial(jax.jit, static_argnames=("kc",))
def _egress_wsums(ws_stacked, *, kc: KernelCurve2):
    """Stacked lazy window sums (n_fp*ELEM, W) -> strict canonical
    projective coords (n_fp, 24, W), one program."""
    return _to_strict_stacked(kc.unstack_point(ws_stacked), kc)


def _finish_host(ws_stacked, kc: KernelCurve2, c: int):
    """Host-side Horner over the W window sums. The reference's window
    reduction is host-side too (/root/reference/src/gpu.rs:193-209); here
    it saves ~90 ms per MSM: the on-device scan runs ~W*(c+1) sequential
    group ops on a batch of ONE (pure dispatch latency), while the host
    does the same ~300 ops on Python ints in ~10 ms after a single
    W-point egress program + one tiny fetch."""
    from ..oracle import curve as OC
    from ..ops import convert as CV

    arr = _call(_egress_wsums, ws_stacked, kc=kc)
    # ONE host fetch of the stacked (n_fp, 24, W) array; slicing device
    # arrays per coordinate costs a synchronous tunnel roundtrip EACH
    # (~10 ms/array on this platform) — 6 of them for G2
    a = np.asarray(arr)
    if kc.name == "g2":
        pts = CV.g2_from_dev(((a[0], a[1]), (a[2], a[3]), (a[4], a[5])))
        ops, to_dev = OC.FP2_OPS, CV.g2_to_dev
    else:
        pts = CV.g1_from_dev((a[0], a[1], a[2]))
        ops, to_dev = OC.FP_OPS, CV.g1_to_dev
    total = None
    for w in range(len(pts) - 1, -1, -1):
        if total is not None:
            for _ in range(c):
                total = OC.double(ops, total)
        total = OC.add(ops, total, pts[w])
    # ONE upload of the stacked (n_fp, 24, 1) result — the to_dev +
    # device-stack route paid one dispatch per coordinate component
    from ..ops.limbs import FP as _FP
    from ..ops.limbs import ints_to_limbs as _itl

    def np_fp(v):
        return _itl([v * _FP.mont_r % _FP.modulus], _FP.num_limbs).T

    if kc.name == "g2":
        x, y, z = (
            ((0, 0), (1, 0), (0, 0)) if total is None
            else (total[0], total[1], (1, 0))
        )
        rows = [np_fp(cmp) for coord in (x, y, z) for cmp in coord]
    else:
        x, y, z = (0, 1, 0) if total is None else (total[0], total[1], 1)
        rows = [np_fp(coord) for coord in (x, y, z)]
    del to_dev  # superseded by the single-upload path
    return jnp.asarray(np.stack(rows).astype(np.uint32))


def _stack_strict(leaves, kc: KernelCurve2):
    if kc.name == "g2":
        return jnp.stack([leaves[i][j] for i in range(3) for j in range(2)])
    return jnp.stack(list(leaves))


def _finish_any(ws_stacked, kc: KernelCurve2, c: int):
    if _eager():
        return _finish_eager(ws_stacked, kc, c)
    return _finish_host(ws_stacked, kc, c)


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
    B = dump.shape[1]
    if _eager():
        W = dump.shape[0]
        pt = _dump_to_points(dump, kc)
        folded = _fold_streams_eager(pt, kc, TILE)
        folded = _tree_map_pt(lambda x: x.reshape(W, B), folded)
        ws = _bucket_suffix_seq(folded, kc, B)
        return kc.stack_point(ws)
    return _reduce_dump(dump, kc=kc, B=B)


def plan_chunk2(kc: KernelCurve2, c: int, hbm_budget_bytes: int = 8 << 30) -> int:
    """Largest power-of-two chunk (multiple of TILE) fitting the HBM budget.
    Footprint: input leaves + packed affine copy + inversion intermediates +
    digits + dump + its transpose.
    Analog of the reference's calc_chunk_size (/root/reference/src/gpu.rs:64-85)."""
    W = _num_windows(c)
    B = _num_buckets(c)
    fixed = 2 * W * B * kc.pt_rows * TILE * 4
    coords16 = kc.n_fp * 24  # strict projective input rows
    elem_words = LZ.ELEM * (2 if kc.name == "g2" else 1)
    per_point = (coords16 + kc.aff_rows + 4 * elem_words + W + 2) * 4
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
    scalars: (16, N) plain FR limbs, each value < 2^255 (the signed window
    transform drops the top carry window on that precondition — scalars
    reduced mod r always qualify; see msm.window_digits_signed). Returns a
    strict-Montgomery projective point with batch shape (1,) — drop-in
    compatible with curves/msm.py consumers. `maybe_abort`: zero-arg
    callable polled between chunk dispatches (ec-gpu's cancellation hook,
    /root/reference/src/gpu.rs:58,133-137).
    """
    from .msm import MsmAborted

    kc = _kernel_curve2(curve)
    if c is None:
        c = kc.c_default
    if c < 2:
        raise ValueError(f"MSM window c must be >= 2, got {c}")
    # clear failure for oversized windows instead of an opaque compiler
    # error: the 16MB VMEM budget is TOTAL (scratch + kernel-body scoped
    # stack); ~12MB of bucket scratch is the empirical ceiling (G1 c=7 at
    # 11.98MB compiles + runs; G2 c=6 at 12.16MB overflows by 4.18MB)
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
    stacked lazy window sums; the per-device sums are combined by a jitted
    log-depth tree fold (tiny: one (n_fp*ELEM, W) array each), then
    Horner'd. This is the multi-device execution the reference left as a
    TODO (/root/reference/src/gpu.rs:233-240), applied to the fast path.
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
    B = _num_buckets(c)

    def local(pa, da):
        dump = _accumulate2.__wrapped__(pa, da, kc=kc, c=c)
        W = dump.shape[0]
        pt = _dump_to_points(dump, kc)
        folded = _fold_streams_traced(pt, kc)
        folded = _tree_map_pt(lambda x: x.reshape(W, B), folded)
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
            in_specs=(Pspec(None, axis), Pspec(None, axis)),
            out_specs=Pspec(axis),
            check_vma=False,
        )(pa, da)

    ws = run(pts_arr, digs_arr)  # (ndev, n_fp*ELEM, W)
    total = _fold_device_wsums(ws, kc)
    out = _finish_any(total, kc, c)
    return _unstack_strict(out, kc)


@functools.partial(jax.jit, static_argnames=("kc",))
def _fold_device_wsums_jit(ws, *, kc: KernelCurve2):
    """Jitted log-depth fold of per-device stacked window sums: ONE dispatch
    regardless of device count (the round-3 host loop paid ~10 ms/dispatch
    per device — PERF.md §1)."""
    d = ws.shape[0]
    while d > 1:
        half = d // 2
        lo, hi = ws[:half], ws[half : 2 * half]
        folded = LG.full_add(
            kc.f,
            kc.unstack_point(jnp.moveaxis(lo, 0, -1)),
            kc.unstack_point(jnp.moveaxis(hi, 0, -1)),
        )
        rest = ws[2 * half :]
        ws = jnp.concatenate(
            [jnp.moveaxis(kc.stack_point(folded), -1, 0), rest], axis=0
        )
        d = half + rest.shape[0]
    return ws[0]


def _fold_device_wsums(ws, kc: KernelCurve2):
    if _eager():
        total = ws[0]
        for i in range(1, ws.shape[0]):
            total = _add_wsums2.__wrapped__(total, ws[i], kc=kc)
        return total
    return _fold_device_wsums_jit(ws, kc=kc)
