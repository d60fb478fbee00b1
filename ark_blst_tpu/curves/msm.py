"""L4: multi-scalar multiplication (Pippenger) as a sharded TPU array program.

TPU-native re-creation of the reference's two MSM paths:

* CPU path: blst's rayon-parallel Pippenger behind `VariableBaseMSM::msm`
  (/root/reference/src/g1.rs:602-619 -> blstrs `multi_exp`).
* GPU path: ec-gpu's window x group bucket kernel + host window reduction
  (/root/reference/src/gpu.rs:126-210; window sizing at :218-223, the
  window/group decomposition at :138-146).

We keep the *decomposition* (scalars cut into c-bit windows; points cut into
lanes/groups; per-(lane, window) bucket accumulation; bucket suffix-sum; final
Horner over windows) but express it as a vectorized JAX program:

* **Bucket accumulation**: a `lax.scan` over per-lane point streams. Each
  step gathers the addressed bucket (`take_along_axis`), performs ONE batched
  complete group addition over the whole (lanes x windows) front, and
  scatters the result back. Group-add count is the Pippenger optimum
  N x ceil(256/c); the gather/scatter is pure data movement. Unlike blst's
  Pippenger, identity inputs are handled correctly (complete formulas) —
  the reference documents that failure at /root/reference/src/g1.rs:682-689.
* **Lane reduction**: log2(lanes) halving rounds of batched adds.
* **Bucket reduction**: the classic sum_b b*B_b = sum of suffix sums,
  computed with `lax.associative_scan` (reverse) — log-depth, fully batched
  across windows; this replaces the reference's *host-side* sequential
  window reduction (/root/reference/src/gpu.rs:193-209) with on-device work.
* **Window reduction**: Horner (c doublings + 1 add per window) on a batch
  of one — the only sequential tail.
* **Multi-chip**: `shard_map` over the point axis; each device reduces its
  shard to W window sums, then an `all_gather` over ICI + a log-depth fold
  combines them. This implements the multi-device scaling the reference left
  as a TODO (single GPU hardcoded at /root/reference/src/gpu.rs:233-240).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import tower as T
from ..ops.limbs import FP, FR, LIMB_BITS
from .group import CurveOps, G1, G2

SCALAR_BITS = FR.num_limbs * LIMB_BITS  # 256


class MsmAborted(RuntimeError):
    """Raised when a `maybe_abort` callback requests cancellation between
    chunk dispatches — the TPU analog of ec-gpu's EcError::Aborted
    (/root/reference/src/gpu.rs:58,133-137)."""


def _tree_get(pt, idx):
    """Gather along the trailing bucket axis of every coordinate leaf."""
    def get(x):
        ix = jnp.broadcast_to(idx[None], x.shape[:-1] + (1,))
        return jnp.take_along_axis(x, ix, axis=-1)

    return jax.tree.map(get, pt)


def _tree_put(pt, idx, val):
    """Scatter `val` back along the trailing bucket axis (indices are unique
    per (lane, window) row, so no collision semantics are needed)."""
    def put(x, v):
        ix = jnp.broadcast_to(idx[None], x.shape[:-1] + (1,))
        return jnp.put_along_axis(x, ix, v, axis=-1, inplace=False)

    return jax.tree.map(put, pt, val)


def window_digits(scalars, c: int):
    """(16, N) plain FR limbs -> (W, N) window digits, W = ceil(256/c).

    Any window size 1..16 (digit j spans bits [j*c, j*c+c), possibly
    straddling a 16-bit limb boundary) — the same slicing the reference's
    GPU kernel performs on 32-bit limbs (/root/reference/src/gpu.rs:138-146)
    generalized so the window can be tuned to the memory budget.
    """
    assert 1 <= c <= LIMB_BITS
    W = (SCALAR_BITS + c - 1) // c
    mask = jnp.uint32((1 << c) - 1)
    digs = []
    for j in range(W):
        lo_bit = j * c
        k, off = divmod(lo_bit, LIMB_BITS)
        d = scalars[k] >> off
        if off + c > LIMB_BITS and k + 1 < FR.num_limbs:
            d = d | (scalars[k + 1] << (LIMB_BITS - off))
        digs.append(d & mask)
    return jnp.stack(digs)  # (W, N) little-endian windows


def window_digits_signed(scalars, c: int):
    """(16, N) plain FR limbs -> (W, N) SIGNED window digits packed as
    `magnitude | (sign << 15)`, magnitude in [0, 2^(c-1)], W = ceil(256/c).

    Standard signed-window transform: digit d and carry k satisfy
    raw_j + k_j = d_j + 2^c * k_{j+1} with d_j in [-2^(c-1), 2^(c-1)),
    except d_j = +2^(c-1) is kept positive (magnitude fits either way), so
    the bucket array shrinks to 2^(c-1)+1 entries and the point is
    conditionally negated instead — profitable exactly because group
    negation is free (`NEGATION_IS_CHEAP`, /root/reference/src/g1.rs:593-600).

    PRECONDITION: scalars < 2^255 (any scalar reduced mod r qualifies;
    every in-repo caller reduces first). The no-carry-window argument
    below depends on it: the W raw windows span W*c >= 256 bits, so the
    top raw digit is at most 2^(255 - (W-1)*c) - 1 and even with an
    incoming carry stays <= 2^(c-1) — it can never go negative, so the
    final carry is provably zero. A full 256-bit scalar would silently
    drop its top carry (ADVICE r4); rather than pay an always-zero extra
    window (1/38 of the whole MSM kernel, the round-3 design), the
    precondition is part of the public MSM contract (see msm_pallas2 /
    msm_auto docstrings).
    """
    assert 2 <= c <= LIMB_BITS - 1
    raw = window_digits(scalars, c)  # (W, N)
    W = raw.shape[0]
    assert W * c >= 256, "signed transform needs >= 1 slack bit at the top"
    half = jnp.uint32(1 << (c - 1))
    full = jnp.uint32(1 << c)
    digs = []
    carry = jnp.zeros_like(raw[0])
    for j in range(W):
        d = raw[j] + carry  # <= 2^c - 1 + 1 = 2^c
        neg = d > half  # use negative digit d - 2^c
        mag = jnp.where(neg, full - d, d)
        carry = neg.astype(jnp.uint32)
        digs.append(mag | (neg.astype(jnp.uint32) << 15))
    return jnp.stack(digs)  # (W, N)


def _scan(body, init, xs, length: int, fuse: bool):
    """lax.scan when fusing (TPU jit path); eager Python loop otherwise.

    The eager path exists for XLA:CPU, where compiling a scan whose body
    inlines dozens of ~600-limb-op field multiplies takes minutes; eagerly
    each field primitive is a small cached jit program, so the loop costs
    zero compilation.
    """
    if fuse:
        out, _ = lax.scan(lambda cv, x: (body(cv, x), None), init, xs)
        return out
    carry = init
    for i in range(length):
        carry = body(carry, jax.tree.map(lambda a: a[i], xs))
    return carry


def _bucket_accumulate(curve: CurveOps, points, digits, lanes: int, c: int,
                       fuse: bool = True):
    """Per-lane scan accumulating points into (lanes, W, B) buckets.

    points: projective batch, coord leaves (L, N); digits: (W, N).
    N must equal lanes * steps. Returns buckets with batch (lanes, W, B).
    """
    W = digits.shape[0]
    B = 1 << c
    n = digits.shape[-1]
    steps = n // lanes
    assert steps * lanes == n

    # (L, N) -> (steps, L, lanes) so the scan slices the leading axis.
    pts = jax.tree.map(
        lambda x: jnp.moveaxis(x.reshape(x.shape[0], steps, lanes), 1, 0), points
    )
    digs = jnp.moveaxis(digits.reshape(W, steps, lanes), 1, 0)  # (steps, W, lanes)

    buckets0 = curve.identity((lanes, W, B))

    def body(buckets, xs):
        pt_j, dig_j = xs  # coords (L, lanes); (W, lanes)
        idx = jnp.moveaxis(dig_j, 0, 1)[..., None].astype(jnp.int32)  # (lanes, W, 1)
        cur = _tree_get(buckets, idx)  # batch (lanes, W, 1)
        ptb = jax.tree.map(lambda x: x[..., None, None], pt_j)  # (L, lanes, 1, 1)
        new = curve.add(cur, ptb)
        return _tree_put(buckets, idx, new)

    return _scan(body, buckets0, (pts, digs), steps, fuse)


def _fold_axis(curve: CurveOps, pt, axis_size: int):
    """Log-depth tree reduction of the leading batch axis (size power of 2)."""
    assert axis_size & (axis_size - 1) == 0
    while axis_size > 1:
        half = axis_size // 2
        lo = jax.tree.map(lambda x: x[:, :half], pt)
        hi = jax.tree.map(lambda x: x[:, half:], pt)
        pt = curve.add(lo, hi)
        axis_size = half
    return jax.tree.map(lambda x: x[:, 0], pt)


def _bucket_reduce(curve: CurveOps, buckets, fuse: bool = True):
    """(W, B) buckets -> (W,) window sums: sum_b b * bucket[b].

    Classic running/total suffix accumulation, highest digit first:
    `running += bucket[b]; total += running` — the on-device twin of the
    reference's host-side window reduction (/root/reference/src/gpu.rs:193-209)
    but batched across all windows at once. Bucket 0 is dropped (digit 0
    contributes nothing; it exists only as the scatter target for zero
    digits). Scan body is 2 group adds, so the compiled program stays small.
    """
    bm1 = (buckets[0][0] if isinstance(buckets[0], tuple) else buckets[0]).shape[-1] - 1
    # leaves (L, W, B) -> (B-1, L, W), highest digit first.
    seq = jax.tree.map(
        lambda x: jnp.moveaxis(x[..., 1:], -1, 0)[::-1], buckets
    )
    W = (seq[0][0] if isinstance(seq[0], tuple) else seq[0]).shape[-1]
    init = (curve.identity((W,)), curve.identity((W,)))

    def body(carry, bucket_b):
        running, total = carry
        running = curve.add(running, bucket_b)
        total = curve.add(total, running)
        return (running, total)

    _, total = _scan(body, init, seq, bm1, fuse)
    return total  # batch (W,)


def _horner(curve: CurveOps, window_sums, c: int, fuse: bool = True):
    """(W,) window sums -> scalar result point: res = sum_w S_w << (c*w).
    A scan over windows (MSB first) keeps the trace one body long; the c
    doublings inside the body sit in a `fori_loop` so the traced body is
    ONE double + ONE add regardless of the window size (the doubling
    unroll was ~40% of the whole sharded-MSM compile on XLA:CPU)."""
    # (..., W) -> (W, ..., 1) MSB-first for scanning.
    seq = jax.tree.map(
        lambda x: jnp.moveaxis(x, -1, 0)[::-1][..., None], window_sums
    )
    W = (seq[0][0] if isinstance(seq[0], tuple) else seq[0]).shape[0]

    def body(acc, s_w):
        if fuse:
            acc = lax.fori_loop(0, c, lambda _, p: curve.double(p), acc)
        else:
            for _ in range(c):
                acc = curve.double(acc)
        return curve.add(acc, s_w)

    return _scan(body, curve.identity((1,)), seq, W, fuse)  # batch (1,)


def _pad_inputs(curve: CurveOps, points, scalars, multiple: int):
    """Pad the point axis to a multiple with (identity, scalar 0) pairs —
    harmless: zero digits land in the ignored bucket 0, and the complete
    addition law absorbs identities anyway."""
    n = scalars.shape[-1]
    pad = (-n) % multiple
    if pad == 0:
        return points, scalars
    idp = curve.identity((pad,))
    points = jax.tree.map(
        lambda x, i: jnp.concatenate([x, i], axis=-1), points, idp
    )
    scalars = jnp.pad(scalars, ((0, 0), (0, pad)))
    return points, scalars


def _msm_local(curve: CurveOps, points, scalars, c: int, lanes: int,
               fuse: bool = True):
    """Single-device MSM up to window sums: returns (W,)-batched partials."""
    lanes = min(lanes, max(1, scalars.shape[-1]))
    while lanes & (lanes - 1):
        lanes -= 1  # round down to a power of two
    points, scalars = _pad_inputs(curve, points, scalars, lanes)
    digits = window_digits(scalars, c)
    buckets = _bucket_accumulate(curve, points, digits, lanes, c, fuse)
    buckets = _fold_axis(curve, buckets, lanes)  # batch (W, B)
    return _bucket_reduce(curve, buckets, fuse)  # batch (W,)


def _msm_impl(points, scalars, curve: CurveOps, c: int, lanes: int,
              fuse: bool = True):
    sums = _msm_local(curve, points, scalars, c, lanes, fuse)
    return _horner(curve, sums, c, fuse)


_msm_jitted = jax.jit(
    _msm_impl, static_argnames=("curve", "c", "lanes", "fuse")
)


def msm(points, scalars, curve: CurveOps = G1, c: int = 8, lanes: int = 128,
        use_jit: bool | None = None):
    """Single-chip Pippenger MSM.

    points: projective batch (coord leaves (L, N)); scalars: (16, N) plain
    (non-Montgomery) FR limbs. Returns a projective point with batch shape
    (1,). Equivalent of `VariableBaseMSM::msm`
    (/root/reference/src/g1.rs:602-632) — identity points permitted.

    `use_jit=None` auto-selects: one fused jit program on TPU; staged
    execution elsewhere (XLA:CPU chokes on the fully inlined graph, and the
    stages are individually jitted anyway).
    """
    if use_jit is None:
        use_jit = jax.default_backend() == "tpu"
    fn = _msm_jitted if use_jit else _msm_impl
    return fn(points, scalars, curve=curve, c=c, lanes=lanes, fuse=use_jit)


def msm_auto(points, scalars, curve: CurveOps = G1, hbm_budget_bytes: int = 6 << 30,
             use_jit: bool | None = None, maybe_abort=None):
    """MSM with the execution strategy chosen automatically.

    Scalars must be < 2^255 (reduced mod r) — the TPU path's signed window
    transform relies on it (window_digits_signed docstring).

    On TPU: the v2 lazy-engine VMEM-bucket kernel with the largest signed
    window whose bucket array fits VMEM (G1: c=7, G2: c=5), via the
    HBM-budgeted chunked driver (msm_pallas2) — compiled chunk programs
    reused for any n, with the `maybe_abort` cancellation hook honored
    between chunk dispatches (TPU-only: off-TPU backends ignore it after
    one initial poll). Off-TPU: the scan-based pipeline with (c, lanes) from
    the memory-budgeted planner (config.plan_msm) — the completed analog of
    the reference's `calc_chunk_size` + window heuristic
    (/root/reference/src/gpu.rs:64-85, 218-223)."""
    if jax.default_backend() == "tpu":
        from .msm_pallas2 import msm_pallas2

        return msm_pallas2(
            points, scalars, curve=curve,
            hbm_budget_bytes=hbm_budget_bytes, maybe_abort=maybe_abort,
        )
    from ..config import plan_msm

    if maybe_abort is not None and maybe_abort():
        raise MsmAborted("aborted before dispatch")
    limbs = FP.num_limbs * (2 if curve.name == "g2" else 1)
    plan = plan_msm(max(1, scalars.shape[-1]), hbm_budget_bytes, coords=3, limbs=limbs)
    return msm(points, scalars, curve=curve, c=plan.c, lanes=plan.lanes,
               use_jit=use_jit)


from dataclasses import dataclass as _dataclass


@_dataclass(frozen=True)
class _VaryingCurve(CurveOps):
    """CurveOps whose identity constants are pcast-lifted (to='varying') to the
    shard_map mesh axis, so scan carries type-check as device-varying
    (check_vma stays ON, unlike round 1's check_vma=False escape hatch)."""

    vary: object = None

    def identity(self, batch_shape):
        return self.vary(CurveOps.identity(self, batch_shape))


def _fold_leading_scan(curve: CurveOps, pt):
    """Fold the leading batch axis with a lax.scan (ONE traced add body
    regardless of the axis size — the unrolled log-depth tree costs one
    compiled add body per level, which dominates XLA:CPU compile time for
    device counts >= 4; at MSM scale the folded arrays are tiny so the
    sequential steps are irrelevant)."""
    first = jax.tree.map(lambda x: x[:, 0], pt)
    rest = jax.tree.map(lambda x: jnp.moveaxis(x[:, 1:], 1, 0), pt)
    acc, _ = lax.scan(lambda a, x: (curve.add(a, x), None), first, rest)
    return acc


def _horner_host(curve: CurveOps, window_sums, c: int):
    """Host-side Horner over the W per-window sums — mirrors the production
    TPU path's host finish (msm_pallas2._finish_host) and the reference's
    own host-side window reduction (/root/reference/src/gpu.rs:193-209).
    `window_sums`: strict-engine projective batch, leaves (L, W)."""
    from ..ops import convert as CV
    from ..oracle import curve as OC

    if curve.name == "g2":
        pts, ops, to_dev = CV.g2_from_dev(window_sums), OC.FP2_OPS, CV.g2_to_dev
    else:
        pts, ops, to_dev = CV.g1_from_dev(window_sums), OC.FP_OPS, CV.g1_to_dev
    total = None
    for w in range(len(pts) - 1, -1, -1):
        if total is not None:
            for _ in range(c):
                total = OC.double(ops, total)
        total = OC.add(ops, total, pts[w])
    return to_dev([total])


def msm_sharded(points, scalars, mesh: Mesh, curve: CurveOps = G1,
                c: int = 8, lanes: int = 128, axis: str = "data",
                finish: str = "device"):
    """Multi-chip MSM: points sharded over `mesh` axis `axis`; per-device
    bucket pipeline inside shard_map producing per-device window partials;
    cross-device fold + Horner outside (XLA inserts the gather over ICI).

    The multi-device axis the reference never built
    (/root/reference/src/gpu.rs:233-240 hardcodes one GPU and leaves
    chunking as a TODO).

    finish: "device" = Horner inside the same jit program; "host" = the jit
    program ends at the cross-device folded window sums and the W-step
    Horner tail runs on host ints (production parity: the TPU kernel path
    finishes on host too, msm_pallas2._finish_host — and on XLA:CPU it
    drops the largest compile body from the cold-start path).
    """
    ndev = mesh.shape[axis]

    def local(pts, scs):
        vary = lambda t: jax.tree.map(
            lambda x: lax.pcast(x, axis, to="varying"), t
        )
        vcurve = _VaryingCurve(curve.name, curve.f, vary)
        sums = _msm_local(vcurve, pts, scs, c, lanes)  # leaves (L, W)
        # add a leading per-device axis so out_specs can shard on it
        return jax.tree.map(lambda x: x[:, None], sums)  # (L, 1, W)

    pspec = jax.tree.map(lambda _: P(None, axis), points)

    @functools.partial(jax.jit, static_argnames=("do_horner",))
    def run(points, scalars, do_horner: bool):
        partials = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(pspec, P(None, axis)),
            out_specs=jax.tree.map(lambda _: P(None, axis, None), points),
        )(points, scalars)  # leaves (L, ndev, W) — replicated after exit
        folded = _fold_leading_scan(curve, partials)  # batch (W,)
        return _horner(curve, folded, c) if do_horner else folded

    if finish == "host":
        return _horner_host(curve, run(points, scalars, False), c)
    return run(points, scalars, True)


def msm_naive(points, scalars, curve: CurveOps = G1):
    """Differential baseline: per-point scalar_mul then log-fold — the role
    of the naive fold in /root/reference/src/tests.rs:50-67."""
    n = scalars.shape[-1]
    prods = curve.scalar_mul(points, scalars, num_bits=SCALAR_BITS)
    size = 1 << (n - 1).bit_length()
    if size != n:
        idp = curve.identity((size - n,))
        prods = jax.tree.map(
            lambda x, i: jnp.concatenate([x, i], axis=-1), prods, idp
        )
    while size > 1:
        half = size // 2
        lo = jax.tree.map(lambda x: x[..., :half], prods)
        hi = jax.tree.map(lambda x: x[..., half:], prods)
        prods = curve.add(lo, hi)
        size = half
    return prods  # batch (1,)
