"""L6 API surface: the `Bls12` pairing engine.

Mirrors /root/reference/src/pairing.rs:34-81 — the `ark_ec::pairing::Pairing`
implementation: `multi_miller_loop` with identity-pairs-substitute-one
semantics (src/pairing.rs:58-60), `final_exponentiation`
(src/pairing.rs:76-80), and the derived `pairing`/`multi_pairing` entry
points. Where the reference calls blst C/assembly (`miller_loop_lines`,
`blst_fp12_mul`), the host path here uses the trusted oracle and the batch
path dispatches to the TPU pairing pipeline (curves/pairing.py).
"""

from __future__ import annotations

from .fields import Fp12, Gt
from .groups import G1Affine, G1Projective, G2Affine, G2Prepared, G2Projective
from .oracle import pairing as OP


class MillerLoopOutput:
    """Un-exponentiated Miller product (arkworks `MillerLoopOutput`)."""

    __slots__ = ("f",)

    def __init__(self, f: Fp12):
        self.f = f if isinstance(f, Fp12) else Fp12(f)

    def __eq__(self, other):
        return isinstance(other, MillerLoopOutput) and self.f == other.f

    def __repr__(self):
        return f"MillerLoopOutput({self.f!r})"


def _as_g1_affine(p) -> G1Affine:
    if isinstance(p, G1Projective):
        return p.into_affine()
    if isinstance(p, G1Affine):
        return p
    raise TypeError(f"expected G1 point, got {type(p).__name__}")

def _as_g2_prepared(q) -> G2Prepared:
    if isinstance(q, G2Prepared):
        return q
    if isinstance(q, G2Projective):
        q = q.into_affine()
    if isinstance(q, G2Affine):
        return G2Prepared.from_affine(q)
    raise TypeError(f"expected G2 point or G2Prepared, got {type(q).__name__}")


class Bls12:
    """The pairing engine (/root/reference/src/pairing.rs:34-81).

    Host path: oracle fast pairing (projective line coefficients + sparse
    014 muls + cyclotomic final exp — the exact algorithm the device twin
    runs). Device path: `pairing_batch` / backend="device" on
    `multi_miller_loop`, dispatching to curves/pairing.py for batched
    throughput on TPU.
    """

    # type bindings, mirroring src/pairing.rs:42-45
    G1 = G1Projective
    G2 = G2Projective
    G1Affine = G1Affine
    G2Affine = G2Affine
    G2Prepared = G2Prepared
    TargetField = Gt

    @staticmethod
    def multi_miller_loop(ps, qs, backend: str | None = None) -> MillerLoopOutput:
        """Product of Miller loops over pairs; identity pairs contribute one
        (src/pairing.rs:49-74). `qs` entries may be G2 points or G2Prepared.
        backend: None=auto (device iff on TPU and no prepared inputs),
        "host", or "device"."""
        import jax

        ps = [_as_g1_affine(p) for p in ps]
        assert len(ps) == len(qs)
        has_prepared = any(isinstance(q, G2Prepared) for q in qs)
        if backend is None:
            backend = (
                "device"
                if jax.default_backend() == "tpu" and not has_prepared and ps
                else "host"
            )

        if backend == "device":
            if has_prepared:
                raise ValueError("device path takes raw G2 points, not G2Prepared")
            return MillerLoopOutput(
                Fp12(_device_multi_miller([p.p for p in ps], [q.p for q in qs]))
            )

        qs = [_as_g2_prepared(q) for q in qs]
        f = OP.FP12_ONE
        for p, q in zip(ps, qs):
            if p.is_zero() or q.is_identity():
                continue  # substitute one, src/pairing.rs:58-60
            f = OP.fp12_mul(f, OP.miller_loop(p.p, q.coeffs))
        return MillerLoopOutput(Fp12(f))

    @staticmethod
    def final_exponentiation(mlo: MillerLoopOutput) -> Gt:
        """f -> f^((p^12-1)/r) via easy part + cyclotomic chain
        (src/pairing.rs:76-80)."""
        f = mlo.f if isinstance(mlo, MillerLoopOutput) else mlo
        return Gt(OP.final_exp(f.v if isinstance(f, Fp12) else f))

    @classmethod
    def pairing(cls, p, q, backend: str | None = None) -> Gt:
        """e(P, Q); identity inputs yield one."""
        return cls.final_exponentiation(cls.multi_miller_loop([p], [q], backend))

    @classmethod
    def multi_pairing(cls, ps, qs, backend: str | None = None) -> Gt:
        """prod_i e(P_i, Q_i)."""
        return cls.final_exponentiation(cls.multi_miller_loop(ps, qs, backend))

    @staticmethod
    def prepare_g2_batch(qs, fuse=None):
        """Device-side G2 line-coefficient precomputation, returned as a
        `curves.pairing.DeviceG2Prepared` for reuse across `pairing_batch`
        calls — the amortization that is the whole point of `G2Prepared`
        (/root/reference/src/g2.rs:650-694), on the device path."""
        import jax.numpy as jnp
        import numpy as np

        from .curves import pairing as DP
        from .ops import convert as CV

        qs = [q.into_affine() if isinstance(q, G2Projective) else q for q in qs]
        q_inf = np.array([q.is_zero() for q in qs])
        gen2 = G2Affine.generator().p
        qv = [gen2 if q.is_zero() else q.p for q in qs]
        qdev = (
            CV.fp2_to_dev([q[0] for q in qv]),
            CV.fp2_to_dev([q[1] for q in qv]),
        )
        return DP.prepare_g2_device(qdev, q_inf=jnp.asarray(q_inf), fuse=fuse)

    @staticmethod
    def pairing_batch(ps, qs, fuse=None):
        """Elementwise batched pairings on device: [e(P_i, Q_i)] as a list of
        Gt — the TPU throughput entry point (no reference analog; its GPU
        layer never reached the pairing). `qs` may be a list of G2 points OR
        a `DeviceG2Prepared` from `prepare_g2_batch` (prepare once, pair
        many — skips the line precomputation entirely)."""
        import jax.numpy as jnp
        import numpy as np

        from .curves import pairing as DP
        from .ops import convert as CV

        ps = [_as_g1_affine(p) for p in ps]
        p_inf = np.array([p.is_zero() for p in ps])
        gen1 = G1Affine.generator().p
        px, py = zip(*[(gen1 if p.is_zero() else p.p) for p in ps])
        pdev = (CV.fp_to_dev(list(px)), CV.fp_to_dev(list(py)))

        if isinstance(qs, DP.DeviceG2Prepared):
            assert qs.n == len(ps), "prepared batch size mismatch"
            out = DP.pairing_prepared(
                pdev, qs, p_inf=jnp.asarray(p_inf), fuse=fuse
            )
            return [Gt(v) for v in CV.fp12_from_dev(out)]

        if any(isinstance(q, G2Prepared) for q in qs):
            raise ValueError(
                "device path takes raw G2 points or a DeviceG2Prepared "
                "(Bls12.prepare_g2_batch), not host G2Prepared"
            )
        qs = [q.into_affine() if isinstance(q, G2Projective) else q for q in qs]
        q_inf = np.array([q.is_zero() for q in qs])
        gen2 = G2Affine.generator().p
        qv = [gen2 if q.is_zero() else q.p for q in qs]
        qdev = (
            CV.fp2_to_dev([q[0] for q in qv]),
            CV.fp2_to_dev([q[1] for q in qv]),
        )
        out = DP.pairing(
            pdev, qdev, p_inf=jnp.asarray(p_inf), q_inf=jnp.asarray(q_inf), fuse=fuse
        )
        return [Gt(v) for v in CV.fp12_from_dev(out)]


def _device_multi_miller(p_pts, q_pts):
    """Host affine tuples -> device multi_miller_loop -> oracle fp12 value.
    Identity inputs are masked to one inside the device pipeline."""
    import jax.numpy as jnp
    import numpy as np

    from .curves import pairing as DP
    from .ops import convert as CV
    from .oracle import field as OF

    p_inf = np.array([p is None for p in p_pts])
    q_inf = np.array([q is None for q in q_pts])
    ps = [OF.G1_GEN if p is None else p for p in p_pts]
    qs = [OF.G2_GEN if q is None else q for q in q_pts]
    pdev = (CV.fp_to_dev([p[0] for p in ps]), CV.fp_to_dev([p[1] for p in ps]))
    qdev = (CV.fp2_to_dev([q[0] for q in qs]), CV.fp2_to_dev([q[1] for q in qs]))
    out = DP.multi_miller_loop(
        pdev, qdev, p_inf=jnp.asarray(p_inf), q_inf=jnp.asarray(q_inf)
    )
    return CV.fp12_from_dev(out)[0]
