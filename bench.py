"""Headline benchmark: G1 Pippenger MSM throughput (points/s) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is computed
against the BASELINE.json north-star peg — ec-gpu-class MSM on a single
A100, ~1.6e7 points/s at 2^22 (typical published bellperson/ec-gpu figures;
the reference's own GPU path, /root/reference/src/gpu.rs, is the same
kernel family). vs_baseline = ours / that estimate.
"""

from __future__ import annotations

import json
import random
import sys
import time

A100_ECGPU_POINTS_PER_S = 1.6e7


def main():
    import jax

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    from ark_blst_tpu.curves import msm as M
    from ark_blst_tpu.curves.group import G1
    from ark_blst_tpu.oracle import curve as OC
    from ark_blst_tpu.oracle import field as OF
    from ark_blst_tpu.ops import convert as CV

    if on_tpu:
        n, c, lanes = 1 << 18, 8, 128
    else:  # smoke fallback (driver runs this on real TPU hardware)
        n, c, lanes = 1 << 10, 8, 16

    rng = random.Random(7)
    base = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(64)]
    pts_host = [base[i % 64] for i in range(n)]
    scs_host = [rng.randrange(OF.R) for _ in range(n)]
    points = CV.g1_to_dev(pts_host)
    scalars = CV.fr_to_dev(scs_host)
    points = jax.device_put(points)
    scalars = jax.device_put(scalars)

    def run():
        out = M.msm(points, scalars, curve=G1, c=c, lanes=lanes, use_jit=on_tpu)
        jax.block_until_ready(out)
        return out

    out = run()  # warmup / compile

    # correctness spot-check on a small prefix (oracle differential)
    k = 32
    small = M.msm(
        jax.tree.map(lambda x: x[..., :k], points),
        scalars[:, :k],
        curve=G1,
        c=c,
        lanes=8,
        use_jit=on_tpu,
    )
    expected = OC.msm(OC.FP_OPS, pts_host[:k], scs_host[:k])
    assert CV.g1_from_dev(small) == [expected], "MSM mismatch vs oracle"

    reps = 3 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
    dt = (time.perf_counter() - t0) / reps

    pps = n / dt
    print(
        json.dumps(
            {
                "metric": f"g1_msm_points_per_s_2^{n.bit_length() - 1}_{backend}",
                "value": round(pps, 1),
                "unit": "points/s",
                "vs_baseline": round(pps / A100_ECGPU_POINTS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
