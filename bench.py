"""Headline benchmark: G1 Pippenger MSM throughput (points/s) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (plus
component metrics in an "extra" field).

The reference publishes no numbers (BASELINE.md; BASELINE.json "published"
is {}), so `vs_baseline` is computed against the north-star peg: ec-gpu
-class MSM on a single A100 (~1.6e7 points/s at 2^22 — typical published
bellperson/ec-gpu figures; the reference's GPU path is that kernel family,
/root/reference/src/gpu.rs). NOTE this is a CROSS-SIZE estimate when the
TPU run size differs from 2^22; the metric name carries the actual size.

Timing is honest: every rep ends with a host fetch of the result, because
`block_until_ready` under-reports on the experimental remote-TPU platform
(async dispatch returns before execution completes).
"""

from __future__ import annotations

import json
import random
import sys
import time

import numpy as np

A100_ECGPU_POINTS_PER_S = 1.6e7  # cross-size peg, see module docstring


def _timed(fn, reps):
    fn()  # warmup (compile)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    return (time.perf_counter() - t0) / reps, out


def _enable_compile_cache():
    """Persistent XLA/Mosaic compile cache: the MSM kernel program takes
    ~10 min to compile on the remote TPU; cached reruns skip it."""
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
    import jax

    _enable_compile_cache()
    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    from ark_blst_tpu.curves import msm_pallas as MP
    from ark_blst_tpu.curves.group import G1
    from ark_blst_tpu.oracle import curve as OC
    from ark_blst_tpu.oracle import field as OF
    from ark_blst_tpu.ops import convert as CV

    if on_tpu:
        # signed windows: B=33 buckets, 44 windows; chunked driver with a
        # fixed 2^18-point chunk so ONE compiled kernel program serves the
        # timing run, the spot-check, and any larger n
        logn, c, reps, chunk = 20, 6, 3, 1 << 18
    else:  # smoke fallback (driver runs this on real TPU hardware)
        logn, c, reps, chunk = 10, 4, 1, None
    n = 1 << logn

    rng = random.Random(7)
    base = [OC.g1_mul(OF.G1_GEN, rng.randrange(1, OF.R)) for _ in range(64)]
    pts_host = [base[i % 64] for i in range(n)]
    scs_host = [rng.randrange(OF.R) for _ in range(n)]
    points = jax.device_put(CV.g1_to_dev(pts_host))
    scalars = jax.device_put(CV.fr_to_dev(scs_host))

    def call(p, s):
        if chunk is not None:
            return MP.msm_pallas_chunked(p, s, curve=G1, c=c, chunk=chunk)
        return MP.msm_pallas(p, s, curve=G1, c=c)

    def run():
        out = call(points, scalars)
        np.asarray(out[0])  # host fetch forces completion
        return out

    dt, out = _timed(run, reps)
    pps = n / dt

    # correctness spot-check (oracle differential): zero all but the first
    # k scalars so the SAME compiled program is reused (a smaller-shape call
    # would trigger a second multi-minute kernel compile)
    k = 64
    scs_check = scs_host[:k] + [0] * (n - k)
    small = call(points, jax.device_put(CV.fr_to_dev(scs_check)))
    expected = OC.msm(OC.FP_OPS, pts_host[:k], scs_host[:k])
    assert CV.g1_from_dev(small) == [expected], "MSM mismatch vs oracle"

    print(
        json.dumps(
            {
                "metric": f"g1_msm_points_per_s_2^{logn}_{backend}",
                "value": round(pps, 1),
                "unit": "points/s",
                "vs_baseline": round(pps / A100_ECGPU_POINTS_PER_S, 4),
                "extra": {
                    "msm_ms": round(dt * 1e3, 1),
                    "window_c": c,
                    "chunk": chunk,
                    "baseline_note": "cross-size vs A100 ec-gpu ~1.6e7 pts/s at 2^22",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
