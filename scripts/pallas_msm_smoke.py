"""CPU interpret-mode smoke test of the VMEM-bucket MSM kernel.

Compares msm_pallas (interpret=True) against the host oracle on a small
instance. Small scalars keep the oracle fast; a couple of full-width
scalars exercise the high windows.
"""

import os
import random
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ark_blst_tpu.curves import msm_pallas as MP
from ark_blst_tpu.curves.group import G1, G2
from ark_blst_tpu.oracle import curve as OC
from ark_blst_tpu.oracle import field as OF
from ark_blst_tpu.ops import convert as CV
from ark_blst_tpu.ops import dispatch as D

MP.INTERPRET = True
D.set_backend("jnp")


def main(which="g1", n=64, c=4):
    rng = random.Random(5)
    if which == "g1":
        mul, to_dev, from_dev, curve, ops = (
            OC.g1_mul, CV.g1_to_dev, CV.g1_from_dev, G1, OC.FP_OPS,
        )
        gen = OF.G1_GEN
    else:
        mul, to_dev, from_dev, curve, ops = (
            OC.g2_mul, CV.g2_to_dev, CV.g2_from_dev, G2, OC.FP2_OPS,
        )
        gen = OF.G2_GEN

    # scalars < 2^(3c) so max_windows=4 is sound for signed digits (one
    # carry window) — keeps interpret mode fast
    pts = [mul(gen, rng.randrange(1, OF.R)) for _ in range(8)]
    pts = [pts[i % 8] for i in range(n)]
    pts[3] = None  # identity input
    scs = [rng.randrange(1 << (3 * c)) for _ in range(n)]
    scs[3] = rng.randrange(1 << (3 * c))

    points = to_dev(pts)
    scalars = CV.fr_to_dev(scs)

    t0 = time.time()
    out = MP.msm_pallas(points, scalars, curve=curve, c=c, max_windows=4)
    got = from_dev(out)
    print(f"{which} msm_pallas n={n} c={c}: {time.time()-t0:.1f}s")
    exp = OC.msm(ops, pts, scs)
    assert got == [exp], f"MISMATCH: {got[0]} != {exp}"
    print("oracle check: OK")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "g1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    main(which, n, c)
