"""Capture a jax.profiler trace of the v2 G1 MSM and print an op-level
summary (SURVEY §5 tracing gap; VERDICT r4 item 7).

Runs one warm msm_pallas2 at 2^logn under jax.profiler.trace, then
post-processes the xplane protobuf with tensorboard_plugin_profile into a
framework-op-stats table and prints the top ops by self time. The raw
trace directory is left on disk for TensorBoard.

Usage: python scripts/tpu_profile_msm.py [logn] [trace_dir]
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def _enable_compile_cache():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


_enable_compile_cache()


def log(m):
    print(f"[{time.perf_counter():9.1f}] {m}", flush=True)


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/msm_trace"

    from bench import _random_msm_instance
    from ark_blst_tpu.curves import msm_pallas2 as MP2
    from ark_blst_tpu.curves.group import G1
    from ark_blst_tpu.ops import convert as CV

    log(f"building 2^{logn} instance")
    pts, scalars, want = _random_msm_instance("g1", logn, seed=5)

    def run():
        out = MP2.msm_pallas2(pts, scalars, curve=G1, c=7)
        np.asarray(out[0])
        return out

    log("warmup")
    out = run()
    assert CV.g1_from_dev(out) == [want]
    log("tracing one MSM")
    with jax.profiler.trace(trace_dir):
        run()
    log(f"trace written to {trace_dir}")

    # post-process: xplane -> framework op stats table
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        log("no xplane.pb found (profiler unsupported on this platform?)")
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([paths[-1]], "framework_op_stats^",
                                      {})
    rows = json.loads(data) if isinstance(data, (str, bytes)) else data
    # rows: list-of-dicts or gviz table; handle both
    print("RAW_TYPE:", type(rows), flush=True)
    try:
        import csv
        import io

        data_csv, _ = rtd.xspace_to_tool_data([paths[-1]],
                                              "framework_op_stats^",
                                              {"tqx": "out:csv;"})
        if isinstance(data_csv, bytes):
            data_csv = data_csv.decode()
        rdr = csv.DictReader(io.StringIO(data_csv))
        table = sorted(rdr, key=lambda r: -float(r.get("Total self-time (us)", r.get("total_self_time_us", 0)) or 0))
        print("TOP 25 OPS BY SELF TIME:", flush=True)
        for r in table[:25]:
            keys = list(r.keys())
            print({k: r[k] for k in keys[:8]}, flush=True)
    except Exception as e:
        print("csv conversion failed:", e, flush=True)


if __name__ == "__main__":
    main()
