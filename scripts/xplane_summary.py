"""Summarize a jax.profiler xplane.pb: per-op self-time table, no
TensorBoard needed (the image's tensorboard_plugin_profile native
converter is incompatible with its TF build, so this parses the XSpace
proto directly — schema from tensorflow.tsl).

Usage: python scripts/xplane_summary.py <trace.xplane.pb> [top_n]
"""

import collections
import sys


def load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def summarize(xs, top_n=30):
    """(plane_name, total_ns, [(op_name, self_ns, count)]) per device plane."""
    out = []
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        agg = collections.Counter()
        cnt = collections.Counter()
        span_lo, span_hi = None, 0
        for line in plane.lines:
            lname = line.name.lower()
            # device op lines: XLA Ops / XLA Modules; skip step lines
            if "step" in lname or "module" in lname:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps // 1000  # ns
                agg[name] += dur
                cnt[name] += 1
                t0 = line.timestamp_ns + ev.offset_ps // 1000
                span_lo = t0 if span_lo is None else min(span_lo, t0)
                span_hi = max(span_hi, t0 + dur)
        if agg:
            total = sum(agg.values())
            rows = [
                (name, ns, cnt[name]) for name, ns in agg.most_common(top_n)
            ]
            out.append((plane.name, total, span_hi - (span_lo or 0), rows))
    return out


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    xs = load_xspace(path)
    for plane, total, span, rows in summarize(xs, top_n):
        print(f"=== plane {plane}: busy {total/1e6:.1f} ms over span "
              f"{span/1e6:.1f} ms")
        for name, ns, n in rows:
            print(f"{ns/1e6:9.2f} ms  x{n:<6d} {name[:110]}")


if __name__ == "__main__":
    main()
