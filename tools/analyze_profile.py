"""Summarize a jax.profiler trace captured by `bench.py --profile`.

Aggregates device op time from the newest xplane under .profile/ (or a
given path) by framework module (KMaXSegmenter submodule names), then
prints the top ops — the workflow used for the MSDA optimization log in
docs/PERFORMANCE.md.

Usage:
  python bench.py --profile
  python tools/analyze_profile.py [--trace .profile] [--iters 3] [--ops 20]
"""
from __future__ import annotations

import argparse
import collections
import glob
import json
import os


def load_op_rows(trace_dir: str):
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "framework_op_stats", {})
    tbl = json.loads(data)[0]
    cols = [c["id"] for c in tbl["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in tbl["rows"]]
    i_dev = cols.index("host_or_device")
    i_op = cols.index("operation")
    i_t = cols.index("total_time")
    return [(r[i_op], float(r[i_t]))
            for r in rows if r[i_dev] == "Device"]


def module_of(op: str) -> str:
    if "self_attn" in op and "wc_module" in op:
        return "wc_module/msda_core"
    if "KMaXSegmenter/" in op:
        parts = op.split("KMaXSegmenter/")[1].split("/")
        if parts[0] in ("pixel_decoder", "transformer_decoder") and len(parts) > 1:
            return f"{parts[0]}/{parts[1]}"
        return parts[0]
    return "(unattributed)"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trace", default=".profile")
    ap.add_argument("--iters", type=int, default=3,
                    help="benchmark iterations captured in the trace")
    ap.add_argument("--ops", type=int, default=20)
    args = ap.parse_args()

    rows = load_op_rows(args.trace)
    total = sum(t for _, t in rows)
    print(f"device total: {total / args.iters / 1000:.2f} ms/iter\n")

    groups = collections.Counter()
    coarse = collections.Counter()
    for op, t in rows:
        groups[module_of(op)] += t
        coarse[module_of(op).split("/")[0]] += t
    print("by module:")
    for k, v in coarse.most_common(12):
        print(f"  {v / total * 100:5.1f}%  {v / args.iters / 1000:8.2f} ms  {k}")
    print("\nby submodule:")
    for k, v in groups.most_common(18):
        print(f"  {v / total * 100:5.1f}%  {v / args.iters / 1000:8.2f} ms  {k}")
    print("\ntop ops:")
    for op, t in sorted(rows, key=lambda x: -x[1])[: args.ops]:
        print(f"  {t / total * 100:5.1f}%  {t / args.iters / 1000:8.2f} ms  {op[:110]}")


if __name__ == "__main__":
    main()
