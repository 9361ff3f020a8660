"""Summarize a jax.profiler device trace: time by HLO category + top ops.

Usage:
    python scripts/trace_summary.py <trace_dir_or_xplane.pb> [top_n]

Pairs with ``pistoseg_tpu.core.profiling.device_trace`` (BENCH_PROFILE):
capture with ``with device_trace("/tmp/t"): ...``, then point this script
at ``/tmp/t``.  Uses the xprof converter (the tensorboard_plugin_profile
one in this image has a protobuf mismatch; xprof's works).
"""

import collections
import glob
import json
import sys


def summarize(xplane_path: str, top_n: int = 15) -> None:
    from xprof.convert.raw_to_tool_data import xspace_to_tool_data

    data, _ = xspace_to_tool_data([xplane_path], "hlo_stats", {})
    doc = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["id"] for c in doc["cols"]]
    i_cat = cols.index("category")
    i_name = cols.index("hlo_op_name")
    i_time = cols.index("total_self_time")
    i_bound = cols.index("bound_by") if "bound_by" in cols else None

    by_cat, by_op = collections.Counter(), collections.Counter()
    op_bound = {}
    for r in doc["rows"]:
        c = r["c"]
        t = float(c[i_time]["v"])
        by_cat[c[i_cat]["v"]] += t
        name = c[i_name]["v"][:80]
        by_op[name] += t
        if i_bound is not None:
            op_bound[name] = c[i_bound]["v"]
    total = sum(by_cat.values())
    print(f"device total: {total / 1e3:.1f} ms (all traced steps)")
    print("\nby HLO category:")
    for k, v in by_cat.most_common():
        print(f"  {k:32s} {v / 1e3:9.2f} ms  {100 * v / total:5.1f}%")
    print(f"\ntop {top_n} ops (self time):")
    for k, v in by_op.most_common(top_n):
        bound = f"  [{op_bound.get(k, '')}]" if op_bound.get(k) else ""
        print(f"  {v / 1e3:8.2f} ms  {100 * v / total:4.1f}%  {k}{bound}")


def main():
    target = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    if target.endswith(".pb"):
        paths = [target]
    else:
        paths = sorted(glob.glob(f"{target}/**/*.xplane.pb", recursive=True))
    if not paths:
        sys.exit(f"no .xplane.pb under {target}")
    summarize(paths[-1], top_n)


if __name__ == "__main__":
    main()
