"""Bucket a captured xplane trace's per-op device self time.

Usage: python scripts/trace_buckets.py /tmp/trace_dir [--steps 10] [--top 25]

Prints total device self-time per bucket (convolution / fusion-loop /
copy / attention-custom-call / all-reduce / other) and the top-N ops,
divided by --steps to give per-step ms.  Companion to
scripts/roofline.py (which does the per-conv-fusion roofline); this one
is the quick "where did the step go" view.
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rows_from(trace_dir: str):
    import glob
    import json

    from xprof.convert import raw_to_tool_data as rtd

    xs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                   recursive=True)
    assert xs, f"no xplane under {trace_dir}"
    data, _ = rtd.xspace_to_tool_data(xs, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    cols = [c["id"] for c in obj["cols"]]
    return [{c: (cell or {}).get("v") for c, cell in zip(cols, r["c"])}
            for r in obj["rows"]]


def bucket_of(cat: str, expr: str, name: str) -> str:
    s = (cat or "").lower()
    e = (expr or "") + " " + (name or "")
    if "convolution" in s or "conv" in e.split("(")[0]:
        return "conv-fusion"
    if "custom-call" in s or "custom_call" in e:
        return "custom-call (pallas)"
    if "copy" in s:
        return "copy"
    if "all-reduce" in s or "reduce-scatter" in s or "all-gather" in s:
        return "collective"
    if "fusion" in s or "loop" in s or "elementwise" in s:
        return "loop-fusion"
    return s or "other"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--steps", type=int, default=10,
                   help="steps in the traced call (K of the scan)")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    rows = rows_from(args.trace_dir)
    key_time = None
    sample = rows[0] if rows else {}
    for k in ("total_self_time_us", "total_self_time",
              "self_time_us", "totalSelfTimeUs"):
        if k in sample:
            key_time = k
            break
    assert key_time, f"no self-time column in {list(sample)}"

    buckets = collections.Counter()
    ops = []
    for r in rows:
        t = float(r.get(key_time) or 0.0)
        cat = str(r.get("hlo_category") or r.get("category") or "")
        name = str(r.get("hlo_op_name") or r.get("hlo_op") or "")
        expr = str(r.get("hlo_op_expression") or "")
        buckets[bucket_of(cat, expr, name)] += t
        ops.append((t, cat, name, expr[:140]))

    total = sum(buckets.values())
    print(f"total device self time: {total / 1e3:.2f} ms "
          f"({total / 1e3 / args.steps:.3f} ms/step)")
    for b, t in buckets.most_common():
        print(f"  {b:<22} {t / 1e3 / args.steps:8.3f} ms/step "
              f"({100 * t / total:5.1f}%)")
    print(f"\ntop {args.top} ops (ms/step):")
    for t, cat, name, expr in sorted(ops, reverse=True)[:args.top]:
        print(f"  {t / 1e3 / args.steps:8.3f}  [{cat}] {name}  {expr}")


if __name__ == "__main__":
    main()
