"""Attribute device time in a jax.profiler trace by HLO category / op.

Consumes the .trace.json.gz Chrome-trace that trace_train_step.py's
jax.profiler capture writes (pid = TPU device, per-HLO lane events carry
an `hlo_category` arg), aggregates device-lane op durations, and prints
per-step totals for the top categories and the top individual fusions.

    python tools/trace_train_step.py --gt 6 --out /tmp/trace_rt
    python tools/trace_report.py /tmp/trace_rt [--top 25]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path):
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(
        os.path.join(path, "plugins/profile/*/*.trace.json.gz")
    ))
    if not hits:
        sys.exit(f"no .trace.json.gz under {path}")
    return hits[-1]  # newest capture


def base_name(name):
    """Strip the .NNN instance suffix so repeated fusions aggregate."""
    return re.sub(r"\.\d+$", "", name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument(
        "--instances", default=None, metavar="CATEGORY",
        help="also list top individual HLO instances (no .NNN "
        "aggregation) of one hlo_category, with long_name details",
    )
    args = ap.parse_args()

    f = find_trace(args.path)
    data = json.load(gzip.open(f))
    events = data["traceEvents"]

    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    if not device_pids:
        sys.exit("no TPU device lane in trace (CPU-only capture?)")

    steps = [
        e for e in events
        if e.get("ph") == "X" and e["pid"] in device_pids
        and str(e.get("name", "")).startswith("jit_")
        and "run_id" in (e.get("args") or {})
    ]
    n_steps = max(1, len(steps))
    step_ms = sum(e["dur"] for e in steps) / 1e3 / n_steps

    by_cat = collections.Counter()
    by_op = collections.Counter()
    op_cat = {}
    by_inst = collections.Counter()
    inst_meta = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in device_pids:
            continue
        a = e.get("args") or {}
        cat = a.get("hlo_category")
        if cat is None:
            continue
        dur = e["dur"]
        total += dur
        by_cat[cat] += dur
        op = base_name(e["name"])
        by_op[op] += dur
        op_cat[op] = cat
        if args.instances and cat == args.instances:
            by_inst[e["name"]] += dur
            if e["name"] not in inst_meta:
                inst_meta[e["name"]] = str(
                    a.get("long_name") or a.get("tf_op") or ""
                )

    print(f"{f}")
    print(f"{n_steps} steps, device {step_ms:.1f} ms/step, "
          f"attributed {total/1e3/n_steps:.1f} ms/step\n")
    print(f"{'category':28s} {'ms/step':>9s} {'%':>6s}")
    for cat, us in by_cat.most_common():
        print(f"{cat:28s} {us/1e3/n_steps:9.2f} {100*us/total:6.1f}")
    print(f"\ntop {args.top} ops:")
    print(f"{'op':52s} {'category':20s} {'ms/step':>9s}")
    for op, us in by_op.most_common(args.top):
        print(f"{op[:52]:52s} {op_cat[op][:20]:20s} {us/1e3/n_steps:9.2f}")

    if args.instances:
        print(f"\ntop {args.top} '{args.instances}' instances:")
        for name, us in by_inst.most_common(args.top):
            print(f"{us/1e3/n_steps:8.2f}  {name}")
            meta = inst_meta.get(name, "")
            if meta:
                print(f"          {meta[:160]}")


if __name__ == "__main__":
    main()
