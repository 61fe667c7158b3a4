"""Aggregate a jax.profiler trace into per-op-bucket device time.

Usage: python tools/trace_attr.py /tmp/prof_dir [--top 30] [--scope]

Reads the newest plugins/profile/*/'*.trace.json.gz', keeps TPU device-lane
complete events ("ph" == "X"), and attributes wall time per HLO bucket
(fusion / convolution / copy / custom-call / ...) and per individual op name.
With --scope, also splits by the leading jax scope in the tf_op metadata
(e.g. "stagenet4/cost_reg") so model components can be ranked.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def newest_trace(root):
    cands = glob.glob(os.path.join(
        root, "plugins", "profile", "*", "*.trace.json.gz"))
    if not cands:
        sys.exit(f"no trace.json.gz under {root}")
    return max(cands, key=os.path.getmtime)


BUCKETS = [
    ("fusion", re.compile(r"^(loop_|input_|output_)?fusion")),
    ("convolution", re.compile(r"^convolution")),
    ("copy", re.compile(r"^copy")),
    ("custom-call(pallas)", re.compile(r"^custom-call")),
    ("dot", re.compile(r"^dot")),
    ("transpose", re.compile(r"^transpose")),
    ("reduce", re.compile(r"^reduce")),
    ("dynamic", re.compile(r"^dynamic")),
    ("bitcast/reshape", re.compile(r"^(bitcast|reshape)")),
]


def bucket_of(name):
    base = name.split(".")[0]
    for label, pat in BUCKETS:
        if pat.match(base):
            return label
    return base[:24]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--scope", action="store_true")
    ap.add_argument("--hlo", default=None,
                    help="optimized-HLO text (tools/dump_hlo.py output): "
                         "top ops get their HLO def line (shape/layout, "
                         "operands, op_name metadata) printed alongside")
    args = ap.parse_args()

    path = newest_trace(args.root)
    print(f"# {path}")
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    # device lanes: process names containing "TPU" (not the python host lanes)
    dev_pids = set()
    step_lanes = set()  # (pid, tid) of "Steps" marker threads — step-number
    # events there span whole steps and would double-count every real op
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            if "TPU" in ev.get("args", {}).get("name", ""):
                dev_pids.add(ev["pid"])
        if (ev.get("ph") == "M" and ev.get("name") == "thread_name"
                and ev.get("args", {}).get("name") == "Steps"):
            step_lanes.add((ev["pid"], ev.get("tid")))

    by_bucket = collections.Counter()
    by_name = collections.Counter()
    by_scope = collections.Counter()
    total = 0.0
    tmin, tmax = float("inf"), 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        if (ev.get("pid"), ev.get("tid")) in step_lanes:
            continue
        name = ev.get("name", "?")
        if name.startswith("jit_") or name.startswith("jit("):
            continue  # whole-module wrapper event overlaps all op events
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        total += dur
        tmin = min(tmin, ev.get("ts", tmin))
        tmax = max(tmax, ev.get("ts", 0) + ev.get("dur", 0))
        by_bucket[bucket_of(name)] += dur
        by_name[name] += dur
        if args.scope:
            top = ev.get("args", {}).get("long_name", "")
            m = re.search(r'op_name="([^"]*)"', top) if top else None
            path = m.group(1) if m else (ev.get("args", {}).get("tf_op", "")
                                         or name)
            parts = [p for p in path.split("/")
                     if not p.startswith("jit")][:3]
            by_scope["/".join(parts) or name] += dur

    span = (tmax - tmin) / 1e3 if tmax > tmin else 0.0
    print(f"device-busy total {total:.1f} ms over span {span:.1f} ms "
          f"({100*total/max(span,1e-9):.0f}% busy)")
    print("\n== buckets ==")
    for k, v in by_bucket.most_common(args.top):
        print(f"{v:10.1f} ms  {100*v/total:5.1f}%  {k}")
    print("\n== top ops ==")
    for k, v in by_name.most_common(args.top):
        print(f"{v:10.1f} ms  {100*v/total:5.1f}%  {k[:110]}")
    if args.scope:
        print("\n== scopes ==")
        for k, v in by_scope.most_common(args.top):
            print(f"{v:10.1f} ms  {100*v/total:5.1f}%  {k[:110]}")

    if args.hlo:
        # Pin trace op names to HLO instructions: shapes/layouts name the
        # seam a copy serves; op_name metadata names the model role.
        defs = {}
        pat = re.compile(r"^\s+(?:ROOT )?%?([\w.-]+) = (.*)$")
        with open(args.hlo) as f:
            for line in f:
                m = pat.match(line)
                if m:
                    defs[m.group(1)] = m.group(2).rstrip()
        print("\n== top ops: HLO defs ==")
        for k, v in by_name.most_common(args.top):
            d = defs.get(k)
            if d is None:
                continue
            meta = ""
            mm = re.search(r'op_name="([^"]*)"', d)
            if mm:
                meta = "  # " + "/".join(
                    p for p in mm.group(1).split("/")
                    if not p.startswith("jit"))[:90]
            body = d.split(", metadata=")[0]
            print(f"{v:10.1f} ms  {k}\n    {body[:170]}{meta}")


if __name__ == "__main__":
    main()
