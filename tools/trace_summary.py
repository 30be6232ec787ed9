"""Summarize a jax.profiler trace: device time by XLA op category.

Usage:
  python tools/bench_model.py --family gpt ... --trace /tmp/tr
  python tools/trace_summary.py /tmp/tr [--top 25]

Reads the perfetto trace (trace.json.gz) the profiler writes and aggregates
device-lane slice durations by op name, bucketing into coarse categories
(pallas kernels, fusions, convolutions, copies, ...). The fast path to
"where did the step go" without loading xprof — the same question
megatron answers with nsys/torch.profiler (reference training.py:749-781).
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(
        path, "**", "*.trace.json.gz"), recursive=True))
    if not hits:
        raise SystemExit(f"no *.trace.json.gz under {path}")
    return hits[-1]


_WRAPPER = re.compile(
    r"^(jit_|pjit|\d+$|np\.asarray|PjitFunction|ParseArguments|"
    r"PythonRefManager|\$|copy-start|copy-done|slice-start|slice-done)")


def is_wrapper(name: str) -> bool:
    """Step wrappers / host-wait lanes / async bookkeeping slices that
    double-count the real ops nested beneath them."""
    return bool(_WRAPPER.match(name))


def categorize(name: str, hlo_category: str = "") -> str:
    n = name.lower()
    # mangled pallas custom-calls keep python-derived names: the fused-MHA
    # fwd appears as jvp__*, its VJP as transpose_jvp__*, remat replays as
    # checkpoint* — but ONLY when the event is a custom-call; plain XLA
    # remat/jvp fusions reuse the same python-derived prefixes and must not
    # count as kernel time (they would invert a pallas-vs-XLA A/B digest)
    if n.startswith(("jvp_", "transpose_jvp", "checkpoint")):
        hc = (hlo_category or "").lower()
        if "custom" in hc or not hc and "fusion" not in n:
            return "pallas-kernel"
    if "pallas" in n or "custom-call" in n or "custom_call" in n:
        # mosaic kernels keep their python-derived names
        for tag in ("flash", "mha", "fused_ce", "layer_norm", "layernorm"):
            if tag in n:
                return f"pallas:{tag}"
        return "custom-call"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion(elementwise/mixed)"
    if "conv" in n:
        return "convolution"
    if n.startswith("dot") or "dot_general" in n or "matmul" in n:
        return "dot(matmul)"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/transpose"
    if "reduce" in n:
        return "reduce"
    if "all-gather" in n or "all-reduce" in n or "collective" in n \
            or "permute" in n:
        return "collective"
    if "infeed" in n or "outfeed" in n or "transfer" in n:
        return "host-transfer"
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--lane-regex", default="TPU|/device:|XLA Ops|TensorFlow Ops",
                   help="process/thread name filter for device lanes")
    args = p.parse_args()

    path = find_trace(args.trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # map pid/tid -> lane names from metadata events
    proc = {}
    threads = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                proc[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    lane_re = re.compile(args.lane_regex, re.I)
    by_op = collections.Counter()
    by_cat = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        lane = f'{proc.get(e.get("pid"), "")}/{threads.get((e.get("pid"), e.get("tid")), "")}'
        if not lane_re.search(lane):
            continue
        name = e.get("name", "?")
        if is_wrapper(name):
            continue
        dur = float(e["dur"])  # us
        by_op[name] += dur
        by_cat[categorize(name, (e.get("args") or {}).get(
            "hlo_category", ""))] += dur
        total += dur

    if not total:
        lanes = sorted({f'{proc.get(p_, "")}/{t}' for (p_, _), t in
                        threads.items()})
        print("no device slices matched; lanes seen:")
        for l in lanes[:40]:
            print("  ", l)
        sys.exit(1)

    print(f"trace: {path}\ndevice-lane time: {total/1e3:.1f} ms total\n")
    print("== by category ==")
    for cat, us in by_cat.most_common():
        print(f"  {us/1e3:9.1f} ms  {100*us/total:5.1f}%  {cat}")
    print(f"\n== top {args.top} ops ==")
    for name, us in by_op.most_common(args.top):
        print(f"  {us/1e3:9.1f} ms  {100*us/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
