#!/usr/bin/env python
"""Render a schedule timeline from tprofiler event logs.

The fork logs `name-start|ts` / `name-end|ts` lines per rank to
$PROFILER_LOG_PATH (megatron/tprofiler.py) and plots them with
open_CLIP/sched_timeline.py. This renders the same format as an ASCII
timeline (matplotlib optional via --png).

  PROFILER_LOG_PATH=/tmp/prof.log python train.py ...
  python tools/sched_timeline.py /tmp/prof.log
"""
import argparse
import re
import sys
from collections import defaultdict


def parse_events(path):
    spans = defaultdict(list)       # name -> [(start, end)]
    open_ev = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if "|" not in line:
                continue
            tag, ts = line.rsplit("|", 1)
            ts = float(ts)
            if tag.endswith("-start"):
                open_ev[tag[:-6]] = ts
            elif tag.endswith("-end"):
                name = tag[:-4]
                if name in open_ev:
                    spans[name].append((open_ev.pop(name), ts))
    return spans


def render_ascii(spans, width=100):
    all_times = [t for v in spans.values() for se in v for t in se]
    if not all_times:
        print("no events")
        return
    t0, t1 = min(all_times), max(all_times)
    dur = max(t1 - t0, 1e-9)
    print(f"timeline {dur*1000:.1f} ms total, {width} cols "
          f"({dur/width*1000:.2f} ms/col)")
    for name in sorted(spans):
        row = [" "] * width
        total = 0.0
        for s, e in spans[name]:
            a = int((s - t0) / dur * (width - 1))
            b = max(a + 1, int((e - t0) / dur * (width - 1)))
            for i in range(a, min(b, width)):
                row[i] = "#"
            total += e - s
        print(f"{name[:24]:>24} |{''.join(row)}| {total*1000:8.1f} ms")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("log", help="tprofiler event file")
    p.add_argument("--png", help="write a matplotlib timeline instead")
    p.add_argument("--width", type=int, default=100)
    args = p.parse_args(argv)
    spans = parse_events(args.log)
    if args.png:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(12, 0.5 * max(len(spans), 2)))
        names = sorted(spans)
        for y, name in enumerate(names):
            for s, e in spans[name]:
                ax.barh(y, e - s, left=s, height=0.6)
        ax.set_yticks(range(len(names)))
        ax.set_yticklabels(names)
        ax.set_xlabel("time (s)")
        fig.tight_layout()
        fig.savefig(args.png, dpi=120)
        print(f"wrote {args.png}")
    else:
        render_ascii(spans, args.width)


if __name__ == "__main__":
    main()
