"""Smoke tests for the observability/bench tools that had no coverage:
sched_timeline (tprofiler plot), trace_summary (profiler trace digest),
generate_samples_gpt (bulk sampling CLI)."""
import gzip
import json
import subprocess
import sys

import numpy as np


def _run(args):
    r = subprocess.run([sys.executable, *args], capture_output=True,
                       text=True, cwd="/root/repo",
                       env={"PATH": "/usr/bin:/bin", "HOME": "/root",
                            "JAX_PLATFORMS": "cpu",
                            "PYTHONPATH": "/root/repo"})
    assert r.returncode == 0, r.stderr
    return r.stdout


def test_sched_timeline(tmp_path):
    """ASCII timeline from the tprofiler `name|timestamp` event format
    (megatron tprofiler.py / open_CLIP sched_timeline.py)."""
    log = tmp_path / "prof.log"
    log.write_text("\n".join([
        "fwd-start|100.0", "fwd-end|100.4",
        "bwd-start|100.4", "bwd-end|101.2",
        "fwd-start|101.2", "fwd-end|101.6",
    ]))
    out = _run(["tools/sched_timeline.py", str(log)])
    assert "fwd" in out and "bwd" in out


def test_trace_summary(tmp_path):
    """Digest a minimal perfetto-format trace: device-lane slices bucketed
    by op category."""
    trace = {
        "traceEvents": [
            {"ph": "M", "pid": 1, "name": "process_name",
             "args": {"name": "/device:TPU:0"}},
            {"ph": "X", "pid": 1, "tid": 1, "ts": 0, "dur": 500,
             "name": "fusion.123"},
            {"ph": "X", "pid": 1, "tid": 1, "ts": 500, "dur": 300,
             "name": "custom-call.flash_attention_fwd"},
            {"ph": "X", "pid": 1, "tid": 1, "ts": 800, "dur": 200,
             "name": "copy.5"},
        ]
    }
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump(trace, f)
    out = _run(["tools/trace_summary.py", str(tmp_path)])
    assert "fusion" in out.lower()


def test_generate_samples_gpt(tmp_path):
    """Unconditional bulk sampling from a random-init tiny GPT writes
    {prompt, text} jsonl (reference generate_samples_gpt.py)."""
    gen = tmp_path / "gens.jsonl"
    _run(["tools/generate_samples_gpt.py", "--genfile", str(gen),
          "--num-samples", "4", "--gen-batch-size", "2",
          "--out-seq-length", "8", "--top-k", "4",
          "--num-layers", "2", "--hidden-size", "64", "--num-heads", "4",
          "--seq-length", "32", "--vocab-size", "256"])
    lines = [json.loads(x) for x in gen.read_text().splitlines()]
    assert len(lines) == 4
    assert all("text" in d for d in lines)
