"""Timers + lightweight event profiler.

Replaces megatron's Timers (megatron/timers.py:56-304: named timers with
log-levels and cross-rank reduction — single-process on TPU, so no barriers)
and the fork's `tprofiler` (megatron/tprofiler.py: `name|timestamp` event
lines appended to $PROFILER_LOG_PATH, plotted by open_CLIP/sched_timeline.py).
The tprofile event format is kept so the reference's timeline plotter works
on our logs. `see_memory_usage` reports device memory via
jax.local_devices()[0].memory_stats().
"""
import os
import time
from contextlib import contextmanager
from typing import Dict, Optional


class _Timer:
    def __init__(self, name: str):
        self.name = name
        self._start = None
        self.elapsed_total = 0.0
        self.count = 0

    def start(self):
        self._start = time.perf_counter()

    def stop(self):
        if self._start is None:
            return
        self.elapsed_total += time.perf_counter() - self._start
        self.count += 1
        self._start = None

    def elapsed(self, reset: bool = True) -> float:
        e = self.elapsed_total
        if reset:
            self.elapsed_total = 0.0
            self.count = 0
        return e


class Timers:
    """Named timers with log levels (megatron/timers.py API shape:
    timers('name', log_level=N).start()/.stop(); timers.log(names))."""

    def __init__(self, log_level: int = 2):
        self.log_level = log_level
        self._timers: Dict[str, _Timer] = {}
        self._levels: Dict[str, int] = {}

    def __call__(self, name: str, log_level: int = 0) -> _Timer:
        if name not in self._timers:
            self._timers[name] = _Timer(name)
            self._levels[name] = log_level
        return self._timers[name]

    @contextmanager
    def record(self, name: str, log_level: int = 0):
        t = self(name, log_level)
        t.start()
        try:
            yield
        finally:
            t.stop()

    def log(self, names=None, normalizer: float = 1.0, reset: bool = True,
            writer=None, step: Optional[int] = None) -> str:
        names = names or [n for n, lv in self._levels.items()
                          if lv <= self.log_level]
        parts = []
        for n in names:
            if n not in self._timers:
                continue
            ms = self._timers[n].elapsed(reset) * 1000.0 / max(normalizer, 1e-9)
            parts.append(f"{n}: {ms:.2f}")
            if writer is not None and step is not None:
                writer.add_scalar(f"timers/{n}", ms, step)
        line = "time (ms) | " + " | ".join(parts)
        return line


class tprofile:
    """Append `name|timestamp` event lines (fork tprofiler format) when
    $PROFILER_LOG_PATH is set; otherwise a no-op. Usable as a decorator or
    context manager; emits `name-start` / `name-end` events."""

    def __init__(self, name: str):
        self.name = name
        self.path = os.environ.get("PROFILER_LOG_PATH")

    def _emit(self, tag: str):
        if not self.path:
            return
        with open(self.path, "a") as f:
            f.write(f"{self.name}-{tag}|{time.time()}\n")

    def __enter__(self):
        self._emit("start")
        return self

    def __exit__(self, *a):
        self._emit("end")

    def __call__(self, fn):
        def wrapped(*args, **kw):
            with tprofile(self.name):
                return fn(*args, **kw)
        return wrapped


def see_memory_usage(message: str = "", force: bool = False) -> dict:
    """Device-memory report (megatron/tprofiler.py:see_memory_usage analogue;
    torch.cuda.memory_allocated -> PJRT memory_stats)."""
    import jax
    stats = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        pass
    if message or force:
        used = stats.get("bytes_in_use", 0) / 2**30
        peak = stats.get("peak_bytes_in_use", 0) / 2**30
        print(f"{message} | device mem: {used:.2f} GiB (peak {peak:.2f} GiB)",
              flush=True)
    return stats
