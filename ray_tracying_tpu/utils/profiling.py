"""Tracing / observability utilities (SURVEY.md §5: the reference has only
stdout progress prints, Code/raytracer.cpp:473-475; the TPU framework adds
structured per-pass instrumentation)."""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace scope — view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RenderStats:
    """Accumulates per-pass timings and ray counts; emits JSON lines."""

    def __init__(self, sink=None):
        self.sink = sink or (lambda line: print(line))
        self.passes = []

    @contextlib.contextmanager
    def track(self, name: str, n_rays: int):
        t0 = time.time()
        yield
        dt = time.time() - t0
        rec = {
            "pass": name,
            "seconds": round(dt, 4),
            "rays": n_rays,
            "rays_per_s": round(n_rays / dt) if dt > 0 else None,
        }
        self.passes.append(rec)
        self.sink(json.dumps(rec))

    def total(self) -> dict:
        secs = sum(p["seconds"] for p in self.passes)
        rays = sum(p["rays"] for p in self.passes)
        return {
            "passes": len(self.passes),
            "seconds": round(secs, 4),
            "rays": rays,
            "rays_per_s": round(rays / secs) if secs else None,
        }


def block_and_time(fn, *args, trials: int = 3, warmup: int = 1,
                   label: Optional[str] = None):
    """Benchmark helper: compile, then average block_until_ready trials."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(trials):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / trials
    if label:
        print(f"{label}: {dt * 1e3:.2f} ms")
    return out, dt
