"""Tracing / profiling utilities (SURVEY §5.1).

The reference's observability is ptflops MAC hooks (evaluate.py:193-251) and
std::chrono stage timers in the viewer (imagegenerator.cpp:300-393). Here:
analytic MAC accounting lives on the model definitions
(``macs_per_input``); this module adds the runtime side — a stage-timer
aggregate, a ``jax.profiler`` trace context, and the chain-slope timing
helper that works through the axon tunnel (where ``block_until_ready`` is not
a completion fence).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict


class StageTimers:
    """Accumulating per-stage wall timers (imagegenerator.cpp:300-393)."""

    def __init__(self):
        self.total_us: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total_us[name] += (time.perf_counter() - t0) * 1e6
            self.count[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.total_us):
            n = max(self.count[name], 1)
            lines.append(f"{name}: {self.total_us[name] / n:.1f} us/call "
                         f"x{self.count[name]}")
        return "\n".join(lines)

    def reset(self):
        self.total_us.clear()
        self.count.clear()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def chain_slope_time(fn: Callable, args, n1: int = 2, n2: int = 12,
                     fence: Callable = None) -> float:
    """Milliseconds per call measured as the slope between two chain lengths,
    each ended by a tiny readback fence — the only honest device timing
    through the axon tunnel."""
    import jax
    import jax.numpy as jnp

    if fence is None:
        probe = jax.jit(lambda x: jnp.sum(jnp.ravel(x)[:4]))

        def fence(r):
            float(probe(r[0] if isinstance(r, tuple) else r))

    def run(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn(*args)
        fence(r)
        return time.perf_counter() - t0

    run(1)
    d1 = run(n1)
    d2 = run(n2)
    return (d2 - d1) / (n2 - n1) * 1e3


def analytic_macs(model_defs, avg_samples: float, n_pixels: int):
    """Per-frame MAC estimate: oracle at every ray, shading scaled by the
    measured average adaptive sample count (evaluate.py:237-251)."""
    per_pixel = 0.0
    for i, d in enumerate(model_defs):
        macs = d.macs_per_input()
        per_pixel += macs if i == 0 else macs * avg_samples
    return per_pixel * n_pixels, per_pixel
