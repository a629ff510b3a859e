"""Profiling & observability.

The reference's only instrumentation is getTickCount around the whole run
and cout progress lines (main.cc:92,122-125, SURVEY.md section 5).  Here:

  * PhaseTimer: named per-phase wall timers with device sync, printable as
    a table and exportable as a dict (for JSON metric lines);
  * trace(): context manager around jax.profiler for xprof traces;
  * throughput(): stereo pairs/s/chip metric from a timed run.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulating named wall-clock phase timers.

    Each phase() context blocks on device work at exit so times reflect
    actual execution, not dispatch.  Use one instance per run:

        t = PhaseTimer()
        with t.phase("volumes"):
            vd = build_volume_data(...)
        with t.phase("optimize"):
            out = run_pair(...)
        print(t.report())
    """

    def __init__(self) -> None:
        self.seconds: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = True):
        t0 = time.perf_counter()
        result_holder = []
        try:
            yield result_holder
        finally:
            if sync:
                if result_holder:
                    jax.block_until_ready(result_holder[-1])
                else:
                    # effectful barrier: wait for everything in flight
                    jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.seconds[name] = self.seconds.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.seconds.values()) or 1.0
        lines = [f"{'phase':<20} {'calls':>5} {'sec':>9} {'%':>6}"]
        for name, sec in sorted(self.seconds.items(), key=lambda kv: -kv[1]):
            lines.append(f"{name:<20} {self.counts[name]:>5} {sec:>9.3f} "
                         f"{100.0 * sec / total:>5.1f}%")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.seconds)


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace if log_dir is set, else a no-op."""
    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield


def throughput(pairs: int, seconds: float,
               n_chips: Optional[int] = None) -> Dict[str, float]:
    """Stereo pairs/s (/chip) metric dict for JSON metric lines."""
    n = n_chips if n_chips is not None else jax.device_count()
    pps = pairs / seconds if seconds > 0 else 0.0
    return {"pairs_per_s": pps, "pairs_per_s_per_chip": pps / max(n, 1),
            "n_chips": n}
