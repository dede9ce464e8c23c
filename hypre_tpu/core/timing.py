"""Named timer registry — analogue of hypre's timing layer.

hypre keeps a registry of named timers with wall/cpu/flop counters behind
``hypre_InitializeTiming`` / ``hypre_BeginTiming`` (``utilities/timing.h:59``,
``timing.c``) plus Caliper/NVTX region annotations
(``utilities/caliper_instrumentation.h:35-56``). The TPU equivalents are:

- host-side wall timers around setup phases (this module),
- ``jax.profiler.TraceAnnotation`` / ``jax.named_scope`` markers inside jitted
  code so XProf traces show per-MG-level regions (``annotate`` below mirrors
  ``HYPRE_ANNOTATE_MGLEVEL_BEGIN``).

Timers that wrap device work call ``block_until_ready`` on a supplied pytree
so asynchronous dispatch does not hide the cost.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


class TimerRegistry:
    """Accumulating named wall-clock timers (hypre_InitializeTiming analogue)."""

    def __init__(self) -> None:
        self._elapsed: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, sync: object = None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self._elapsed[name] += time.perf_counter() - t0
            self._count[name] += 1

    def elapsed(self, name: str) -> float:
        return self._elapsed[name]

    def report(self) -> str:
        lines = ["=" * 60]
        for name in sorted(self._elapsed):
            lines.append(
                f"{name:<40s} {self._elapsed[name]:10.4f} s  ({self._count[name]} calls)"
            )
        lines.append("=" * 60)
        return "\n".join(lines)

    def clear(self) -> None:
        self._elapsed.clear()
        self._count.clear()


GLOBAL_TIMERS = TimerRegistry()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Region annotation visible in XProf traces (HYPRE_ANNOTATE_* analogue)."""
    with jax.named_scope(name), jax.profiler.TraceAnnotation(name):
        yield


def device_memory_report() -> str:
    """Live device-buffer accounting (the role of hypre's
    --enable-memory-tracker ledger, utilities/memory.h:139-161, translated
    to the JAX world: arrays are garbage-collected, so the failure mode is
    retention, not leaks — this reports what is currently held)."""
    import collections

    import jax

    by_kind: dict = collections.defaultdict(lambda: [0, 0])
    total = 0
    for buf in jax.live_arrays():
        nbytes = buf.size * buf.dtype.itemsize
        key = (str(buf.dtype), getattr(buf, "shape", ()))
        by_kind[key][0] += 1
        by_kind[key][1] += nbytes
        total += nbytes
    lines = [f"live device arrays: {total / 1e6:.1f} MB total"]
    top = sorted(by_kind.items(), key=lambda kv: -kv[1][1])[:15]
    for (dt, shape), (cnt, nb) in top:
        lines.append(f"  {cnt:4d} x {dt}{list(shape)}: {nb / 1e6:.1f} MB")
    return "\n".join(lines)
