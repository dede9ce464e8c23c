"""Device-memory model: HBM stats, pressure guard, allocation tracker.

The analogues of hypre's memory subsystem (``utilities/memory.h:139-161``
memory tracker, ``hypre_TAlloc``-family accounting) rebuilt for the XLA
allocator: JAX owns the allocations, so the useful services are (a)
querying the live HBM budget, (b) sizing slab/chunk plans against it
BEFORE dispatch (round 2's 27-pt setup requested 29 GB on a 17 GB chip
with no guard — the blocked paths in amg/device_setup.py now consume this
budget), and (c) a peak-usage tracker for tests and benchmarks.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax

_DEFAULT_HBM = 16 * 2**30  # v5e-class chip; used when stats are unavailable


def device_memory_stats(device=None) -> dict:
    """Raw allocator stats (bytes_in_use, bytes_limit, peak_bytes_in_use,
    ...) — empty dict on backends that expose none (CPU)."""
    dev = device or jax.devices()[0]
    try:
        return dict(dev.memory_stats() or {})
    except Exception:  # pragma: no cover - backend-dependent
        return {}


def hbm_bytes_limit(device=None) -> int:
    stats = device_memory_stats(device)
    return int(stats.get("bytes_limit", _DEFAULT_HBM))


def hbm_bytes_free(device=None) -> int:
    stats = device_memory_stats(device)
    return int(
        stats.get("bytes_limit", _DEFAULT_HBM)
        - stats.get("bytes_in_use", 0)
    )


def check_hbm_request(n_bytes: int, device=None, headroom: float = 0.9):
    """Pre-dispatch pressure guard: raise MemoryError (with a helpful
    message) if a planned allocation cannot fit — so a 29 GB slab request
    fails in microseconds on the host instead of after minutes of AOT
    compilation (the round-2 failure mode)."""
    limit = int(headroom * hbm_bytes_limit(device))
    if n_bytes > limit:
        raise MemoryError(
            f"planned device allocation {n_bytes/2**30:.2f} GiB exceeds "
            f"{headroom:.0%} of the {hbm_bytes_limit(device)/2**30:.2f} GiB "
            "HBM limit; increase chunking/blocking (see "
            "amg/device_setup.py slab budgets)"
        )


def slab_element_budget(itemsize: int = 4, copies: int = 6,
                        frac: float = 0.33, device=None) -> float:
    """How many elements a transient setup slab may hold: a ``frac`` share
    of HBM divided by the ``copies`` of the slab alive during the merge
    sorts. The static defaults in device_setup (96e6/48e6 elements) equal
    this formula on a 16 GiB chip."""
    return frac * hbm_bytes_limit(device) / (itemsize * copies)


@dataclasses.dataclass
class HbmReport:
    start_bytes: int = 0
    end_bytes: int = 0
    peak_bytes: int = 0

    @property
    def delta_bytes(self) -> int:
        return self.end_bytes - self.start_bytes


@contextlib.contextmanager
def track_hbm(device=None):
    """Peak-usage tracker (the --enable-memory-tracker analogue): yields an
    HbmReport filled in on exit. Peak is the allocator's own high-water
    mark where exposed; otherwise end-of-region usage."""
    dev = device or jax.devices()[0]
    rep = HbmReport()
    s0 = device_memory_stats(dev)
    rep.start_bytes = int(s0.get("bytes_in_use", 0))
    try:
        yield rep
    finally:
        s1 = device_memory_stats(dev)
        rep.end_bytes = int(s1.get("bytes_in_use", 0))
        rep.peak_bytes = int(s1.get("peak_bytes_in_use", rep.end_bytes))
