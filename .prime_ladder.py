"""Prime the setup/solve program caches across the row-bucket ladder."""
import sys, time
import jax
from hypre_tpu.warmup import enable_persistent_cache, warmup_family

enable_persistent_cache()
t0 = time.perf_counter()
for fam, nmax in [("7pt", 2 ** 23), ("27pt", 2 ** 21), ("9pt", 2 ** 22),
                  ("5pt", 2 ** 22)]:
    try:
        done = warmup_family(fam, n_max=nmax, n_min=2 ** 15)
        print(f"{fam}: primed {done}", file=sys.stderr, flush=True)
    except Exception as e:
        print(f"{fam}: FAILED {e!r}", file=sys.stderr, flush=True)
print(f"total {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
