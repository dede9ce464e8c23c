"""Test harness configuration.

Tests run on CPU with 8 virtual devices — the analogue of hypre's two test
axes: the HYPRE_SEQUENTIAL MPI-stub serial build (``utilities/mpistubs.c:763``)
is 1-device jax, and the <=8-rank ``mpirun`` regression runs
(``test/runtest.sh:13-14``) are an 8-device virtual mesh. x64 is enabled so
convergence goldens are checked at hypre's native float64.

NOTE: this environment pre-imports jax via a sitecustomize that registers the
axon TPU plugin and pins JAX_PLATFORMS=axon, so env vars set here are too
late — the platform must be switched through jax.config *after* import.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# vm.max_map_count guard: the full suite compiles ~2000 XLA:CPU programs
# in one process; their JIT code mappings exhaust the kernel's default
# 65530-map limit right around test ~116 (measured maps=57k and climbing
# at the crash point), after which any mmap in the compiler or the
# compilation cache's (de)serializer fails and XLA segfaults/aborts.
# Raise it best-effort (root containers) — harmless elsewhere.
def _raise_map_count(target=1_000_000):
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            cur = int(f.read())
        if cur < target:
            with open("/proc/sys/vm/max_map_count", "w") as f:
                f.write(str(target))
    except (OSError, ValueError):
        pass  # unprivileged: the suite may need splitting across processes


_raise_map_count()

# Persistent XLA compilation cache: the suite is compile-dominated on this
# 1-CPU host (a cold full fast-tier run is ~50 min, nearly all of it XLA).
# Cache entries are keyed by HLO fingerprint, so edits invalidate exactly
# the programs they change; warm reruns skip the rest. (The round-4 crash
# hunt first blamed this cache — the real culprit was the map-count
# exhaustion above, which made cache serialization mmaps fail.)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
