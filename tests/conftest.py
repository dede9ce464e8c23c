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

# Persistent XLA compilation cache: the suite is compile-dominated on this
# 1-CPU host (a cold full fast-tier run is ~50 min, nearly all of it XLA).
# Cache entries are keyed by HLO fingerprint, so edits invalidate exactly
# the programs they change; warm reruns skip the rest.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
