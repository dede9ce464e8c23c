"""Test harness configuration.

Tests run on CPU with 8 virtual devices — the analogue of hypre's two test
axes: the HYPRE_SEQUENTIAL MPI-stub serial build (``utilities/mpistubs.c:763``)
is 1-device jax, and the <=8-rank ``mpirun`` regression runs
(``test/runtest.sh:13-14``) are an 8-device virtual mesh. x64 is enabled so
convergence goldens are checked at hypre's native float64.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
