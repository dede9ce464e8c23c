"""Core runtime: dtype policy, convergence status, global knobs.

TPU-native analogue of hypre's ``utilities/`` layer. Where hypre keys a
process-wide singleton handle with memory-location / exec-policy knobs
(``utilities/handle.h:20-50``) and a bit-coded error flag
(``utilities/HYPRE_utilities.h:106-140``), we use: the ambient JAX x64 mode
for the scalar type policy (hypre's ``HYPRE_Real`` float/double selection,
``HYPRE_utilities.h:35-92``), int32 indices (hypre's default ``HYPRE_Int``),
and explicit, functional convergence-status values returned from solvers
instead of a global error flag (JAX transformations forbid ambient state).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# dtype policy
# ---------------------------------------------------------------------------


def default_real_dtype() -> jnp.dtype:
    """hypre builds pick float/double at configure time; we follow jax x64."""
    return jnp.dtype(jnp.float64) if jax.config.jax_enable_x64 else jnp.dtype(jnp.float32)


def default_int_dtype() -> jnp.dtype:
    """hypre_Int is 32-bit by default (``HYPRE_utilities.h:50``)."""
    return jnp.dtype(jnp.int32)


# Sentinel column index for padding slots in static-shape sparse formats.
# Padded slots carry value 0.0 so they are numerically inert; structural ops
# must mask with ``cols >= 0``.
PAD_COL = -1


# ---------------------------------------------------------------------------
# Convergence status (hypre's HYPRE_ERROR_CONV analogue, HYPRE_utilities.h:110)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ConvergenceInfo:
    """Result record returned by every iterative solver.

    Mirrors what hypre exposes through ``HYPRE_<Solver>GetNumIterations`` /
    ``GetFinalRelativeResidualNorm`` plus the ``HYPRE_ERROR_CONV`` flag, as a
    jit-friendly pytree instead of out-parameters on an opaque handle.
    """

    iterations: jax.Array  # int32 scalar
    relative_residual: jax.Array  # real scalar, final ||r|| / ||b||
    converged: jax.Array  # bool scalar
    # per-iteration ||r|| norms, recorded when the solver's logging > 0
    # (hypre's SetLogging norms/rel_norms arrays, pcg.c:630-634); length
    # maxiter+1 with slot 0 = the initial residual, untouched slots = -1
    res_history: "jax.Array | None" = None
    # True when the solver stopped EARLY because the true (recomputed)
    # residual stagnated above the tolerance — the f32 attainable-accuracy
    # floor (hypre's HYPRE_ERROR_CONV class: stopped, not converged).
    # Distinct from running to maxiter: converged=False either way, but
    # stagnated=True says more iterations cannot help.
    stagnated: "jax.Array | None" = None

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        try:
            return (
                f"ConvergenceInfo(iters={int(self.iterations)}, "
                f"rel_res={float(self.relative_residual):.3e}, "
                f"converged={bool(self.converged)})"
            )
        except Exception:
            return object.__repr__(self)


def make_convergence_info(
    iterations, relative_residual, converged, res_history=None,
    stagnated=None,
) -> ConvergenceInfo:
    return ConvergenceInfo(
        iterations=jnp.asarray(iterations, jnp.int32),
        relative_residual=jnp.asarray(relative_residual),
        converged=jnp.asarray(converged, jnp.bool_),
        res_history=res_history,
        stagnated=(None if stagnated is None
                   else jnp.asarray(stagnated, jnp.bool_)),
    )


# ---------------------------------------------------------------------------
# Deterministic RNG helper (hypre's utilities/random.c LCG analogue)
# ---------------------------------------------------------------------------


def hash_rand01(indices: jax.Array) -> jax.Array:
    """Deterministic per-index uniform(0,1) floats from an integer hash.

    Used for PMIS tie-breaking measures. hypre's ``-pmis1`` mode seeds its LCG
    per global index for reproducible coarsenings (``par_indepset.c``,
    ``test/ij.c:2052``); a stateless integer hash gives the same property and
    is additionally invariant under resharding — the measure of global row i
    never depends on which device owns it.
    """
    x = indices.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)


# ---------------------------------------------------------------------------
# Small math helpers shared across layers
# ---------------------------------------------------------------------------


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m
