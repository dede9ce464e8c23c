"""Matrix-free solver protocol.

hypre's Krylov layer is matrix-free over a caller-supplied vtable of function
pointers (``krylov/pcg.h:49-70``: CAlloc, Matvec, InnerProd, Axpy, precond,
...), with per-matrix-class glue files binding ParCSR/Struct/SStruct vectors
into it. In JAX the natural equivalent is *plain callables over arrays*:

- ``A``: a function ``x -> A@x`` on global (possibly NamedSharding-sharded)
  arrays. Distribution is A's private business (shard_map inside); the solver
  sees pure functions, and XLA SPMD turns ``jnp.sum`` reductions into psums.
- ``M``: optional preconditioner callable ``r -> z`` (hypre's two-pointer
  precond/precond_setup contract collapses to one closure because setup
  happens when the closure is built).

All solvers are jit-compatible: fixed-shape carries in lax.while_loop, with
hypre's stopping semantics (relative/absolute tol, two-norm vs preconditioned
energy norm, NaN/Inf guard as in ``pcg.c:391``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from hypre_tpu.core.config import make_convergence_info, ConvergenceInfo

LinearOp = Callable[[jax.Array], jax.Array]


def identity_precond(r: jax.Array) -> jax.Array:
    return r


def finite(x: jax.Array) -> jax.Array:
    """NaN/Inf guard on a scalar (hypre pcg.c:391 checks sdotp sanity)."""
    return jnp.isfinite(x)
