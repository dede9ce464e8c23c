"""AMG hierarchy setup and multilevel cycling.

Analogue of hypre_BoomerAMGSetup (``parcsr_ls/par_amg_setup.c:28``) and
hypre_BoomerAMGCycle (``par_cycle.c:23``). The division of labor is the
TPU-idiomatic one promised in SURVEY.md §7:

- *setup* is host-orchestrated: per-level shapes are data-dependent, so the
  host drives a loop of jitted device stages (strength/PMIS/interp fused in
  one traced function per level shape; RAP via the capacity-retrying
  SpGEMM), pulling only scalars (coarse sizes) back to decide level count;
- *solve* is one jitted program: the hierarchy is a static pytree of
  per-level operators, the recursive V/W-cycle unrolls at trace time into a
  flat sequence of SpMVs and axpys with no host involvement per iteration.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from hypre_tpu.amg.coarsen import cljp, coarse_map, hmis, pmis, ruge_stuben
from hypre_tpu.amg.interp import (
    classical_interp, direct_interp, ext_plus_i_interp, jacobi_improve_interp,
    truncate_interp,
)
from hypre_tpu.amg.relax import (
    chebyshev, jacobi, kaczmarz, l1_jacobi, l1_norms, max_eig_estimate,
    row_norms_sq_inv, sym_two_stage_gs, two_stage_gs,
)
from hypre_tpu.amg.strength import strength_mask
from hypre_tpu.seq.ell import EllMatrix
from hypre_tpu.seq.spgemm import ell_spgemm, ell_transpose


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Level:
    """One multigrid level's operators (hypre's A_array/P_array/R_array slots
    in hypre_ParAMGData, par_amg.h)."""

    A: EllMatrix
    P: Optional[EllMatrix]  # None on the coarsest level
    Pt: Optional[EllMatrix]
    dinv: jax.Array  # 1/diag
    l1inv: jax.Array  # 1/l1 row norms
    lmax: jax.Array  # D^{-1}A spectral bound for Chebyshev


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AMGHierarchy:
    levels: List[Level]
    coarse_inv: jax.Array  # dense (pseudo)inverse of the coarsest operator

    @property
    def num_levels(self) -> int:
        return len(self.levels) + 1


def _level_vectors(A: EllMatrix, need_cheby: bool) -> tuple[jax.Array, jax.Array, jax.Array]:
    diag = A.diagonal()
    dinv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0)
    l1inv = 1.0 / l1_norms(A)
    lmax = max_eig_estimate(A, dinv) if need_cheby else jnp.asarray(0.0, A.dtype)
    return dinv, l1inv, lmax


def setup_hierarchy(
    A: EllMatrix,
    strength_threshold: float = 0.25,
    max_levels: int = 25,
    max_coarse_size: int = 64,
    p_max_elmts: int = 4,
    trunc_factor: float = 0.0,
    interp: str = "ext+i",
    relax: str = "chebyshev",
    coarsen_rtol: float = 0.9,
    coarsen: str = "pmis",
    interp_jacobi_passes: int = 0,
) -> AMGHierarchy:
    """Build the multigrid hierarchy (BoomerAMG setup phase).

    coarsen: 'pmis' (8) | 'cljp' (0) | 'ruge' (1) | 'hmis' (10) | 'falgout'
    (6; single-shard Falgout = RS everywhere, so it maps to 'ruge' here —
    the CLJP boundary pass is a no-op without shard boundaries).
    """
    need_cheby = relax == "chebyshev"
    levels: List[Level] = []

    coarsen_fns = {
        "pmis": pmis,
        "cljp": cljp,
        "ruge": lambda A_, S_: ruge_stuben(A_, S_),
        "falgout": lambda A_, S_: ruge_stuben(A_, S_),
        "hmis": hmis,
    }
    if coarsen not in coarsen_fns:
        raise ValueError(f"unknown coarsen type: {coarsen!r}")
    device_coarsen = coarsen in ("pmis", "cljp")

    @partial(jax.jit, static_argnames=())
    def strength(A_lev: EllMatrix):
        return strength_mask(A_lev, strength_threshold)

    @jax.jit
    def number(cf):
        return coarse_map(cf)

    while len(levels) < max_levels - 1 and A.n_rows > max_coarse_size:
        S = strength(A)
        cf = coarsen_fns[coarsen](A, S)
        cmap, n_c = number(cf)
        n_coarse = int(n_c)
        if n_coarse == 0 or n_coarse >= coarsen_rtol * A.n_rows:
            break  # coarsening stalled (par_amg_setup.c stops similarly)
        if interp == "ext+i":
            P = ext_plus_i_interp(A, S, cf, cmap, n_coarse)
        elif interp == "direct":
            P = direct_interp(A, S, cf, cmap, n_coarse)
        elif interp == "classical":
            P = classical_interp(A, S, cf, cmap, n_coarse)
        else:
            raise ValueError(f"unknown interp type: {interp!r}")
        if interp_jacobi_passes > 0:
            P = jacobi_improve_interp(
                A, P, cf, passes=interp_jacobi_passes,
                max_elmts=p_max_elmts, trunc_factor=trunc_factor,
            )
        P = truncate_interp(P, max_elmts=p_max_elmts, trunc_factor=trunc_factor)
        Pt = ell_transpose(P)
        AP = ell_spgemm(A, P)
        A_coarse = ell_spgemm(Pt, AP)
        dinv, l1inv, lmax = _level_vectors(A, need_cheby)
        levels.append(Level(A=A, P=P, Pt=Pt, dinv=dinv, l1inv=l1inv, lmax=lmax))
        A = A_coarse

    # coarsest: dense (pseudo)inverse — hypre's coarse Gaussian elimination
    # (par_gauss_elim.c) gathered to a dense solve; pinv tolerates the
    # singular coarse operators pure-Neumann problems produce.
    from hypre_tpu.seq.ell import ell_to_csr

    dense = jnp.zeros((A.n_rows, A.n_cols), A.dtype)
    rows = jnp.broadcast_to(jnp.arange(A.n_rows)[:, None], A.cols.shape)
    dense = dense.at[rows, jnp.maximum(A.cols, 0)].add(
        jnp.where(A.cols >= 0, A.vals, 0)
    )
    coarse_inv = jnp.linalg.pinv(dense)
    return AMGHierarchy(levels=levels, coarse_inv=coarse_inv)


def make_smoother(relax: str, relax_weight: float, cheby_order: int, cheby_ratio: float):
    """Bind a relax-type string to a (level, u, f) -> u function
    (the hypre_BoomerAMGRelax relax_type dispatch, par_relax.c:78-160)."""

    if relax == "jacobi":
        return lambda lev, u, f: jacobi(lev.A, lev.dinv, u, f, relax_weight)
    if relax == "l1-jacobi":
        return lambda lev, u, f: l1_jacobi(lev.A, lev.l1inv, u, f)
    if relax == "chebyshev":
        return lambda lev, u, f: chebyshev(
            lev.A, lev.dinv, lev.lmax, u, f, order=cheby_order, eig_ratio=cheby_ratio
        )
    if relax == "two-stage-gs":
        return lambda lev, u, f: two_stage_gs(lev.A, lev.dinv, u, f)
    if relax == "sym-two-stage-gs":
        return lambda lev, u, f: sym_two_stage_gs(lev.A, lev.dinv, u, f)
    if relax == "kaczmarz":
        return lambda lev, u, f: kaczmarz(
            lev.A, row_norms_sq_inv(lev.A), u, f, relax_weight
        )
    raise ValueError(f"unknown relax type: {relax!r}")


def amg_cycle(
    hier: AMGHierarchy,
    f: jax.Array,
    u: Optional[jax.Array] = None,
    smoother: Optional[Callable] = None,
    num_sweeps: int = 1,
    cycle_type: int = 1,
) -> jax.Array:
    """One multigrid cycle (V for cycle_type=1, W for 2, F for 3;
    par_cycle.c:23, fcycle flag).

    Python recursion over the static level list — unrolls at trace time.
    """
    smoother = smoother or make_smoother("l1-jacobi", 1.0, 2, 0.3)

    def descend(level: int, f: jax.Array, u: jax.Array, ctype: int) -> jax.Array:
        if level == len(hier.levels):
            return hier.coarse_inv @ f
        lev = hier.levels[level]
        for _ in range(num_sweeps):
            u = smoother(lev, u, f)
        r = f - lev.A.mv(u)
        rc = lev.Pt.mv(r)
        ec = jnp.zeros(lev.Pt.vec_len_rows, f.dtype)
        last = level >= len(hier.levels) - 1
        if ctype == 3 and not last:
            # F-cycle: one recursive F-visit, then a V-visit (FMG recursion)
            ec = descend(level + 1, rc, ec, 3)
            ec = descend(level + 1, rc, ec, 1)
        else:
            visits = 1 if (last or ctype == 3) else max(ctype, 1)
            for _ in range(visits):
                ec = descend(level + 1, rc, ec, ctype if ctype != 3 else 1)
        u = u + lev.P.mv(ec)
        for _ in range(num_sweeps):
            u = smoother(lev, u, f)
        return u

    if u is None:
        u = jnp.zeros_like(f)
    return descend(0, f, u, cycle_type)
