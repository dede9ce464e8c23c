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

from hypre_tpu.amg.coarsen import cgc, cljp, coarse_map, hmis, pmis, ruge_stuben
from hypre_tpu.amg.interp import (
    classical_interp, direct_interp, ext_plus_i_interp, jacobi_improve_interp,
    multipass_interp, truncate_interp,
)
from hypre_tpu.amg.relax import (
    chebyshev, jacobi, kaczmarz, l1_jacobi, l1_norms, max_eig_estimate,
    row_norms_sq_inv, sym_two_stage_gs, two_stage_gs,
)
from hypre_tpu.amg.strength import strength_mask
from hypre_tpu.seq.ell import EllMatrix
from hypre_tpu.seq.fastmv import optimize_operator
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
    # optional CG-estimated Jacobi weight (hypre_BoomerAMGCGRelaxWt,
    # par_cg_relax_wt.c — requested by relax_weight < 0, hypre's
    # convention); None = use the static relax_weight knob
    rw: Optional[jax.Array] = None
    # CF splitting of this level's rows (+1 C / -1 F, 0 on padded tails),
    # kept for CF-ordered relaxation (HYPRE_BoomerAMGSetRelaxOrder); None
    # on the coarsest level and on setup paths that don't record it
    cf: Optional[jax.Array] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AMGHierarchy:
    levels: List[Level]
    coarse_inv: jax.Array  # dense (pseudo)inverse of the coarsest operator
    # False when restriction != P^T (AIR): Pt then holds R and must be kept
    galerkin: bool = dataclasses.field(default=True, metadata=dict(static=True))
    # TRUE fine row count when the device setup row-bucketed the levels
    # (levels[0].A then has n_fine <= n_rows padded empty rows at the tail);
    # 0 = unpadded. amg_cycle pads/unpads vectors automatically.
    n_fine: int = dataclasses.field(default=0, metadata=dict(static=True))
    # TRUE row count of every level incl. the coarsest (len == num_levels)
    # when row-bucketed; () = unpadded. The padded tails are always empty
    # rows appended AFTER the true rows, so true-restriction is a slice.
    n_level_true: tuple = dataclasses.field(default=(),
                                            metadata=dict(static=True))

    @property
    def num_levels(self) -> int:
        return len(self.levels) + 1


def unpad_hierarchy(hier: "AMGHierarchy") -> "AMGHierarchy":
    """True-size view of a row-bucketed hierarchy.

    The device setup pads every level's row count up to a bucket with empty
    tail rows (padding rows are never C points, so coarse indices stay
    compact in [0, n_true) — verified by the bucketed==unbucketed parity
    tests). Restricting to the true sizes is therefore a pure slice; use
    this for IO, parity comparisons, and interop with unpadded solvers.
    Returns ``hier`` unchanged when it was never bucketed.
    """
    if not hier.n_fine or not hier.n_level_true:
        return hier
    ts = hier.n_level_true
    new_levels = []
    for i, lv in enumerate(hier.levels):
        nt, nc = ts[i], ts[i + 1]
        if not isinstance(lv.P, EllMatrix) or (
            lv.Pt is not None and not isinstance(lv.Pt, EllMatrix)
        ):
            raise ValueError("unpad_hierarchy needs ELL transfers "
                             "(transfer_dia hierarchies stay padded)")
        new_levels.append(dataclasses.replace(
            lv,
            A=EllMatrix(vals=lv.A.vals[:nt], cols=lv.A.cols[:nt],
                        n_cols=nt),
            P=EllMatrix(vals=lv.P.vals[:nt], cols=lv.P.cols[:nt],
                        n_cols=nc),
            Pt=(None if lv.Pt is None else
                EllMatrix(vals=lv.Pt.vals[:nc], cols=lv.Pt.cols[:nc],
                          n_cols=nt)),
            dinv=lv.dinv[:nt], l1inv=lv.l1inv[:nt],
            cf=None if lv.cf is None else lv.cf[:nt],
        ))
    nco = ts[-1]
    return dataclasses.replace(
        hier, levels=new_levels, coarse_inv=hier.coarse_inv[:nco, :nco],
        n_fine=0, n_level_true=(),
    )


def _level_vectors(A: EllMatrix, need_cheby: bool) -> tuple[jax.Array, jax.Array, jax.Array]:
    diag = A.diagonal()
    dinv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0)
    l1inv = 1.0 / l1_norms(A)
    lmax = max_eig_estimate(A, dinv) if need_cheby else jnp.asarray(0.0, A.dtype)
    return dinv, l1inv, lmax


def setup_hierarchy(
    A: EllMatrix,
    strength_threshold: float = 0.25,
    max_row_sum: float = 1.0,
    max_levels: int = 25,
    max_coarse_size: int = 64,
    p_max_elmts: int = 4,
    trunc_factor: float = 0.0,
    interp: str = "ext+i",
    relax: str = "chebyshev",
    coarsen_rtol: float = 0.9,
    coarsen: str = "pmis",
    interp_jacobi_passes: int = 0,
    setup_backend: str = "auto",
    agg_num_levels: int = 0,
    restrict_type: str = "transpose",
    nongalerkin_tol: float = 0.0,
) -> AMGHierarchy:
    """Build the multigrid hierarchy (BoomerAMG setup phase).

    coarsen: 'pmis' (8) | 'cljp' (0) | 'ruge' (1) | 'hmis' (10) | 'falgout'
    (6; single-shard Falgout = RS everywhere, so it maps to 'ruge' here —
    the CLJP boundary pass is a no-op without shard boundaries).

    setup_backend: 'native' runs the per-level pipeline (strength, PMIS/RS,
    ext+i, truncation, RAP) through the C++/OpenMP kernels in csrc/ —
    hypre's own architecture, where setup is C — and is orders of magnitude
    faster at scale than the jax sort-based path; 'jax' keeps everything in
    XLA ops (used on platforms without a compiler and as the test oracle);
    'auto' picks native when the library builds and the knob combination is
    covered (ext+i / pmis / ruge / hmis / falgout, no Jacobi-interp passes).
    """
    if setup_backend == "device":
        from hypre_tpu.amg.device_setup import setup_hierarchy_device

        if interp not in ("ext+i",) or coarsen != "pmis":
            raise ValueError(
                "the device setup backend currently covers pmis + ext+i "
                f"(got coarsen={coarsen!r}, interp={interp!r})"
            )
        if restrict_type != "transpose" or (
            nongalerkin_tol > 0 or interp_jacobi_passes > 0
        ):
            raise ValueError(
                "device setup backend: AIR/non-Galerkin/Jacobi-interp "
                "knobs are not wired yet — use the native or jax backend"
            )
        return setup_hierarchy_device(
            A,
            strength_threshold=strength_threshold,
            max_row_sum=max_row_sum,
            max_levels=max_levels,
            max_coarse_size=max_coarse_size,
            p_max_elmts=p_max_elmts,
            trunc_factor=trunc_factor,
            relax=relax,
            coarsen_rtol=coarsen_rtol,
            agg_num_levels=agg_num_levels,
        )
    if setup_backend == "auto":
        from hypre_tpu import native as _native

        covered = (
            interp in ("ext+i", "direct")
            and coarsen in ("pmis", "ruge", "hmis", "falgout")
            and interp_jacobi_passes == 0
            and restrict_type == "transpose"
            and _native.available()
        )
        if nongalerkin_tol > 0 and not covered:
            raise ValueError("nongalerkin_tol requires the native setup path")
        if agg_num_levels > 0 and not covered:
            raise ValueError(
                "aggressive coarsening requires the native setup backend"
            )
        setup_backend = "native" if covered else "jax"
    if setup_backend == "native":
        return _setup_hierarchy_native(
            A,
            strength_threshold=strength_threshold,
            max_row_sum=max_row_sum,
            max_levels=max_levels,
            max_coarse_size=max_coarse_size,
            p_max_elmts=p_max_elmts,
            trunc_factor=trunc_factor,
            relax=relax,
            coarsen=coarsen,
            coarsen_rtol=coarsen_rtol,
            interp=interp,
            agg_num_levels=agg_num_levels,
            nongalerkin_tol=nongalerkin_tol,
        )
    need_cheby = relax == "chebyshev"
    levels: List[Level] = []

    coarsen_fns = {
        "pmis": pmis,
        "cljp": cljp,
        "ruge": lambda A_, S_: ruge_stuben(A_, S_),
        "falgout": lambda A_, S_: ruge_stuben(A_, S_),
        "hmis": hmis,
        "cgc": lambda A_, S_: cgc(A_, S_),
    }
    if coarsen not in coarsen_fns:
        raise ValueError(f"unknown coarsen type: {coarsen!r}")
    device_coarsen = coarsen in ("pmis", "cljp")

    @partial(jax.jit, static_argnames=())
    def strength(A_lev: EllMatrix):
        return strength_mask(A_lev, strength_threshold, max_row_sum)

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
        elif interp == "multipass":
            P = multipass_interp(A, S, cf, cmap, n_coarse,
                                 p_max_elmts=p_max_elmts)
        else:
            raise ValueError(f"unknown interp type: {interp!r}")
        if interp_jacobi_passes > 0:
            P = jacobi_improve_interp(
                A, P, cf, passes=interp_jacobi_passes,
                max_elmts=p_max_elmts, trunc_factor=trunc_factor,
            )
        P = truncate_interp(P, max_elmts=p_max_elmts, trunc_factor=trunc_factor)
        if restrict_type == "air":
            from hypre_tpu.amg.air import air_restriction

            R = air_restriction(A, S, cf, cmap, n_coarse)
        Pt = ell_transpose(P) if restrict_type == "transpose" else R
        AP = ell_spgemm(A, P)
        A_coarse = ell_spgemm(Pt, AP)
        dinv, l1inv, lmax = _level_vectors(A, need_cheby)
        cf_pad = jnp.zeros(dinv.shape, jnp.int8).at[: cf.shape[0]].set(
            cf.astype(jnp.int8)
        )
        levels.append(
            Level(A=A, P=P, Pt=Pt, dinv=dinv, l1inv=l1inv, lmax=lmax, cf=cf_pad)
        )
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
    return AMGHierarchy(
        levels=levels, coarse_inv=coarse_inv,
        galerkin=restrict_type == "transpose",
    )


def make_smoother(relax: str, relax_weight: float, cheby_order: int, cheby_ratio: float,
                  relax_order: int = 0):
    """Bind a relax-type string to a (level, u, f) -> u function
    (the hypre_BoomerAMGRelax relax_type dispatch, par_relax.c:78-160).

    relax_order=1 applies hypre's CF ordering (HYPRE_BoomerAMGSetRelaxOrder:
    C points first, then F points against the updated C values) to the
    Jacobi-type smoothers; Chebyshev/Kaczmarz are whole-grid polynomial
    methods and ignore it, as hypre's dispatch does for relax types without
    a relax_points path."""
    from hypre_tpu.amg.relax import cf_jacobi

    if relax_order == 1 and relax in ("jacobi", "l1-jacobi"):
        def cf_sm(lev, u, f):
            if lev.cf is None:
                raise ValueError(
                    "relax_order=1 needs the setup path to record the CF "
                    "splitting (Level.cf); this hierarchy has none"
                )
            if relax == "jacobi":
                w = relax_weight if getattr(lev, "rw", None) is None else lev.rw
                return cf_jacobi(lev.A, lev.dinv, u, f, lev.cf, w)
            return cf_jacobi(lev.A, lev.l1inv, u, f, lev.cf, 1.0)

        return cf_sm
    if relax == "jacobi":
        # per-level CG-estimated weights (hypre_BoomerAMGCGRelaxWt) live
        # in lev.rw when the hypre negative-relax-weight convention asked
        # for them; the static knob applies otherwise
        return lambda lev, u, f: jacobi(
            lev.A, lev.dinv, u, f,
            relax_weight if getattr(lev, "rw", None) is None else lev.rw,
        )
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


def _restrict_level(hier: AMGHierarchy, lev: Level, r: jax.Array) -> jax.Array:
    # Pt=None marks a Galerkin level whose restriction runs through P's
    # own transpose path: fine-space diagonals for stencil-level
    # interpolation (seq/transfer_dia.py) or the scatter-formulated
    # BandedEll transpose (windows in the small coarse space); AIR
    # levels keep their explicit R in Pt (seq/fastmv.py)
    from hypre_tpu.seq.fastmv import BandedEll, banded_spmv_t
    from hypre_tpu.seq.transfer_dia import TransferDia

    if isinstance(lev.P, TransferDia):
        return lev.P.mv_t(r)
    if lev.Pt is None:
        return banded_spmv_t(lev.P, r)
    if isinstance(lev.P, BandedEll) and hier.galerkin:
        return banded_spmv_t(lev.P, r)
    return lev.Pt.mv(r)


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

    smoother may be a LIST of per-level callables (hypre's smooth_type /
    smooth_num_levels: complex smoothers — FSAI/ILU/Schwarz — on the first
    levels, the pointwise smoother below them, par_cycle.c smooth dispatch).
    """
    smoother = smoother or make_smoother("l1-jacobi", 1.0, 2, 0.3)
    per_level = isinstance(smoother, (list, tuple))

    def restrict(lev: Level, r: jax.Array) -> jax.Array:
        return _restrict_level(hier, lev, r)

    def descend(level: int, f: jax.Array, u: jax.Array, ctype: int) -> jax.Array:
        if level == len(hier.levels):
            with jax.named_scope("mg_coarse_solve"):
                return hier.coarse_inv @ f
        lev = hier.levels[level]
        sm = smoother[level] if per_level else smoother
        # per-MG-level trace annotation (HYPRE_ANNOTATE_MGLEVEL_BEGIN,
        # utilities/caliper_instrumentation.h:35-56) — shows up as named
        # regions in jax.profiler/Xprof traces
        with jax.named_scope(f"mg_level_{level}"):
            for _ in range(num_sweeps):
                u = sm(lev, u, f)
            r = f - lev.A.mv(u)
            rc = restrict(lev, r)
            ec = jnp.zeros(lev.P.vec_len_cols, f.dtype)
        last = level >= len(hier.levels) - 1
        if ctype == 3 and not last:
            # F-cycle: one recursive F-visit, then a V-visit (FMG recursion)
            ec = descend(level + 1, rc, ec, 3)
            ec = descend(level + 1, rc, ec, 1)
        else:
            visits = 1 if (last or ctype == 3) else max(ctype, 1)
            for _ in range(visits):
                ec = descend(level + 1, rc, ec, ctype if ctype != 3 else 1)
        with jax.named_scope(f"mg_level_{level}_up"):
            u = u + lev.P.mv(ec)
            for _ in range(num_sweeps):
                u = sm(lev, u, f)
        return u

    n_pad = hier.levels[0].A.vec_len_rows if hier.levels else (
        hier.coarse_inv.shape[0])
    unpad = 0
    if hier.n_fine and f.shape[0] != n_pad:
        # row-bucketed hierarchy driven with a true-size vector: pad in,
        # slice out (padded rows carry exact zeros through the cycle)
        unpad = f.shape[0]
        f = jnp.zeros(n_pad, f.dtype).at[:unpad].set(f)
        if u is not None:
            u = jnp.zeros(n_pad, u.dtype).at[:unpad].set(u)
    if u is None:
        u = jnp.zeros_like(f)
    out = descend(0, f, u, cycle_type)
    return out[:unpad] if unpad else out


def amg_cycle_t(
    hier: AMGHierarchy,
    f: jax.Array,
    u: Optional[jax.Array] = None,
    relax_weight: float = 1.0,
    num_sweeps: int = 1,
) -> jax.Array:
    """Transpose V-cycle: one multigrid cycle on A^T
    (hypre_BoomerAMGCycleT inside par_amg_solveT.c).

    A Galerkin hierarchy transposes level-by-level with the SAME
    transfers: A_{l+1} = P^T A_l P implies A_{l+1}^T = P^T A_l^T P, so
    the T-cycle only swaps every matvec for its transpose and the coarse
    direct solve for its transpose — restriction stays P^T, interpolation
    stays P. hypre forces the smoother to (damped) Jacobi here
    (par_amg_solveT.c:443-444 clamps relax_type to 7/9, applied through
    hypre_BoomerAMGRelaxT with a transposed matvec) because diag(A^T) =
    diag(A); we do the same.
    """
    if not hier.galerkin:
        raise ValueError(
            "solveT requires a Galerkin hierarchy (AIR stores R != P^T; "
            "its transpose cycle would need R^T interpolation)"
        )

    def descend(level: int, f: jax.Array, u: jax.Array) -> jax.Array:
        if level == len(hier.levels):
            with jax.named_scope("mg_coarse_solve_t"):
                return hier.coarse_inv.T @ f
        lev = hier.levels[level]
        with jax.named_scope(f"mg_level_{level}_t"):
            for _ in range(num_sweeps):
                u = u + relax_weight * lev.dinv * (f - lev.A.mv_t(u))
            r = f - lev.A.mv_t(u)
            rc = _restrict_level(hier, lev, r)
            ec = jnp.zeros(lev.P.vec_len_cols, f.dtype)
        ec = descend(level + 1, rc, ec)
        with jax.named_scope(f"mg_level_{level}_t_up"):
            u = u + lev.P.mv(ec)
            for _ in range(num_sweeps):
                u = u + relax_weight * lev.dinv * (f - lev.A.mv_t(u))
        return u

    n_pad = hier.levels[0].A.vec_len_rows if hier.levels else (
        hier.coarse_inv.shape[0])
    unpad = 0
    if hier.n_fine and f.shape[0] != n_pad:
        unpad = f.shape[0]
        f = jnp.zeros(n_pad, f.dtype).at[:unpad].set(f)
        if u is not None:
            u = jnp.zeros(n_pad, u.dtype).at[:unpad].set(u)
    if u is None:
        u = jnp.zeros_like(f)
    out = descend(0, f, u)
    return out[:unpad] if unpad else out


def amg_additive_cycle(
    hier: AMGHierarchy,
    f: jax.Array,
    u: Optional[jax.Array] = None,
    smoother: Optional[Callable] = None,
    num_sweeps: int = 1,
    add_start: int = 0,
    variant: str = "additive",
) -> jax.Array:
    """Additive / mult-additive / simple-additive cycle
    (hypre_BoomerAMGAdditiveCycle, par_add_cycle.c; selected at
    par_amg_solve.c:250-258 by HYPRE_BoomerAMGSetAdditive /
    SetMultAdditive / SetSimple, each taking the level the additive
    part starts at).

    Levels above ``add_start`` run the standard multiplicative V
    recursion; from ``add_start`` down the cycle is additive: the
    residual cascades through the restrictions untouched and every
    level contributes an independent smoother correction, summed
    through the prolongations —

        B_add = sum_l  (P_0 ... P_{l-1})  S_l  (P_0 ... P_{l-1})^T

    With a symmetric smoother (l1-Jacobi — hypre forces relax type
    8/18 here too) B_add is SPD, so the additive cycle is PCG-safe.
    All level smoothers are independent — XLA can overlap them, and in
    the distributed path one downward residual cascade is the only
    communication (the same motivation as hypre's).

    variant: 'additive' = ``smoother`` sweeps from zero per level;
    'simple' = single D^{-1} (plain diagonal) scaling
    (hypre_BoomerAMGSetSimple); 'mult' = mult-additive — the level
    correction is post-smoothed against the level residual on the way
    up (hypre folds this smoothing into P; the resulting operator
    matches a single-sweep multiplicative pass below add_start, which
    is exactly hypre's documented equivalence).
    """
    smoother = smoother or make_smoother("l1-jacobi", 1.0, 2, 0.3)
    n_pad0 = hier.levels[0].A.vec_len_rows if hier.levels else (
        hier.coarse_inv.shape[0])
    unpad = 0
    if hier.n_fine and f.shape[0] != n_pad0:
        unpad = f.shape[0]
        f = jnp.zeros(n_pad0, f.dtype).at[:unpad].set(f)
        if u is not None:
            u = jnp.zeros(n_pad0, u.dtype).at[:unpad].set(u)
    if u is None:
        u = jnp.zeros_like(f)
    n_lev = len(hier.levels)
    add_start = max(0, min(add_start, n_lev))

    # multiplicative down-sweep above the additive region
    stack = []  # (level, f_l, u_l) for levels 0..add_start-1
    f_l, u_l = f, u
    for level in range(add_start):
        lev = hier.levels[level]
        with jax.named_scope(f"mg_level_{level}"):
            for _ in range(num_sweeps):
                u_l = smoother(lev, u_l, f_l)
            r = f_l - lev.A.mv(u_l)
            stack.append((lev, f_l, u_l))
            f_l = _restrict_level(hier, lev, r)
            u_l = jnp.zeros(lev.P.vec_len_cols, f.dtype)

    # additive core: cascade the residual down, correct every level
    # independently, sum corrections up through P
    core = hier.levels[add_start:]
    if core:
        r_cur = f_l - core[0].A.mv(u_l)
        r_list = []
        for lev in core:
            r_list.append(r_cur)
            r_cur = _restrict_level(hier, lev, r_cur)
        acc = hier.coarse_inv @ r_cur
        for lev, r_l in zip(reversed(core), reversed(r_list)):
            if variant == "simple":
                e = lev.dinv * r_l
            else:
                e = jnp.zeros_like(r_l)
                for _ in range(num_sweeps):
                    e = smoother(lev, e, r_l)
            e = e + lev.P.mv(acc)
            if variant == "mult":
                for _ in range(num_sweeps):
                    e = smoother(lev, e, r_l)
            acc = e
        u_l = u_l + acc
    else:
        u_l = hier.coarse_inv @ f_l

    # multiplicative up-sweep
    for lev, f_prev, u_prev in reversed(stack):
        u_l = u_prev + lev.P.mv(u_l)
        for _ in range(num_sweeps):
            u_l = smoother(lev, u_l, f_prev)
    return u_l[:unpad] if unpad else u_l


def optimize_hierarchy(
    hier: AMGHierarchy,
    prefer_pallas: bool | None = None,
    gather_precision: int = 0,
    cheby_eig_est: int = 0,
    specialize: bool = False,
) -> AMGHierarchy:
    """Swap every level operator (A, P, Pt) for its fastest-on-this-backend
    representation (DIA shifts or the windowed Pallas gather, seq/fastmv.py).
    Run after setup, before the solve phase — the TPU analogue of hypre
    choosing device kernels at exec-policy time.

    cheby_eig_est > 0: re-estimate each level's Chebyshev lambda_max with
    that many CG/Lanczos steps (hypre_ParCSRMaxEigEstimateCG,
    par_relax_more.c:173) on the OPTIMIZED operator — the device setup
    itself uses the free Gershgorin bound because iterative estimation on
    the raw ELL slabs was the dominant setup cost; on the DIA/BandedEll
    operators ~10 matvecs per level are cheap, restoring hypre's
    -cheby_eig_est semantics for the device path.

    specialize: bake diagonal-offset VALUES into the solve programs (the
    round-3 static kernels: tight x windows, static slices — measured
    834 GB/s vs 700 for the shape-generic dynamic kernels). One compile
    per offset family+shape, served from the persistent cache after first
    sight; the policy layer (warmup.shape_seen) decides when the trade is
    free."""
    from hypre_tpu.seq.dia import DiaMatrix
    from hypre_tpu.seq.fastmv import BandedEll

    import numpy as _np

    def _spec_dia(M):
        # late specialization of an already-built DiaMatrix: pull the tiny
        # offsets array to host and pin it as the static twin
        if not specialize or not isinstance(M, DiaMatrix):
            return M
        if M.offsets_static is not None:
            return M
        offs = tuple(int(o) for o in _np.asarray(M.offsets))
        return dataclasses.replace(M, offsets_static=offs)

    def refresh_lmax(lev, A_fast):
        if cheby_eig_est <= 0 or float(_np.asarray(lev.lmax)) == 0.0:
            return lev
        lmax = _jit_eig_cg(A_fast, lev.dinv, min(cheby_eig_est,
                                                 A_fast.vec_len_rows))
        return dataclasses.replace(lev, lmax=lmax.astype(lev.lmax.dtype))

    # Batched banded prepass: dispatch every level's window-schedule
    # program up front, pull ALL the schedule scalars in ONE transfer
    # (the per-operator pulls cost ~30 ms of tunnel RTT each — ~0.2 s of
    # the warm optimize phase), then build the BandedEll objects below.
    from hypre_tpu.seq.fastmv import (
        MIN_BANDED_ELEMENTS, _banded_sched_payload, banded_from_sched,
    )

    pp = prefer_pallas if prefer_pallas is not None else (
        jax.default_backend() == "tpu"
    )
    sched: dict = {}
    if pp:
        cands = []
        for li, lev in enumerate(hier.levels):
            for nm, M in (("A", lev.A), ("P", lev.P), ("Pt", lev.Pt)):
                if (
                    isinstance(M, EllMatrix)
                    and M.shifts is None
                    and M.dtype == jnp.float32
                    and M.n_rows * M.k >= MIN_BANDED_ELEMENTS
                ):
                    n_pad = -(-M.n_rows // 1024) * 1024
                    pieces = _banded_sched_payload(M.vals, M.cols, 1024,
                                                   n_pad)
                    cands.append(((li, nm), M, pieces))
        if cands:
            packed = _np.asarray(
                _jit_pack_scalars(tuple(c[2][3] for c in cands))
            )
            for i, (key, M, pieces) in enumerate(cands):
                sched[key] = banded_from_sched(
                    M, pieces[0], pieces[1], pieces[2],
                    int(packed[2 * i]), int(packed[2 * i + 1]),
                    exact=gather_precision,
                )

    def _opt(M, key):
        if key in sched:
            bb = sched[key]
            return bb if bb is not None else M
        return optimize_operator(
            M, prefer_pallas, exact=gather_precision, dia_detect="shifts",
            specialize=specialize,
        )

    new_levels = []
    for _li, lev in enumerate(hier.levels):
        # exact=0 (single-pass bf16 gather): the rounding error (~1e-3 on
        # the gathered values) is benign inside the V-cycle preconditioner;
        # the outer Krylov drives the true residual with exact operators.
        # Raise via gather_precision for parity/debug runs.
        A = _spec_dia(_opt(lev.A, (_li, "A")))
        from hypre_tpu.seq.transfer_dia import TransferDia

        if isinstance(lev.P, TransferDia):
            # already converted by the device setup (fine-space diagonal
            # transfers on stencil levels) — pass through, specializing
            # the embedded DIA transfer kernels when asked
            P = lev.P
            if jax.default_backend() == "tpu":
                # block-major dvals copies for the pallas kernels: the
                # (D, n) layout costs D strided DMA segments per grid step
                # (~0.25 us of descriptor overhead each), which at D~64
                # made the transfer SpMVs 3.5x slower than their stream
                # floor (measured 2.4 ms vs 0.68 ms at 128^3). One device
                # pass here buys roofline transfers for the whole solve.
                P = dataclasses.replace(
                    P,
                    P_dia=P.P_dia.pack_blocked(),
                    Pt_dia=P.Pt_dia.pack_blocked(),
                )
            if specialize:
                P = dataclasses.replace(
                    P, P_dia=_spec_dia(P.P_dia), Pt_dia=_spec_dia(P.Pt_dia)
                )
            new_levels.append(
                refresh_lmax(dataclasses.replace(lev, A=A, P=P, Pt=None), A)
            )
            continue
        P = _spec_dia(_opt(lev.P, (_li, "P")))
        if isinstance(P, BandedEll) and hier.galerkin:
            # restriction runs through P's scatter transpose; Pt and the
            # duplicate ELL payloads would only burn transfer bandwidth
            P = P.drop_ell()
            Pt = None
        else:
            # non-Galerkin (AIR): Pt holds R and must survive
            Pt = _spec_dia(_opt(lev.Pt, (_li, "Pt")))
        if isinstance(A, BandedEll):
            A = A.drop_ell()
        if isinstance(Pt, BandedEll):
            Pt = Pt.drop_ell()
        new_levels.append(
            refresh_lmax(dataclasses.replace(lev, A=A, P=P, Pt=Pt), A)
        )
    return AMGHierarchy(
        levels=new_levels, coarse_inv=hier.coarse_inv, galerkin=hier.galerkin,
        n_fine=hier.n_fine, n_level_true=hier.n_level_true,
    )


@jax.jit
def _jit_pack_scalars(parts):
    return jnp.concatenate([jnp.ravel(p).astype(jnp.float32) for p in parts])


@partial(jax.jit, static_argnames=("iters",))
def _jit_eig_cg(A, dinv, iters):
    from hypre_tpu.amg.relax import max_eig_estimate_cg

    return max_eig_estimate_cg(A, dinv, iters)[0]


# ---------------------------------------------------------------------------
# Native (C++/OpenMP) setup path — see csrc/hypre_tpu_native.cpp
# ---------------------------------------------------------------------------


def _ell_to_csr_arrays(A: EllMatrix):
    import numpy as np

    cols = np.asarray(A.cols)
    vals = np.asarray(A.vals, dtype=np.float64)
    n, k = cols.shape
    valid = cols >= 0
    counts = valid.sum(axis=1).astype(np.int32)
    Ap = np.zeros(n + 1, np.int32)
    np.cumsum(counts, out=Ap[1:])
    # the native kernels accept unsorted column order within rows
    Aj = cols[valid].astype(np.int32)
    Ax = np.ascontiguousarray(vals[valid])
    return n, Ap, Aj, Ax


def _csr_to_ell_device(n, m, Ap, Aj, Ax, dtype):
    import numpy as np

    from hypre_tpu.core.config import PAD_COL

    counts = np.diff(Ap)
    k = max(int(counts.max(initial=0)), 1)
    vals = np.zeros((n, k), dtype=dtype)
    cols = np.full((n, k), PAD_COL, np.int32)
    rows = np.repeat(np.arange(n), counts)
    within = np.arange(len(Aj)) - np.repeat(Ap[:-1], counts)
    vals[rows, within] = Ax
    cols[rows, within] = Aj
    return EllMatrix(vals=jnp.asarray(vals), cols=jnp.asarray(cols), n_cols=m)


def _hash01_vec(n: int):
    """Vectorized core/config.py:hash_rand01 (numpy) for reproducible
    power-method starting vectors on host."""
    import numpy as np

    x = np.arange(n, dtype=np.uint32)
    x = (x ^ (x >> np.uint32(16))) * np.uint32(0x7FEB352D)
    x = (x ^ (x >> np.uint32(15))) * np.uint32(0x846CA68B)
    x = x ^ (x >> np.uint32(16))
    return x.astype(np.float64) / 4294967296.0


def _setup_hierarchy_native(
    A: EllMatrix,
    strength_threshold: float,
    max_levels: int,
    max_coarse_size: int,
    p_max_elmts: int,
    trunc_factor: float,
    relax: str,
    coarsen: str,
    coarsen_rtol: float,
    interp: str = "ext+i",
    agg_num_levels: int = 0,
    nongalerkin_tol: float = 0.0,
    max_row_sum: float = 1.0,
) -> AMGHierarchy:
    """hypre_BoomerAMGSetup via the native kernels: the level loop stays in
    host CSR arrays end-to-end; ELL device slabs are built once per level."""
    import numpy as np

    from hypre_tpu import native

    need_cheby = relax == "chebyshev"
    dtype = A.dtype
    levels: List[Level] = []
    n, Ap, Aj, Ax = _ell_to_csr_arrays(A)
    A_ell = A

    def one_pass(n, Ap, Aj, Ax):
        """strength + coarsening + interpolation on one operator; returns
        (n_coarse, P csr)."""
        S = native.strength(n, Ap, Aj, Ax, strength_threshold, max_row_sum)
        if coarsen == "pmis":
            cf = native.pmis(n, Ap, Aj, S)
        else:  # ruge / falgout / hmis (single-shard: RS first pass)
            cf = native.rs(n, Ap, Aj, S)
            if coarsen == "hmis":
                # PMIS cleanup: F points with strong rows but no C neighbor
                for i in np.nonzero(cf == -1)[0]:
                    seg = slice(Ap[i], Ap[i + 1])
                    strong = Aj[seg][S[seg].astype(bool)]
                    if strong.size and not (cf[strong] == 1).any():
                        cf[i] = 1
        is_c = cf == 1
        n_coarse = int(is_c.sum())
        if n_coarse == 0 or n_coarse >= coarsen_rtol * n:
            return 0, None, None
        cmap = np.where(is_c, np.cumsum(is_c) - 1, -1).astype(np.int32)
        if interp == "direct":
            Pp, Pj, Px = native.direct_interp(n, Ap, Aj, Ax, S, cf, cmap)
        else:
            Pp, Pj, Px = native.extpi_interp(n, Ap, Aj, Ax, S, cf, cmap)
        if p_max_elmts > 0 or trunc_factor > 0:
            Pp, Pj, Px = native.truncate(n, Pp, Pj, Px, p_max_elmts, trunc_factor)
        return n_coarse, (Pp, Pj, Px), cf

    def rap(n, nc, Ap, Aj, Ax, Pp, Pj, Px):
        Tp, Tj, Tx = native.transpose(n, nc, Pp, Pj, Px)
        APp, APj, APx = native.spgemm(n, nc, Ap, Aj, Ax, Pp, Pj, Px)
        Cp, Cj, Cx = native.spgemm(nc, nc, Tp, Tj, Tx, APp, APj, APx)
        return (Tp, Tj, Tx), (Cp, Cj, Cx)

    while len(levels) < max_levels - 1 and n > max_coarse_size:
        n_coarse, P_csr, cf_fine = one_pass(n, Ap, Aj, Ax)
        if n_coarse == 0:
            break
        Pp, Pj, Px = P_csr
        if len(levels) < agg_num_levels and n_coarse > max_coarse_size:
            # aggressive coarsening (hypre agg_num_levels / par_2s_interp):
            # coarsen the coarse operator again immediately and interpolate
            # through the product P = P1 * P2, so the stored hierarchy skips
            # the intermediate grid entirely
            (T1), (C1) = rap(n, n_coarse, Ap, Aj, Ax, Pp, Pj, Px)
            C1p, C1j, C1x = C1
            n2, P2_csr, _cf2 = one_pass(n_coarse, C1p, C1j, C1x)
            if n2 > 0:
                P2p, P2j, P2x = P2_csr
                Pp, Pj, Px = native.spgemm(
                    n, n2, Pp, Pj, Px, P2p, P2j, P2x
                )
                if p_max_elmts > 0:
                    Pp, Pj, Px = native.truncate(
                        n, Pp, Pj, Px, p_max_elmts, trunc_factor
                    )
                n_coarse = n2
        (Tp, Tj, Tx), (Cp, Cj, Cx) = rap(n, n_coarse, Ap, Aj, Ax, Pp, Pj, Px)
        if nongalerkin_tol > 0:
            Cp, Cj, Cx = _nongalerkin_sparsify(n_coarse, Cp, Cj, Cx, nongalerkin_tol)

        P_ell = _csr_to_ell_device(n, n_coarse, Pp, Pj, Px, dtype)
        Pt_ell = _csr_to_ell_device(n_coarse, n, Tp, Tj, Tx, dtype)
        # diagonal / l1 vectors straight from CSR (numpy segment sums);
        # the Chebyshev eigenvalue estimate is deferred to the fast device
        # operators (BoomerAMG.setup finalize) — lmax=0 marks "pending"
        rows = np.repeat(np.arange(n), np.diff(Ap))
        diag = np.zeros(n, np.float64)
        np.add.at(diag, rows[Aj == rows], Ax[Aj == rows])
        l1 = np.zeros(n, np.float64)
        np.add.at(l1, rows, np.abs(Ax))
        dinv_np = np.where(diag != 0, 1.0 / np.where(diag != 0, diag, 1.0), 0.0)
        dinv = jnp.asarray(dinv_np.astype(dtype))
        l1inv = jnp.asarray((1.0 / np.where(l1 > 0, l1, 1.0)).astype(dtype))
        if need_cheby:
            # host power method on D^{-1}A (native CSR SpMV), with hypre's
            # 1.1 safety margin (par_relax_more.c:136)
            x = _hash01_vec(n) - 0.5
            x /= np.linalg.norm(x)
            for _ in range(10):
                y = dinv_np * native.matvec(n, Ap, Aj, Ax, x)
                nrm = np.linalg.norm(y)
                x = y / (nrm if nrm > 0 else 1.0)
            y = dinv_np * native.matvec(n, Ap, Aj, Ax, x)
            lmax = jnp.asarray(1.1 * float(x @ y) / float(x @ x), dtype)
        else:
            lmax = jnp.asarray(0.0, dtype)
        cf_pad = np.zeros(int(dinv.shape[0]), np.int8)
        cf_pad[: cf_fine.shape[0]] = cf_fine.astype(np.int8)
        levels.append(
            Level(A=A_ell, P=P_ell, Pt=Pt_ell, dinv=dinv, l1inv=l1inv,
                  lmax=lmax, cf=jnp.asarray(cf_pad))
        )

        n, Ap, Aj, Ax = n_coarse, Cp, Cj, Cx
        A_ell = _csr_to_ell_device(n, n, Ap, Aj, Ax, dtype)

    dense = np.zeros((n, n), np.float64)
    rows = np.repeat(np.arange(n), np.diff(Ap))
    np.add.at(dense, (rows, Aj), Ax)
    # plain inv is much cheaper than pinv at n~1500, but singular coarse
    # operators (pure-Neumann problems, gradient-space A_G in AMS) pass
    # through np.linalg.inv WITHOUT raising — verify the inverse and fall
    # back to the pseudo-inverse when it is garbage
    coarse_inv = None
    try:
        inv = np.linalg.inv(dense)
        scale = max(np.abs(dense).max(), 1.0)
        if np.isfinite(inv).all() and np.abs(inv).max() * scale < 1e12:
            resid = np.abs(dense @ inv - np.eye(n)).max()
            if resid < 1e-6:
                coarse_inv = inv
    except np.linalg.LinAlgError:
        pass
    if coarse_inv is None:
        coarse_inv = np.linalg.pinv(dense, rcond=1e-10)
    coarse_inv = jnp.asarray(coarse_inv.astype(dtype))
    return AMGHierarchy(levels=levels, coarse_inv=coarse_inv, galerkin=True)


def _nongalerkin_sparsify(n, Cp, Cj, Cx, tol):
    """Non-Galerkin coarse-operator sparsification (par_nongalerkin.c idea,
    simplified): drop off-diagonal entries |a_ij| < tol*sqrt(|a_ii a_jj|)
    and lump them onto the diagonal — row sums (constants) are preserved,
    the coarse stencil shrinks, and the TPU gather kernels get narrower
    slots and windows."""
    import numpy as np

    rows = np.repeat(np.arange(n), np.diff(Cp))
    diag = np.zeros(n)
    dm = Cj == rows
    np.add.at(diag, rows[dm], Cx[dm])
    scale = np.sqrt(np.abs(diag[rows]) * np.abs(diag[Cj])) + 1e-300
    keep = dm | (np.abs(Cx) >= tol * scale)
    lump = np.zeros(n)
    np.add.at(lump, rows[~keep], Cx[~keep])
    Cx = Cx.copy()
    Cx[dm] += lump[rows[dm]]
    new_counts = np.bincount(rows[keep], minlength=n).astype(np.int32)
    Np = np.zeros(n + 1, np.int32)
    np.cumsum(new_counts, out=Np[1:])
    return Np, Cj[keep].astype(np.int32), Cx[keep]
