"""Distributed fine-grained ILU on row-sharded operators.

The true parallel-ILU analogue of hypre's Euclid
(``distributed_ls/Euclid/Euclid_dh.c``): Euclid factors across ranks by
exchanging *external rows* of the factor along the subdomain graph, so
each rank's rows eliminate against up-to-date neighbor values. The
TPU-native formulation keeps the Chow-Patel fixed-point view of
``precond/ilu.py`` and distributes it with exactly that exchange:

- every sweep updates all local factor entries simultaneously from the
  ILU fixed-point equations, with the neighbor-row factor values fetched
  by ONE forward halo exchange over the matrix's ppermute schedule
  (``parallel/par_ell.py``) — the ``hypre_ParCSRMatrixExtractBExt`` idea
  applied to the factor instead of the matrix;
- comparisons run on *global* column ids (each shard also fetches its
  halo rows' global column ids once, the pattern being static), so the
  iteration is the synchronous global Chow-Patel iteration — the factors
  converge to the same ILU(0) fixed point as the single-device kernel;
- application is Jacobi-iterated triangular solves whose matvecs are
  plain ``par_spmv`` calls on the L / strict-U factors stored as
  ``ParEllMatrix`` over the SAME halo schedule (the factor pattern is a
  subset of A's, so the CommPkg is reused unchanged — hypre rebuilds a
  smaller one, ``Euclid/ExternalRows_dh.c``).

Unlike Euclid's level-scheduled exact triangular solves, both phases
here are fully parallel with tunable sweep counts — the same trade
hypre's own GPU ILU makes (``par_ilu_solve.c`` iterative variants).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from hypre_tpu.parallel.mesh import ROW_AXIS
from hypre_tpu.parallel.par_ell import ParEllMatrix, par_spmv

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

_BIG = jnp.int32(2**30)


def _par_chow_patel(A: ParEllMatrix, sweeps: int):
    """Distributed Chow-Patel factorization. Returns (Fd, Fo, dinv,
    is_l_d, is_l_o, is_diag_d) — factor values aligned with A's
    diag/offd slabs plus the global-order masks needed to split L/U."""
    from hypre_tpu.parallel.par_setup import _ext_matrix, _fetch

    nshards = A.num_shards
    offsets, sizes = A.offsets, A.sizes
    n_cl = A.n_col_local
    kd = A.diag_cols.shape[1]

    def body(dvals, dcols, ovals, ocols, send_idx):
        send0 = send_idx[0]
        vals, cols = _ext_matrix(dvals, dcols, ovals, ocols, n_cl)
        n_l = vals.shape[0]
        shard = lax.axis_index(ROW_AXIS)
        gids_local = jnp.arange(n_cl, dtype=jnp.int32) + shard * n_cl
        # global id of every extended-space position (own rows + halo)
        gmap = jnp.concatenate([
            gids_local,
            _fetch(gids_local, send0, offsets, sizes, nshards),
        ])
        valid = cols >= 0
        rsafe = jnp.maximum(cols, 0)
        gcols = jnp.where(valid, gmap[rsafe], _BIG)  # (n_l, k) global ids
        grow = gids_local[:, None]  # (n_l, 1)
        # halo rows' global column ids (static pattern: fetched once)
        gcols_ext = jnp.concatenate(
            [gcols, _fetch(gcols, send0, offsets, sizes, nshards)]
        )
        grow_ext = gmap  # (n_ext,) each extended row's own global id

        is_l = valid & (gcols < grow)
        is_u = valid & (gcols >= grow)
        is_diag = valid & (gcols == grow)

        def sweep(F, _):
            # factor rows for every referenced extended row: own + ONE
            # forward halo exchange of the factor slab (Euclid's
            # external-rows exchange, per sweep)
            F_ext = jnp.concatenate(
                [F, _fetch(F, send0, offsets, sizes, nshards)]
            )
            nv = F_ext[rsafe]          # (n_l, k, k) neighbor-row factors
            ncg = gcols_ext[rsafe]     # (n_l, k, k) their global col ids
            # U(c_a, c_b): neighbor row entries at/above its own diagonal
            u_mask = ncg >= grow_ext[rsafe][:, :, None]
            uv = jnp.where(u_mask & (ncg < _BIG), nv, 0.0)
            Uab = jnp.einsum(
                "nas,nabs->nab",
                uv,
                (ncg[:, :, None, :] == gcols[:, None, :, None]).astype(
                    F.dtype
                ),
            )
            Lia = jnp.where(is_l, F, 0.0)
            ab_order = (gcols[:, :, None] < gcols[:, None, :]).astype(
                F.dtype
            )
            S = jnp.einsum("na,nab,nab->nb", Lia, Uab, ab_order)
            dU_ext = jnp.sum(
                jnp.where(gcols_ext == grow_ext[:, None], F_ext, 0.0),
                axis=1,
            )
            dU_col = dU_ext[rsafe]
            dU_col = jnp.where(dU_col != 0, dU_col, 1.0)
            newU = vals - S
            newL = (vals - S) / dU_col
            return jnp.where(is_u, newU, jnp.where(is_l, newL, 0.0)), None

        F0 = jnp.where(valid, vals, 0.0)
        F, _ = lax.scan(sweep, F0, None, length=sweeps)
        dU = jnp.sum(jnp.where(is_diag, F, 0.0), axis=1)
        dinv = jnp.where(dU != 0, 1.0 / jnp.where(dU != 0, dU, 1.0), 1.0)
        return (
            F[:, :kd], F[:, kd:], dinv,
            is_l[:, :kd], is_l[:, kd:], is_diag[:, :kd],
        )

    spec = P(ROW_AXIS)
    return _shard_map(
        body,
        mesh=A.mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec, spec, spec),
    )(A.diag_vals, A.diag_cols, A.offd_vals, A.offd_cols, A.send_idx)


def _masked_par(A: ParEllMatrix, Fd, Fo, mask_d, mask_o) -> ParEllMatrix:
    """A ParEllMatrix holding the masked factor values over A's pattern
    and halo schedule (the factor pattern is a subset, so the CommPkg is
    reused verbatim)."""
    return dataclasses.replace(
        A,
        diag_vals=jnp.where(mask_d, Fd, 0.0),
        diag_cols=jnp.where(mask_d, A.diag_cols, -1),
        offd_vals=jnp.where(mask_o, Fo, 0.0),
        offd_cols=jnp.where(mask_o, A.offd_cols, -1),
    )


def par_extend_pattern(A: ParEllMatrix, levels: int,
                       out_k: int | None = None) -> ParEllMatrix:
    """ILU(k)-envelope pattern growth on a row-sharded operator: ``levels``
    rounds of distributed symbolic neighbor union (each round ORs every
    row's pattern with its neighbor rows' patterns — the pattern of A^(2^r)
    after r rounds covers ILU fill paths of that length). Fill positions
    carry value 0, so factoring the result enforces (LU)_ij = a_ij on the
    whole envelope — hypre's Euclid ILU(k) fill (``Euclid/ilu_seq.c``
    symbolic phase) realized as slab merges + the ExtractBExt-style
    neighbor-row fetch instead of per-rank linked lists."""
    from hypre_tpu.parallel.par_setup import (
        _ext_matrix, _fetch, par_from_global_cols,
    )
    from hypre_tpu.seq.slabops import merge_slab
    from hypre_tpu.core.config import PAD_COL

    nshards = A.num_shards
    offsets, sizes = A.offsets, A.sizes
    n_cl = A.n_col_local

    for _ in range(levels):
        k = A.diag_cols.shape[1] + A.offd_cols.shape[1]
        ko = out_k or min(k * k + k, 96)

        def body(dvals, dcols, ovals, ocols, send_idx):
            send0 = send_idx[0]
            vals, cols = _ext_matrix(dvals, dcols, ovals, ocols, n_cl)
            n_l, kk = cols.shape
            shard = lax.axis_index(ROW_AXIS)
            gids_local = jnp.arange(n_cl, dtype=jnp.int32) + shard * n_cl
            gmap = jnp.concatenate([
                gids_local,
                _fetch(gids_local, send0, offsets, sizes, nshards),
            ])
            valid = cols >= 0
            rsafe = jnp.maximum(cols, 0)
            gcols = jnp.where(valid, gmap[rsafe], PAD_COL)
            gcols_ext = jnp.concatenate(
                [gcols, _fetch(gcols, send0, offsets, sizes, nshards)]
            )
            nb = gcols_ext[rsafe].reshape(n_l, kk * kk)
            nb = jnp.where(jnp.repeat(valid, kk, axis=1), nb, PAD_COL)
            cand_c = jnp.concatenate([gcols, nb], axis=1)
            cand_v = jnp.concatenate(
                [jnp.where(valid, vals, 0.0),
                 jnp.zeros((n_l, kk * kk), vals.dtype)], axis=1
            )
            mc, mv, _ = merge_slab(cand_c, cand_v, ko)
            return mc, mv

        spec = P(ROW_AXIS)
        gc, gv = _shard_map(
            body, mesh=A.mesh, in_specs=(spec,) * 5, out_specs=(spec, spec),
        )(A.diag_vals, A.diag_cols, A.offd_vals, A.offd_cols, A.send_idx)
        A = par_from_global_cols(gc, gv, A.n_rows, A.n_cols, A.mesh)
    return A


@dataclasses.dataclass
class ParILU:
    """Distributed ILU(0) over a row-sharded ParEllMatrix — the working
    core behind the Euclid wrapper's distributed path."""

    factor_sweeps: int = 8
    solve_sweeps: int = 6

    L: Optional[ParEllMatrix] = dataclasses.field(default=None, repr=False)
    Us: Optional[ParEllMatrix] = dataclasses.field(default=None, repr=False)
    dinv: Optional[jax.Array] = dataclasses.field(default=None, repr=False)

    def setup(self, A: ParEllMatrix) -> "ParILU":
        Fd, Fo, dinv, is_l_d, is_l_o, is_diag_d = _par_chow_patel(
            A, self.factor_sweeps
        )
        is_u_d = (A.diag_cols >= 0) & ~is_l_d & ~is_diag_d
        is_u_o = (A.offd_cols >= 0) & ~is_l_o
        self.L = _masked_par(A, Fd, Fo, is_l_d, is_l_o)
        self.Us = _masked_par(A, Fd, Fo, is_u_d, is_u_o)  # strict upper
        self.dinv = dinv
        return self

    def precond(self):
        L, Us, dinv = self.L, self.Us, self.dinv
        m = self.solve_sweeps

        def M(r):
            y = r
            for _ in range(m):
                y = r - par_spmv(L, y)
            x = dinv * y
            for _ in range(m):
                x = dinv * (y - par_spmv(Us, x))
            return x

        return M


def _par_global_cols(A: ParEllMatrix):
    """Global column ids aligned with A's diag/offd slabs (_BIG where
    invalid) — the shard-independent tie-break key for truncation."""
    from hypre_tpu.parallel.par_setup import _ext_matrix, _fetch

    nshards = A.num_shards
    offsets, sizes = A.offsets, A.sizes
    n_cl = A.n_col_local
    kd = A.diag_cols.shape[1]

    def body(dvals, dcols, ovals, ocols, send_idx):
        send0 = send_idx[0]
        _, cols = _ext_matrix(dvals, dcols, ovals, ocols, n_cl)
        shard = lax.axis_index(ROW_AXIS)
        gids_local = jnp.arange(n_cl, dtype=jnp.int32) + shard * n_cl
        gmap = jnp.concatenate([
            gids_local,
            _fetch(gids_local, send0, offsets, sizes, nshards),
        ])
        g = jnp.where(cols >= 0, gmap[jnp.maximum(cols, 0)], _BIG)
        return g[:, :kd], g[:, kd:]

    spec = P(ROW_AXIS)
    return _shard_map(
        body, mesh=A.mesh, in_specs=(spec,) * 5, out_specs=(spec, spec),
    )(A.diag_vals, A.diag_cols, A.offd_vals, A.offd_cols, A.send_idx)


def _ilut_keep(mag: jax.Array, gcols: jax.Array, side_mask: jax.Array,
               thr: jax.Array, p: int) -> jax.Array:
    """Dual-drop selection per row (pilut's rule, ``parilut.c`` /
    ``ilut.c``): drop |v| < thr, then keep at most the ``p`` largest
    survivors — EXACTLY p, ties broken by global column id so the
    selection is independent of slot order and shard count. Row-local
    sorts only — sharding-transparent."""
    ok = side_mask & (mag >= thr[:, None])
    if p >= mag.shape[1]:
        return ok
    neg = jnp.where(ok, -mag, jnp.inf)
    gk = jnp.where(ok, gcols, _BIG)
    s_neg, s_g = lax.sort((neg, gk), num_keys=2)
    cut_neg = s_neg[:, p - 1:p]
    cut_g = s_g[:, p - 1:p]
    return ok & ((neg < cut_neg) | ((neg == cut_neg) & (gk <= cut_g)))


@dataclasses.dataclass
class ParILUT:
    """TRUE distributed ILUT (the ``distributed_ls/pilut`` capability):
    drop-tolerance + factor-row-size fill control inside a distributed
    factorization.

    pilut (Karypis/Kumar, ``pilut/parilut.c`` + ``trifactor.c``) eliminates
    rows in parallel phases with dual-drop truncation applied during
    elimination. The TPU-native equivalent decomposes the same capability
    into three fully-parallel stages: (1) grow an ILU(k) fill envelope by
    distributed symbolic neighbor union (``par_extend_pattern``), (2) run
    the distributed Chow-Patel fixed point on the envelope (per-sweep
    external-factor exchange — ``_par_chow_patel``), (3) apply pilut's
    dual-drop rule to the converged factors: per row drop entries below
    ``drop_tolerance * ||a_i||_2`` and keep at most ``factor_row_size``
    largest per L/U side (``SetDropTolerance`` /
    ``SetFactorRowSize``, ``HYPRE_DistributedMatrixPilutSolver.c``)."""

    fill_levels: int = 1
    drop_tolerance: float = 1e-4
    factor_row_size: int = 20
    factor_sweeps: int = 8
    solve_sweeps: int = 6

    L: Optional[ParEllMatrix] = dataclasses.field(default=None, repr=False)
    Us: Optional[ParEllMatrix] = dataclasses.field(default=None, repr=False)
    dinv: Optional[jax.Array] = dataclasses.field(default=None, repr=False)

    def setup(self, A: ParEllMatrix) -> "ParILUT":
        Ax = (
            par_extend_pattern(A, self.fill_levels)
            if self.fill_levels > 0
            else A
        )
        Fd, Fo, dinv, is_l_d, is_l_o, is_diag_d = _par_chow_patel(
            Ax, self.factor_sweeps
        )
        is_u_d = (Ax.diag_cols >= 0) & ~is_l_d & ~is_diag_d
        is_u_o = (Ax.offd_cols >= 0) & ~is_l_o
        # pilut's relative threshold: against the ORIGINAL row 2-norm
        # (fill positions carry value 0, so Ax's row norms equal A's)
        rn = jnp.sqrt(
            jnp.sum(Ax.diag_vals**2, axis=1)
            + jnp.sum(Ax.offd_vals**2, axis=1)
        )
        thr = self.drop_tolerance * rn
        mag = jnp.abs(jnp.concatenate([Fd, Fo], axis=1))
        gd, go = _par_global_cols(Ax)
        gcols = jnp.concatenate([gd, go], axis=1)
        kd = Fd.shape[1]
        p = self.factor_row_size
        keep_l = _ilut_keep(
            mag, gcols, jnp.concatenate([is_l_d, is_l_o], axis=1), thr, p
        )
        keep_u = _ilut_keep(
            mag, gcols, jnp.concatenate([is_u_d, is_u_o], axis=1), thr, p
        )
        self.L = _masked_par(Ax, Fd, Fo, keep_l[:, :kd], keep_l[:, kd:])
        self.Us = _masked_par(Ax, Fd, Fo, keep_u[:, :kd], keep_u[:, kd:])
        self.dinv = dinv
        return self

    precond = ParILU.precond
