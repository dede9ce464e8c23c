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
