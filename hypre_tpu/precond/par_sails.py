"""Distributed ParaSails on row-sharded operators.

The reference ParaSails (``distributed_ls/ParaSails/ParaSails.c``) gathers
*remote rows* of A along the pattern (``PrunedRows.c``) so each processor
can form and solve its rows' least-squares systems locally. Same idea
here: ONE forward halo exchange ships the factor-relevant neighbor rows
(values + global column ids) over the matrix's ppermute schedule, after
which every local row's normal equations

    (A A^T)[J_i, J_i] m_i^T = A[i, J_i]^T,   J_i = pattern(row i)

assemble from pairwise row inner products computed by a global-column-id
match — no materialized A A^T, no second communication. The batched
(k, k) solves are one ``jnp.linalg.solve`` (MXU work). Application is a
plain ``par_spmv`` with M stored over A's halo schedule.

v1 scope: level-0 pattern (pattern of A) with the ``thresh`` prune — the
power-pattern expansion of the sequential version needs a second halo
layer and is sequential-only for now.
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


def _par_sails_rows(A: ParEllMatrix, thresh: float, reg: float):
    from hypre_tpu.parallel.par_setup import _ext_matrix, _fetch

    nshards = A.num_shards
    offsets, sizes = A.offsets, A.sizes
    n_cl = A.n_col_local
    kd = A.diag_cols.shape[1]

    def body(dvals, dcols, ovals, ocols, send_idx):
        send0 = send_idx[0]
        vals, cols = _ext_matrix(dvals, dcols, ovals, ocols, n_cl)
        shard = lax.axis_index(ROW_AXIS)
        gids_local = jnp.arange(n_cl, dtype=jnp.int32) + shard * n_cl
        gmap = jnp.concatenate([
            gids_local, _fetch(gids_local, send0, offsets, sizes, nshards),
        ])
        valid = cols >= 0
        rsafe = jnp.maximum(cols, 0)
        gcols = jnp.where(valid, gmap[rsafe], _BIG)

        if thresh > 0.0:
            # ParaSails.c's prune pass on the local pattern
            diag = jnp.sum(
                jnp.where(gcols == gids_local[:, None], vals, 0.0), axis=1
            )
            d_ext = jnp.concatenate(
                [diag, _fetch(diag, send0, offsets, sizes, nshards)]
            )
            dj = jnp.where(valid, jnp.abs(d_ext[rsafe]), 1.0)
            keep = valid & (
                (gcols == gids_local[:, None])
                | (
                    jnp.abs(vals)
                    >= thresh * jnp.sqrt(jnp.abs(diag)[:, None] * dj)
                )
            )
        else:
            keep = valid

        # remote-row gather: values + global col ids for halo positions
        ev = jnp.concatenate([vals, _fetch(vals, send0, offsets, sizes,
                                           nshards)])
        eg = jnp.concatenate([gcols, _fetch(gcols, send0, offsets, sizes,
                                            nshards)])
        rv = ev[rsafe]   # (n, k, k): row c_a of A
        rg = eg[rsafe]
        rv = jnp.where(keep[:, :, None], rv, 0.0)
        # pairwise row inner products by global-col-id match:
        # N[i,a,b] = sum_{s,t} rv[a,s] rv[b,t] [rg[a,s]==rg[b,t]]
        m = (rg[:, :, None, :, None] == rg[:, None, :, None, :])
        N = jnp.einsum("nas,nbt,nabst->nab", rv, rv, m.astype(vals.dtype))
        k = cols.shape[1]
        N = N + reg * jnp.eye(k, dtype=vals.dtype)
        rhs = jnp.where(keep, vals, 0.0)
        mrow = jnp.linalg.solve(N, rhs[..., None])[..., 0]
        mrow = jnp.where(keep, mrow, 0.0)
        return mrow[:, :kd], mrow[:, kd:], keep[:, :kd], keep[:, kd:]

    spec = P(ROW_AXIS)
    return _shard_map(
        body,
        mesh=A.mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec),
    )(A.diag_vals, A.diag_cols, A.offd_vals, A.offd_cols, A.send_idx)


@dataclasses.dataclass
class ParSails:
    """Distributed sparse approximate inverse (the working core behind
    ParaSails for ParEllMatrix inputs)."""

    thresh: float = 0.0
    reg: float = 1e-10

    M: Optional[ParEllMatrix] = dataclasses.field(default=None, repr=False)

    def setup(self, A: ParEllMatrix) -> "ParSails":
        md, mo, kd, ko = _par_sails_rows(A, self.thresh, self.reg)
        self.M = dataclasses.replace(
            A,
            diag_vals=jnp.where(kd, md, 0.0),
            diag_cols=jnp.where(kd, A.diag_cols, -1),
            offd_vals=jnp.where(ko, mo, 0.0),
            offd_cols=jnp.where(ko, A.offd_cols, -1),
        )
        return self

    def precond(self):
        M = self.M
        return lambda r: par_spmv(M, r)
