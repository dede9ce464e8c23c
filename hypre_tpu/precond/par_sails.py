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

Pattern powers (``nlevels``): the level-1 pattern is the sparsity of
``thresholded(A)^2`` (ParaSails.c's pattern-of-powers). Distributed, that
needs A-rows at graph distance 2 — a SECOND halo layer. The expansion
builds the symbolic square with one exchange of pattern slabs over A's
schedule, then constructs the pattern matrix M through the CommPkg
builder (``par_from_global_cols``), whose NEW halo schedule reaches the
distance-2 owners; a final exchange ships A's rows along M's schedule for
the local normal equations. Three static neighbor exchanges total, no
rendezvous at solve time.
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


def _power_pattern_cols(A: ParEllMatrix, thresh: float, cap: int):
    """Global-column slabs of the level-1 pattern: pattern(thresh(A))^2.
    One forward exchange of the (pruned) pattern slabs, then a per-row
    slab merge of the neighbors' patterns (PrunedRows.c's expansion).
    Returns (cols2_global (n_local*, cap) sharded, required_width)."""
    from hypre_tpu.parallel.par_setup import _ext_matrix, _fetch
    from hypre_tpu.seq.slabops import merge_slab

    nshards = A.num_shards
    offsets, sizes = A.offsets, A.sizes
    n_cl = A.n_col_local

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
        pat = jnp.where(keep, gcols, -1)  # pruned pattern, global ids
        # ship every local row's pruned pattern to the shards that touch it
        pat_ext = jnp.concatenate(
            [pat, _fetch(pat, send0, offsets, sizes, nshards)]
        )
        nb = pat_ext[rsafe]  # (n, k, k) neighbor patterns (global ids)
        nb = jnp.where(keep[:, :, None], nb, -1)
        n, k = cols.shape
        cand = jnp.concatenate([pat, nb.reshape(n, k * k)], axis=1)
        c2, _, req = merge_slab(
            cand, jnp.zeros(cand.shape, vals.dtype), cap
        )
        return c2, req[None]

    spec = P(ROW_AXIS)
    c2, req = _shard_map(
        body,
        mesh=A.mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=(spec, spec),
    )(A.diag_vals, A.diag_cols, A.offd_vals, A.offd_cols, A.send_idx)
    return c2, int(jnp.max(req))


def _par_sails_power_rows(A: ParEllMatrix, Mp: ParEllMatrix, reg: float):
    """Least-squares rows over an EXPANDED pattern matrix Mp (its halo
    schedule reaches distance-2 owners): ship A's rows (values + global
    col ids) along Mp's schedule, then assemble and solve every local
    row's normal equations

        (A A^T)[J_i, J_i] m_i^T = A[i, J_i]^T,  J_i = pattern(Mp row i).
    """
    from hypre_tpu.parallel.par_setup import _ext_matrix, _fetch

    nshards = A.num_shards
    a_off, a_sz = A.offsets, A.sizes
    m_off, m_sz = Mp.offsets, Mp.sizes
    n_cl = A.n_col_local

    def body(advals, adcols, aovals, aocols, asend, mdcols, mocols, msend):
        asend0, msend0 = asend[0], msend[0]
        avals, acols = _ext_matrix(advals, adcols, aovals, aocols, n_cl)
        shard = lax.axis_index(ROW_AXIS)
        gids_local = jnp.arange(n_cl, dtype=jnp.int32) + shard * n_cl
        a_gmap = jnp.concatenate([
            gids_local, _fetch(gids_local, asend0, a_off, a_sz, nshards),
        ])
        a_valid = acols >= 0
        a_gcols = jnp.where(a_valid, a_gmap[jnp.maximum(acols, 0)], _BIG)
        a_gcols_pat = jnp.where(a_valid, a_gcols, -1)

        # A's rows shipped along Mp's (distance-2) schedule
        ev = jnp.concatenate(
            [avals, _fetch(avals, msend0, m_off, m_sz, nshards)]
        )
        eg = jnp.concatenate(
            [a_gcols_pat, _fetch(a_gcols_pat, msend0, m_off, m_sz, nshards)]
        )

        # Mp's extended-local pattern indices -> rows of ev/eg
        mcols = jnp.concatenate(
            [mdcols, jnp.where(mocols >= 0, mocols + n_cl, -1)], axis=1
        )
        m_gmap = jnp.concatenate([
            gids_local, _fetch(gids_local, msend0, m_off, m_sz, nshards),
        ])
        m_valid = mcols >= 0
        msafe = jnp.maximum(mcols, 0)
        m_g = jnp.where(m_valid, m_gmap[msafe], _BIG)

        rv = jnp.where(m_valid[:, :, None], ev[msafe], 0.0)  # (n, k2, kA)
        rg = jnp.where(m_valid[:, :, None], eg[msafe], -1)
        # N[i,a,b] = <row j_a, row j_b> matched on global column ids
        match = (rg[:, :, None, :, None] == rg[:, None, :, None, :]) & (
            rg[:, :, None, :, None] >= 0
        )
        N = jnp.einsum("nas,nbt,nabst->nab", rv, rv,
                       match.astype(avals.dtype))
        k2 = mcols.shape[1]
        N = N + reg * jnp.eye(k2, dtype=avals.dtype)
        # rhs[a] = A[i, j_a]: match row i's own entries against the pattern
        own_match = (a_gcols[:, None, :] == m_g[:, :, None]) & a_valid[
            :, None, :
        ]
        rhs = jnp.einsum("nas,ns->na", own_match.astype(avals.dtype),
                         jnp.where(a_valid, avals, 0.0))
        mrow = jnp.linalg.solve(N, rhs[..., None])[..., 0]
        mrow = jnp.where(m_valid, mrow, 0.0)
        kd = mdcols.shape[1]
        return mrow[:, :kd], mrow[:, kd:]

    spec = P(ROW_AXIS)
    return _shard_map(
        body,
        mesh=A.mesh,
        in_specs=(spec,) * 8,
        out_specs=(spec, spec),
    )(A.diag_vals, A.diag_cols, A.offd_vals, A.offd_cols, A.send_idx,
      Mp.diag_cols, Mp.offd_cols, Mp.send_idx)


@dataclasses.dataclass
class ParSails:
    """Distributed sparse approximate inverse (the working core behind
    ParaSails for ParEllMatrix inputs).

    nlevels=0: pattern of thresh(A); nlevels=1: pattern of thresh(A)^2
    via the second halo layer (ParaSails.c / PrunedRows.c).
    filter: post-solve drop of |m_ij| < filter * max_j |m_ij| (hypre's
    ParaSails filter parameter)."""

    thresh: float = 0.0
    reg: float = 1e-10
    nlevels: int = 0
    filter: float = 0.0
    pattern_cap: int = 64

    M: Optional[ParEllMatrix] = dataclasses.field(default=None, repr=False)

    def setup(self, A: ParEllMatrix) -> "ParSails":
        if self.nlevels >= 1:
            from hypre_tpu.parallel.par_setup import par_from_global_cols

            cap = self.pattern_cap
            for _ in range(4):
                c2, req = _power_pattern_cols(A, self.thresh, cap)
                if req <= cap:
                    break
                cap = int(req)
            Mp = par_from_global_cols(
                c2, jnp.zeros(c2.shape, A.dtype), A.n_rows, A.n_cols, A.mesh
            )
            md, mo = _par_sails_power_rows(A, Mp, self.reg)
            self.M = dataclasses.replace(Mp, diag_vals=md, offd_vals=mo)
        else:
            md, mo, kd, ko = _par_sails_rows(A, self.thresh, self.reg)
            self.M = dataclasses.replace(
                A,
                diag_vals=jnp.where(kd, md, 0.0),
                diag_cols=jnp.where(kd, A.diag_cols, -1),
                offd_vals=jnp.where(ko, mo, 0.0),
                offd_cols=jnp.where(ko, A.offd_cols, -1),
            )
        if self.filter > 0.0:
            M = self.M
            mx = jnp.maximum(
                jnp.max(jnp.abs(M.diag_vals), axis=1),
                jnp.max(jnp.abs(M.offd_vals), axis=1)
                if M.offd_vals.shape[1]
                else 0.0,
            )
            rows = jnp.arange(M.diag_vals.shape[0], dtype=jnp.int32)
            shardn = M.diag_vals.shape[0] // M.num_shards
            # diag_cols hold shard-LOCAL indices; the diag entry of global
            # row i sits at local column i mod shard size — always kept
            is_diag = M.diag_cols == (rows % shardn)[:, None]
            keep_d = is_diag | (
                jnp.abs(M.diag_vals) >= self.filter * mx[:, None]
            )
            keep_o = jnp.abs(M.offd_vals) >= self.filter * mx[:, None]
            self.M = dataclasses.replace(
                M,
                diag_vals=jnp.where(keep_d, M.diag_vals, 0.0),
                offd_vals=jnp.where(keep_o, M.offd_vals, 0.0),
            )
        return self

    def precond(self):
        M = self.M
        return lambda r: par_spmv(M, r)
