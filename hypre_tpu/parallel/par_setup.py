"""Distributed AMG hierarchy setup — strength/PMIS/ext+i/RAP on sharded
operators, without ever materializing the global matrix.

This is the round-2 replacement for parallel/par_amg.py's
partition-after-the-fact veneer: the whole BoomerAMG setup pipeline
(``parcsr_ls/par_amg_setup.c:28``) runs on a ParEllMatrix that is already
row-sharded across the mesh, mirroring hypre's distributed structure:

- **Extended local matrix** (the ``hypre_ParCSRMatrixExtractBExt`` idea,
  ``par_csr_matop.c``): each shard's diag and offd blocks concatenate into
  one local ELL whose column space is [0, n_local) ∪ halo positions. Data
  living on neighbor shards (strength rows, CF marks, packed ext+i
  payloads, P rows) is fetched by ONE forward halo exchange per quantity
  over the matrix's ppermute schedule, after which every local slab kernel
  from amg/device_setup.py runs unchanged.
- **Boundary-correct PMIS** (``par_coarsen.c:2813`` + ``par_indepset.c``):
  each round exchanges the measure, the scatter-direction maxima (reverse
  exchange, max-combined at the source — hypre's reverse comm of
  measure updates), and the fresh CF marks, so the splitting is exactly
  the single-device PMIS on the global operator (same hash tie-breaks on
  global row ids — pinned by a test).
- **Distributed RAP** (``par_csr_triplemat.c:196`` + the boundary-row
  communication of ``par_rap_communication.c``): AP is local (with P halo
  rows); A_c partial rows for coarse points owned by neighbors are built
  in the extended coarse space and shipped home by a reverse exchange of
  row slabs, then merged with the owner's partials.

Division of labor: all numeric phases are jitted shard_map programs; the
per-level CommPkg construction (diag/offd split + halo schedules of P and
A_c) is host-side numpy over per-shard blocks — the same setup-phase
irregular work hypre does in ``new_commpkg.c``, never touching a global
assembled operator.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hypre_tpu.amg.device_setup import (
    ext_plus_i_device, extpi_pack_sources, merge_slab, spgemm_slab,
    strength_and_cap, transpose_slab,
)
from hypre_tpu.amg.hierarchy import AMGHierarchy, Level
from hypre_tpu.core.config import PAD_COL, hash_rand01
from hypre_tpu.core.partition import RowPartition
from hypre_tpu.parallel.halo import build_halo_schedule
from hypre_tpu.parallel.mesh import ROW_AXIS, row_sharding
from hypre_tpu.parallel.par_ell import (
    ParEllMatrix, _exchange, _exchange_rev, distribute_vector,
)
from hypre_tpu.seq.ell import EllMatrix

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

C_PT = 1
F_PT = -1


def _ext_matrix(dvals, dcols, ovals, ocols, n_col_local):
    """The extended local ELL: diag ⊕ offd with halo-offset columns."""
    cols = jnp.concatenate(
        [dcols, jnp.where(ocols >= 0, ocols + n_col_local, PAD_COL)], axis=1
    )
    vals = jnp.concatenate([dvals, ovals], axis=1)
    return vals, cols


def _fetch(payload, send_idx0, offsets, sizes, nshards):
    """Forward halo fetch of per-row payloads (vectors or 2-D slabs).
    Padding slots (send_idx == -1) ship row 0's data; receivers never
    reference those halo positions. An EMPTY schedule (single-shard mesh:
    sizes == ()) still carries a width-1 padded send_idx; return an all-pad
    halo of that width so concatenated ext buffers keep their static
    shapes."""
    if not sizes:
        return jnp.zeros(
            (send_idx0.shape[0],) + payload.shape[1:], payload.dtype
        )
    return _exchange(
        payload[jnp.maximum(send_idx0, 0)], offsets, sizes, nshards
    )


def _return_add(local, tail, send_idx0, offsets, sizes, nshards, combine):
    """Reverse exchange of the halo tail, combined into local rows at the
    pack positions (hypre's reverse-comm accumulate). Padding slots
    scatter out of bounds and are dropped. An empty schedule (single-shard
    mesh) has nothing to return-accumulate."""
    if not sizes:
        return local
    back = _exchange_rev(tail, offsets, sizes, nshards)
    dst = jnp.where(send_idx0 >= 0, send_idx0, local.shape[0])
    if combine == "add":
        return local.at[dst].add(back)
    return local.at[dst].max(back)


def hmis_interior_seeds(A: ParEllMatrix, theta: float) -> jax.Array:
    """Per-shard Ruge-Stuben first pass on the processor-INTERIOR graph
    (the diag block only — off-shard couplings ignored), returning the C
    seeds for the boundary PMIS pass. This is exactly hypre's HMIS
    structure (De Sterck/Yang/Heys; ``par_coarsen.c:2846``): serial
    one-pass RS per rank, then PMIS over the remaining/boundary points
    with those C points fixed. Host-side like hypre's (HMIS has no device
    path in the reference either — ``par_coarsen_device.c`` is PMIS-only).
    """
    from hypre_tpu import native

    dv = np.asarray(A.diag_vals)
    dc = np.asarray(A.diag_cols)
    nshards = A.num_shards
    n_l = dv.shape[0] // nshards
    seeds = np.zeros(dv.shape[0], np.int32)
    for p in range(nshards):
        blk_v = dv[p * n_l : (p + 1) * n_l]
        blk_c = dc[p * n_l : (p + 1) * n_l]
        valid = blk_c >= 0
        counts = valid.sum(axis=1).astype(np.int32)
        Ap = np.zeros(n_l + 1, np.int32)
        np.cumsum(counts, out=Ap[1:])
        Aj = blk_c[valid].astype(np.int32)
        Ax = blk_v[valid].astype(np.float64)
        S = native.strength(n_l, Ap, Aj, Ax, float(theta))
        cf = native.rs(n_l, Ap, Aj, S)
        seeds[p * n_l : (p + 1) * n_l] = (np.asarray(cf) == 1).astype(
            np.int32
        )
    return jax.device_put(
        jnp.asarray(seeds), NamedSharding(A.mesh, P(ROW_AXIS))
    )


def par_split_phase(A: ParEllMatrix, theta: float, s_cap: int,
                    seed_c=None):
    """strength + boundary-correct PMIS + global coarse numbering.

    ``seed_c`` (sharded int32, 1 = C) fixes initial C points before the
    PMIS rounds — the HMIS composition (interior RS seeds from
    ``hmis_interior_seeds`` + boundary PMIS).

    Returns sharded (scols_ext, svals, cf, cmap_global) and the replicated
    coarse count. cmap_global[i] = global coarse index of local row i if C
    else -1.
    """
    nshards = A.num_shards
    offsets, sizes = A.offsets, A.sizes
    n_cl = A.n_col_local
    M = int(A.send_idx.shape[1])
    kcap = min(s_cap, A.diag_vals.shape[1] + A.offd_vals.shape[1])
    seeded = seed_c is not None
    if not seeded:
        seed_c = jnp.zeros(A.diag_vals.shape[0], jnp.int32)

    def body(dvals, dcols, ovals, ocols, send_idx, seed):
        send0 = send_idx[0]
        vals, cols = _ext_matrix(dvals, dcols, ovals, ocols, n_cl)
        n_l = vals.shape[0]
        n_ext = n_cl + M
        Aloc = EllMatrix(vals=vals, cols=cols, n_cols=n_ext)
        # global column ids for deterministic cap tie-breaks (matches the
        # single-device path's ordering exactly)
        shard0 = lax.axis_index(ROW_AXIS)
        gmap = jnp.concatenate([
            jnp.arange(n_cl, dtype=jnp.int32) + shard0 * n_cl,
            _fetch(
                jnp.arange(n_cl, dtype=jnp.int32) + shard0 * n_cl,
                send0, offsets, sizes, nshards,
            ),
        ])
        tie_cols = jnp.where(cols >= 0, gmap[jnp.maximum(cols, 0)], PAD_COL)
        _, scols, svals, _ = strength_and_cap(
            Aloc, theta, kcap, tie_cols=tie_cols
        )
        S = scols >= 0
        scols_c = jnp.maximum(scols, 0)

        # S^T counts with boundary accumulation
        cnt_ext = (
            jnp.zeros(n_ext + 1, jnp.int32)
            .at[jnp.where(S, scols, n_ext).reshape(-1)]
            .add(1)
        )[:-1]
        st = _return_add(
            cnt_ext[:n_cl], cnt_ext[n_cl:], send0, offsets, sizes, nshards,
            "add",
        )

        shard = lax.axis_index(ROW_AXIS)
        rows_global = jnp.arange(n_l, dtype=jnp.int32) + shard * n_l
        measure0 = st.astype(jnp.float32) + hash_rand01(rows_global).astype(
            jnp.float32
        )
        has_strong_row = jnp.any(S, axis=1)
        isolated = ~has_strong_row & (st == 0)
        cf0 = jnp.where(isolated, F_PT, 0).astype(jnp.int32)
        if seeded:
            # HMIS: interior-RS C points enter fixed, and their strong
            # dependents are marked F BEFORE the first independent-set
            # round (hypre marks dependents of initial C points first)
            cf0 = jnp.where(seed == 1, C_PT, cf0)
            cf0_ext = jnp.concatenate(
                [cf0, _fetch(cf0, send0, offsets, sizes, nshards)]
            )
            dep0 = jnp.any(S & (cf0_ext[scols_c] == C_PT), axis=1)
            cf0 = jnp.where((cf0 == 0) & dep0, F_PT, cf0)

        def cond(state):
            _, _, go = state
            return go

        def round_(state):
            cf, measure, _ = state
            undecided = cf == 0
            m = jnp.where(undecided, measure, 0.0)
            m_ext = jnp.concatenate(
                [m, _fetch(m, send0, offsets, sizes, nshards)]
            )
            row_nbr_max = jnp.max(jnp.where(S, m_ext[scols_c], 0.0), axis=1)
            colmax_ext = (
                jnp.zeros(n_ext + 1, m.dtype)
                .at[jnp.where(S, scols, n_ext).reshape(-1)]
                .max(jnp.broadcast_to(m[:, None], S.shape).reshape(-1))
            )[:-1]
            col_nbr_max = _return_add(
                colmax_ext[:n_cl], colmax_ext[n_cl:], send0, offsets, sizes,
                nshards, "max",
            )
            nbr_max = jnp.maximum(row_nbr_max, col_nbr_max)
            new_c = undecided & (m > nbr_max) & (m > 0)
            cf = jnp.where(new_c, C_PT, cf)
            cf_ext = jnp.concatenate(
                [cf, _fetch(cf, send0, offsets, sizes, nshards)]
            )
            dep_on_c = jnp.any(S & (cf_ext[scols_c] == C_PT), axis=1)
            cf = jnp.where((cf == 0) & dep_on_c, F_PT, cf)
            cf = jnp.where((cf == 0) & isolated, F_PT, cf)
            stalled_local = jnp.all(cf == state[0])
            stalled = lax.pmin(
                stalled_local.astype(jnp.int32), ROW_AXIS
            ).astype(bool)
            cf = jnp.where(stalled & (cf == 0), C_PT, cf)
            go = lax.pmax(
                jnp.any(cf == 0).astype(jnp.int32), ROW_AXIS
            ).astype(bool)
            return (cf, measure, go)

        go0 = lax.pmax(jnp.any(cf0 == 0).astype(jnp.int32), ROW_AXIS).astype(
            bool
        )
        cf, _, _ = lax.while_loop(cond, round_, (cf0, measure0, go0))

        # global coarse numbering: exclusive scan of per-shard counts
        is_c = cf == C_PT
        local_count = jnp.sum(is_c.astype(jnp.int32))
        counts = lax.all_gather(local_count, ROW_AXIS)  # (P,)
        my_offset = jnp.sum(
            jnp.where(jnp.arange(nshards) < shard, counts, 0)
        )
        cmap = jnp.where(
            is_c, my_offset + jnp.cumsum(is_c.astype(jnp.int32)) - 1, -1
        ).astype(jnp.int32)
        n_c = lax.psum(local_count, ROW_AXIS)  # psum => provably replicated
        return scols, svals, cf, cmap, n_c

    spec = P(ROW_AXIS)
    out = _shard_map(
        body,
        mesh=A.mesh,
        in_specs=(spec, spec, spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec, P()),
    )(A.diag_vals, A.diag_cols, A.offd_vals, A.offd_cols, A.send_idx,
      seed_c)
    return out


def par_interp_phase(
    A: ParEllMatrix, scols, svals, cf, cmap, out_k: int,
    p_max_elmts: int, trunc_factor: float,
):
    """ext+i on the extended local matrix; P columns come out in GLOBAL
    coarse numbering (no later remap)."""
    nshards = A.num_shards
    offsets, sizes = A.offsets, A.sizes
    n_cl = A.n_col_local

    def body(dvals, dcols, ovals, ocols, send_idx, scols_b, svals_b, cf_b,
             cmap_b):
        send0 = send_idx[0]
        vals, cols = _ext_matrix(dvals, dcols, ovals, ocols, n_cl)
        n_ext = n_cl + int(send_idx.shape[1])
        Aloc = EllMatrix(vals=vals, cols=cols, n_cols=n_ext)
        diag = Aloc.diagonal()
        sgn = jnp.where(diag >= 0, 1.0, -1.0).astype(vals.dtype)

        is_c = cf_b == C_PT
        is_c_ext = jnp.concatenate(
            [is_c, _fetch(is_c, send0, offsets, sizes, nshards)]
        )
        cmap_ext = jnp.concatenate(
            [cmap_b, _fetch(cmap_b, send0, offsets, sizes, nshards)]
        )
        pf_loc, pi_loc = extpi_pack_sources(
            scols_b, svals_b, sgn, is_c_ext, cmap_ext
        )
        pf_ext = jnp.concatenate(
            [pf_loc, _fetch(pf_loc, send0, offsets, sizes, nshards)]
        )
        pi_ext = jnp.concatenate(
            [pi_loc, _fetch(pi_loc, send0, offsets, sizes, nshards)]
        )
        sgn_ext = jnp.concatenate(
            [sgn, _fetch(sgn, send0, offsets, sizes, nshards)]
        )
        # candidate-1 columns in global coarse numbering
        cand1 = jnp.where(
            scols_b >= 0, cmap_ext[jnp.maximum(scols_b, 0)], PAD_COL
        )
        pc, pv, req = ext_plus_i_device(
            Aloc, scols_b, svals_b, cf_b, out_k,
            p_max_elmts=p_max_elmts, trunc_factor=trunc_factor,
            col_sources=(is_c_ext, pf_ext, pi_ext, sgn_ext),
            out_cols=(cand1, cmap_b),
        )
        return pc, pv, lax.pmax(req, ROW_AXIS)

    spec = P(ROW_AXIS)
    return _shard_map(
        body,
        mesh=A.mesh,
        in_specs=(spec,) * 9,
        out_specs=(spec, spec, P()),
    )(
        A.diag_vals, A.diag_cols, A.offd_vals, A.offd_cols, A.send_idx,
        scols, svals, cf, cmap,
    )


def par_rap_phase(A: ParEllMatrix, Ppar: ParEllMatrix, out_ap: int,
                  out_t: int, out_ac: int):
    """A_c = P^T A P, distributed: AP with P halo rows, partial coarse rows
    in the extended coarse space, boundary partials shipped to their owners
    (par_rap_communication.c) and merged. Output: local A_c rows (coarse
    partition) with GLOBAL coarse columns, plus the required widths."""
    nshards = A.num_shards
    a_off, a_sz = A.offsets, A.sizes
    p_off, p_sz = Ppar.offsets, Ppar.sizes
    n_cl = A.n_col_local
    nc_l = Ppar.n_col_local
    MP = int(Ppar.send_idx.shape[1])

    def body(advals, adcols, aovals, aocols, asend, pdvals, pdcols, povals,
             pocols, psend):
        asend0 = asend[0]
        psend0 = psend[0]
        a_vals, a_cols = _ext_matrix(advals, adcols, aovals, aocols, n_cl)
        # P in GLOBAL coarse columns (diag back to global + offd via the
        # recv map is not available here, so P blocks carry global columns
        # directly — see par_from_global_cols)
        p_vals, p_cols = _ext_matrix(pdvals, pdcols, povals, pocols, nc_l)
        shard = lax.axis_index(ROW_AXIS)
        c_lo = shard * nc_l

        # globalize P's columns: diag part is local coarse + c_lo; offd part
        # holds halo positions whose global ids we fetch from the owners
        halo_gcol = _fetch(
            jnp.arange(nc_l, dtype=jnp.int32) + c_lo,
            psend0, p_off, p_sz, nshards,
        )
        kpd = pdcols.shape[1]
        p_gcols = jnp.concatenate(
            [
                jnp.where(pdcols >= 0, pdcols + c_lo, PAD_COL),
                jnp.where(
                    pocols >= 0,
                    halo_gcol[jnp.maximum(pocols, 0)],
                    PAD_COL,
                ),
            ],
            axis=1,
        )
        kp = p_gcols.shape[1]

        # P rows for A's halo columns: exchange packed (gcols, vals)
        p_halo_g = _fetch(p_gcols, asend0, a_off, a_sz, nshards)
        p_halo_v = _fetch(
            jnp.concatenate([pdvals, povals], axis=1), asend0, a_off, a_sz,
            nshards,
        )
        pg_ext = jnp.concatenate([p_gcols, p_halo_g], axis=0)
        pv_ext = jnp.concatenate(
            [jnp.concatenate([pdvals, povals], axis=1), p_halo_v], axis=0
        )

        apc, apv, req_ap = spgemm_slab(
            a_cols, a_vals, pg_ext, pv_ext, out_ap
        )

        # transpose local P into the EXTENDED coarse space: row index =
        # local coarse [0, nc_l) or halo position + nc_l
        pl_cols = jnp.concatenate(
            [pdcols, jnp.where(pocols >= 0, pocols + nc_l, PAD_COL)], axis=1
        )
        pl_vals = jnp.concatenate([pdvals, povals], axis=1)
        tc, tv, req_t = transpose_slab(pl_cols, pl_vals, nc_l + MP, out_t)

        # partial A_c rows over the extended coarse space (cols global)
        acc, acv, req_ac = spgemm_slab(tc, tv, apc, apv, out_ac)

        # ship the halo-tail partial rows home and merge (reverse exchange
        # of (m_r, k) slabs per offset, accumulated at the pack positions)
        tail_c = acc[nc_l:]
        tail_v = acv[nc_l:]
        back_c = _exchange_rev(tail_c, p_off, p_sz, nshards)
        back_v = _exchange_rev(tail_v, p_off, p_sz, nshards)
        # scatter received candidate rows next to the local partials. Each
        # offset gets its own block: within one offset the pack positions
        # are unique, but different offsets may target the same local
        # coarse row (a boundary point shared with several neighbors)
        kac = acc.shape[1]
        extras_c, extras_v = [], []
        start = 0
        for m_r in p_sz:
            sl = slice(start, start + m_r)
            # padding pack slots (-1) scatter out of bounds -> dropped
            dst = jnp.where(psend0[sl] >= 0, psend0[sl], nc_l)
            extras_c.append(
                jnp.full((nc_l, kac), PAD_COL, jnp.int32).at[dst].set(
                    back_c[sl]
                )
            )
            extras_v.append(
                jnp.zeros((nc_l, kac), acv.dtype).at[dst].set(back_v[sl])
            )
            start += m_r
        mc, mv, req_m = merge_slab(
            jnp.concatenate([acc[:nc_l]] + extras_c, axis=1),
            jnp.concatenate([acv[:nc_l]] + extras_v, axis=1),
            out_ac,
        )
        req = jnp.maximum(jnp.maximum(req_ap, req_t), jnp.maximum(req_ac, req_m))
        return mc, mv, lax.pmax(req_ap, ROW_AXIS), lax.pmax(
            req_t, ROW_AXIS
        ), lax.pmax(jnp.maximum(req_ac, req_m), ROW_AXIS)

    spec = P(ROW_AXIS)
    return _shard_map(
        body,
        mesh=A.mesh,
        in_specs=(spec,) * 10,
        out_specs=(spec, spec, P(), P(), P()),
    )(
        A.diag_vals, A.diag_cols, A.offd_vals, A.offd_cols, A.send_idx,
        Ppar.diag_vals, Ppar.diag_cols, Ppar.offd_vals, Ppar.offd_cols,
        Ppar.send_idx,
    )


# ---------------------------------------------------------------------------
# Host-side per-level CommPkg construction (new_commpkg.c analogue)
# ---------------------------------------------------------------------------


def par_from_global_cols(
    cols_sharded: jax.Array,
    vals_sharded: jax.Array,
    n_rows: int,
    n_cols: int,
    mesh: Mesh,
) -> ParEllMatrix:
    """Build a ParEllMatrix from row-sharded blocks whose columns are GLOBAL
    indices. Per-shard numpy (diag/offd split + halo schedule) — the
    CommPkg build; no global matrix is ever assembled."""
    nshards = mesh.devices.size
    col_part = RowPartition(n_cols, nshards)
    cols_np = np.asarray(cols_sharded)
    vals_np = np.asarray(vals_sharded)
    n_pad, k = cols_np.shape
    nl = n_pad // nshards

    diag_cols = np.full_like(cols_np, -1)
    diag_vals = np.zeros_like(vals_np)
    offd_cols_g = np.full_like(cols_np, -1)
    offd_vals = np.zeros_like(vals_np)
    offd_sets = []
    for p in range(nshards):
        sl = slice(p * nl, (p + 1) * nl)
        c = cols_np[sl]
        v = vals_np[sl]
        valid = c >= 0
        owner = np.where(valid, col_part.owner_of(np.maximum(c, 0)), -9)
        is_d = valid & (owner == p)
        is_o = valid & ~is_d
        # left-compact each split (stable)
        for mask, out_c, out_v, to_local in (
            (is_d, diag_cols, diag_vals, True),
            (is_o, offd_cols_g, offd_vals, False),
        ):
            order = np.argsort(~mask, axis=1, kind="stable")
            cc = np.take_along_axis(np.where(mask, c, -1), order, axis=1)
            vv = np.take_along_axis(np.where(mask, v, 0), order, axis=1)
            if to_local:
                cc = np.where(cc >= 0, col_part.local_index(np.maximum(cc, 0)), -1)
            out_c[sl] = cc
            out_v[sl] = vv
        blk = offd_cols_g[sl]
        offd_sets.append(np.unique(blk[blk >= 0]))
    kd = max(int((diag_cols >= 0).sum(axis=1).max(initial=0)), 1)
    ko = max(int((offd_cols_g >= 0).sum(axis=1).max(initial=0)), 1)
    diag_cols, diag_vals = diag_cols[:, :kd], diag_vals[:, :kd]
    offd_cols_g, offd_vals = offd_cols_g[:, :ko], offd_vals[:, :ko]

    sched = build_halo_schedule(offd_sets, col_part)
    offd_cols = np.full_like(offd_cols_g, -1, dtype=np.int32)
    for p in range(nshards):
        pos = sched.recv_pos[p]
        sl = slice(p * nl, (p + 1) * nl)
        blk = offd_cols_g[sl]
        if pos:
            keys = np.array(sorted(pos), dtype=np.int64)
            vmap_ = np.array([pos[int(c)] for c in keys], dtype=np.int32)
            idx = np.searchsorted(keys, np.maximum(blk, 0))
            offd_cols[sl] = np.where(
                blk >= 0, vmap_[np.clip(idx, 0, len(keys) - 1)], -1
            )

    shard = row_sharding(mesh)
    return ParEllMatrix(
        diag_vals=jax.device_put(jnp.asarray(diag_vals), shard),
        diag_cols=jax.device_put(jnp.asarray(diag_cols.astype(np.int32)), shard),
        offd_vals=jax.device_put(jnp.asarray(offd_vals), shard),
        offd_cols=jax.device_put(jnp.asarray(offd_cols), shard),
        send_idx=jax.device_put(jnp.asarray(sched.send_idx), shard),
        n_rows=n_rows,
        n_cols=n_cols,
        offsets=sched.offsets,
        sizes=sched.sizes,
        mesh=mesh,
    )


# ---------------------------------------------------------------------------
# The distributed setup driver
# ---------------------------------------------------------------------------


def setup_hierarchy_par(
    A: ParEllMatrix,
    strength_threshold: float = 0.25,
    max_levels: int = 25,
    max_coarse_size: int = 64,
    p_max_elmts: int = 4,
    trunc_factor: float = 0.0,
    coarsen_rtol: float = 0.9,
    s_cap: int = 12,
    coarsen: str = "pmis",
) -> AMGHierarchy:
    """Distributed hypre_BoomerAMGSetup on an already-sharded operator.

    coarsen: 'pmis' (boundary-correct distributed PMIS — the same scope
    as hypre's device coarsening, ``par_coarsen_device.c``) or 'hmis'
    (per-shard interior Ruge-Stuben first pass + boundary PMIS over the
    seeds, ``par_coarsen.c:2846``).

    Every level's operators (A, P, Pt) come out as ParEllMatrix over the
    same mesh, so the existing amg_cycle/smoother machinery runs the solve
    fully distributed. ℓ1-Jacobi smoothing (row-local norms); Chebyshev's
    power method is left to the caller (needs distributed matvecs anyway).
    """
    mesh = A.mesh
    levels: List[Level] = []
    A_cur = A

    while len(levels) < max_levels - 1 and A_cur.n_rows > max_coarse_size:
        seeds = (
            hmis_interior_seeds(A_cur, strength_threshold)
            if coarsen == "hmis"
            else None
        )
        scols, svals, cf, cmap, n_c = jax.jit(
            par_split_phase, static_argnames=("s_cap",)
        )(A_cur, jnp.asarray(strength_threshold, A_cur.dtype), s_cap=s_cap,
          seed_c=seeds)
        n_coarse = int(n_c)
        if n_coarse == 0 or n_coarse >= coarsen_rtol * A_cur.n_rows:
            break
        ks = scols.shape[1]
        out_k = min(max(2 * ks, 8), 64)
        pc, pv, _ = jax.jit(
            par_interp_phase,
            static_argnames=("out_k", "p_max_elmts", "trunc_factor"),
        )(
            A_cur, scols, svals, cf, cmap, out_k=out_k,
            p_max_elmts=p_max_elmts, trunc_factor=float(trunc_factor),
        )
        Ppar = par_from_global_cols(
            pc, pv, n_rows=A_cur.n_rows, n_cols=n_coarse, mesh=mesh
        )

        kA = A_cur.diag_vals.shape[1] + A_cur.offd_vals.shape[1]
        out_ap = min(kA * Ppar.diag_vals.shape[1] * 2 + 8, 96)
        nnz_p_per_c = (p_max_elmts + 1) * A_cur.n_rows / max(n_coarse, 1)
        out_t = max(int(2.5 * nnz_p_per_c), 8)
        out_ac = max(3 * kA, 32)
        for _attempt in range(3):
            acc, acv, req_ap, req_t, req_ac = jax.jit(
                par_rap_phase, static_argnames=("out_ap", "out_t", "out_ac")
            )(A_cur, Ppar, out_ap=out_ap, out_t=out_t, out_ac=out_ac)
            ra, rt, rc = int(req_ap), int(req_t), int(req_ac)
            if ra <= out_ap and rt <= out_t and rc <= out_ac:
                break
            out_ap, out_t, out_ac = max(out_ap, ra), max(out_t, rt), max(
                out_ac, rc
            )
        A_next = par_from_global_cols(
            acc, acv, n_rows=n_coarse, n_cols=n_coarse, mesh=mesh
        )

        # Pt as its own distributed operator (restriction matvec)
        tp_c, tp_v = _transpose_sharded(Ppar, n_coarse)
        Ptpar = par_from_global_cols(
            tp_c, tp_v, n_rows=n_coarse, n_cols=A_cur.n_rows, mesh=mesh
        )

        dinv, l1inv = jax.jit(_par_level_vectors)(A_cur)
        levels.append(
            Level(
                A=A_cur, P=Ppar, Pt=Ptpar, dinv=dinv, l1inv=l1inv,
                lmax=jnp.asarray(0.0, A_cur.dtype),
            )
        )
        A_cur = A_next

    # coarsest: gather the (small) operator and invert, replicated — the
    # same gather-to-subcommunicator hypre's par_gauss_elim.c:84-118 does
    dense = _gather_dense(A_cur)
    inv = np.linalg.pinv(dense, rcond=1e-10)
    nshards = mesh.devices.size
    c_part = RowPartition(A_cur.n_rows, nshards)
    ci_pad = np.zeros((c_part.n_padded, c_part.n_padded), dense.dtype)
    ci_pad[: inv.shape[0], : inv.shape[1]] = inv
    coarse_inv = jax.device_put(
        jnp.asarray(ci_pad), NamedSharding(mesh, P(ROW_AXIS, None))
    )
    return AMGHierarchy(levels=levels, coarse_inv=coarse_inv, galerkin=True)


def _par_level_vectors(A: ParEllMatrix):
    def body(dvals, dcols, ovals, ocols):
        n_l = dvals.shape[0]
        rows = jnp.arange(n_l, dtype=jnp.int32)[:, None]
        diag = jnp.sum(jnp.where(dcols == rows, dvals, 0), axis=1)
        l1 = jnp.sum(jnp.abs(dvals), axis=1) + jnp.sum(jnp.abs(ovals), axis=1)
        dinv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0)
        l1inv = 1.0 / jnp.where(l1 > 0, l1, 1.0)
        return dinv, l1inv

    spec = P(ROW_AXIS)
    return _shard_map(
        body, mesh=A.mesh, in_specs=(spec,) * 4, out_specs=(spec, spec)
    )(A.diag_vals, A.diag_cols, A.offd_vals, A.offd_cols)


def _transpose_sharded(Ppar: ParEllMatrix, n_coarse: int):
    """Transpose a row-sharded P (fine rows -> coarse rows) on host, shard
    by the coarse partition, keeping global columns. Host numpy over shard
    blocks (CommPkg-class setup work)."""
    nshards = Ppar.num_shards
    nl = Ppar.vec_len_rows // nshards
    nc_part = RowPartition(n_coarse, nshards)
    dcols = np.asarray(Ppar.diag_cols)
    dvals = np.asarray(Ppar.diag_vals)
    ocols = np.asarray(Ppar.offd_cols)
    ovals = np.asarray(Ppar.offd_vals)

    # reconstruct global columns per shard block: diag cols are local
    # coarse indices (+ the shard's coarse offset); offd global ids are
    # fetched on device below
    entries = []  # (coarse_row_global, fine_col_global, val)
    for p in range(nshards):
        sl = slice(p * nl, (p + 1) * nl)
        gl_rows = np.arange(p * nl, (p + 1) * nl)
        c = dcols[sl]
        m = c >= 0
        r, s_ = np.nonzero(m)
        entries.append(
            (
                c[m] + p * nc_part.n_local,
                gl_rows[r],
                dvals[sl][m],
            )
        )
    # device-side: fetch halo global ids once
    c_lo = np.arange(nshards) * nc_part.n_local

    def body(pocols, psend):
        gids = (jnp.arange(nc_part.n_local, dtype=jnp.int32)
                + lax.axis_index(ROW_AXIS) * nc_part.n_local)
        halo_g = _fetch(gids, psend[0], Ppar.offsets, Ppar.sizes, nshards)
        return jnp.where(
            pocols >= 0, halo_g[jnp.maximum(pocols, 0)], PAD_COL
        )

    spec = P(ROW_AXIS)
    offd_g = np.asarray(
        _shard_map(
            body, mesh=Ppar.mesh, in_specs=(spec, spec), out_specs=spec
        )(Ppar.offd_cols, Ppar.send_idx)
    )
    for p in range(nshards):
        sl = slice(p * nl, (p + 1) * nl)
        gl_rows = np.arange(p * nl, (p + 1) * nl)
        c = offd_g[sl]
        m = c >= 0
        r, s_ = np.nonzero(m)
        entries.append((c[m], gl_rows[r], ovals[sl][m]))

    rows_t = np.concatenate([e[0] for e in entries])
    cols_t = np.concatenate([e[1] for e in entries])
    vals_t = np.concatenate([e[2] for e in entries])
    # bucket into the coarse partition's padded row space
    n_pad = nc_part.n_padded
    order = np.lexsort((cols_t, rows_t))
    rows_t, cols_t, vals_t = rows_t[order], cols_t[order], vals_t[order]
    counts = np.bincount(rows_t, minlength=n_pad)
    kT = max(int(counts.max(initial=0)), 1)
    tp_c = np.full((n_pad, kT), -1, np.int32)
    tp_v = np.zeros((n_pad, kT), vals_t.dtype)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(len(rows_t)) - starts[rows_t]
    tp_c[rows_t, within] = cols_t
    tp_v[rows_t, within] = vals_t
    return jnp.asarray(tp_c), jnp.asarray(tp_v)


def _gather_dense(A: ParEllMatrix) -> np.ndarray:
    """Materialize the (small) coarsest operator densely on host."""
    nshards = A.num_shards
    nl = A.vec_len_rows // nshards
    ncl = A.n_col_local
    dcols = np.asarray(A.diag_cols)
    dvals = np.asarray(A.diag_vals)

    def body(pocols, psend):
        gids = (jnp.arange(ncl, dtype=jnp.int32)
                + lax.axis_index(ROW_AXIS) * ncl)
        halo_g = _fetch(gids, psend[0], A.offsets, A.sizes, A.num_shards)
        return jnp.where(pocols >= 0, halo_g[jnp.maximum(pocols, 0)], PAD_COL)

    spec = P(ROW_AXIS)
    offd_g = np.asarray(
        _shard_map(
            body, mesh=A.mesh, in_specs=(spec, spec), out_specs=spec
        )(A.offd_cols, A.send_idx)
    )
    ovals = np.asarray(A.offd_vals)
    n = A.n_rows
    dense = np.zeros((n, A.n_cols))
    for p in range(nshards):
        for i in range(nl):
            g = p * nl + i
            if g >= n:
                break
            for c, v in zip(dcols[p * nl + i], dvals[p * nl + i]):
                if c >= 0:
                    dense[g, c + p * ncl] += v
            for c, v in zip(offd_g[p * nl + i], ovals[p * nl + i]):
                if c >= 0:
                    dense[g, c] += v
    return dense
