"""TransferDia — stencil-structured interpolation as fine-space diagonals.

The interpolation built on a stencil level reaches only C points within
graph distance <= 2, so in FINE indexing P is a *generalized stencil*: its
column offsets (fine index of the C point minus the row index) come from
the distance-2 offset set of the grid. That turns both transfer products
into roofline-speed operations:

    prolong  u += P e_c  =  DIA(P_fine) · expand(e_c)
    restrict r_c = P^T r =  compress( DIA(P_fine^T) · r )

where DIA is the Pallas streaming kernel (seq/dia.py, 93-98% of HBM peak),
``expand`` scatters the coarse vector to the C-point positions and
``compress`` reads it back — both are monotone selections with tiny
windows, executed by the existing BandedEll gather kernel on width-1
patterns. The windowed one-hot transfer kernels this replaces cost ~4.5 ms
per direction at 128^3 (the one-hot construction is VPU-bound over the
~5k-wide coarse windows); this path measures the three pieces at ~0.1 +
~0.25 + ~0.2 ms.

hypre's analogue is the device matvec path for P (``par_csr_matvec.c``) —
the reference has no structural specialization here; this one exists
because the TPU cost model punishes gathers so hard that re-expressing the
transfer through the fine index space is worth a 5x storage padding
(diagonal slabs hold zeros where rows have fewer entries).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hypre_tpu.seq.dia import DiaMatrix
from hypre_tpu.seq.fastmv import BandedEll, banded_spmv


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TransferDia:
    """P (n_fine x n_coarse) as fine-space diagonals + selections."""

    P_dia: DiaMatrix  # fine-space forward diagonals
    Pt_dia: DiaMatrix  # fine-space transpose diagonals
    expand: BandedEll  # (n_fine, n_coarse) C-point expansion selection
    compress: BandedEll  # (n_coarse, n_fine) C-point restriction selection
    n_coarse_s: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_rows(self) -> int:
        return self.P_dia.n_rows

    @property
    def n_cols(self) -> int:
        return self.n_coarse_s

    @property
    def shape(self):
        return (self.n_rows, self.n_coarse_s)

    @property
    def dtype(self):
        return self.P_dia.dtype

    @property
    def vec_len_rows(self) -> int:
        return self.n_rows

    @property
    def vec_len_cols(self) -> int:
        return self.n_coarse_s

    def mv(self, ec: jax.Array) -> jax.Array:
        """fine = P @ coarse (prolongation)."""
        ec_fine = banded_spmv(self.expand, ec)
        return self.P_dia.mv(ec_fine)

    def mv_t(self, r: jax.Array) -> jax.Array:
        """coarse = P^T @ fine (restriction)."""
        t = self.Pt_dia.mv(r)
        return banded_spmv(self.compress, t)


import functools as _ft

from hypre_tpu.seq.dia import _margin_for, _shift1d_dyn


@_ft.partial(jax.jit, static_argnames=("max_offsets",))
def _distinct_diffs(pc, c2f, max_offsets):
    n = pc.shape[0]
    valid = pc >= 0
    pf = jnp.where(valid, c2f[jnp.maximum(pc, 0)], 0)
    diff = jnp.where(
        valid, pf - jnp.arange(n, dtype=jnp.int32)[:, None], jnp.int32(2**30)
    )
    s_ = jnp.sort(diff.reshape(-1))
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), s_[1:] != s_[:-1]]
    ) & (s_ < 2**30)
    count = jnp.sum(is_new)
    pos = jnp.where(is_new, jnp.arange(s_.shape[0]), 2**30)
    _, uniq = jax.lax.sort((pos, s_), num_keys=1)
    return uniq[:max_offsets], count


@_ft.partial(jax.jit, static_argnames=("offs",))
def _transfer_planes(pc, pv, c2f, offs):
    n = pc.shape[0]
    valid = pc >= 0
    pf = jnp.where(valid, c2f[jnp.maximum(pc, 0)], 0)
    diff = pf - jnp.arange(n, dtype=jnp.int32)[:, None]
    out = []
    for o in offs:
        m = valid & (diff == o)
        out.append(jnp.sum(jnp.where(m, pv, 0), axis=1))
    return jnp.stack(out)


@_ft.partial(jax.jit, static_argnames=("offs",))
def _transpose_planes(dvals, offs):
    from hypre_tpu.seq.dia import _shift1d

    return jnp.stack([_shift1d(dvals[d], -o) for d, o in enumerate(offs)])


# ---------------------------------------------------------------------------
# Fused one-dispatch builder (what setup_hierarchy_device uses)
# ---------------------------------------------------------------------------

_C_PT = 1  # coarsen.py / device_setup.py C_PT marker


@_ft.partial(jax.jit, static_argnames=("nc", "max_offsets"))
def _probe_offsets_jit(pc, cf, nc, max_offsets):
    n = pc.shape[0]
    key = jnp.where(
        cf == _C_PT, jnp.arange(n, dtype=jnp.int32), jnp.int32(2**30)
    )
    c2f = jnp.sort(key)[:nc]
    valid = pc >= 0
    pf = jnp.where(valid, c2f[jnp.maximum(pc, 0)], 0)
    diff = jnp.where(
        valid, pf - jnp.arange(n, dtype=jnp.int32)[:, None], jnp.int32(2**30)
    )
    s_ = jnp.sort(diff.reshape(-1))
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), s_[1:] != s_[:-1]]
    ) & (s_ < 2**30)
    count = jnp.sum(is_new)
    pos = jnp.where(is_new, jnp.arange(s_.shape[0]), 2**30)
    _, uniq = jax.lax.sort((pos, s_), num_keys=1)
    uniq = jnp.where(
        jnp.arange(max_offsets) < count, uniq[:max_offsets], jnp.int32(2**30)
    )
    return uniq


def probe_transfer_offsets(pc, cf, nc: int, max_offsets: int = 96):
    """Distinct fine-space diagonal offsets of P, or None if > max_offsets.
    One dispatch + one small pull (sentinel-filled tail encodes the count)."""
    import numpy as np

    uniq = np.asarray(_probe_offsets_jit(pc, cf, nc, max_offsets + 1))
    offs = uniq[uniq < 2**30]
    if len(offs) > max_offsets:
        return None
    return tuple(sorted(int(o) for o in offs))


@_ft.partial(jax.jit, static_argnames=("nc", "D", "margin", "B_e", "B_c"))
def _build_fused(pc, pv, cf, nc, offs_arr, D, margin, B_e=8192, B_c=2048):
    """Diagonal planes (scatter-add over offset ids — one 7.8 ns/elt pass
    instead of |offs| masked sweeps), their transpose, and the expand /
    compress selection payloads with their window schedules: the whole
    TransferDia build as one program. Only 4 scalars go back to host."""
    from hypre_tpu.seq.fastmv import _payload_impl, _sched_impl

    n, k = pc.shape
    key = jnp.where(
        cf == _C_PT, jnp.arange(n, dtype=jnp.int32), jnp.int32(2**30)
    )
    c2f = jnp.sort(key)[:nc]
    valid = pc >= 0
    pf = jnp.where(valid, c2f[jnp.maximum(pc, 0)], 0)
    diff = pf - jnp.arange(n, dtype=jnp.int32)[:, None]
    oid = jnp.clip(jnp.searchsorted(offs_arr, diff), 0, D - 1)
    hit = valid & (offs_arr[oid] == diff)
    rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, k))
    dvals = (
        jnp.zeros((D, n), pv.dtype)
        .at[oid, rows]
        .add(jnp.where(hit, pv, 0))
    )
    dvalsT = jnp.stack(
        [_shift1d_dyn(dvals[d], -offs_arr[d], margin) for d in range(D)]
    )

    is_c_row = cf == _C_PT
    cmap_dense = (jnp.cumsum(is_c_row.astype(jnp.int32)) - 1).astype(
        jnp.int32
    )
    e_vals = jnp.where(is_c_row, 1.0, 0.0).astype(pv.dtype)[:, None]
    e_cols = jnp.where(is_c_row, cmap_dense, -1).astype(jnp.int32)[:, None]
    # coarse rows beyond the true C count (bucket padding) carry the sort
    # sentinel — mask them to empty selection rows, else the compress
    # window schedule sees a 2^30 "column" and rejects the build
    c_valid = c2f < jnp.int32(2**30)
    c_cols = jnp.where(c_valid, c2f, -1)[:, None]
    c_vals = jnp.where(c_valid, 1.0, 0.0).astype(pv.dtype)[:, None]

    def pad_to(x, m, fill):
        r = x.shape[0]
        if r == m:
            return x
        return jnp.concatenate(
            [x, jnp.full((m - r,) + x.shape[1:], fill, x.dtype)]
        )

    # Block sizes per side (round-5): the selection kernels are pure
    # per-grid-step overhead at k=1 (~0.2 us/step) — B=1024 cost 2048
    # steps = ~0.45 ms per direction at 128^3. Expand gathers from the
    # COARSE vector (window ~ B_e / coarsening ratio, stays small at
    # B_e=8192); compress gathers from the FINE vector (window ~ B_c *
    # ratio, so B_c stays at 2048 to keep W inside VMEM).
    n_pad_e = -(-n // B_e) * B_e
    n_pad_c = -(-nc // B_c) * B_c
    e_cols_p = pad_to(e_cols, n_pad_e, -1)
    e_vals_p = pad_to(e_vals, n_pad_e, 0)
    c_cols_p = pad_to(c_cols, n_pad_c, -1)
    c_vals_p = pad_to(c_vals, n_pad_c, 0)
    lo_e, sc_e = _sched_impl(e_cols_p, B_e, n_pad_e)
    ev_t, el_t = _payload_impl(e_vals_p, e_cols_p, lo_e, B_e)
    lo_c, sc_c = _sched_impl(c_cols_p, B_c, n_pad_c)
    cv_t, cl_t = _payload_impl(c_vals_p, c_cols_p, lo_c, B_c)
    return (dvals, dvalsT, e_vals, e_cols, c_cols, c_vals, ev_t, el_t,
            lo_e, cv_t, cl_t, lo_c, jnp.concatenate([sc_e, sc_c]))


def build_transfer_dia(P, cf, offs, exact: int = 0,
                       max_window: int = 131072, known_windows=None):
    """TransferDia from P + the CF split + plan-cached offsets: one fused
    dispatch and one 4-scalar pull (the unfused path cost ~0.8 s of
    dispatch/pull overhead per setup through this tunnel).

    Contract (same as width_plan): ``offs`` must cover P's pattern — reuse
    across setups is valid only while the sparsity pattern is frozen.
    """
    import numpy as np

    from hypre_tpu.seq.ell import EllMatrix
    from hypre_tpu.seq.fastmv import ALIGN, BandedEll

    if not isinstance(P, EllMatrix) or P.k < 1 or offs is None:
        return None
    n = P.n_rows
    nc = P.n_cols
    B_e, B_c = 8192, 2048  # see _build_fused: per-side selection blocks
    # pad the offset COUNT to a bucket (repeat the last offset: searchsorted
    # resolves duplicates to the first slot, so padded planes stay zero) —
    # the fused program and the DIA kernels then key on the bucket, not the
    # exact diagonal count
    from hypre_tpu.amg.device_setup import _bucket as _kbucket

    D = _kbucket(len(offs))
    offs_p = tuple(offs) + (offs[-1],) * (D - len(offs))
    margin = _margin_for(offs_p, n)
    offs_arr = jnp.asarray(offs_p, jnp.int32)
    (dvals, dvalsT, e_vals, e_cols, c_cols, c_vals, ev_t, el_t, lo_e,
     cv_t, cl_t, lo_c, sc) = _build_fused(P.cols, P.vals, cf, nc,
                                          offs_arr, D, margin)
    from hypre_tpu.seq.fastmv import _wbucket, _xpad_bucket

    if known_windows is not None:
        # replay path (fast setup): the window buckets were recorded by an
        # earlier identical setup — skip the scalar pull and hand the raw
        # schedule scalars back for deferred verification
        W_e, xe, W_c, xc = known_windows
        P_dia = DiaMatrix(dvals=dvals, offsets=offs_p, n_cols=n,
                          margin=margin)
        Pt_dia = DiaMatrix(
            dvals=dvalsT, offsets=tuple(-o for o in offs_p), n_cols=n,
            margin=margin,
        )
        Eb = BandedEll(
            ell=EllMatrix(vals=e_vals, cols=e_cols, n_cols=nc),
            vals_t=ev_t, lcols_t=el_t, starts=lo_e, W=W_e, B=B_e,
            n_xpad=xe, exact=exact, n_rows_s=n, n_cols_s=nc,
        )
        Cb = BandedEll(
            ell=EllMatrix(vals=c_vals, cols=c_cols, n_cols=n),
            vals_t=cv_t, lcols_t=cl_t, starts=lo_c, W=W_c, B=B_c,
            n_xpad=xc, exact=exact, n_rows_s=nc, n_cols_s=n,
        )
        T = TransferDia(P_dia=P_dia, Pt_dia=Pt_dia, expand=Eb,
                        compress=Cb, n_coarse_s=nc)
        return T, sc

    wm_e, lm_e, wm_c, lm_c = (int(v) for v in np.asarray(sc))
    W_e = _wbucket(wm_e)
    W_c = _wbucket(wm_c)
    if W_e > max_window or W_c > max_window:
        return None
    P_dia = DiaMatrix(dvals=dvals, offsets=offs_p, n_cols=n, margin=margin)
    Pt_dia = DiaMatrix(
        dvals=dvalsT, offsets=tuple(-o for o in offs_p), n_cols=n,
        margin=margin,
    )
    Eb = BandedEll(
        ell=EllMatrix(vals=e_vals, cols=e_cols, n_cols=nc),
        vals_t=ev_t, lcols_t=el_t, starts=lo_e, W=W_e, B=B_e,
        n_xpad=_xpad_bucket(max(lm_e + W_e, nc)),
        exact=exact, n_rows_s=n, n_cols_s=nc,
    )
    Cb = BandedEll(
        ell=EllMatrix(vals=c_vals, cols=c_cols, n_cols=n),
        vals_t=cv_t, lcols_t=cl_t, starts=lo_c, W=W_c, B=B_c,
        n_xpad=_xpad_bucket(max(lm_c + W_c, n)),
        exact=exact, n_rows_s=nc, n_cols_s=n,
    )
    return TransferDia(
        P_dia=P_dia, Pt_dia=Pt_dia, expand=Eb, compress=Cb, n_coarse_s=nc,
    )


def try_transfer_dia(P, c2f, max_offsets: int = 96, exact: int = 0):
    """Build the fine-space transfer operators, or None if P's pattern
    needs more than ``max_offsets`` distinct fine-space diagonals.

    ``c2f`` (n_coarse,) maps coarse ids to their C-point fine rows (the
    inverse of the coarse numbering — supplied by setup, where the CF
    splitting is in hand). Offsets are data-driven: the multipass-agg P on
    a 3-D 7-pt stencil measures 63 distinct diagonals independent of grid
    size. All device programs are module-level jits keyed on the static
    offset tuple, so repeat setups with the same sparsity recompile
    nothing.
    """
    import numpy as np

    from hypre_tpu.seq.ell import EllMatrix
    from hypre_tpu.seq.fastmv import try_banded

    if not isinstance(P, EllMatrix) or P.k < 1:
        return None
    n, k = P.cols.shape
    n_c = P.n_cols

    uniq, count = _distinct_diffs(P.cols, c2f, max_offsets)
    n_off = int(count)
    if n_off > max_offsets:
        return None
    offs = tuple(sorted(int(u) for u in np.asarray(uniq)[:n_off]))

    dvals = _transfer_planes(P.cols, P.vals, c2f, offs)
    dvalsT = _transpose_planes(dvals, offs)
    P_dia = DiaMatrix(dvals=dvals, offsets=offs, n_cols=n)
    Pt_dia = DiaMatrix(
        dvals=dvalsT, offsets=tuple(-o for o in offs), n_cols=n
    )
    is_c_row = jnp.zeros(n, bool).at[c2f].set(True)
    cmap_dense = (
        jnp.cumsum(is_c_row.astype(jnp.int32)) - 1
    ).astype(jnp.int32)
    E = EllMatrix(
        vals=jnp.where(is_c_row, 1.0, 0.0).astype(P.dtype)[:, None],
        cols=jnp.where(is_c_row, cmap_dense, -1)[:, None],
        n_cols=n_c,
    )
    C = EllMatrix(
        vals=jnp.ones((n_c, 1), P.dtype),
        cols=c2f[:, None].astype(jnp.int32),
        n_cols=n,
    )
    Eb = try_banded(E, exact=exact)
    Cb = try_banded(C, exact=exact)
    if Eb is None or Cb is None:
        return None
    # keep the (tiny, k=1) ELL payloads: CPU runs fall back through them
    return TransferDia(
        P_dia=P_dia, Pt_dia=Pt_dia, expand=Eb, compress=Cb, n_coarse_s=n_c,
    )
