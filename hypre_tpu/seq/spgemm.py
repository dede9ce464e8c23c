"""Device-side sparse matrix algebra on EllMatrix: SpGEMM, transpose, add, filter.

TPU-native replacement for hypre's custom GPU SpGEMM
(``seq_mv/csr_spgemm_device.c:15-106`` — two-phase hash kernels with 11 size
bins) and device transpose/add (``csr_sptrans_device.c``,
``csr_spadd_device.c``). Hash tables are hostile to the TPU's vector unit, so
we use the sort/segment formulation instead: expand candidate products,
sort each row by column, segment-reduce duplicates, and compact into a fixed
output width ``out_k``. Everything is static-shape; kernels return the true
required width so the (host-side) caller can re-run with a larger capacity —
the same capacity-re-estimation dance hypre's symbolic/numeric split performs
(``csr_spgemm_device_rowest.c``), collapsed into one pass.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hypre_tpu.core.config import PAD_COL
from hypre_tpu.seq.ell import EllMatrix

_BIG = jnp.int32(2**30)  # sort key for padding; larger than any column index

# NOTE: the jit wrappers live at module level (bottom of file) — creating
# jax.jit(fn) per call makes a fresh wrapper each time, so every invocation
# re-traced; that was a dominant cost of the compile-heavy test tier


def _merge_rows(cols: jax.Array, vals: jax.Array, out_k: int):
    """Merge duplicate columns within each row of a candidate slab.

    cols: (n, K) int32 with PAD_COL padding; vals: (n, K).
    Returns (out_cols (n,out_k), out_vals (n,out_k), required_k scalar).
    Entries beyond out_k uniques per row are dropped (caller checks
    required_k and retries with a larger capacity).
    """
    n, K = cols.shape
    valid = cols >= 0
    key = jnp.where(valid, cols, _BIG)
    order = jnp.argsort(key, axis=1)
    sc = jnp.take_along_axis(key, order, axis=1)
    sv = jnp.take_along_axis(jnp.where(valid, vals, 0), order, axis=1)
    valid_s = sc < _BIG
    is_new = jnp.concatenate(
        [valid_s[:, :1], (sc[:, 1:] != sc[:, :-1]) & valid_s[:, 1:]], axis=1
    )
    upos = jnp.cumsum(is_new.astype(jnp.int32), axis=1) - 1  # unique slot per entry
    required_k = jnp.max(upos[:, -1] + 1) if K > 0 else jnp.int32(0)
    # overflow slot out_k swallows padding and beyond-capacity entries
    upos = jnp.where(valid_s & (upos < out_k), upos, out_k)
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    out_vals = jnp.zeros((n, out_k + 1), dtype=vals.dtype).at[rows, upos].add(sv)
    out_cols = (
        jnp.full((n, out_k + 1), PAD_COL, dtype=jnp.int32)
        .at[rows, upos]
        .max(jnp.where(valid_s, sc, PAD_COL).astype(jnp.int32))
    )
    return out_cols[:, :out_k], out_vals[:, :out_k], required_k


# candidate-slab element budget above which ell_spgemm routes through the
# slot-blocked/chunked device_setup.spgemm_slab path (see ell_spgemm)
_BIG_SPGEMM_ELEMENTS = 2e8

# pair-count cap for the stencil-composition product below (program size is
# linear in kA*kB; beyond this the slab paths win on compile time)
_STENCIL_SPGEMM_MAX_PAIRS = 4096


def stencil_spgemm(A: EllMatrix, B: EllMatrix) -> EllMatrix:
    """C = A @ B when BOTH operands are shift-structured stencils.

    Stencil offsets compose additively: C's diagonal set is the pairwise
    sums {sa + sb}, and each output diagonal is a sum of rolled elementwise
    products — no gathers, no sorts, no candidate slabs. This is the exact
    structured-product identity hypre hand-differentiates per stencil in
    ``struct_ls/pfmg_setup_rap*.c`` / ``smg2_setup_rap.c``, applied here to
    arbitrary ELL stencils; on TPU it lowers to ~kA*kB fused multiply-adds
    at HBM bandwidth (the 128^3 27-pt A*A runs in tens of ms where the
    sort-based slab path needs seconds and hypre's hash SpGEMM
    ``seq_mv/csr_spgemm_device.c`` needs 0.078-0.654 s).

    Correctness of the unmasked value sum: invalid slots hold val 0 in both
    operands, and a wrapped roll (i + sa outside the grid) can only be read
    where A's slot sa is structurally invalid — i.e. multiplied by 0.
    Structural validity (C.cols) is tracked exactly via rolled masks.
    """
    shA = tuple(int(s) for s in A.shifts)
    shB = tuple(int(s) for s in B.shifts)
    n = A.n_rows
    pairs: dict[int, list] = {}
    for ia, sa in enumerate(shA):
        for ib, sb in enumerate(shB):
            pairs.setdefault(sa + sb, []).append((ia, ib, sa))
    offs = sorted(pairs)
    idx = jnp.arange(n, dtype=jnp.int32)
    a_valid = A.cols >= 0
    b_valid = B.cols >= 0
    cols_list, vals_list = [], []
    for o in offs:
        acc = jnp.zeros((n,), A.vals.dtype)
        vmask = jnp.zeros((n,), bool)
        for ia, ib, sa in pairs[o]:
            acc = acc + A.vals[:, ia] * jnp.roll(B.vals[:, ib], -sa)
            vmask = vmask | (a_valid[:, ia] & jnp.roll(b_valid[:, ib], -sa))
        cols_list.append(jnp.where(vmask, idx + o, PAD_COL))
        vals_list.append(jnp.where(vmask, acc, 0))
    return EllMatrix(
        vals=jnp.stack(vals_list, axis=1),
        cols=jnp.stack(cols_list, axis=1).astype(jnp.int32),
        n_cols=B.n_cols,
        shifts=tuple(offs),
    )


def ell_spgemm_raw(A: EllMatrix, B: EllMatrix, out_k: int):
    """C = A @ B with fixed output width; returns (C, required_k)."""
    aco = jnp.maximum(A.cols, 0)
    cand_cols = B.cols[aco]  # (n, kA, kB)
    cand_vals = A.vals[:, :, None] * B.vals[aco]
    a_valid = (A.cols >= 0)[:, :, None]
    cand_cols = jnp.where(a_valid, cand_cols, PAD_COL)
    cand_vals = jnp.where(a_valid, cand_vals, 0)
    n = A.n_rows
    out_cols, out_vals, required_k = _merge_rows(
        cand_cols.reshape(n, -1), cand_vals.reshape(n, -1), out_k
    )
    return EllMatrix(vals=out_vals, cols=out_cols, n_cols=B.n_cols), required_k


def ell_spgemm(A: EllMatrix, B: EllMatrix, out_k: int | None = None) -> EllMatrix:
    """Host-orchestrated SpGEMM with capacity re-estimation on overflow.

    Not jittable end-to-end (the retry needs a host round-trip); AMG setup is
    host-orchestrated anyway, mirroring hypre's symbolic-then-numeric phases.

    Large products (27-pt-class: n*kA*kB beyond a slab budget) route through
    device_setup.spgemm_slab — slot-blocked progressive merges when A is
    shift-structured, lax.map row chunks otherwise — because the one-shot
    (n, kA, kB) candidate gather here lane-pads its minor dim to 128 on TPU
    (29 GB on the 128^3 27-pt A*A; hypre's answer to the same blow-up is the
    11-bin hash SpGEMM, ``seq_mv/csr_spgemm_device.h:20-24``).
    """
    n, kA, kB = A.n_rows, A.k, B.k
    if (
        A.shifts is not None
        and B.shifts is not None
        and A.n_cols == B.n_rows == n
        and kA * kB <= _STENCIL_SPGEMM_MAX_PAIRS
    ):
        return _stencil_spgemm_jit(A, B)
    if out_k is None:
        out_k = min(kA * kB, max(kA, kB) * 4)
    if n * kA * kB > _BIG_SPGEMM_ELEMENTS:
        from hypre_tpu.amg.device_setup import _jit_ap

        shifts = A.shifts if A.shifts is None else tuple(
            int(s) for s in A.shifts
        )
        chunks = 1
        if shifts is None:
            while n * kA * kB / chunks > 48e6:
                chunks *= 2
        for _ in range(4):
            cc, cv, req = _jit_ap(
                A.vals, A.cols, B.cols, B.vals, out_k, shifts, 0, chunks
            )
            r = int(req)
            if r <= out_k:
                break
            out_k = r
        k = max(min(r, out_k), 1)
        return EllMatrix(vals=cv[:, :k], cols=cc[:, :k], n_cols=B.n_cols)
    C, required_k = _spgemm_jit(A, B, out_k)
    required_k = int(required_k)
    if required_k > out_k:
        C, _ = _spgemm_jit(A, B, required_k)
    elif required_k < out_k:
        # uniques are left-aligned by the merge; shrink to the true width
        k = max(required_k, 1)
        C = EllMatrix(vals=C.vals[:, :k], cols=C.cols[:, :k], n_cols=C.n_cols)
    return C


def stencil_transpose(A: EllMatrix) -> EllMatrix:
    """A^T of a shift-structured square stencil, by rolls.

    T[i, i+o] = A[i+o, i], i.e. diagonal o of T is diagonal -o of A rolled
    by -o; a wrapped read is only reachable where the source slot is
    structurally invalid (val 0, mask False), as in stencil_spgemm.
    """
    sh = tuple(int(s) for s in A.shifts)
    slot = {s: j for j, s in enumerate(sh)}
    offs = sorted(-s for s in sh)
    idx = jnp.arange(A.n_rows, dtype=jnp.int32)
    a_valid = A.cols >= 0
    cols_list, vals_list = [], []
    for o in offs:
        j = slot[-o]
        m = jnp.roll(a_valid[:, j], -o)
        vals_list.append(jnp.where(m, jnp.roll(A.vals[:, j], -o), 0))
        cols_list.append(jnp.where(m, idx + o, PAD_COL))
    return EllMatrix(
        vals=jnp.stack(vals_list, axis=1),
        cols=jnp.stack(cols_list, axis=1).astype(jnp.int32),
        n_cols=A.n_rows,
        shifts=tuple(offs),
    )


def ell_transpose_raw(A: EllMatrix, out_k: int):
    """T = A.T with fixed row width; returns (T, required_k).

    Sort all entries by column (stable keeps row order), compute the slot of
    each entry within its column segment via a running segment-start cummax,
    then scatter into the transposed slab. Duplicate (row,col) entries remain
    duplicates (ELL semantics sum them).
    """
    n, k = A.cols.shape
    flat_cols = A.cols.reshape(-1)
    flat_vals = A.vals.reshape(-1)
    flat_rows = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, k)
    ).reshape(-1)
    valid = flat_cols >= 0
    key = jnp.where(valid, flat_cols, _BIG)
    order = jnp.argsort(key, stable=True)
    sc = key[order]
    sv = flat_vals[order]
    sr = flat_rows[order]
    idx = jnp.arange(n * k, dtype=jnp.int32)
    is_new = jnp.concatenate([jnp.ones((1,), bool), sc[1:] != sc[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_new, idx, 0))
    slot = idx - seg_start
    valid_s = sc < _BIG
    required_k = jnp.max(jnp.where(valid_s, slot, -1)) + 1
    in_range = valid_s & (slot < out_k)
    dst_row = jnp.where(in_range, sc, A.n_cols)
    dst_slot = jnp.where(in_range, slot, out_k)
    t_vals = (
        jnp.zeros((A.n_cols + 1, out_k + 1), dtype=A.vals.dtype)
        .at[dst_row, dst_slot]
        .add(sv)
    )
    t_cols = (
        jnp.full((A.n_cols + 1, out_k + 1), PAD_COL, dtype=jnp.int32)
        .at[dst_row, dst_slot]
        .max(jnp.where(in_range, sr, PAD_COL))
    )
    T = EllMatrix(vals=t_vals[:-1, :out_k], cols=t_cols[:-1, :out_k], n_cols=n)
    return T, required_k


def ell_transpose(A: EllMatrix, out_k: int | None = None) -> EllMatrix:
    if A.shifts is not None and A.n_cols == A.n_rows:
        return _stencil_transpose_jit(A)
    if out_k is None:
        # average row fill of A.T, padded up; retried below if insufficient
        out_k = max(2 * A.k, 4)
    T, required_k = _transpose_jit(A, out_k)
    required_k = int(required_k)
    if required_k > out_k:
        T, _ = _transpose_jit(A, required_k)
    elif required_k < out_k:
        # slots are filled left-to-right per column segment; shrink
        k = max(required_k, 1)
        T = EllMatrix(vals=T.vals[:, :k], cols=T.cols[:, :k], n_cols=T.n_cols)
    return T


def ell_add_raw(alpha, A: EllMatrix, beta, B: EllMatrix, out_k: int):
    """C = alpha*A + beta*B (same shape), returns (C, required_k)."""
    cand_cols = jnp.concatenate([A.cols, B.cols], axis=1)
    cand_vals = jnp.concatenate([alpha * A.vals, beta * B.vals], axis=1)
    out_cols, out_vals, required_k = _merge_rows(cand_cols, cand_vals, out_k)
    return EllMatrix(vals=out_vals, cols=out_cols, n_cols=A.n_cols), required_k


def ell_add(alpha, A: EllMatrix, beta, B: EllMatrix, out_k: int | None = None) -> EllMatrix:
    if out_k is None:
        out_k = A.k + B.k
    C, _ = _add_jit(alpha, A, beta, B, out_k)
    return C


def ell_filter(A: EllMatrix, keep: jax.Array, out_k: int | None = None) -> EllMatrix:
    """Keep only entries where ``keep`` (n,k) is True, compacting rows left.

    Used for strength-graph extraction and interpolation-pattern restriction
    (hypre builds these as fresh CSR matrices, e.g. ``par_strength.c:531``).
    Jit-safe for fixed out_k.
    """
    keep = keep & A.structural_mask()
    # stable sort rows by "dropped" flag: kept entries first, order preserved
    order = jnp.argsort(jnp.where(keep, 0, 1).astype(jnp.int32), axis=1, stable=True)
    cols = jnp.take_along_axis(jnp.where(keep, A.cols, PAD_COL), order, axis=1)
    vals = jnp.take_along_axis(jnp.where(keep, A.vals, 0), order, axis=1)
    if out_k is not None:
        cols, vals = cols[:, :out_k], vals[:, :out_k]
    return EllMatrix(vals=vals, cols=cols, n_cols=A.n_cols)


def ell_remap_cols(A: EllMatrix, col_map: jax.Array, new_n_cols: int) -> EllMatrix:
    """Renumber columns through ``col_map`` (entries mapping to <0 are dropped)."""
    new_cols = jnp.where(A.cols >= 0, col_map[jnp.maximum(A.cols, 0)], PAD_COL)
    vals = jnp.where(new_cols >= 0, A.vals, 0)
    new_cols = jnp.where(new_cols >= 0, new_cols, PAD_COL)
    return EllMatrix(vals=vals, cols=new_cols.astype(jnp.int32), n_cols=new_n_cols)


_spgemm_jit = jax.jit(ell_spgemm_raw, static_argnums=2)
_transpose_jit = jax.jit(ell_transpose_raw, static_argnums=1)
_stencil_spgemm_jit = jax.jit(stencil_spgemm)
_stencil_transpose_jit = jax.jit(stencil_transpose)
_add_jit = jax.jit(ell_add_raw, static_argnums=4)
