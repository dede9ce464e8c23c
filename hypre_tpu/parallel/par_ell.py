"""ParEllMatrix — the distributed row-sharded sparse matrix.

TPU-native redesign of ``hypre_ParCSRMatrix`` (``parcsr_mv/par_csr_matrix.h:
27-86``): each shard owns a contiguous block of rows, split into

- ``diag``: entries whose column lives on the same shard (local col space),
- ``offd``: entries whose column lives elsewhere — but where hypre keeps
  global indices plus a ``col_map_offd`` translation, our offd columns are
  rewritten **at partition time** to point directly into the flat halo
  receive buffer, erasing the unpack step entirely,
- a ``HaloSchedule`` (CommPkg analogue) consumed by one ``lax.all_to_all``.

The distributed matvec (hypre_ParCSRMatrixMatvec, ``par_csr_matvec.c:23``)
becomes: pack (one gather) -> all_to_all over ICI -> diag SpMV + offd SpMV.
XLA's async collective scheduling overlaps the exchange with the diag SpMV,
replacing hypre's manual Isend/Irecv-compute-Waitall choreography
(``par_csr_matvec.c:293-340``).

Everything here operates on *global* jax.Arrays carrying NamedShardings, so
Krylov solvers and AMG cycles compose with distributed matrices unchanged —
inner products on sharded vectors lower to psum automatically.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hypre_tpu.core.partition import RowPartition
from hypre_tpu.parallel.halo import HaloSchedule, build_halo_schedule
from hypre_tpu.parallel.mesh import ROW_AXIS, row_sharding, replicated_sharding
from hypre_tpu.seq.ell import EllMatrix

try:  # jax >= 0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParEllMatrix:
    """Row-sharded ELL matrix over a 1-D device mesh."""

    diag_vals: jax.Array  # (n_row_pad, kd)
    diag_cols: jax.Array  # (n_row_pad, kd) local col indices, -1 pad
    offd_vals: jax.Array  # (n_row_pad, ko)
    offd_cols: jax.Array  # (n_row_pad, ko) halo-buffer indices, -1 pad
    send_idx: jax.Array  # (P, M) local col-space pack map, sharded on axis 0

    n_rows: int = dataclasses.field(metadata=dict(static=True))  # global, unpadded
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    # neighbor ppermute schedule (CommPkg topology): ring offsets and the
    # per-offset tile sizes, static so the exchange unrolls at trace time
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    sizes: tuple = dataclasses.field(metadata=dict(static=True))
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))

    @property
    def num_shards(self) -> int:
        return self.send_idx.shape[0]

    @property
    def halo_starts(self) -> tuple:
        out, acc = [], 0
        for m in self.sizes:
            out.append(acc)
            acc += m
        return tuple(out)

    def exchange_bytes(self) -> int:
        """Bytes one matvec exchange moves across the mesh (halo volume)."""
        return self.num_shards * int(self.send_idx.shape[1]) * self.dtype.itemsize

    @property
    def n_row_local(self) -> int:
        return self.diag_vals.shape[0] // self.num_shards

    @property
    def n_col_local(self) -> int:
        return -(-self.n_cols // self.num_shards)

    @property
    def dtype(self):
        return self.diag_vals.dtype

    # -- operator protocol (see EllMatrix) ------------------------------------

    @property
    def vec_len_rows(self) -> int:
        return self.diag_vals.shape[0]

    @property
    def vec_len_cols(self) -> int:
        return self.n_col_local * self.num_shards

    def mv(self, x: jax.Array) -> jax.Array:
        return par_spmv(self, x)

    def mv_t(self, x: jax.Array) -> jax.Array:
        return par_spmv_t(self, x)


def _local_spmv(vals, cols, x):
    return jnp.sum(vals * jnp.take(x, jnp.maximum(cols, 0), axis=0), axis=1)


def _local_spmv_t(vals, cols, x, n_out):
    flat_cols = jnp.maximum(cols, 0).reshape(-1)
    contrib = jnp.where(cols >= 0, vals * x[:, None], 0).reshape(-1)
    return jnp.zeros((n_out,), contrib.dtype).at[flat_cols].add(contrib)


def _exchange(send: jax.Array, offsets, sizes, nshards):
    """Forward halo exchange: one ppermute per ring offset. send (M,) is the
    packed buffer grouped by offset; returns the (M,) halo buffer."""
    parts = []
    start = 0
    for o, m in zip(offsets, sizes):
        perm = [(s, (s + o) % nshards) for s in range(nshards)]
        parts.append(jax.lax.ppermute(send[start : start + m], ROW_AXIS, perm))
        start += m
    return jnp.concatenate(parts) if parts else send[:0]


def _exchange_rev(contrib: jax.Array, offsets, sizes, nshards):
    """Reverse (transpose/accumulate) exchange: route each offset block back
    to its source — hypre's reverse-comm job (CommHandle job=2)."""
    parts = []
    start = 0
    for o, m in zip(offsets, sizes):
        perm = [((s + o) % nshards, s) for s in range(nshards)]
        parts.append(
            jax.lax.ppermute(contrib[start : start + m], ROW_AXIS, perm)
        )
        start += m
    return jnp.concatenate(parts) if parts else contrib[:0]


def par_spmv(A: ParEllMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x with x sharded by A's column partition (3.2's hot kernel)."""
    nshards = A.num_shards
    offsets, sizes = A.offsets, A.sizes

    def shard_fn(dvals, dcols, ovals, ocols, send_idx, x_local):
        # send_idx local block: (1, M) — this shard's outgoing pack map
        # (-1 = padding; clamp for the gather, receivers never read those)
        y = _local_spmv(dvals, dcols, x_local)
        if not sizes:  # no halo at all (single shard / block-diagonal)
            return y
        send = jnp.take(x_local, jnp.maximum(send_idx[0], 0), axis=0)
        halo = _exchange(send, offsets, sizes, nshards)
        return y + _local_spmv(ovals, ocols, halo)

    spec_rows = P(ROW_AXIS)
    return _shard_map(
        shard_fn,
        mesh=A.mesh,
        in_specs=(spec_rows, spec_rows, spec_rows, spec_rows, P(ROW_AXIS), spec_rows),
        out_specs=spec_rows,
    )(A.diag_vals, A.diag_cols, A.offd_vals, A.offd_cols, A.send_idx, x)


def par_spmv_t(A: ParEllMatrix, x: jax.Array) -> jax.Array:
    """y = A.T @ x — reverse exchange with accumulation, mirroring hypre's
    MatvecT reverse-comm job (``par_csr_matvec.c:412``, CommHandle job=2)."""
    nshards = A.num_shards
    offsets, sizes = A.offsets, A.sizes
    n_col_local = A.n_col_local
    M = sum(sizes) if sizes else 0

    def shard_fn(dvals, dcols, ovals, ocols, send_idx, x_local):
        y = _local_spmv_t(dvals, dcols, x_local, n_col_local)
        if not sizes:  # single-shard mesh: no off-diag contributions
            return y
        contrib = _local_spmv_t(ovals, ocols, x_local, max(M, 1))
        back = _exchange_rev(contrib[:M], offsets, sizes, nshards)
        # padding slots scatter out of bounds and are dropped
        dst = jnp.where(send_idx[0] >= 0, send_idx[0], n_col_local)
        return y.at[dst].add(back)

    spec_rows = P(ROW_AXIS)
    return _shard_map(
        shard_fn,
        mesh=A.mesh,
        in_specs=(spec_rows, spec_rows, spec_rows, spec_rows, P(ROW_AXIS), spec_rows),
        out_specs=spec_rows,
    )(A.diag_vals, A.diag_cols, A.offd_vals, A.offd_cols, A.send_idx, x)


# ---------------------------------------------------------------------------
# Partitioning (host-side setup, numpy)
# ---------------------------------------------------------------------------


def _compact_rows_np(vals: np.ndarray, cols: np.ndarray, keep: np.ndarray):
    """Left-compact kept entries per row; shrink to max fill (numpy)."""
    n, k = cols.shape
    order = np.argsort(~keep, axis=1, kind="stable")
    cols_s = np.take_along_axis(np.where(keep, cols, -1), order, axis=1)
    vals_s = np.take_along_axis(np.where(keep, vals, 0), order, axis=1)
    width = max(int(keep.sum(axis=1).max(initial=0)), 1)
    return vals_s[:, :width], cols_s[:, :width]


def partition_ell(
    A: EllMatrix,
    mesh: Mesh,
    col_part: RowPartition | None = None,
) -> ParEllMatrix:
    """Split a (host-resident) global EllMatrix across a 1-D mesh.

    The analogue of building hypre's diag/offd split + col_map_offd + CommPkg
    (``par_csr_matrix.c`` + ``new_commpkg.c``), all in vectorized numpy at
    setup time.
    """
    nshards = mesh.devices.size
    row_part = RowPartition(A.n_rows, nshards)
    col_part = col_part or RowPartition(A.n_cols, nshards)

    vals = np.asarray(A.vals)
    cols = np.asarray(A.cols)
    n, k = cols.shape
    n_pad = row_part.n_padded
    if n_pad > n:
        vals = np.concatenate([vals, np.zeros((n_pad - n, k), vals.dtype)])
        cols = np.concatenate([cols, np.full((n_pad - n, k), -1, cols.dtype)])

    valid = cols >= 0
    row_owner = (np.arange(n_pad) // row_part.n_local)[:, None]
    col_owner = np.where(valid, col_part.owner_of(np.maximum(cols, 0)), -9)
    is_diag = valid & (col_owner == row_owner)
    is_offd = valid & ~is_diag

    diag_vals, diag_cols_g = _compact_rows_np(vals, cols, is_diag)
    diag_cols = np.where(diag_cols_g >= 0, col_part.local_index(np.maximum(diag_cols_g, 0)), -1).astype(np.int32)

    offd_vals, offd_cols_g = _compact_rows_np(vals, cols, is_offd)

    # per-shard unique offd columns (col_map_offd)
    offd_cols_per_shard = []
    nl = row_part.n_local
    for p in range(nshards):
        block = offd_cols_g[p * nl : (p + 1) * nl]
        offd_cols_per_shard.append(np.unique(block[block >= 0]))
    sched = build_halo_schedule(offd_cols_per_shard, col_part)

    # rewrite offd global columns -> flat recv-buffer positions
    offd_cols = np.full_like(offd_cols_g, -1, dtype=np.int32)
    for p in range(nshards):
        pos = sched.recv_pos[p]
        block = offd_cols_g[p * nl : (p + 1) * nl]
        if pos:
            keys = np.array(sorted(pos), dtype=np.int64)
            vals_map = np.array([pos[int(c)] for c in keys], dtype=np.int32)
            hit = block >= 0
            idx = np.searchsorted(keys, np.maximum(block, 0))
            offd_cols[p * nl : (p + 1) * nl] = np.where(hit, vals_map[np.clip(idx, 0, len(keys) - 1)], -1)

    shard = row_sharding(mesh)
    return ParEllMatrix(
        diag_vals=jax.device_put(jnp.asarray(diag_vals), shard),
        diag_cols=jax.device_put(jnp.asarray(diag_cols), shard),
        offd_vals=jax.device_put(jnp.asarray(offd_vals), shard),
        offd_cols=jax.device_put(jnp.asarray(offd_cols), shard),
        send_idx=jax.device_put(jnp.asarray(sched.send_idx), shard),
        n_rows=A.n_rows,
        n_cols=A.n_cols,
        offsets=sched.offsets,
        sizes=sched.sizes,
        mesh=mesh,
    )


def distribute_vector(x, mesh: Mesh, n_global: int | None = None) -> jax.Array:
    """Pad a global vector to the sharded length and place it on the mesh."""
    x = np.asarray(x)
    n_global = n_global or x.shape[0]
    part = RowPartition(n_global, mesh.devices.size)
    if part.n_padded > x.shape[0]:
        x = np.concatenate([x, np.zeros(part.n_padded - x.shape[0], x.dtype)])
    return jax.device_put(jnp.asarray(x), row_sharding(mesh))


def collect_vector(x: jax.Array, n_global: int) -> np.ndarray:
    return np.asarray(x)[:n_global]
