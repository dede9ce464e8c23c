"""Halo-exchange schedule construction — the CommPkg analogue.

hypre's ``hypre_ParCSRCommPkg`` (``parcsr_mv/par_csr_communication.h:51-75``)
is *neighbor-only*: each rank packs ``send_map_elmts`` for its actual
neighbors and posts point-to-point Isend/Irecv. The TPU equivalent here is a
static **ppermute schedule**: the neighbor graph of a row-partitioned sparse
matrix is expressed as a set of ring offsets o = (dest - source) mod P; each
offset becomes one ``lax.ppermute`` of a per-edge-sized tile. Exchange
volume is therefore O(sum of true boundary sizes), not the O(P^2 * max)
dense ``all_to_all`` tile a naive port would ship — the same scaling
property CommPkg buys hypre (asserted by ``tests/test_parallel.py``'s
byte-count test).

All irregular discovery happens on host at setup in numpy (hypre does it
with the assumed-partition rendezvous, ``new_commpkg.c:550``); the result is
baked into static device arrays consumed inside shard_map:

- ``send_idx (P, M)``: per source shard, the local col-space indices to
  pack, grouped by offset (offset r owns columns [starts[r], starts[r]+m[r]));
- offd column indices are rewritten at partition time to point directly into
  the flat ``(M,)`` receive buffer, so no unpack step exists at all;
- receive layout mirrors the send grouping: shard d's halo[starts[r]+j] is
  the j-th entry from source (d - offsets[r]) mod P. Ring wraparound pairs
  that exchange nothing carry zero-padded tiles nobody reads.

hypre overlaps the diag SpMV with the halo exchange explicitly
(``par_csr_matvec.c:293-340``); here the ppermutes and the diag SpMV have
no data dependence, so XLA's async collective scheduler CAN overlap them —
whether it does is backend-dependent and measured, not assumed: see
``PROFILE.md`` / ``profile_overlap.py`` (on the 8-virtual-device CPU mesh
the exchange is NOT hidden — XLA:CPU runs collectives synchronously; on
TPU ICI the async-collective path exists but is unverified on this
1-chip testbed).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from hypre_tpu.core.partition import RowPartition


@dataclasses.dataclass(frozen=True)
class HaloSchedule:
    """Static neighbor exchange schedule for a (row, col) partition pair."""

    send_idx: np.ndarray  # (P, M) int32 — local col-space indices to pack
    offsets: tuple  # ring offsets (dest - source) mod P, one ppermute each
    sizes: tuple  # per-offset tile size m_r; M = sum(sizes)
    # per shard: mapping of offd global col -> flat recv-buffer position
    recv_pos: list

    @property
    def num_shards(self) -> int:
        return self.send_idx.shape[0]

    @property
    def recv_size(self) -> int:
        return int(self.send_idx.shape[1])

    @property
    def starts(self) -> tuple:
        out, acc = [], 0
        for m in self.sizes:
            out.append(acc)
            acc += m
        return tuple(out)

    def exchange_bytes(self, itemsize: int = 4) -> int:
        """Bytes moved per exchange across the whole mesh (one direction).
        O(sum of boundary sizes) — the quantity the byte-count test pins."""
        return self.num_shards * self.recv_size * itemsize


def build_halo_schedule(
    offd_cols_per_shard: list, col_part: RowPartition
) -> HaloSchedule:
    """offd_cols_per_shard[p] = sorted unique global columns shard p needs
    from other shards (hypre's col_map_offd, par_csr_matrix.h:45)."""
    P = col_part.num_shards
    # needs[d][s] = global cols destination d needs from source s
    needs: list = []
    for d in range(P):
        cols = np.asarray(offd_cols_per_shard[d], dtype=np.int64)
        owners = col_part.owner_of(cols)
        needs.append({s: cols[owners == s] for s in range(P) if s != d})
    # neighbor offsets actually used anywhere on the mesh
    offsets = sorted(
        {
            (d - s) % P
            for d in range(P)
            for s, c in needs[d].items()
            if len(c)
        }
    )
    if not offsets:
        offsets = [1 % max(P, 1)] if P > 1 else []
    sizes = []
    for o in offsets:
        m_o = 0
        for d in range(P):
            s = (d - o) % P
            if s != d:
                m_o = max(m_o, len(needs[d].get(s, ())))
        sizes.append(max(m_o, 1))
    M = sum(sizes) if sizes else 1
    # padding slots hold -1 (NOT 0 — a genuine local index): forward
    # exchanges clamp-and-ignore them, reverse merges must skip them
    send_idx = np.full((P, M), -1, dtype=np.int32)
    recv_pos: list = []
    starts = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
    for d in range(P):
        pos = {}
        for r, o in enumerate(offsets):
            s = (d - o) % P
            if s == d:
                continue
            cols = needs[d].get(s, np.zeros(0, np.int64))
            # source s packs these at its offset-r block
            send_idx[s, starts[r] : starts[r] + len(cols)] = (
                col_part.local_index(cols)
            )
            for j, c in enumerate(cols):
                pos[int(c)] = int(starts[r]) + j
        recv_pos.append(pos)
    return HaloSchedule(
        send_idx=send_idx,
        offsets=tuple(int(o) for o in offsets),
        sizes=tuple(int(m) for m in sizes),
        recv_pos=recv_pos,
    )
