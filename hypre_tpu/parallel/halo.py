"""Halo-exchange schedule construction — the CommPkg analogue.

hypre's ``hypre_ParCSRCommPkg`` (``parcsr_mv/par_csr_communication.h:51-75``)
describes, per rank, which local entries to pack for each destination
(``send_map_elmts``) and where received values land; it is built at setup by
an assumed-partition rendezvous (``new_commpkg.c:550``). The TPU redesign
(SURVEY.md §5): all irregular discovery happens **on host at setup** in plain
numpy, and the result is baked into three static device arrays that a single
``lax.all_to_all`` consumes inside shard_map:

- ``send_idx  (P, P, m)``: for source shard s and destination d, the local
  row indices s packs (padded with 0 — receivers never read padded slots);
- offd column indices are rewritten at partition time to point directly into
  the flat ``(P*m,)`` receive buffer, so no unpack step exists at all;
- ``m`` = max entries over any (s, d) pair — equal tile size is what lets
  the exchange ride one all_to_all over ICI instead of point-to-point sends.

hypre overlaps the diag SpMV with the halo exchange explicitly
(``par_csr_matvec.c:293-340``); here the all_to_all and the diag SpMV have no
data dependence, so XLA's async collective scheduler provides the overlap.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from hypre_tpu.core.partition import RowPartition


@dataclasses.dataclass(frozen=True)
class HaloSchedule:
    """Static exchange schedule for a (row_partition, col_partition) pair."""

    send_idx: np.ndarray  # (P, P, m) int32 — local col-space indices to pack
    m: int  # padded per-pair tile size
    # per shard: mapping of offd global col -> flat recv-buffer position
    recv_pos: list[dict[int, int]]

    @property
    def num_shards(self) -> int:
        return self.send_idx.shape[0]

    @property
    def recv_size(self) -> int:
        return self.num_shards * self.m


def build_halo_schedule(
    offd_cols_per_shard: list[np.ndarray], col_part: RowPartition
) -> HaloSchedule:
    """offd_cols_per_shard[p] = sorted unique global columns shard p needs
    from other shards (hypre's col_map_offd, par_csr_matrix.h:45)."""
    P = col_part.num_shards
    # needs[d][s] = global cols destination d needs from source s
    needs: list[list[np.ndarray]] = []
    for d in range(P):
        cols = np.asarray(offd_cols_per_shard[d], dtype=np.int64)
        owners = col_part.owner_of(cols)
        needs.append([cols[owners == s] for s in range(P)])
    m = max((len(needs[d][s]) for d in range(P) for s in range(P)), default=0)
    m = max(m, 1)
    send_idx = np.zeros((P, P, m), dtype=np.int32)
    recv_pos: list[dict[int, int]] = []
    for d in range(P):
        pos: dict[int, int] = {}
        for s in range(P):
            cols = needs[d][s]
            send_idx[s, d, : len(cols)] = col_part.local_index(cols)
            for j, c in enumerate(cols):
                pos[int(c)] = s * m + j
        recv_pos.append(pos)
    return HaloSchedule(send_idx=send_idx, m=m, recv_pos=recv_pos)
