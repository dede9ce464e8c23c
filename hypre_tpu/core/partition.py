"""1-D block row partitioning helpers.

Analogue of ``seq_mv/genpart.c:18`` (``hypre_GeneratePartitioning``) and the
assumed-partition machinery (``utilities/ap.c``,
``parcsr_mv/par_csr_assumed_part.c``). hypre's assumed partition exists to
avoid O(P) partition arrays on every MPI rank; on TPU the partition is a
*static compile-time layout decision*: we always pad the global row count to a
multiple of the mesh size so every shard has the same local length (XLA SPMD
requires equal shards), which makes owner lookup O(1) arithmetic — the same
property hypre's assumed partition buys, obtained for free.
"""

from __future__ import annotations

import numpy as np

from hypre_tpu.core.config import round_up


class RowPartition:
    """Equal-block 1-D partition of ``n_global`` (possibly padded) rows."""

    def __init__(self, n_global: int, num_shards: int):
        self.n_global = int(n_global)
        self.num_shards = int(num_shards)
        self.n_padded = round_up(self.n_global, self.num_shards)
        self.n_local = self.n_padded // self.num_shards

    def owner_of(self, rows: np.ndarray) -> np.ndarray:
        """O(1) owner lookup — the 'assumed partition is the real partition'."""
        return np.asarray(rows) // self.n_local

    def local_index(self, rows: np.ndarray) -> np.ndarray:
        return np.asarray(rows) % self.n_local

    def row_range(self, shard: int) -> tuple[int, int]:
        lo = shard * self.n_local
        return lo, min(lo + self.n_local, self.n_global)

    def __repr__(self) -> str:
        return (
            f"RowPartition(n_global={self.n_global}, shards={self.num_shards}, "
            f"n_local={self.n_local})"
        )
