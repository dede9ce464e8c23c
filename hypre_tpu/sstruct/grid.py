"""SStructGrid — a union of structured parts (HYPRE_SStructGridCreate,
``sstruct_mv/_hypre_sstruct_mv.h:139-184``).

Each part is a dense box grid; the global index space concatenates the
flattened parts (hypre's part-major global numbering). Neighbor relations
between parts are expressed as graph entries on the matrix (see matrix.py),
not grid metadata — the TPU design bakes all coupling into operators.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class SStructGrid:
    part_shapes: tuple[tuple[int, ...], ...]

    @property
    def nparts(self) -> int:
        return len(self.part_shapes)

    @property
    def part_sizes(self) -> tuple[int, ...]:
        return tuple(int(np.prod(s)) for s in self.part_shapes)

    @property
    def part_offsets(self) -> tuple[int, ...]:
        """Global index of each part's first cell."""
        sizes = self.part_sizes
        return tuple(int(x) for x in np.concatenate([[0], np.cumsum(sizes)[:-1]]))

    @property
    def total_size(self) -> int:
        return int(sum(self.part_sizes))

    def global_index(self, part: int, index: tuple[int, ...]) -> int:
        """Flat global index of a cell (HYPRE_SStructGridSetVariables-era
        cell-centered single-variable numbering)."""
        shape = self.part_shapes[part]
        flat = 0
        for d in range(len(shape)):
            flat = flat * shape[d] + index[d]
        return self.part_offsets[part] + flat

    def split(self, x):
        """Flat global vector -> list of part-shaped arrays (views)."""
        out = []
        for off, size, shape in zip(
            self.part_offsets, self.part_sizes, self.part_shapes
        ):
            out.append(x[off : off + size].reshape(shape))
        return out
