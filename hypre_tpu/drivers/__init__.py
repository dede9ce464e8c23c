"""Command-line drivers mirroring the reference's test surface.

hypre's de-facto CLI is its test drivers (``src/test/ij.c``, ``struct.c``,
``sstruct.c``) — the regression suite runs them with flag combinations and
diffs iteration counts + final residual norms against golden files
(``test/runtest.sh``, ``TEST_ij/solvers.saved``). These modules reproduce
that surface with the same flag names and the same output format:

    python -m hypre_tpu.drivers.ij -solver 1 -pmis -interptype 6 -n 40 40 1
    python -m hypre_tpu.drivers.struct -solver 1 -n 64 64 1
"""
