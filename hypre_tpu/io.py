"""Matrix/vector IO — MatrixMarket + native checkpoint format.

Covers hypre's IO surface (SURVEY §5 checkpoint/resume): the MatrixMarket
reader/writer (``utilities/mmio.c``), the per-object print/read used by the
drivers' ``-fromfile`` flags (``par_csr_matrix.c:485,582,644``), and a
compact ``.npz`` native format replacing hypre's per-rank ASCII files (one
sharded-array-friendly file instead of P rank files).
"""

from __future__ import annotations

import numpy as np

from hypre_tpu.seq.csr import HostCSR
from hypre_tpu.seq.ell import EllMatrix, csr_to_ell, ell_to_csr


# ---------------------------------------------------------------------------
# MatrixMarket (utilities/mmio.c analogue)
# ---------------------------------------------------------------------------


def read_matrix_market(path: str) -> HostCSR:
    """Parse a MatrixMarket coordinate file (real/integer/pattern,
    general/symmetric)."""
    with open(path) as f:
        header = f.readline().strip().lower().split()
        if len(header) < 4 or header[0] != "%%matrixmarket":
            raise ValueError(f"not a MatrixMarket file: {path}")
        if header[2] != "coordinate":
            raise ValueError("only coordinate (sparse) format is supported")
        field = header[3] if len(header) > 3 else "real"
        symmetry = header[4] if len(header) > 4 else "general"
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        m, n, nnz = (int(t) for t in line.split())
        data = np.loadtxt(f, ndmin=2) if nnz else np.zeros((0, 3))
    rows = data[:, 0].astype(np.int64) - 1
    cols = data[:, 1].astype(np.int64) - 1
    vals = data[:, 2] if field != "pattern" and data.shape[1] > 2 else np.ones(len(rows))
    if symmetry in ("symmetric", "skew-symmetric"):
        off = rows != cols
        sign = -1.0 if symmetry == "skew-symmetric" else 1.0
        rows = np.concatenate([rows, cols[off]])
        cols = np.concatenate([cols, data[:, 0].astype(np.int64)[off] - 1])
        vals = np.concatenate([vals, sign * vals[off]])
    return HostCSR.from_coo(rows, cols, vals, (m, n), sum_duplicates=False)


def write_matrix_market(path: str, A: HostCSR | EllMatrix) -> None:
    csr = ell_to_csr(A) if isinstance(A, EllMatrix) else A
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{csr.shape[0]} {csr.shape[1]} {csr.nnz}\n")
        rows = np.repeat(np.arange(csr.n_rows), csr.row_nnz())
        for r, c, v in zip(rows, csr.indices, csr.data):
            f.write(f"{r + 1} {c + 1} {v:.17g}\n")


# ---------------------------------------------------------------------------
# Native checkpoint format (hypre_ParCSRMatrixPrint/Read analogue)
# ---------------------------------------------------------------------------


def save_matrix(path: str, A: EllMatrix) -> None:
    """One .npz per matrix (replaces hypre's per-rank ASCII files)."""
    np.savez_compressed(
        path,
        vals=np.asarray(A.vals),
        cols=np.asarray(A.cols),
        n_cols=np.int64(A.n_cols),
    )


def load_matrix(path: str, dtype=None) -> EllMatrix:
    import jax.numpy as jnp

    z = np.load(path)
    vals = z["vals"] if dtype is None else z["vals"].astype(dtype)
    return EllMatrix(
        vals=jnp.asarray(vals),
        cols=jnp.asarray(z["cols"]),
        n_cols=int(z["n_cols"]),
    )


def save_vector(path: str, v) -> None:
    np.savez_compressed(path, v=np.asarray(v))


def load_vector(path: str):
    import jax.numpy as jnp

    return jnp.asarray(np.load(path)["v"])
