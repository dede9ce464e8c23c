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


# ---------------------------------------------------------------------------
# Reference ASCII IJ format (hypre_ParCSRMatrixPrintIJ, par_csr_matrix.c:644)
# ---------------------------------------------------------------------------


def read_ij_ascii(path: str) -> HostCSR:
    """Parse the reference implementation's PrintIJ output: a header line
    ``ilower iupper jlower jupper`` followed by ``I J %.14e`` triplets
    (par_csr_matrix.c:729,745). Global indices are offset by ilower/jlower
    (the print writes them in the file's own base). Single-rank file; for a
    multi-rank dump concatenate the per-rank files first (each repeats only
    its own range header — extra 4-token lines are treated as data guards
    and rejected, so strip them when concatenating)."""
    with open(path) as f:
        head = f.readline().split()
        if len(head) != 4:
            raise ValueError(f"not an IJ ASCII file (bad header): {path}")
        ilower, iupper, jlower, jupper = (int(t) for t in head)
        rows, cols, vals = [], [], []
        for line in f:
            toks = line.replace(",", " ").split()
            if not toks:
                continue
            rows.append(int(toks[0]) - ilower)
            cols.append(int(toks[1]) - jlower)
            vals.append(float(toks[2]) if len(toks) > 2 else 1.0)
    shape = (iupper - ilower + 1, jupper - jlower + 1)
    return HostCSR.from_coo(
        np.asarray(rows, np.int64), np.asarray(cols, np.int64),
        np.asarray(vals), shape, sum_duplicates=False,
    )


def write_ij_ascii(path: str, A: HostCSR | EllMatrix, base: int = 0) -> None:
    """Write in the reference PrintIJ format (default 0-based like
    HYPRE_IJMatrixPrint's base_i=0 path)."""
    csr = ell_to_csr(A) if isinstance(A, EllMatrix) else A
    m, n = csr.shape
    with open(path, "w") as f:
        f.write(f"{base} {m - 1 + base} {base} {n - 1 + base}\n")
        rows = np.repeat(np.arange(m), csr.row_nnz())
        for r, c, v in zip(rows, csr.indices, csr.data):
            f.write(f"{r + base} {c + base} {v:.14e}\n")


def read_any_matrix(path: str) -> HostCSR:
    """Dispatch on file content: MatrixMarket, reference IJ ASCII, or the
    native .npz checkpoint (the ij driver's -fromfile accepts all three)."""
    if path.endswith(".npz"):
        return ell_to_csr(load_matrix(path))
    with open(path) as f:
        first = f.readline().strip()
    if first.lower().startswith("%%matrixmarket"):
        return read_matrix_market(path)
    return read_ij_ascii(path)
