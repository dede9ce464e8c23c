"""IJ assembly + IO tests (mirrors the reference's ij_assembly.c driver
checks: set/add ordering semantics, and mmio round-trips)."""

import numpy as np
import jax.numpy as jnp

from hypre_tpu.ij import IJMatrix, IJVector
from hypre_tpu.io import (
    load_matrix,
    read_matrix_market,
    save_matrix,
    write_matrix_market,
)
from hypre_tpu.seq.ell import ell_spmv, ell_to_csr


def test_ij_set_then_add_accumulates():
    m = IJMatrix(3, 3)
    m.set_values([0], [0], [2.0])
    m.add_to_values([0], [0], [1.5])
    m.assemble()
    assert m.get_csr().to_dense()[0, 0] == 3.5


def test_ij_add_then_set_overwrites():
    m = IJMatrix(3, 3)
    m.add_to_values([1], [2], [5.0])
    m.set_values([1], [2], [2.0])
    m.add_to_values([1], [2], [0.5])
    m.assemble()
    # the set wipes the earlier add; the later add accumulates (hypre
    # IJMatrix aux-matrix semantics)
    assert m.get_csr().to_dense()[1, 2] == 2.5


def test_ij_ex5_style_laplacian():
    """Assemble the 1-D Laplacian the way examples/ex5.c does and solve."""
    n = 32
    m = IJMatrix(n, n)
    for i in range(n):
        cols, vals = [i], [2.0]
        if i > 0:
            cols.append(i - 1), vals.append(-1.0)
        if i < n - 1:
            cols.append(i + 1), vals.append(-1.0)
        m.set_values([i] * len(cols), cols, vals)
    A = m.assemble().get_object()
    b = IJVector(n).set_values(np.arange(n), np.ones(n)).assemble().get_object()
    from hypre_tpu.krylov import pcg

    x, info = pcg(lambda v: ell_spmv(A, v), b, rtol=1e-10)
    assert bool(info.converged)
    want = np.linalg.solve(ell_to_csr(A).to_dense(), np.ones(n))
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-6)


def test_ij_out_of_range_raises():
    m = IJMatrix(3, 3)
    try:
        m.set_values([3], [0], [1.0])
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_matrix_market_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    from hypre_tpu.seq.ell import ell_from_dense

    M = rng.standard_normal((7, 5)) * (rng.random((7, 5)) < 0.4)
    A = ell_from_dense(M)
    p = str(tmp_path / "m.mtx")
    write_matrix_market(p, A)
    B = read_matrix_market(p)
    np.testing.assert_allclose(B.to_dense(), M, atol=1e-15)


def test_matrix_market_symmetric(tmp_path):
    p = str(tmp_path / "s.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("% comment line\n")
        f.write("3 3 4\n1 1 2.0\n2 1 -1.0\n2 2 2.0\n3 3 1.0\n")
    A = read_matrix_market(p)
    want = np.array([[2.0, -1.0, 0], [-1.0, 2.0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(A.to_dense(), want)


def test_native_save_load(tmp_path):
    from hypre_tpu import laplacian_2d_5pt

    A = laplacian_2d_5pt(6, 6)
    p = str(tmp_path / "a.npz")
    save_matrix(p, A)
    B = load_matrix(p)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(36))
    np.testing.assert_allclose(
        np.asarray(ell_spmv(A, x)), np.asarray(ell_spmv(B, x))
    )


def test_ij_ascii_roundtrip(tmp_path):
    # reference PrintIJ format (par_csr_matrix.c:729,745): header line with
    # ranges, then "I J %.14e" triplets
    from hypre_tpu.io import read_any_matrix, read_ij_ascii, write_ij_ascii
    from hypre_tpu.seq.csr import HostCSR

    rng = np.random.default_rng(3)
    dense = np.where(rng.random((7, 7)) < 0.4, rng.standard_normal((7, 7)), 0.0)
    r, c = np.nonzero(dense)
    A = HostCSR.from_coo(r, c, dense[r, c], (7, 7))
    p = tmp_path / "mat.IJ.out.00000"
    write_ij_ascii(str(p), A, base=1)
    B = read_ij_ascii(str(p))
    np.testing.assert_allclose(B.to_dense(), dense, rtol=1e-13)
    # content dispatch picks the IJ parser (no MatrixMarket header)
    C = read_any_matrix(str(p))
    np.testing.assert_allclose(C.to_dense(), dense, rtol=1e-13)


def test_umbrella_api_surface():
    """hypre's single-include umbrella (HYPRE.h): every solver family is
    reachable from the package root (lazy PEP 562 exports)."""
    import hypre_tpu

    for name in (
        "IJMatrix", "IJVector", "pcg", "gmres", "bicgstab", "BoomerAMG",
        "SmoothedAggAMG", "PFMG", "SMG", "SparseMSG", "StructHybrid",
        "SStructGrid", "SplitSolver", "SysPFMG", "FAC", "Maxwell", "FSAI",
        "ParaSails", "ILU", "ILUT", "Euclid", "PILUT", "ParILU", "Schwarz",
        "PolyPrecond", "FEISystem",
    ):
        assert getattr(hypre_tpu, name) is not None, name
    assert "BoomerAMG" in dir(hypre_tpu)
