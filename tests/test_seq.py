"""seq layer tests: ELL format, SpMV, SpGEMM, transpose, add, filter.

Oracle is the host numpy CSR (``hypre_tpu/seq/csr.py``); random sparse
matrices plus the stencil generators play the role of hypre's seq_mv checks.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hypre_tpu.seq.csr import HostCSR
from hypre_tpu.seq.ell import (
    EllMatrix, csr_to_ell, ell_to_csr, ell_spmv, ell_spmv_t, ell_from_dense,
)
from hypre_tpu.seq.spgemm import (
    ell_spgemm, ell_spgemm_raw, ell_transpose, ell_add, ell_filter,
    ell_remap_cols, stencil_spgemm, stencil_transpose,
)
from hypre_tpu.problems.laplacian import (
    laplacian_2d_5pt, laplacian_2d_9pt, laplacian_3d_7pt, laplacian_3d_27pt,
)


def random_csr(n, m, density, rng, dtype=np.float64):
    nnz = max(1, int(n * m * density))
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, m, nnz)
    vals = rng.standard_normal(nnz).astype(dtype)
    return HostCSR.from_coo(rows, cols, vals, (n, m))


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class TestEllFormat:
    def test_csr_ell_roundtrip(self, rng):
        A = random_csr(50, 40, 0.1, rng)
        E = csr_to_ell(A)
        B = ell_to_csr(E)
        np.testing.assert_allclose(A.to_dense(), B.to_dense(), rtol=1e-14)

    def test_spmv_matches_oracle(self, rng):
        A = random_csr(64, 48, 0.15, rng)
        E = csr_to_ell(A)
        x = rng.standard_normal(48)
        np.testing.assert_allclose(
            np.asarray(ell_spmv(E, jnp.asarray(x))), A.matvec(x), rtol=1e-12
        )

    def test_spmv_transpose(self, rng):
        A = random_csr(32, 48, 0.2, rng)
        E = csr_to_ell(A)
        x = rng.standard_normal(32)
        np.testing.assert_allclose(
            np.asarray(ell_spmv_t(E, jnp.asarray(x))),
            A.transpose().matvec(x),
            rtol=1e-12,
        )

    def test_diagonal(self, rng):
        A = random_csr(40, 40, 0.2, rng)
        E = csr_to_ell(A)
        np.testing.assert_allclose(np.asarray(E.diagonal()), A.diagonal(), rtol=1e-12)

    def test_laplacian_structure(self):
        A = laplacian_2d_5pt(4, 4)
        D = np.asarray(ell_to_csr(A).to_dense())
        assert D.shape == (16, 16)
        np.testing.assert_allclose(np.diag(D), 4.0)
        np.testing.assert_allclose(D, D.T)  # symmetric
        # interior row sums are 0, boundary rows positive (eliminated BCs)
        assert (D.sum(axis=1) >= -1e-14).all()

    def test_laplacian_3d_spd(self):
        A = laplacian_3d_7pt(4, 4, 4)
        D = np.asarray(ell_to_csr(A).to_dense())
        w = np.linalg.eigvalsh(D)
        assert w.min() > 0


class TestSpGEMM:
    def test_spgemm_matches_oracle(self, rng):
        A = random_csr(30, 25, 0.15, rng)
        B = random_csr(25, 35, 0.15, rng)
        C = ell_spgemm(csr_to_ell(A), csr_to_ell(B))
        np.testing.assert_allclose(
            ell_to_csr(C).to_dense(), A.matmat(B).to_dense(), rtol=1e-12, atol=1e-13
        )

    def test_spgemm_capacity_retry(self, rng):
        # force an undersized initial out_k; wrapper must retry and be exact
        A = random_csr(20, 20, 0.3, rng)
        B = random_csr(20, 20, 0.3, rng)
        C = ell_spgemm(csr_to_ell(A), csr_to_ell(B), out_k=1)
        np.testing.assert_allclose(
            ell_to_csr(C).to_dense(), A.matmat(B).to_dense(), rtol=1e-12, atol=1e-13
        )

    @pytest.mark.parametrize("build,shape", [
        (laplacian_2d_5pt, (7, 5)),
        (laplacian_2d_9pt, (6, 7)),
        (laplacian_3d_7pt, (5, 4, 3)),
        (laplacian_3d_27pt, (4, 5, 3)),
    ])
    def test_stencil_spgemm_matches_dense(self, build, shape, rng):
        # roll-composition product vs the dense oracle, boundaries included;
        # randomized values break the constant-coefficient symmetry
        A = build(*shape)
        A = EllMatrix(
            vals=jnp.asarray(
                np.where(np.asarray(A.cols) >= 0,
                         rng.standard_normal(A.vals.shape), 0),
                A.vals.dtype),
            cols=A.cols, n_cols=A.n_cols, shifts=A.shifts)
        C = stencil_spgemm(A, A)
        assert C.shifts is not None
        Ad = np.asarray(ell_to_csr(A).to_dense())
        np.testing.assert_allclose(
            np.asarray(ell_to_csr(C).to_dense()), Ad @ Ad,
            rtol=1e-5, atol=1e-5)
        # structural exactness: the mask must match the offsets' validity
        T = stencil_transpose(A)
        np.testing.assert_allclose(
            np.asarray(ell_to_csr(T).to_dense()), Ad.T, rtol=1e-6, atol=0)
        # mixed-stencil product (different offset sets)
        B = build(*shape)
        C2 = stencil_spgemm(T, B)
        np.testing.assert_allclose(
            np.asarray(ell_to_csr(C2).to_dense()),
            Ad.T @ np.asarray(ell_to_csr(B).to_dense()),
            rtol=1e-5, atol=1e-5)

    def test_ell_spgemm_routes_stencil(self):
        # the dispatcher must return a shift-structured product for
        # stencil operands and agree with the slab path
        A = laplacian_3d_27pt(4, 4, 4)
        C = ell_spgemm(A, A)
        assert C.shifts is not None
        C_raw, _ = ell_spgemm_raw(A, A, 130)
        np.testing.assert_allclose(
            np.asarray(ell_to_csr(C).to_dense()),
            np.asarray(ell_to_csr(C_raw).to_dense()), rtol=1e-5, atol=1e-5)

    def test_rap_laplacian(self):
        # Galerkin sanity: P = aggregation of 1D pairs, RAP stays SPD
        A = laplacian_2d_5pt(8, 8)
        n = 64
        Pd = np.zeros((n, n // 2))
        for i in range(n):
            Pd[i, i // 2] = 1.0
        P = ell_from_dense(Pd)
        Pt = ell_transpose(P)
        AP = ell_spgemm(A, P)
        RAP = ell_spgemm(Pt, AP)
        D = np.asarray(ell_to_csr(RAP).to_dense())
        ref = Pd.T @ np.asarray(ell_to_csr(A).to_dense()) @ Pd
        np.testing.assert_allclose(D, ref, rtol=1e-12, atol=1e-13)

    def test_transpose_matches_oracle(self, rng):
        A = random_csr(23, 37, 0.2, rng)
        T = ell_transpose(csr_to_ell(A))
        np.testing.assert_allclose(
            ell_to_csr(T).to_dense(), A.transpose().to_dense(), rtol=1e-12
        )

    def test_add(self, rng):
        A = random_csr(20, 30, 0.2, rng)
        B = random_csr(20, 30, 0.2, rng)
        C = ell_add(2.0, csr_to_ell(A), -0.5, csr_to_ell(B))
        np.testing.assert_allclose(
            ell_to_csr(C).to_dense(),
            2.0 * A.to_dense() - 0.5 * B.to_dense(),
            rtol=1e-12, atol=1e-14,
        )

    def test_filter_offdiag(self, rng):
        A = random_csr(25, 25, 0.25, rng)
        E = csr_to_ell(A)
        F = ell_filter(E, E.offdiag_mask())
        D = np.asarray(ell_to_csr(F).to_dense())
        ref = A.to_dense().copy()
        np.fill_diagonal(ref, 0)
        np.testing.assert_allclose(D, ref, rtol=1e-12)

    def test_remap_cols(self, rng):
        A = random_csr(10, 10, 0.3, rng)
        E = csr_to_ell(A)
        # drop odd columns, renumber evens
        col_map = jnp.asarray([i // 2 if i % 2 == 0 else -1 for i in range(10)], jnp.int32)
        R = ell_remap_cols(E, col_map, 5)
        ref = A.to_dense()[:, ::2]
        np.testing.assert_allclose(ell_to_csr(R).to_dense(), ref, rtol=1e-12)
