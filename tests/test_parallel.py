"""Distributed-layer tests on the 8-virtual-device CPU mesh.

The analogue of hypre's <=8-rank mpirun regression runs (runtest.sh): the
same operators, distributed, must produce bitwise-comparable results and the
Krylov solvers must converge identically on sharded arrays.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hypre_tpu.core.partition import RowPartition
from hypre_tpu.krylov import pcg
from hypre_tpu.parallel import (
    ParEllMatrix, make_mesh, par_spmv, par_spmv_t, partition_ell,
)
from hypre_tpu.parallel.par_ell import collect_vector, distribute_vector
from hypre_tpu.problems.laplacian import laplacian_2d_5pt, laplacian_3d_7pt
from hypre_tpu.seq.csr import HostCSR
from hypre_tpu.seq.ell import csr_to_ell, ell_spmv, ell_spmv_t


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def random_ell(n, m, density, seed, k_extra=0):
    rng = np.random.default_rng(seed)
    nnz = max(1, int(n * m * density))
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, m, nnz)
    vals = rng.standard_normal(nnz)
    return csr_to_ell(HostCSR.from_coo(rows, cols, vals, (n, m)))


class TestPartition:
    def test_row_partition_padding(self):
        part = RowPartition(100, 8)
        assert part.n_padded == 104 and part.n_local == 13
        assert part.owner_of(np.array([0, 12, 13, 99])).tolist() == [0, 0, 1, 7]

    def test_par_spmv_matches_seq(self, mesh):
        A = laplacian_2d_5pt(20, 20)  # 400 rows over 8 shards
        Ap = partition_ell(A, mesh)
        rng = np.random.default_rng(3)
        x = rng.standard_normal(400)
        xd = distribute_vector(x, mesh)
        y = collect_vector(par_spmv(Ap, xd), 400)
        y_ref = np.asarray(ell_spmv(A, jnp.asarray(x)))
        np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-13)

    def test_par_spmv_unstructured(self, mesh):
        A = random_ell(97, 97, 0.08, seed=5)  # odd size exercises padding
        Ap = partition_ell(A, mesh)
        rng = np.random.default_rng(4)
        x = rng.standard_normal(97)
        y = collect_vector(par_spmv(Ap, distribute_vector(x, mesh)), 97)
        np.testing.assert_allclose(
            y, np.asarray(ell_spmv(A, jnp.asarray(x))), rtol=1e-12, atol=1e-13
        )

    def test_par_spmv_rectangular(self, mesh):
        A = random_ell(60, 35, 0.1, seed=6)
        Ap = partition_ell(A, mesh)
        rng = np.random.default_rng(7)
        x = rng.standard_normal(35)
        y = collect_vector(par_spmv(Ap, distribute_vector(x, mesh)), 60)
        np.testing.assert_allclose(
            y, np.asarray(ell_spmv(A, jnp.asarray(x))), rtol=1e-12, atol=1e-13
        )

    def test_par_spmv_t_matches_seq(self, mesh):
        A = random_ell(60, 35, 0.1, seed=8)
        Ap = partition_ell(A, mesh)
        rng = np.random.default_rng(9)
        x = rng.standard_normal(60)
        y = collect_vector(par_spmv_t(Ap, distribute_vector(x, mesh)), 35)
        np.testing.assert_allclose(
            y, np.asarray(ell_spmv_t(A, jnp.asarray(x))), rtol=1e-12, atol=1e-13
        )

    def test_par_spmv_jit(self, mesh):
        A = laplacian_2d_5pt(16, 16)
        Ap = partition_ell(A, mesh)
        x = distribute_vector(np.ones(256), mesh)
        f = jax.jit(lambda x: par_spmv(Ap, x))
        np.testing.assert_allclose(
            collect_vector(f(x), 256),
            np.asarray(ell_spmv(A, jnp.ones(256))),
            rtol=1e-12,
        )


class TestDistributedSolve:
    def test_pcg_on_distributed_operator(self, mesh):
        """End-to-end: 8-shard halo-exchange SpMV inside jitted PCG."""
        A = laplacian_3d_7pt(8, 8, 8)  # 512 rows
        Ap = partition_ell(A, mesh)
        b = distribute_vector(np.ones(512), mesh)
        x, info = jax.jit(lambda b: pcg(lambda v: par_spmv(Ap, v), b, rtol=1e-10))(b)
        assert bool(info.converged)
        # compare with the sequential solve
        x_seq, info_seq = pcg(lambda v: ell_spmv(A, v), jnp.ones(512), rtol=1e-10)
        assert int(info.iterations) == int(info_seq.iterations)
        np.testing.assert_allclose(
            collect_vector(x, 512), np.asarray(x_seq), rtol=1e-6, atol=1e-8
        )

    def test_padding_rows_stay_zero(self, mesh):
        # 100 rows over 8 shards -> 4 padding rows; they must never pollute
        A = random_ell(100, 100, 0.08, seed=11)
        Ap = partition_ell(A, mesh)
        x = distribute_vector(np.ones(100), mesh)
        y = np.asarray(par_spmv(Ap, x))
        np.testing.assert_allclose(y[100:], 0.0)


def test_amgdd_composite_cycles():
    """AMG-DD (par_amgdd*.c): per-device composite grids, one residual
    exchange per cycle, communication-free local FAC cycles. Converges with
    a modest iteration penalty vs global AMG (the latency trade)."""
    import numpy as np

    from hypre_tpu import laplacian_2d_5pt
    from hypre_tpu.parallel.amgdd import AMGDD
    from hypre_tpu.seq.ell import ell_spmv

    A = laplacian_2d_5pt(24, 24)
    dd = AMGDD(padding=2).setup(A, num_devices=4)
    b = jnp.ones(A.n_rows, A.dtype)
    x, info = dd.solve(b, rtol=1e-8, maxiter=150)
    assert bool(info.converged), f"{info}"
    r = b - ell_spmv(A, x)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-7
    # composite-grid quality: cycles stay within ~5x of the global hierarchy
    from hypre_tpu.amg import BoomerAMG

    amg = BoomerAMG(max_coarse_size=64).setup(A, optimize=False)
    x2, i2 = amg.solve(b, rtol=1e-8)
    assert int(info.iterations) <= 5 * int(i2.iterations)


def test_amgdd_as_gmres_preconditioner():
    from hypre_tpu import laplacian_2d_5pt
    from hypre_tpu.krylov import gmres
    from hypre_tpu.parallel.amgdd import AMGDD
    from hypre_tpu.seq.ell import ell_spmv

    A = laplacian_2d_5pt(24, 24)
    dd = AMGDD(padding=2).setup(A, num_devices=4)
    b = jnp.ones(A.n_rows, A.dtype)
    x, info = gmres(lambda v: ell_spmv(A, v), b, M=dd.precond(), rtol=1e-8)
    assert bool(info.converged)
    assert int(info.iterations) <= 25


def test_halo_schedule_is_neighbor_topology():
    # CommPkg property (par_csr_communication.h:51-75): exchange volume is
    # O(boundary), not O(P^2 * max-tile). 1-D partitioned 3-D 7-pt
    # Laplacian: each shard needs exactly one plane (nx*ny) per side.
    from hypre_tpu.core.partition import RowPartition
    from hypre_tpu.parallel.halo import build_halo_schedule

    nx = ny = 8
    nz = 16
    A = laplacian_3d_7pt(nz, ny, nx)  # z-major: planes are contiguous
    nshards = 8
    part = RowPartition(A.n_rows, nshards)
    cols = np.asarray(A.cols)
    offd_cols_per_shard = []
    for p in range(nshards):
        lo, hi = part.row_range(p)
        block = cols[lo:hi]
        mask = (block >= 0) & ((block // part.n_local) != p)
        offd_cols_per_shard.append(np.unique(block[mask]))
    sched = build_halo_schedule(offd_cols_per_shard, part)
    plane = nx * ny
    # two ring offsets (up/down neighbors), one plane each
    assert set(sched.offsets) == {1, nshards - 1}
    assert sched.sizes == (plane, plane)
    assert sched.exchange_bytes(4) == nshards * 2 * plane * 4
    # the dense all_to_all this replaced shipped P*P*max_tile
    dense_bytes = nshards * nshards * plane * 4
    assert sched.exchange_bytes(4) * 4 == dense_bytes


def test_neighbor_halo_matvec_matches_dense():
    # numerics unchanged by the ppermute schedule (vs a host reference)
    A = laplacian_3d_7pt(6, 6, 8)
    mesh = make_mesh(8)
    Ap = partition_ell(A, mesh)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.n_cols)
    xd = distribute_vector(x, mesh)
    y = collect_vector(par_spmv(Ap, xd), A.n_rows)
    y_ref = np.asarray(ell_spmv(A, jnp.asarray(x, A.dtype)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-6)
    yt = collect_vector(par_spmv_t(Ap, xd[: Ap.vec_len_rows]), A.n_cols)
    yt_ref = np.asarray(ell_spmv_t(A, jnp.asarray(x[: A.n_rows], A.dtype)))
    np.testing.assert_allclose(yt, yt_ref, rtol=1e-5, atol=1e-6)
