"""SuiteSparse-class unstructured problems through the IJ interface.

BASELINE.json config 5: "SuiteSparse unstructured matrices (e.g. thermal2,
G3_circuit) via IJ interface: BSR blocking, AMG-GMRES, validated against
hypre iteration counts".  No network egress -> the generators in
``hypre_tpu.problems.unstructured`` produce the same matrix classes locally
(FEM thermal stiffness on a Delaunay mesh; irregular circuit conductance
Laplacian).  Golden iteration counts pin AMG quality: hypre's BoomerAMG
solves thermal-class FEM problems in O(10-20) PCG/GMRES iterations at 1e-6
(reference ``src/test/TEST_ij/solvers.saved`` scale); regressions in
strength/coarsening/interp on irregular patterns show up here first.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hypre_tpu.amg import BoomerAMG
from hypre_tpu.krylov import gmres, pcg
from hypre_tpu.problems.unstructured import (
    circuit_laplacian,
    fem_block_2d,
    fem_stiffness_2d,
)
from hypre_tpu.seq.ell import ell_spmv


def test_fem_unstructured_spd_and_row_stats():
    ij, pts = fem_stiffness_2d(m=12, seed=0)
    csr = ij.get_csr()
    n = csr.shape[0]
    assert pts.shape == (n, 2)
    # FEM stiffness: symmetric, zero row sums in the mesh interior would
    # hold without Dirichlet elimination; here: SPD via eigvalsh
    d = np.zeros((n, n))
    r = np.repeat(np.arange(n), np.diff(csr.indptr))
    d[r, csr.indices] = csr.data
    assert np.allclose(d, d.T, atol=1e-12)
    w = np.linalg.eigvalsh(d)
    assert w.min() > 0
    # unstructured pattern: row lengths vary (a structured stencil would
    # give constant interior row length)
    rl = np.diff(csr.indptr)
    assert rl.min() >= 3 and rl.max() >= 8 and len(set(rl.tolist())) > 4


def test_fem_unstructured_amg_gmres_golden():
    # thermal2-class: material-contrast FEM stiffness, AMG-GMRES at 1e-6.
    ij, _ = fem_stiffness_2d(m=24, seed=0)
    A = ij.get_object()
    amg = BoomerAMG(strength_threshold=0.25, max_coarse_size=40).setup(A)
    b = jnp.asarray(
        np.random.default_rng(1).standard_normal(A.n_rows), A.dtype
    )
    op = lambda v: ell_spmv(A, v)
    x, info = gmres(op, b, M=amg.precond(), rtol=1e-6, maxiter=60)
    assert bool(info.converged)
    r = b - op(x)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-4
    # golden: hypre-class iteration count on an irregular SPD problem
    assert int(info.iterations) <= 20, int(info.iterations)


def test_circuit_amg_pcg_golden():
    # G3_circuit-class: heavy-tailed degrees, grounded diagonal, AMG-PCG.
    ij = circuit_laplacian(n=4000, seed=0)
    A = ij.get_object()
    amg = BoomerAMG(strength_threshold=0.25, max_coarse_size=40).setup(A)
    b = jnp.asarray(
        np.random.default_rng(2).standard_normal(A.n_rows), A.dtype
    )
    op = lambda v: ell_spmv(A, v)
    x, info = pcg(op, b, M=amg.precond(), rtol=1e-6, maxiter=80)
    assert bool(info.converged)
    r = b - op(x)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-4
    assert int(info.iterations) <= 35, int(info.iterations)


@pytest.mark.slow
def test_fem_block_bsr_amg_gmres():
    # BSR blocking on the unstructured problem: 2 dofs/node, nodal/block
    # AMG, GMRES driver (the BASELINE config-5 BSR leg).
    from hypre_tpu.amg.block_amg import BlockAMG
    from hypre_tpu.seq.bsr import ell_to_bsr

    ij, _ = fem_block_2d(m=16, seed=0, coupling=0.1)
    A = ij.get_object()
    Ab = ell_to_bsr(A, 2)
    amg = BlockAMG().setup(Ab)
    b = jnp.asarray(
        np.random.default_rng(3).standard_normal(A.n_rows), A.dtype
    )
    op = lambda v: ell_spmv(A, v)
    x, info = gmres(op, b, M=amg.precond(), rtol=1e-6, maxiter=80)
    assert bool(info.converged)
    r = b - op(x)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-4
    assert int(info.iterations) <= 30, int(info.iterations)
