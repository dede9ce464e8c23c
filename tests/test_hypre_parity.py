"""Cross-implementation convergence parity against hypre's published
TEST_ij goldens (``src/test/TEST_ij/solvers.saved``, the BASELINE.md
hardware-independent table).

The jobs run hypre's DEFAULT ij problem — the 10x10x10 7-pt Laplacian with
a random rhs (``solvers.jobs:33-38``) at tol 1e-8. Diagonally-scaled Krylov
counts are knob-free, so they compare directly across implementations (up
to the rhs sample; hypre's -rhsrand draws differ from ours):

  DS-PCG        hypre 41 (solvers.saved:5-7)   -> ours 41, EXACT match
  DS-GMRES k=5  hypre 93 (solvers.saved:13-15) -> ours 93, EXACT match
  DS-CGNR       hypre 196 (solvers.saved:19-21)-> ours 129: hypre's
                cgnr.c seeds the first search direction with p0 = r
                (cgnr.c:328 "p = r") instead of the textbook CGLS
                p0 = A^T r; ours uses the textbook start, same <r,r>
                stopping rule (cgnr.c:386), and converges FASTER (129).
  AMG-PCG       hypre 7 (solvers.saved:1-3, Falgout/classical-interp/
                hybrid-GS CPU defaults) -> ours 6 with the TPU defaults
                (PMIS/ext+i/Chebyshev) — same convergence class.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hypre_tpu.amg import BoomerAMG
from hypre_tpu.krylov import cgnr, cogmres, flexgmres, gmres, lgmres, pcg
from hypre_tpu.problems.laplacian import laplacian_3d_7pt
from hypre_tpu.seq.ell import ell_spmv
from hypre_tpu.seq.spgemm import ell_transpose


@pytest.fixture(scope="module")
def default_problem():
    A = laplacian_3d_7pt(10, 10, 10)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(1000))
    return A, b


def test_ds_pcg_matches_hypre_golden(default_problem):
    A, b = default_problem
    dinv = 1.0 / A.diagonal()
    _, info = pcg(lambda v: ell_spmv(A, v), b, M=lambda r: dinv * r,
                  rtol=1e-8, maxiter=1000)
    assert int(info.iterations) == 41  # hypre: 41


def test_ds_gmres_matches_hypre_golden(default_problem):
    A, b = default_problem
    dinv = 1.0 / A.diagonal()
    # hypre ij.c's GMRES default restart is k_dim=5
    _, info = gmres(lambda v: ell_spmv(A, v), b, M=lambda r: dinv * r,
                    rtol=1e-8, k_dim=5, maxiter=1000)
    assert int(info.iterations) == 93  # hypre: 93


def test_ds_cogmres_matches_hypre_golden(default_problem):
    """hypre's DS-COGMRES goldens (solvers.saved:53-76, cases 13-16) are 93
    at every -cgs/-unroll setting, identical to DS-GMRES — reproduced here
    at both single and double orthogonalization passes."""
    A, b = default_problem
    dinv = 1.0 / A.diagonal()
    for cgs in (1, 2):
        _, info = cogmres(lambda v: ell_spmv(A, v), b, M=lambda r: dinv * r,
                          rtol=1e-8, k_dim=5, gs_passes=cgs, maxiter=1000)
        assert int(info.iterations) == 93  # hypre: 93


def test_ds_flexgmres_matches_hypre_golden(default_problem):
    A, b = default_problem
    dinv = 1.0 / A.diagonal()
    _, info = flexgmres(lambda v: ell_spmv(A, v), b, M=lambda r: dinv * r,
                        rtol=1e-8, k_dim=5, maxiter=1000)
    assert int(info.iterations) == 93  # hypre solvers.saved:121: 93


def test_ds_lgmres_not_slower_than_hypre_golden(default_problem):
    """hypre DS-LGMRES golden is 83 (solvers.saved:113) — augmentation
    beats plain restarted GMRES's 93. Our augmentation policy converges
    faster still (65); pin ours and bound by hypre's."""
    A, b = default_problem
    dinv = 1.0 / A.diagonal()
    _, info = lgmres(lambda v: ell_spmv(A, v), b, M=lambda r: dinv * r,
                     rtol=1e-8, k_dim=5, aug_dim=2, maxiter=1000)
    assert int(info.iterations) <= 83
    assert int(info.iterations) == 65


def test_cgnr_not_slower_than_hypre_golden(default_problem):
    A, b = default_problem
    At = ell_transpose(A)
    _, info = cgnr(lambda v: ell_spmv(A, v), lambda v: ell_spmv(At, v), b,
                   rtol=1e-8, maxiter=1000)
    assert bool(info.converged)
    # textbook CGLS start beats hypre's p0=r variant (196); pin ours
    assert int(info.iterations) <= 196
    assert int(info.iterations) == 129


def test_amg_pcg_in_hypre_iteration_class(default_problem):
    A, b = default_problem
    amg = BoomerAMG(max_coarse_size=100).setup(A)
    _, info = pcg(lambda v: ell_spmv(A, v), b, M=amg.precond(), rtol=1e-8)
    assert int(info.iterations) <= 7  # hypre CPU defaults: 7; ours: 6


def test_struct_cg_matches_hypre_golden_to_printed_digits():
    """TEST_struct solvers.saved:23 (np=1 CG on the default 10^3 7-pt
    problem, b = ones, tol 1e-6): hypre prints 20 iterations and final
    relative residual 5.962015e-07. The run is deterministic, so our
    count AND residual match to every printed digit."""
    from hypre_tpu.drivers import struct as struct_driver
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        it, rel = struct_driver.run("-solver 18 -n 10 10 10 -tol 1e-6".split())
    assert it == 20
    assert f"{rel:.6e}" == "5.962015e-07"


def test_struct_mg_pcg_in_hypre_iteration_class():
    """solvers.saved:2,6: SMG-PCG 4 and PFMG-PCG 8 on the default problem;
    ours land within one iteration (5 and 9 — the coarse-operator recovery
    is probing-based, not hypre's hand-differenced RAP kernels)."""
    from hypre_tpu.drivers import struct as struct_driver
    import contextlib, io

    with contextlib.redirect_stdout(io.StringIO()):
        it_smg, _ = struct_driver.run("-solver 10 -n 10 10 10 -tol 1e-6".split())
        it_pfmg, _ = struct_driver.run("-solver 11 -n 10 10 10 -tol 1e-6".split())
    assert it_smg <= 5  # hypre: 4
    assert it_pfmg <= 9  # hypre: 8


def test_smg_anisotropic_golden_smgbase3d():
    """TEST_struct/smgbase3d: ``struct -n 12 12 12 -c 2.0 3.0 40 -solver 0``
    -> 4 iterations, rres 8.97e-07 (smgbase3d.saved:1-3). The plane-solve
    interpolation (smg_setup_interp.c, struct/smg._plane_interp) is what
    makes SMG match this on a strongly anisotropic operator — the
    operator-collapsed weights needed more cycles."""
    from hypre_tpu.drivers import struct as struct_driver

    it, rres = struct_driver.run(
        "-solver 0 -n 12 12 12 -c 2.0 3.0 40 -tol 1e-6".split()
    )
    assert it <= 5  # hypre golden: 4
    assert rres < 1e-6
