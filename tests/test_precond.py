"""Preconditioner family tests (FSAI, ParaSails, ILU, Schwarz) —
each must (a) be a sane linear operator and (b) cut Krylov iteration counts
vs diagonal scaling (the TEST_ij solver-id 8/18/31/43/80/12 coverage)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hypre_tpu import laplacian_2d_5pt
from hypre_tpu.krylov import gmres, pcg
from hypre_tpu.precond import FSAI, ILU, ParaSails, Schwarz
from hypre_tpu.seq.ell import ell_from_dense, ell_spmv, ell_to_csr


def _iters(A, M, rtol=1e-8, solver=pcg):
    b = jnp.ones(A.n_rows, A.dtype)
    op = lambda v: ell_spmv(A, v)
    x, info = solver(op, b, M=M, rtol=rtol, maxiter=2000)
    assert bool(info.converged), f"{info}"
    r = b - op(x)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < rtol * 100
    return int(info.iterations)


@pytest.fixture(scope="module")
def lap():
    return laplacian_2d_5pt(24, 24)


@pytest.fixture(scope="module")
def base_iters(lap):
    dinv = 1.0 / lap.diagonal()
    return _iters(lap, lambda r: dinv * r)


def test_fsai_pcg(lap, base_iters):
    it = _iters(lap, FSAI().setup(lap).precond())
    assert it < base_iters


def test_fsai_factor_is_triangular_inverseish(lap):
    G = FSAI().setup(lap).G
    csr = ell_to_csr(G)
    rows = np.repeat(np.arange(csr.n_rows), csr.row_nnz())
    assert (csr.indices <= rows).all(), "G must be lower triangular"
    # G A G^T should be near identity on the diagonal
    Ad = ell_to_csr(lap).to_dense()
    Gd = csr.to_dense()
    D = Gd @ Ad @ Gd.T
    np.testing.assert_allclose(np.diag(D), 1.0, rtol=1e-10)


def test_parasails_pcg(lap, base_iters):
    it = _iters(lap, ParaSails().setup(lap).precond())
    assert it < base_iters


def test_parasails_minimizes_frobenius_residual():
    """The SAI rows minimize ||e_i - m_i A|| over the pattern, so the result
    must beat diagonal scaling in ||I - M A||_F (the quantity ParaSails
    optimizes) — including for nonsymmetric A."""
    rng = np.random.default_rng(0)
    n = 64
    Md = rng.standard_normal((n, n)) * 0.2
    Md += np.diag(np.abs(Md).sum(axis=1) + 1.0)
    A = ell_from_dense(Md)
    M = ell_to_csr(ParaSails().setup(A).M).to_dense()
    eye = np.eye(n)
    sai_res = np.linalg.norm(eye - M @ Md)
    jac_res = np.linalg.norm(eye - np.diag(1.0 / np.diag(Md)) @ Md)
    assert sai_res < jac_res
    it = _iters(A, ParaSails().setup(A).precond(), solver=gmres)
    assert it <= 20


def test_ilu_pcg(lap, base_iters):
    it = _iters(lap, ILU().setup(lap).precond())
    assert it < base_iters


def test_ilu_factorization_accuracy(lap):
    """Chow-Patel sweeps must converge to the exact ILU(0) factors (for the
    Laplacian, whose pattern makes ILU(0) well defined)."""
    ilu = ILU(factor_sweeps=30).setup(lap)
    Ld = ell_to_csr(ilu.L).to_dense() + np.eye(lap.n_rows)
    Ud = ell_to_csr(ilu.U).to_dense() + np.diag(1.0 / np.asarray(ilu.dinv))
    prod = Ld @ Ud
    Ad = ell_to_csr(lap).to_dense()
    # on the pattern of A the product must match A
    mask = Ad != 0
    np.testing.assert_allclose(prod[mask], Ad[mask], atol=1e-8)


def test_schwarz_pcg(lap, base_iters):
    it = _iters(lap, Schwarz(block_size=24).setup(lap).precond())
    assert it < base_iters


def test_schwarz_overlap_ras_gmres(lap):
    """RAS weighting with overlap must beat zero-overlap block Jacobi under
    GMRES (the setting RAS is designed for; it is nonsymmetric, so GMRES)."""
    it0 = _iters(
        lap, Schwarz(block_size=24).setup(lap).precond(), solver=gmres
    )
    it1 = _iters(
        lap,
        Schwarz(block_size=24, overlap=8, weighting="ras").setup(lap).precond(),
        solver=gmres,
    )
    assert it1 < it0


def test_schwarz_overlap_additive_pcg_converges(lap):
    # plain additive overlap stays symmetric — PCG must still converge
    it = _iters(lap, Schwarz(block_size=24, overlap=8).setup(lap).precond())
    assert it < 200


def test_ilu_fill_level_one_converges(lap):
    """ILU(1): grown pattern stays a valid preconditioner. (With the
    fine-grained fixed-point factorization, more fill only pays once the
    sweep count grows with it — hypre's exact factorization differs here.)"""
    it1 = _iters(lap, ILU(fill_level=1).setup(lap).precond())
    assert it1 <= 60


def test_bsr_roundtrip_and_block_jacobi():
    import numpy as np
    from hypre_tpu.seq.bsr import BsrMatrix, ell_to_bsr
    from hypre_tpu.seq.ell import ell_from_dense

    rng = np.random.default_rng(0)
    nb, bs = 12, 3
    n = nb * bs
    M = np.kron((rng.random((nb, nb)) < 0.3) * 1.0, np.ones((bs, bs)))
    M *= rng.standard_normal((n, n))
    M += np.diag(np.abs(M).sum(1) + 1.0)
    A = ell_from_dense(M)
    B = ell_to_bsr(A, bs)
    x = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(np.asarray(B.mv(x)), M @ np.asarray(x), rtol=1e-10)
    # scalar round-trip
    from hypre_tpu.seq.ell import ell_spmv

    np.testing.assert_allclose(
        np.asarray(ell_spmv(B.to_ell(), x)), M @ np.asarray(x), rtol=1e-10
    )
    # block-Jacobi beats scalar Jacobi on block-coupled systems
    it_blk = _iters(A, B.block_jacobi_precond(), solver=gmres)
    dinv = 1.0 / A.diagonal()
    it_pt = _iters(A, lambda r: dinv * r, solver=gmres)
    assert it_blk <= it_pt


def test_ilut_pcg(lap, base_iters):
    from hypre_tpu.precond import ILUT

    # tau-only and dual-threshold ILUT must both beat diagonal scaling;
    # fill (grown pattern) should beat same-tolerance ILU(0)-pattern ILUT
    it_fill = _iters(lap, ILUT(drop_tol=1e-2, max_row_nnz=8).setup(lap).precond())
    it_f0 = _iters(lap, ILUT(drop_tol=1e-2, fill_level=0).setup(lap).precond())
    assert it_fill < base_iters
    assert it_f0 < base_iters
    assert it_fill <= it_f0


def test_ilut_respects_row_cap(lap):
    from hypre_tpu.precond import ILUT

    M = ILUT(drop_tol=0.0, max_row_nnz=2).setup(lap)
    l_nnz = jnp.sum(M.L.cols >= 0, axis=1)
    rows = jnp.arange(M.U.cols.shape[0])[:, None]
    u_off_nnz = jnp.sum((M.U.cols >= 0) & (M.U.cols != rows), axis=1)
    assert int(jnp.max(l_nnz)) <= 3      # cap + threshold-tie tolerance
    assert int(jnp.max(u_off_nnz)) <= 3


@pytest.mark.slow
def test_euclid_pcg(lap, base_iters):
    from hypre_tpu.precond import Euclid

    it = _iters(lap, Euclid(level=1).setup(lap).precond())
    assert it < base_iters
    # block-Jacobi mode stays a valid (weaker) preconditioner
    it_bj = _iters(lap, Euclid(level=0, bj=4, row_scale=True).setup(lap).precond())
    assert it_bj < 2000


def test_pilut_pcg(lap, base_iters):
    from hypre_tpu.precond import PILUT

    it = _iters(lap, PILUT(factor_row_size=8, drop_tolerance=1e-3).setup(lap).precond())
    assert it < base_iters


def test_fsai_adaptive_beats_static_on_anisotropic():
    # VERDICT r1 #8 done-bar: adaptive Kaporin pattern growth
    # (par_fsai_setup.c:117-136) beats the static level-0 pattern on an
    # anisotropic operator
    from hypre_tpu.problems.laplacian import stencil_to_ell

    # strongly anisotropic 2-D 5-pt: eps*u_xx + u_yy
    eps = 0.01
    nx = ny = 24
    offsets = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)]
    coeffs = [2 * (1 + eps), -1.0, -1.0, -eps, -eps]
    A = stencil_to_ell((nx, ny), offsets, coeffs)
    it_static = _iters(A, FSAI().setup(A).precond(), rtol=1e-6)
    it_adapt = _iters(
        A,
        FSAI(algo_type="adaptive", max_steps=3, max_step_size=4)
        .setup(A).precond(),
        rtol=1e-6,
    )
    assert it_adapt < it_static, (it_adapt, it_static)


def test_parasails_power_pattern_beats_v1(lap):
    it_v1 = _iters(lap, ParaSails().setup(lap).precond(), rtol=1e-6)
    it_v2 = _iters(
        lap,
        ParaSails(thresh=0.05, nlevels=1, filter=0.01).setup(lap).precond(),
        rtol=1e-6,
    )
    assert it_v2 < it_v1, (it_v2, it_v1)


def test_ilu_schur_gmres(lap):
    # hypre ilu_type 10: ILU on the interior blocks, GMRES on the
    # interface Schur complement (par_ilu_setup.c:346-527). Must converge
    # in similar-or-fewer outer iterations than plain ILU(0)
    from hypre_tpu.krylov import flexgmres
    from hypre_tpu.precond.ilu_schur import ILUSchurGMRES

    from hypre_tpu.precond.ilu_schur import _masked_matrix

    # the honest baseline at the same parallelism: block-Jacobi ILU
    # (factor each block independently, drop all cross-block couplings)
    n = lap.n_rows
    nparts = 2
    block = -(-n // nparts)
    owner = jnp.arange(n) // block
    import jax.numpy as _j

    bj_masks = _masked_matrix(
        lap,
        _j.ones(n, bool),
        _j.ones(n, bool),
        identity_rest=False,
    )
    # mask cross-block entries
    col_owner = _j.where(lap.cols >= 0, _j.maximum(lap.cols, 0) // block, -1)
    keep = (lap.cols >= 0) & (col_owner == owner[:, None])
    from hypre_tpu.seq.ell import EllMatrix

    Abj = EllMatrix(
        vals=_j.where(keep, lap.vals, 0.0),
        cols=_j.where(keep, lap.cols, -1),
        n_cols=lap.n_cols,
    )
    # the Schur preconditioner is variable (inner GMRES) — pair it with
    # FlexGMRES outer, as hypre does for its ILU-GMRES types
    it_bj = _iters(
        lap, ILU().setup(Abj).precond(), rtol=1e-6, solver=flexgmres
    )
    it_schur = _iters(
        lap,
        ILUSchurGMRES(nparts=nparts, schur_max_iter=8).setup(lap).precond(),
        rtol=1e-6, solver=flexgmres,
    )
    # the Schur interface solve recouples the blocks: strictly better than
    # block-Jacobi ILU at the same decomposition
    assert it_schur < it_bj, (it_schur, it_bj)
    # the interface set is the block boundary, nonempty and a minority
    sch = ILUSchurGMRES(nparts=nparts).setup(lap)
    frac = float(jnp.mean((~sch.interior).astype(jnp.float32)))
    assert 0.0 < frac < 0.5


def test_euclid_smoke_fast():
    # fast-tier Euclid coverage: setup + a few iterations on a tiny grid
    # (the full golden is slow-tier — level-1 pattern growth recompiles the
    # Chow-Patel scans for a new ELL width)
    from hypre_tpu.precond import Euclid

    A = laplacian_2d_5pt(10, 10)
    M = Euclid(level=0).setup(A).precond()
    b = jnp.ones(A.n_rows, A.dtype)
    x, info = pcg(lambda v: ell_spmv(A, v), b, M=M, rtol=1e-6, maxiter=60)
    assert bool(info.converged)


def test_ilu_schur_nsh(lap):
    # hypre ilu_type 20/21: NSH approximate inverse of the interface Schur
    # complement (par_ilu_setup.c NSH branch). The NSH preconditioner is a
    # FIXED linear operator (unlike the inner-GMRES variant) so plain PCG
    # can host it; iterations must land in the ILU-Schur class.
    from hypre_tpu.precond import ILUSchurNSH

    sch = ILUSchurNSH(nparts=2, nsh_iters=12).setup(lap)
    # NSH converged: ||I - S X|| small on the interface block
    m = sch.X.shape[0]
    assert m > 0
    it = _iters(lap, sch.precond(), rtol=1e-6, solver=gmres)
    it_diag = _iters(
        lap, (lambda d: (lambda r: d * r))(1.0 / lap.diagonal()),
        rtol=1e-6, solver=gmres,
    )
    assert it < it_diag / 2, (it, it_diag)


def test_poly_precond(lap, base_iters):
    # HYPRE_LSI_poly.c analogue: least-squares polynomial preconditioner.
    # Degree-6 p(A) must beat diagonal scaling; higher degree no worse.
    from hypre_tpu.precond import PolyPrecond

    p6 = PolyPrecond(order=6).setup(lap)
    it6 = _iters(lap, p6.precond())
    assert it6 < base_iters / 2, (it6, base_iters)
    p2 = PolyPrecond(order=2).setup(lap)
    it2 = _iters(lap, p2.precond())
    assert it6 <= it2


def _make_saddle(n=16, eps=1e-2, mass=1.0):
    # velocity block = Laplacian + mass (the mass shift keeps lambda_min
    # bounded, which classic Uzawa requires for its diag-based Schur
    # scaling to be spectrally equivalent — a time-stepping Stokes block)
    from hypre_tpu.problems.laplacian import laplacian_2d_5pt, stencil_to_ell
    from hypre_tpu.precond.saddle import SaddleSystem
    from hypre_tpu.seq.spgemm import ell_add, ell_transpose

    L = laplacian_2d_5pt(n, n)
    I = stencil_to_ell((n, n), [(0, 0)], [mass], dtype=L.dtype)
    A = ell_add(1.0, L, 1.0, I) if mass else L
    B = stencil_to_ell((n, n), [(0, 0), (1, 0)], [1.0, -1.0], dtype=L.dtype)
    C = stencil_to_ell((n, n), [(0, 0)], [eps], dtype=L.dtype)
    return SaddleSystem(A=A, B=B, Bt=ell_transpose(B), C=C)


def test_uzawa_stokes_like():
    # HYPRE_LSI_UZAWA.cxx: stationary Uzawa with AMG A11 sub-solves and a
    # diag(A)-Schur pressure update must converge on a stabilized
    # Stokes-like system
    from hypre_tpu.precond.saddle import Uzawa

    sys = _make_saddle()
    f = jnp.ones(sys.n_u, sys.A.dtype)
    g = jnp.zeros(sys.n_p, sys.A.dtype)
    uz = Uzawa(omega=0.5, rtol=1e-7, maxiter=200).setup(sys)
    u, p, info = uz.solve(f, g)
    assert bool(info.converged), (int(info.iterations), float(info.relative_residual))
    r = jnp.concatenate([f, g]) - sys.mv(jnp.concatenate([u, p]))
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(jnp.concatenate([f, g])))
    assert rel < 1e-5, rel


def test_block_precond_flexgmres():
    # HYPRE_LSI_blkprec.cxx: block-triangular preconditioning inside
    # FlexGMRES; must beat the unpreconditioned iteration count clearly
    from hypre_tpu.krylov import flexgmres
    from hypre_tpu.precond.saddle import BlockPrecond

    sys = _make_saddle()
    b = jnp.concatenate([
        jnp.ones(sys.n_u, sys.A.dtype), jnp.zeros(sys.n_p, sys.A.dtype)
    ])
    bp = BlockPrecond(mode="triangular").setup(sys)
    x, info = flexgmres(sys.mv, b, M=bp.precond(), rtol=1e-8, maxiter=200)
    assert bool(info.converged)
    _, info0 = flexgmres(sys.mv, b, rtol=1e-8, maxiter=200)
    assert int(info.iterations) < int(info0.iterations) // 2, (
        int(info.iterations), int(info0.iterations),
    )
    r = b - sys.mv(x)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-6


def test_schur_reduce_solve():
    # HYPRE_LSI_schur.cxx: reduced pressure-Schur PCG + velocity back-solve
    from hypre_tpu.precond.saddle import BlockPrecond

    sys = _make_saddle()
    f = jnp.ones(sys.n_u, sys.A.dtype)
    g = jnp.zeros(sys.n_p, sys.A.dtype)
    bp = BlockPrecond(inner_cycles=6).setup(sys)
    u, p, info = bp.solve_reduced(f, g, rtol=1e-8)
    r = jnp.concatenate([f, g]) - sys.mv(jnp.concatenate([u, p]))
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(jnp.concatenate([f, g])))
    assert rel < 1e-4, rel


def test_ic_pcg(lap, base_iters):
    # IC(0) fixed point (HYPRE_LSI_ddict.c's IC core, here on the full
    # pattern): must beat diagonal scaling and be SPD (PCG-hosted)
    from hypre_tpu.precond.ic import IC

    it = _iters(lap, IC().setup(lap).precond())
    assert it < base_iters, (it, base_iters)


def test_ic_factorization_accuracy(lap):
    # with enough sweeps L L^T must reproduce A on A's pattern
    from hypre_tpu.precond.ic import IC

    ic = IC(factor_sweeps=30).setup(lap)
    n = lap.n_rows
    Ld = ell_to_csr(ic.L).to_dense() + np.diag(1.0 / np.asarray(ic.dinv))
    prod = Ld @ Ld.T
    Ad = ell_to_csr(lap).to_dense()
    mask = Ad != 0
    np.testing.assert_allclose(prod[mask], Ad[mask], atol=1e-8)


def test_ddict_ddilut_converge(lap, base_iters):
    from hypre_tpu.precond.ic import DDICT, DDILUT

    it_ict = _iters(lap, DDICT(num_subdomains=2, overlap=3).setup(lap).precond())
    it_ilut = _iters(
        lap, DDILUT(num_subdomains=2, overlap=3).setup(lap).precond()
    )
    assert it_ict < base_iters
    assert it_ilut < base_iters
    # overlap must help vs none (the DD in DDICT)
    it_no = _iters(lap, DDICT(num_subdomains=2, overlap=0).setup(lap).precond())
    assert it_ict <= it_no
