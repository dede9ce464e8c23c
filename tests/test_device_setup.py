"""Device setup path (amg/device_setup.py) vs the jax oracle path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypre_tpu.amg.coarsen import coarse_map, pmis
from hypre_tpu.amg.device_setup import (
    ext_plus_i_device, paired_transpose_vals, pmis_device, setup_hierarchy_device,
    spgemm_slab, strength_and_cap, transpose_slab,
)
from hypre_tpu.amg.interp import ext_plus_i_interp, truncate_interp
from hypre_tpu.amg.strength import strength_mask
from hypre_tpu.core.config import PAD_COL
from hypre_tpu.problems.laplacian import laplacian_2d_5pt, laplacian_3d_7pt
from hypre_tpu.seq.ell import EllMatrix, ell_to_csr
from hypre_tpu.seq.spgemm import ell_spgemm, ell_transpose


def _dense(cols, vals, ncols):
    cols, vals = np.asarray(cols), np.asarray(vals)
    d = np.zeros((cols.shape[0], ncols))
    for i in range(cols.shape[0]):
        for c, v in zip(cols[i], vals[i]):
            if c >= 0:
                d[i, c] += v
    return d


@pytest.mark.parametrize("use_shifts", [False, True])
def test_pmis_device_matches_oracle(use_shifts):
    A = laplacian_2d_5pt(12, 11)
    S = strength_mask(A, 0.25)
    cf_ref = np.asarray(pmis(A, S))
    scols = jnp.where(S, A.cols, PAD_COL)
    cf_dev = np.asarray(
        pmis_device(scols, A.n_rows, shifts=A.shifts if use_shifts else None)
    )
    np.testing.assert_array_equal(cf_dev, cf_ref)


def test_extpi_device_matches_oracle_symmetric():
    A = laplacian_2d_5pt(10, 9)
    S = strength_mask(A, 0.25)
    cf = pmis(A, S)
    cmap, n_c = coarse_map(cf)
    n_coarse = int(n_c)
    P_ref = ext_plus_i_interp(A, S, cf, cmap, n_coarse)
    _, scols, svals, _ = strength_and_cap(A, 0.25, s_cap=A.k)
    pc, pv, _ = ext_plus_i_device(A, scols, svals, cf, out_k=24)
    from hypre_tpu.amg.device_setup import remap_fine_to_coarse

    pc, pv = remap_fine_to_coarse(pc, pv, cmap)
    np.testing.assert_allclose(
        _dense(pc, pv, n_coarse), _dense(P_ref.cols, P_ref.vals, n_coarse),
        rtol=1e-5, atol=1e-7,
    )


@pytest.mark.parametrize("use_shifts", [False, True])
def test_extpi_device_shifts_path_consistent(use_shifts):
    # shift path must equal the gather path exactly on a stencil problem
    A = laplacian_3d_7pt(6, 5, 4)
    S = strength_mask(A, 0.25)
    cf = pmis(A, S)
    _, scols, svals, _ = strength_and_cap(
        A, 0.25, s_cap=A.k, shifts=A.shifts if use_shifts else None
    )
    pc, pv, _ = ext_plus_i_device(
        A, scols, svals, cf, out_k=32,
        shifts=A.shifts if use_shifts else None,
    )
    if not hasattr(test_extpi_device_shifts_path_consistent, "_ref"):
        test_extpi_device_shifts_path_consistent._ref = {}
    ref = test_extpi_device_shifts_path_consistent._ref
    d = _dense(pc, pv, A.n_rows)
    if "d" in ref:
        np.testing.assert_allclose(d, ref["d"], rtol=1e-6, atol=1e-8)
    ref["d"] = d


def test_paired_transpose_vals():
    rng = np.random.default_rng(5)
    n = 20
    dense = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            if i != j and rng.random() < 0.2:
                dense[i, j] = rng.standard_normal()
        dense[i, i] = 4.0
    # make the PATTERN symmetric (values stay nonsymmetric)
    pat = (dense != 0) | (dense.T != 0)
    dense = np.where(pat & (dense == 0), 1e-30, dense)
    from hypre_tpu.seq.ell import ell_from_dense

    A = ell_from_dense(dense)
    B = paired_transpose_vals(A.cols, A.vals, n)
    cols, vals = np.asarray(A.cols), np.asarray(B)
    for i in range(n):
        for a, c in enumerate(cols[i]):
            if c >= 0:
                np.testing.assert_allclose(vals[i, a], dense[c, i], rtol=1e-12)


def test_paired_transpose_vals_shifts():
    A = laplacian_2d_5pt(7, 6)
    # make values asymmetric but keep the stencil structure
    vals = np.asarray(A.vals).copy()
    vals[:, 1] *= 1.5  # scale one off-diagonal slot
    A = dataclasses.replace(A, vals=jnp.asarray(vals))
    B_roll = paired_transpose_vals(A.cols, A.vals, A.n_rows, shifts=A.shifts)
    B_sort = paired_transpose_vals(A.cols, A.vals, A.n_rows, shifts=None)
    np.testing.assert_allclose(np.asarray(B_roll), np.asarray(B_sort), rtol=1e-12)


@pytest.mark.parametrize("use_shifts", [False, True])
def test_spgemm_slab_matches_oracle(use_shifts):
    A = laplacian_2d_5pt(9, 8)
    S = strength_mask(A, 0.25)
    cf = pmis(A, S)
    cmap, n_c = coarse_map(cf)
    P = ext_plus_i_interp(A, S, cf, cmap, int(n_c))
    C_ref = ell_spgemm(A, P)
    cc, cv, req = spgemm_slab(
        A.cols, A.vals, P.cols, P.vals, out_k=32,
        shifts=A.shifts if use_shifts else None,
    )
    assert int(req) <= 32
    np.testing.assert_allclose(
        _dense(cc, cv, int(n_c)), _dense(C_ref.cols, C_ref.vals, int(n_c)),
        rtol=1e-5, atol=1e-7,
    )


def test_transpose_slab_matches_oracle():
    A = laplacian_2d_5pt(9, 8)
    S = strength_mask(A, 0.25)
    cf = pmis(A, S)
    cmap, n_c = coarse_map(cf)
    P = ext_plus_i_interp(A, S, cf, cmap, int(n_c))
    T_ref = ell_transpose(P)
    tc, tv, req = transpose_slab(P.cols, P.vals, int(n_c), out_k=int(T_ref.k))
    assert int(req) == T_ref.k
    np.testing.assert_allclose(
        _dense(tc, tv, A.n_rows), _dense(T_ref.cols, T_ref.vals, A.n_rows),
        rtol=1e-6, atol=1e-9,
    )


def test_setup_hierarchy_device_solves():
    # end-to-end: device-built hierarchy drives AMG-PCG to convergence with
    # hypre-class iteration counts on the 2-D model problem
    from hypre_tpu.amg.hierarchy import amg_cycle, make_smoother
    from hypre_tpu.krylov import pcg
    from hypre_tpu.seq.ell import ell_spmv

    A = laplacian_2d_5pt(48, 48)
    hier = setup_hierarchy_device(A, max_coarse_size=40, relax="l1-jacobi")
    assert len(hier.levels) >= 2
    smoother = make_smoother("l1-jacobi", 1.0, 2, 0.3)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(A.n_rows), A.dtype)

    def M(r):
        return amg_cycle(hier, r, smoother=smoother)

    x, info = pcg(lambda v: ell_spmv(A, v), b, M=M, rtol=1e-8, maxiter=60)
    r = b - ell_spmv(A, x)
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert bool(info.converged)
    assert int(info.iterations) <= 14, f"{info}"
    assert rel < 1e-6


def test_setup_hierarchy_device_galerkin_exact():
    # with no caps the coarse operator must be exactly Pt A P
    A = laplacian_2d_5pt(20, 18)
    hier = setup_hierarchy_device(A, max_coarse_size=30, ap_cap=0)
    lev = hier.levels[0]
    Af = _dense(lev.A.cols, lev.A.vals, lev.A.n_cols)
    Pf = _dense(lev.P.cols, lev.P.vals, lev.P.n_cols)
    Ac = hier.levels[1].A if len(hier.levels) > 1 else None
    Ac_d = (
        _dense(Ac.cols, Ac.vals, Ac.n_cols)
        if Ac is not None
        else np.linalg.inv(np.asarray(hier.coarse_inv))
    )
    np.testing.assert_allclose(Pf.T @ Af @ Pf, Ac_d, rtol=1e-4, atol=1e-5)


def test_spgemm_and_extpi_chunked_match_unchunked():
    A = laplacian_2d_5pt(13, 11)
    A = dataclasses.replace(A, shifts=None)  # force the gather/chunk path
    S = strength_mask(A, 0.25)
    cf = pmis(A, S)
    cmap, n_c = coarse_map(cf)
    _, scols, svals, _ = strength_and_cap(A, 0.25, s_cap=A.k)
    p1 = ext_plus_i_device(A, scols, svals, cf, out_k=24, chunks=1)
    p4 = ext_plus_i_device(A, scols, svals, cf, out_k=24, chunks=4)
    np.testing.assert_allclose(
        _dense(p1[0], p1[1], A.n_rows), _dense(p4[0], p4[1], A.n_rows),
        rtol=1e-6, atol=1e-9,
    )
    P = ext_plus_i_interp(A, S, cf, cmap, int(n_c))
    c1 = spgemm_slab(A.cols, A.vals, P.cols, P.vals, 32, chunks=1)
    c3 = spgemm_slab(A.cols, A.vals, P.cols, P.vals, 32, chunks=3)
    np.testing.assert_allclose(
        _dense(c1[0], c1[1], int(n_c)), _dense(c3[0], c3[1], int(n_c)),
        rtol=1e-6, atol=1e-9,
    )
    assert int(c1[2]) == int(c3[2])


def test_multipass_device_matches_host_oracle():
    # device multipass == host multipass (amg/interp.multipass_interp) on
    # the same CF splitting (par_multi_interp.c semantics)
    from hypre_tpu.amg.device_setup import (
        multipass_interp_device, second_pass_pmis,
    )
    from hypre_tpu.amg.interp import multipass_interp

    A = laplacian_2d_5pt(12, 10)
    S = strength_mask(A, 0.25)
    cf1 = pmis(A, S)
    scols = jnp.where(S, A.cols, PAD_COL)
    svals = jnp.where(S, A.vals, 0.0)
    cf = second_pass_pmis(scols, cf1, A.n_rows, s2_cap=24)
    cmap, n_c = coarse_map(cf)
    n_coarse = int(n_c)
    assert 0 < n_coarse < int(jnp.sum(cf1 == 1))  # aggressive: fewer C

    P_ref = multipass_interp(A, S, cf, cmap, n_coarse, p_max_elmts=4)
    pc, pv, _, _ = multipass_interp_device(A, scols, svals, cf, cmap, 4)
    np.testing.assert_allclose(
        _dense(pc, pv, n_coarse), _dense(P_ref.cols, P_ref.vals, n_coarse),
        rtol=1e-5, atol=1e-8,
    )


def test_setup_hierarchy_device_aggressive():
    from hypre_tpu.amg.hierarchy import amg_cycle, make_smoother
    from hypre_tpu.krylov import pcg
    from hypre_tpu.seq.ell import ell_spmv

    A = laplacian_3d_7pt(16, 16, 16)
    hier = setup_hierarchy_device(A, max_coarse_size=60, agg_num_levels=1)
    hier0 = setup_hierarchy_device(A, max_coarse_size=60)
    # aggressive first level coarsens much harder than plain PMIS
    assert hier.levels[1].A.n_rows < 0.6 * hier0.levels[1].A.n_rows
    smoother = make_smoother("l1-jacobi", 1.0, 2, 0.3)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(A.n_rows), A.dtype)
    x, info = pcg(
        lambda v: ell_spmv(A, v), b,
        M=lambda r: amg_cycle(hier, r, smoother=smoother),
        rtol=1e-8, maxiter=60,
    )
    assert bool(info.converged)
    assert int(info.iterations) <= 20, f"{info}"


def test_second_pass_pmis_shift_path_matches_gather_path():
    from hypre_tpu.amg.device_setup import second_pass_pmis

    A = laplacian_3d_7pt(7, 6, 5)
    S = strength_mask(A, 0.25)
    cf1 = pmis(A, S)
    scols = jnp.where(S, A.cols, PAD_COL)
    cf_roll = np.asarray(
        second_pass_pmis(scols, cf1, A.n_rows, s2_cap=32, shifts=A.shifts)
    )
    cf_gather = np.asarray(
        second_pass_pmis(scols, cf1, A.n_rows, s2_cap=64, shifts=None)
    )
    np.testing.assert_array_equal(cf_roll, cf_gather)


def test_transfer_dia_matches_ell_transfers():
    # fine-space diagonal transfers == the ELL P products exactly
    from hypre_tpu.amg.device_setup import (
        multipass_interp_device, second_pass_pmis,
    )
    from hypre_tpu.seq.ell import ell_spmv, ell_spmv_t
    from hypre_tpu.seq.transfer_dia import try_transfer_dia

    A = laplacian_3d_7pt(10, 9, 8)
    S = strength_mask(A, 0.25)
    cf1 = pmis(A, S)
    scols = jnp.where(S, A.cols, PAD_COL)
    svals = jnp.where(S, A.vals, 0.0)
    cf = second_pass_pmis(scols, cf1, A.n_rows, s2_cap=32, shifts=A.shifts)
    cmap, n_c = coarse_map(cf)
    pc, pv, _, _ = multipass_interp_device(A, scols, svals, cf, cmap, 4,
                                        shifts=A.shifts)
    # the banded/DIA kernels are f32-only (TPU Pallas has no f64)
    P = EllMatrix(vals=pv.astype(jnp.float32), cols=pc, n_cols=int(n_c))
    c2f = jnp.sort(
        jnp.where(cf == 1, jnp.arange(A.n_rows, dtype=jnp.int32), 2**30)
    )[: int(n_c)]
    T = try_transfer_dia(P, c2f, exact=2)
    assert T is not None
    rng = np.random.default_rng(0)
    ec = jnp.asarray(rng.standard_normal(int(n_c)), jnp.float32)
    r = jnp.asarray(rng.standard_normal(A.n_rows), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(T.mv(ec)), np.asarray(ell_spmv(P, ec)), rtol=1e-5,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(T.mv_t(r)), np.asarray(ell_spmv_t(P, r)), rtol=1e-5,
        atol=1e-5,
    )


def test_spgemm_slab_slot_blocked_matches_oneshot(monkeypatch):
    """The 27-pt-class slot-blocked progressive merge (device_setup
    _SLOT_BLOCK_BUDGET path) must agree with the one-shot slab exactly."""
    from hypre_tpu.amg import device_setup as ds

    A = laplacian_3d_7pt(6, 5, 4)
    S = strength_mask(A, 0.25)
    cf = pmis(A, S)
    cmap, n_c = coarse_map(cf)
    P = ext_plus_i_interp(A, S, cf, cmap, int(n_c))
    ref_c, ref_v, ref_req = spgemm_slab(
        A.cols, A.vals, P.cols, P.vals, out_k=32, shifts=A.shifts
    )
    monkeypatch.setattr(ds, "_SLOT_BLOCK_BUDGET", 1.0)  # force blocking
    cc, cv, req = spgemm_slab(
        A.cols, A.vals, P.cols, P.vals, out_k=32, shifts=A.shifts
    )
    assert int(req) <= 32 and int(req) == int(ref_req)
    np.testing.assert_allclose(
        _dense(cc, cv, int(n_c)), _dense(ref_c, ref_v, int(n_c)),
        rtol=1e-6, atol=1e-8,
    )
    # truncation options applied once at the end must also agree
    ref2 = spgemm_slab(A.cols, A.vals, P.cols, P.vals, out_k=32, shifts=None,
                       max_elmts=4, rescale_rowsum=True)
    blk2 = spgemm_slab(A.cols, A.vals, P.cols, P.vals, out_k=32,
                       shifts=A.shifts, max_elmts=4, rescale_rowsum=True)
    np.testing.assert_allclose(
        _dense(blk2[0], blk2[1], int(n_c)), _dense(ref2[0], ref2[1], int(n_c)),
        rtol=1e-6, atol=1e-8,
    )


def test_extpi_slot_blocked_matches_oneshot(monkeypatch):
    from hypre_tpu.amg import device_setup as ds

    A = laplacian_3d_7pt(6, 5, 4)
    _, scols, svals, _ = strength_and_cap(A, 0.25, s_cap=A.k, shifts=A.shifts)
    cf = pmis_device(scols, A.n_rows, shifts=A.shifts)
    ref_c, ref_v, ref_req = ext_plus_i_device(
        A, scols, svals, cf, out_k=32, shifts=A.shifts
    )
    monkeypatch.setattr(ds, "_SLOT_BLOCK_BUDGET", 1.0)
    pc, pv, req = ext_plus_i_device(
        A, scols, svals, cf, out_k=32, shifts=A.shifts
    )
    assert int(req) <= 32
    np.testing.assert_allclose(
        _dense(pc, pv, A.n_rows), _dense(ref_c, ref_v, A.n_rows),
        rtol=1e-6, atol=1e-8,
    )


def test_setup_hierarchy_device_27pt_blocked(monkeypatch):
    """End-to-end device setup on a 27-pt operator through the blocked
    paths (the BASELINE-named problem class that OOMed in round 2)."""
    from hypre_tpu.amg import device_setup as ds
    from hypre_tpu.amg.hierarchy import amg_cycle, make_smoother
    from hypre_tpu.krylov import pcg
    from hypre_tpu.problems.laplacian import laplacian_3d_27pt
    from hypre_tpu.seq.ell import ell_spmv

    A = laplacian_3d_27pt(10, 9, 8)
    monkeypatch.setattr(ds, "_SLOT_BLOCK_BUDGET", 1e4)  # force blocking
    hier = setup_hierarchy_device(A, max_coarse_size=80, agg_num_levels=1)
    smoother = make_smoother("l1-jacobi", 1.0, 2, 0.3)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(A.n_rows), A.dtype)
    x, info = pcg(
        lambda v: ell_spmv(A, v), b,
        M=lambda r: amg_cycle(hier, r, smoother=smoother),
        rtol=1e-8, maxiter=60,
    )
    assert bool(info.converged), f"{info}"
    r = b - ell_spmv(A, x)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-6


def test_optimize_hierarchy_cheby_eig_est():
    """VERDICT r2 weak #8: -cheby_eig_est semantics on the DEVICE path.
    The CG/Lanczos re-estimate on the optimized operators must tighten the
    Gershgorin bound toward the true lambda_max(D^-1 A)."""
    from hypre_tpu.amg.hierarchy import optimize_hierarchy

    A = laplacian_3d_7pt(10, 10, 10)
    hier = setup_hierarchy_device(A, max_coarse_size=80, relax="chebyshev")
    fast0 = optimize_hierarchy(hier)
    fast = optimize_hierarchy(hier, cheby_eig_est=20)
    # true lambda_max of D^-1 A on the fine level
    import numpy as np

    d = np.asarray(A.diagonal())
    dense = _dense(A.cols, A.vals, A.n_rows) / d[:, None]
    true = np.max(np.linalg.eigvals(dense).real)
    g_bound = float(np.asarray(fast0.levels[0].lmax))
    cg_est = float(np.asarray(fast.levels[0].lmax))
    assert g_bound >= true - 1e-3          # Gershgorin is an upper bound
    assert abs(cg_est - true) < 0.05 * true  # CG estimate is tight
    assert cg_est <= g_bound + 1e-6


# ---------------------------------------------------------------------------
# Row-bucket invariance (round-4 regression pin): padding every level to its
# row bucket must be an ALGORITHMIC no-op — same CF splits, same true level
# sizes, identical A and P entries on the true blocks. hypre's PMIS is
# partition-invariant (par_coarsen.c:2813); empty padded rows have no strong
# connections, so they must never perturb measures, tie-breaks, or C-point
# selection of real rows.
# ---------------------------------------------------------------------------


def _hier_pair(A, **kw):
    from hypre_tpu.amg.hierarchy import unpad_hierarchy

    hb = unpad_hierarchy(setup_hierarchy_device(A, row_bucket=True, **kw))
    hu = setup_hierarchy_device(A, row_bucket=False, **kw)
    return hb, hu


def _assert_hier_equal(hb, hu):
    assert len(hb.levels) == len(hu.levels)
    for lb, lu in zip(hb.levels, hu.levels):
        assert lb.A.shape == lu.A.shape
        assert lb.P.shape == lu.P.shape
        np.testing.assert_allclose(
            _dense(lb.A.cols, lb.A.vals, lb.A.n_cols),
            _dense(lu.A.cols, lu.A.vals, lu.A.n_cols), rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(
            _dense(lb.P.cols, lb.P.vals, lb.P.n_cols),
            _dense(lu.P.cols, lu.P.vals, lu.P.n_cols), rtol=1e-6, atol=1e-9)
    assert hb.coarse_inv.shape == hu.coarse_inv.shape
    np.testing.assert_allclose(np.asarray(hb.coarse_inv),
                               np.asarray(hu.coarse_inv),
                               rtol=1e-5, atol=1e-8)


def test_bucketed_matches_unbucketed_gather_exact_bucket():
    # 8^3 = 512 rows is an exact bucket (zero fine padding) but coarse
    # levels pad 187->256 etc.; gather (shifts=None) path
    A = dataclasses.replace(laplacian_3d_7pt(8, 8, 8), shifts=None)
    _assert_hier_equal(*_hier_pair(A, max_coarse_size=40))


def test_bucketed_matches_unbucketed_gather_nonpow2():
    # 7^3 = 343 rows -> bucket 384: REAL padding at the fine level
    A = dataclasses.replace(laplacian_3d_7pt(7, 7, 7), shifts=None)
    _assert_hier_equal(*_hier_pair(A, max_coarse_size=40))


def test_bucketed_matches_unbucketed_stencil_nonpow2():
    # stencil (shifts) path with fine-level padding: 10x9 = 90 rows
    A = laplacian_2d_5pt(10, 9)
    _assert_hier_equal(*_hier_pair(A, max_coarse_size=20))


def test_fast_setup_replay_identical_and_rejects_mismatch(tmp_path, monkeypatch):
    """Round-5 fast replay path (device_setup._try_fast_setup): a repeat
    setup of a recorded (shape, knobs) ladder must produce a bit-identical
    hierarchy with zero intermediate host syncs, and a DIFFERENT operator
    of the same shape must be caught by the deferred verification (n_c
    mismatch) and fall back to the slow path."""
    import hypre_tpu.warmup as wu

    monkeypatch.setenv("HYPRE_TPU_SHAPE_REGISTRY",
                       str(tmp_path / "reg.json"))
    monkeypatch.setattr(wu, "_SHAPE_REG", None)
    A = laplacian_3d_7pt(12, 12, 12)
    kw = dict(max_coarse_size=100, relax="chebyshev", agg_num_levels=1,
              coarse_drop_tol=0.02)
    h1 = setup_hierarchy_device(A, **kw)   # slow path records the ladder
    h2 = setup_hierarchy_device(A, **kw)   # replay
    assert [l.A.n_rows for l in h1.levels] == [l.A.n_rows
                                               for l in h2.levels]
    for l1, l2 in zip(h1.levels, h2.levels):
        np.testing.assert_array_equal(np.asarray(l1.A.cols),
                                      np.asarray(l2.A.cols))
        np.testing.assert_allclose(np.asarray(l1.A.vals),
                                   np.asarray(l2.A.vals))
    np.testing.assert_allclose(np.asarray(h1.coarse_inv),
                               np.asarray(h2.coarse_inv))
    # different operator, same shape: replay must reject or match — either
    # way the result must equal a from-scratch slow-path setup
    rng = np.random.default_rng(0)
    A3 = dataclasses.replace(A, vals=A.vals * (1.0 + 0.3 * jnp.asarray(
        rng.random(A.vals.shape), A.dtype)))
    h3 = setup_hierarchy_device(A3, **kw)
    import os
    os.environ["HYPRE_TPU_NO_FAST_SETUP"] = "1"
    try:
        h3_ref = setup_hierarchy_device(A3, **kw)
    finally:
        del os.environ["HYPRE_TPU_NO_FAST_SETUP"]
    assert [l.A.n_rows for l in h3.levels] == [l.A.n_rows
                                               for l in h3_ref.levels]
    for l1, l2 in zip(h3.levels, h3_ref.levels):
        np.testing.assert_allclose(np.asarray(l1.A.vals),
                                   np.asarray(l2.A.vals))


def test_row_padding_preserves_stencil_annotation_and_dia_solve_path():
    """Round-5 regression pin: row-bucket padding must keep the fine
    level's ``shifts`` annotation (padded rows are empty so the contract
    holds) — without it, padded shapes silently lost the DIA solve
    kernels and fell back to gather SpMV."""
    from hypre_tpu.amg.hierarchy import optimize_hierarchy
    from hypre_tpu.seq.dia import DiaMatrix

    A = laplacian_3d_7pt(10, 10, 10)  # 1000 -> padded 1024
    hier = setup_hierarchy_device(A, max_coarse_size=60)
    assert hier.levels[0].A.n_rows == 1024
    assert hier.levels[0].A.shifts == A.shifts
    hf = optimize_hierarchy(hier, prefer_pallas=True, gather_precision=0)
    assert isinstance(hf.levels[0].A, DiaMatrix)
