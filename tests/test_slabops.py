"""slabops merge/cap/gather primitives vs the spgemm._merge_rows oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from hypre_tpu.core.config import PAD_COL
from hypre_tpu.seq.slabops import (
    cap_slab, compact_mask_slab, detect_shifts, merge_slab, shift_gather_rows,
)
from hypre_tpu.seq.spgemm import _merge_rows


def _rand_slab(n=37, K=13, ncols=29, seed=0, dup=True):
    rng = np.random.default_rng(seed)
    cols = rng.integers(0, ncols, (n, K)).astype(np.int32)
    cols[rng.random((n, K)) < 0.3] = PAD_COL
    vals = rng.standard_normal((n, K))
    return jnp.asarray(cols), jnp.asarray(vals)


def _dense_of(cols, vals, ncols):
    cols, vals = np.asarray(cols), np.asarray(vals)
    n = cols.shape[0]
    d = np.zeros((n, ncols))
    for i in range(n):
        for c, v in zip(cols[i], vals[i]):
            if c >= 0:
                d[i, c] += v
    return d


def test_merge_slab_matches_oracle():
    cols, vals = _rand_slab()
    mc, mv, req = merge_slab(cols, vals, out_k=29)
    oc, ov, oreq = _merge_rows(cols, vals, 29)
    assert int(req) == int(oreq)
    np.testing.assert_allclose(
        _dense_of(mc, mv, 29), _dense_of(oc, ov, 29), rtol=1e-12, atol=1e-12
    )
    # sorted cols, left-compacted
    mc = np.asarray(mc)
    for row in mc:
        seg = row[row >= 0]
        assert (np.diff(seg) > 0).all()
        assert (row[len(seg):] == PAD_COL).all()


def test_merge_slab_overflow_reports_required():
    cols, vals = _rand_slab(seed=1)
    _, _, req = merge_slab(cols, vals, out_k=2)
    assert int(req) > 2


def test_merge_slab_fused_truncation():
    cols, vals = _rand_slab(seed=2)
    mc, mv, _ = merge_slab(cols, vals, out_k=29, max_elmts=3,
                           rescale_rowsum=True)
    ref = _dense_of(cols, vals, 29)
    got = _dense_of(mc, mv, 29)
    for i in range(ref.shape[0]):
        nz = np.nonzero(got[i])[0]
        assert len(nz) <= 3
        # row sums preserved (hypre truncation rescaling convention)
        if got[i].sum() != 0 and ref[i].sum() != 0:
            np.testing.assert_allclose(got[i].sum(), ref[i].sum(), rtol=1e-10)
        # kept entries are the largest-|merged value| ones (pre-rescale)
        merged = ref[i]
        dropped = np.setdiff1d(np.nonzero(merged)[0], nz)
        if len(dropped) and len(nz):
            assert np.min(np.abs(merged[nz])) >= np.max(np.abs(merged[dropped])) - 1e-9


def test_cap_slab_keeps_largest():
    cols, vals = _rand_slab(seed=3, K=9)
    c2, v2 = cap_slab(cols, vals, kcap=4)
    c2n, v2n = np.asarray(c2), np.asarray(v2)
    coln, valn = np.asarray(cols), np.asarray(vals)
    for i in range(c2n.shape[0]):
        kept = set(c2n[i][c2n[i] >= 0].tolist())
        mags = sorted(
            (abs(v) for c, v in zip(coln[i], valn[i]) if c >= 0), reverse=True
        )
        thresh = mags[3] if len(mags) > 4 else -1.0
        for c, v in zip(coln[i], valn[i]):
            if c >= 0 and abs(v) > thresh:
                assert c in kept
        seg = c2n[i][c2n[i] >= 0]
        # col-sorted (duplicates allowed -- cap_slab does not dedup)
        assert (np.diff(seg) >= 0).all() or len(seg) <= 1


def test_cap_slab_lump_preserves_rowsum():
    cols, vals = _rand_slab(seed=4, K=9)
    c2, v2 = cap_slab(cols, vals, kcap=4, lump_largest=True)
    np.testing.assert_allclose(
        np.asarray(v2).sum(axis=1), np.asarray(vals * (cols >= 0)).sum(axis=1),
        rtol=1e-10, atol=1e-12,
    )


def test_compact_mask_slab():
    cols, vals = _rand_slab(seed=5)
    keep = jnp.asarray(np.random.default_rng(9).random(cols.shape) < 0.5)
    c2, v2 = compact_mask_slab(cols, vals, keep, out_k=13)
    ref = _dense_of(
        jnp.where(keep, cols, PAD_COL), jnp.where(keep, vals, 0), 29
    )
    np.testing.assert_allclose(_dense_of(c2, v2, 29), ref, rtol=1e-12)


def test_detect_shifts_and_shift_gather():
    from hypre_tpu.problems.laplacian import laplacian_2d_5pt

    A = laplacian_2d_5pt(6, 5)
    shifts = detect_shifts(np.asarray(A.cols))
    assert shifts is not None
    assert sorted(shifts.tolist()) == [-5, -1, 0, 1, 5]
    X = jnp.asarray(np.random.default_rng(0).standard_normal((30, 3)))
    g = shift_gather_rows(X, shifts)
    cols = np.asarray(A.cols)
    # wherever A has a valid entry, the rolled gather equals X[cols]
    for s in range(cols.shape[1]):
        m = cols[:, s] >= 0
        np.testing.assert_allclose(
            np.asarray(g)[m, s], np.asarray(X)[cols[m, s]], rtol=0
        )
    # non-stencil matrix -> None
    bad = cols.copy()
    bad[3, 0] = 17
    assert detect_shifts(bad) is None


def test_ell_spgemm_big_path_matches_small(monkeypatch):
    """ell_spgemm's large-product routing (slot-blocked/chunked slab path)
    must agree with the one-shot kernel (the 27-pt A*A OOM fix)."""
    import numpy as np

    from hypre_tpu.problems.laplacian import laplacian_3d_7pt
    from hypre_tpu.seq import spgemm as sp

    A = laplacian_3d_7pt(7, 6, 5)
    ref = sp.ell_spgemm(A, A)
    monkeypatch.setattr(sp, "_BIG_SPGEMM_ELEMENTS", 1.0)
    big = sp.ell_spgemm(A, A)

    def dense(M):
        cols, vals = np.asarray(M.cols), np.asarray(M.vals)
        d = np.zeros((cols.shape[0], M.n_cols))
        for i in range(cols.shape[0]):
            for c, v in zip(cols[i], vals[i]):
                if c >= 0:
                    d[i, c] += v
        return d

    np.testing.assert_allclose(dense(big), dense(ref), rtol=1e-5, atol=1e-7)
