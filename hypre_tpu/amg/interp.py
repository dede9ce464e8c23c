"""Interpolation operator construction.

Direct interpolation, sign-split as in hypre (hypre_BoomerAMGBuildDirInterp,
``parcsr_ls/par_interp.c``; device variant ``par_interp_device.c``), plus
hypre's interpolation truncation (``par_interp_trunc_device.c``):

For an F-point i with strong C-neighborhood C_i = { j : S_ij, cf_j = C }:

    alfa_i = (sum of negative off-diag a_ik over ALL k) / (sum of negative
             a_ij over j in C_i)              [analogous beta_i for positive]
    w_ij  = -alfa_i * a_ij / a_ii   (a_ij < 0)
            -beta_i * a_ij / a_ii   (a_ij > 0)

If a row has positive off-diagonals but no positive strong-C entry, the
positive mass is lumped onto the diagonal instead (hypre's convention),
i.e. a_ii <- a_ii + sum_pos and beta term drops.

C-point rows are identity. Everything is slot-parallel over A's ELL layout —
one pass of elementwise math, no graph walking.

Direct interpolation is chosen first because it is purely row-local (needs no
halo rows of A), so the distributed version needs zero communication; hypre's
ext+i variants (``par_lr_interp.c``) extend reach through distance-2
neighborhoods and are a later addition via one halo-row exchange.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hypre_tpu.core.config import PAD_COL
from hypre_tpu.amg.coarsen import C_PT
from hypre_tpu.seq.ell import EllMatrix
from hypre_tpu.seq.spgemm import ell_filter, ell_remap_cols


def direct_interp(
    A: EllMatrix, S: jax.Array, cf: jax.Array, cmap: jax.Array, n_coarse: int
) -> EllMatrix:
    """Build P (n_fine x n_coarse) with direct interpolation weights."""
    n, k = A.cols.shape
    offd = A.offdiag_mask()
    cols_c = jnp.maximum(A.cols, 0)
    diag = A.diagonal()

    is_strong_c = S & (cf[cols_c] == C_PT)
    neg = A.vals < 0
    pos = A.vals > 0

    sum_n_neg = jnp.sum(jnp.where(offd & neg, A.vals, 0), axis=1)
    sum_n_pos = jnp.sum(jnp.where(offd & pos, A.vals, 0), axis=1)
    sum_p_neg = jnp.sum(jnp.where(is_strong_c & neg, A.vals, 0), axis=1)
    sum_p_pos = jnp.sum(jnp.where(is_strong_c & pos, A.vals, 0), axis=1)

    have_pos_c = sum_p_pos != 0
    diag_eff = jnp.where(have_pos_c, diag, diag + sum_n_pos)
    alfa = sum_n_neg / jnp.where(sum_p_neg != 0, sum_p_neg, 1.0)
    beta = jnp.where(have_pos_c, sum_n_pos / jnp.where(have_pos_c, sum_p_pos, 1.0), 0.0)

    safe_diag = jnp.where(diag_eff != 0, diag_eff, 1.0)
    w = jnp.where(neg, -alfa[:, None] * A.vals, -beta[:, None] * A.vals) / safe_diag[:, None]

    is_f = (cf != C_PT)[:, None]
    keep = is_strong_c & is_f & (w != 0)
    p_cols = jnp.where(keep, cmap[cols_c], PAD_COL).astype(jnp.int32)
    p_vals = jnp.where(keep, w, 0.0)

    # append the C-point identity slot
    own = cmap.astype(jnp.int32)
    ident_col = jnp.where(cf == C_PT, own, PAD_COL)[:, None]
    ident_val = jnp.where(cf == C_PT, 1.0, 0.0)[:, None].astype(A.dtype)
    P = EllMatrix(
        vals=jnp.concatenate([p_vals, ident_val], axis=1),
        cols=jnp.concatenate([p_cols, ident_col], axis=1),
        n_cols=int(n_coarse) if not isinstance(n_coarse, jax.Array) else n_coarse,
    )
    # compact: drop dead slots so P's width is the true max row fill
    P = ell_filter(P, P.structural_mask())
    width = int(jnp.max(jnp.sum(P.structural_mask(), axis=1)))
    return EllMatrix(vals=P.vals[:, : max(width, 1)], cols=P.cols[:, : max(width, 1)], n_cols=P.n_cols)


# ---------------------------------------------------------------------------
# Extended+i (distance-2) interpolation — hypre's PMIS companion
# ---------------------------------------------------------------------------


def _ext_pi_block(A: EllMatrix, S, cf, a_hat, sgn, diag, lo: int, blk: int, out_k: int):
    """Candidate generation + merge for rows [lo, lo+blk) (jit-compiled once
    per block shape). Returns merged (blk,out_k) cols/vals and required_k."""
    n, k = A.cols.shape
    rows = lo + jnp.arange(blk, dtype=jnp.int32)
    cols_b = jax.lax.dynamic_slice_in_dim(A.cols, lo, blk, 0)
    vals_b = jax.lax.dynamic_slice_in_dim(A.vals, lo, blk, 0)
    S_b = jax.lax.dynamic_slice_in_dim(S, lo, blk, 0)
    cols_c = jnp.maximum(cols_b, 0)

    is_c_col = cf[cols_c] == C_PT
    strongC = S_b & is_c_col
    strongF = S_b & ~is_c_col

    strongC_full = S & (cf[jnp.maximum(A.cols, 0)] == C_PT)  # (n,k) for gathers
    nb_cols = jnp.maximum(A.cols, 0)[cols_c]  # (blk,k,k)
    nb_strongC = strongC_full[cols_c]
    nb_ahat = a_hat[cols_c]

    # â_ki: row k's sign-filtered coupling back to row i
    back = jnp.sum(jnp.where(nb_cols == rows[:, None, None], nb_ahat, 0.0), axis=2)
    theta = jnp.sum(jnp.where(nb_strongC, nb_ahat, 0.0), axis=2) + back
    theta_safe = jnp.where(theta != 0, theta, 1.0)
    usable_F = strongF & (theta != 0)

    diag_b = diag[rows]
    weak = (cols_b >= 0) & (cols_b != rows[:, None]) & ~S_b
    d_eff = (
        diag_b
        + jnp.sum(jnp.where(weak, vals_b, 0), axis=1)
        + jnp.sum(jnp.where(usable_F, vals_b * back / theta_safe, 0), axis=1)
        + jnp.sum(jnp.where(strongF & (theta == 0), vals_b, 0), axis=1)
    )

    cand1_cols = jnp.where(strongC, cols_b, PAD_COL)
    cand1_vals = jnp.where(strongC, vals_b, 0.0)
    through = usable_F[:, :, None] & nb_strongC
    w2 = jnp.where(through, vals_b[:, :, None] * nb_ahat / theta_safe[:, :, None], 0.0)
    cand2_cols = jnp.where(through, nb_cols, PAD_COL)
    from hypre_tpu.seq.spgemm import _merge_rows

    mc, mv, req = _merge_rows(
        jnp.concatenate([cand1_cols, cand2_cols.reshape(blk, -1)], axis=1),
        jnp.concatenate([cand1_vals, w2.reshape(blk, -1)], axis=1),
        out_k,
    )
    d_safe = jnp.where(d_eff != 0, d_eff, 1.0)
    w = -mv / d_safe[:, None]
    cf_b = cf[rows]
    is_f = (cf_b != C_PT)[:, None]
    w = jnp.where(is_f, w, 0.0)
    mc = jnp.where(is_f, mc, PAD_COL)
    own = jnp.where(cf_b == C_PT, rows, PAD_COL)[:, None]
    ones = jnp.where(cf_b == C_PT, 1.0, 0.0).astype(A.dtype)[:, None]
    return (
        jnp.concatenate([mc, own], axis=1),
        jnp.concatenate([w, ones], axis=1),
        req,
    )


def ext_plus_i_interp(
    A: EllMatrix,
    S: jax.Array,
    cf: jax.Array,
    cmap: jax.Array,
    n_coarse: int,
    out_k: int | None = None,
    row_block: int = 131072,
) -> EllMatrix:
    """Extended+i interpolation, modified MM form.

    hypre's distance-two interpolation family (hypre_BoomerAMGBuildExtPIInterp,
    ``par_lr_interp.c``; device/MM variants ``par_mod_lr_interp.c``,
    ``par_2s_interp_device.c``) exists because PMIS leaves strong F-F pairs
    with no common C neighbor, where distance-1 interpolation degrades. For
    F-point i (De Sterck/Falgout/Nolting/Yang 2008, with the MM-friendly
    'modified' denominator that drops the common-C membership test):

        w_ij = -[ a_ij + sum_{k in F_i^s} a_ik â_kj / theta_k ] / d_i
        theta_k = sum_{m in C_k^s} â_km + â_ki
        d_i = a_ii + sum_weak a_in + sum_{k in F_i^s} a_ik â_ki / theta_k

    (â = entries sign-opposed to the row's diagonal; strong-F rows with
    theta=0 are lumped onto the diagonal). Constant vectors are reproduced
    exactly on zero-row-sum interiors: the cross terms cancel algebraically.

    Candidate generation gathers each row's neighbor rows — an O(n k^2)
    slab — so rows are processed in ``row_block`` chunks to bound memory.
    """
    n, k = A.cols.shape
    diag = A.diagonal()
    sgn = jnp.where(diag >= 0, 1.0, -1.0).astype(A.dtype)
    a_hat = jnp.where(A.vals * sgn[:, None] < 0, A.vals, 0.0)
    if out_k is None:
        out_k = min(max(4 * k, 8), 64)

    block_fn = _EXT_PI_BLOCK_JIT

    def run(out_k: int):
        if n <= row_block:
            mc, mv, req = block_fn(A, S, cf, a_hat, sgn, diag, 0, n, out_k)
            return mc, mv, int(req)
        mcs, mvs, req_max = [], [], 0
        lo = 0
        while lo < n:
            blk = min(row_block, n - lo)
            mc, mv, req = block_fn(A, S, cf, a_hat, sgn, diag, lo, blk, out_k)
            mcs.append(mc)
            mvs.append(mv)
            req_max = max(req_max, int(req))
            lo += blk
        return jnp.concatenate(mcs, 0), jnp.concatenate(mvs, 0), req_max

    mc, mv, req = run(out_k)
    if req > out_k:
        mc, mv, _ = run(req)
    P = EllMatrix(vals=mv, cols=mc, n_cols=n)
    # renumber fine C-columns into the coarse index space
    fine_to_coarse = jnp.where(cf == C_PT, cmap, -1).astype(jnp.int32)
    P = ell_remap_cols(P, fine_to_coarse, int(n_coarse))
    P = ell_filter(P, P.structural_mask())
    width = int(jnp.max(jnp.sum(P.structural_mask(), axis=1)))
    return EllMatrix(vals=P.vals[:, : max(width, 1)], cols=P.cols[:, : max(width, 1)], n_cols=P.n_cols)


def truncate_interp(P: EllMatrix, max_elmts: int = 0, trunc_factor: float = 0.0) -> EllMatrix:
    """hypre_BoomerAMGInterpTruncation (par_interp_trunc_device.c).

    Keeps at most ``max_elmts`` largest-|w| entries per row and drops entries
    with |w| < trunc_factor * max|w| in the row, then rescales the survivors
    so the row sum is preserved (per hypre's rescaling convention).
    """
    if max_elmts <= 0 and trunc_factor <= 0.0:
        return P
    absw = jnp.where(P.structural_mask(), jnp.abs(P.vals), -1.0)
    keep = P.structural_mask()
    if trunc_factor > 0.0:
        row_max = jnp.max(absw, axis=1, keepdims=True)
        keep &= absw >= trunc_factor * row_max
    if 0 < max_elmts < P.k:
        # rank of each entry by |w| within its row (descending)
        order = jnp.argsort(-absw, axis=1, stable=True)
        rank = jnp.argsort(order, axis=1)
        keep &= rank < max_elmts
    old_sum = P.row_sums()
    Pt = ell_filter(P, keep, out_k=max_elmts if 0 < max_elmts < P.k else None)
    new_sum = Pt.row_sums()
    scale = jnp.where(new_sum != 0, old_sum / jnp.where(new_sum != 0, new_sum, 1.0), 1.0)
    return Pt.scale_rows(scale)


# ---------------------------------------------------------------------------
# Classical (common-C) interpolation — hypre_BoomerAMGBuildInterp
# ---------------------------------------------------------------------------


def _classical_block(A: EllMatrix, S, cf, a_hat, diag, lo: int, blk: int, out_k: int):
    """Classical modified interpolation for rows [lo, lo+blk):

        w_ij = -( a_ij + sum_{k in F_i^s} a_ik â_kj / denom_k ) / d_i
        denom_k = sum_{m in C_i^s, â_km != 0} â_km     (common-C distribution)
        d_i = a_ii + sum_{weak n} a_in + sum_{k in F_i^s, denom_k=0} a_ik

    (par_interp.c:15; strong-F rows with no common C are lumped onto the
    diagonal, hypre's modified-classical convention).
    """
    n, k = A.cols.shape
    rows = lo + jnp.arange(blk, dtype=jnp.int32)
    cols_b = jax.lax.dynamic_slice_in_dim(A.cols, lo, blk, 0)
    vals_b = jax.lax.dynamic_slice_in_dim(A.vals, lo, blk, 0)
    S_b = jax.lax.dynamic_slice_in_dim(S, lo, blk, 0)
    cols_c = jnp.maximum(cols_b, 0)

    is_c_col = cf[cols_c] == C_PT
    strongC = S_b & is_c_col  # (blk, k)
    strongF = S_b & ~is_c_col

    nb_cols = jnp.maximum(A.cols, 0)[cols_c]  # (blk, k, k)
    nb_ahat = a_hat[cols_c]

    # membership: is nb_cols[b,a,s] one of row b's strong-C columns?
    in_Ci = jnp.any(
        (nb_cols[:, :, None, :] == cols_c[:, None, :, None])
        & strongC[:, None, :, None],
        axis=2,
    )  # (blk, a, s)
    denom = jnp.sum(jnp.where(in_Ci, nb_ahat, 0.0), axis=2)  # (blk, a)
    usable_F = strongF & (denom != 0)
    denom_safe = jnp.where(denom != 0, denom, 1.0)

    diag_b = diag[rows]
    weak = (cols_b >= 0) & (cols_b != rows[:, None]) & ~S_b
    d_eff = (
        diag_b
        + jnp.sum(jnp.where(weak, vals_b, 0), axis=1)
        + jnp.sum(jnp.where(strongF & (denom == 0), vals_b, 0), axis=1)
    )

    cand1_cols = jnp.where(strongC, cols_b, PAD_COL)
    cand1_vals = jnp.where(strongC, vals_b, 0.0)
    through = usable_F[:, :, None] & in_Ci
    w2 = jnp.where(through, vals_b[:, :, None] * nb_ahat / denom_safe[:, :, None], 0.0)
    cand2_cols = jnp.where(through, nb_cols, PAD_COL)
    from hypre_tpu.seq.spgemm import _merge_rows

    mc, mv, req = _merge_rows(
        jnp.concatenate([cand1_cols, cand2_cols.reshape(blk, -1)], axis=1),
        jnp.concatenate([cand1_vals, w2.reshape(blk, -1)], axis=1),
        out_k,
    )
    d_safe = jnp.where(d_eff != 0, d_eff, 1.0)
    w = -mv / d_safe[:, None]
    cf_b = cf[rows]
    is_f = (cf_b != C_PT)[:, None]
    w = jnp.where(is_f, w, 0.0)
    mc = jnp.where(is_f, mc, PAD_COL)
    own = jnp.where(cf_b == C_PT, rows, PAD_COL)[:, None]
    ones = jnp.where(cf_b == C_PT, 1.0, 0.0).astype(A.dtype)[:, None]
    return (
        jnp.concatenate([mc, own], axis=1),
        jnp.concatenate([w, ones], axis=1),
        req,
    )


def classical_interp(
    A: EllMatrix,
    S: jax.Array,
    cf: jax.Array,
    cmap: jax.Array,
    n_coarse: int,
    out_k: int | None = None,
    row_block: int = 131072,
) -> EllMatrix:
    """hypre_BoomerAMGBuildInterp (par_interp.c:15) — distance-1 classical
    interpolation with common-C distribution of strong-F mass."""
    n, k = A.cols.shape
    diag = A.diagonal()
    sgn = jnp.where(diag >= 0, 1.0, -1.0).astype(A.dtype)
    a_hat = jnp.where(A.vals * sgn[:, None] < 0, A.vals, 0.0)
    if out_k is None:
        out_k = min(max(2 * k, 8), 64)

    block_fn = _CLASSICAL_BLOCK_JIT

    def run(out_k: int):
        if n <= row_block:
            mc, mv, req = block_fn(A, S, cf, a_hat, diag, 0, n, out_k)
            return mc, mv, int(req)
        mcs, mvs, req_max = [], [], 0
        lo = 0
        while lo < n:
            blk = min(row_block, n - lo)
            mc, mv, req = block_fn(A, S, cf, a_hat, diag, lo, blk, out_k)
            mcs.append(mc)
            mvs.append(mv)
            req_max = max(req_max, int(req))
            lo += blk
        return jnp.concatenate(mcs, 0), jnp.concatenate(mvs, 0), req_max

    mc, mv, req = run(out_k)
    if req > out_k:
        mc, mv, _ = run(req)
    P = EllMatrix(vals=mv, cols=mc, n_cols=n)
    fine_to_coarse = jnp.where(cf == C_PT, cmap, -1).astype(jnp.int32)
    P = ell_remap_cols(P, fine_to_coarse, int(n_coarse))
    P = ell_filter(P, P.structural_mask())
    width = int(jnp.max(jnp.sum(P.structural_mask(), axis=1)))
    return EllMatrix(vals=P.vals[:, : max(width, 1)], cols=P.cols[:, : max(width, 1)], n_cols=P.n_cols)


# ---------------------------------------------------------------------------
# Jacobi interpolation improvement — hypre_BoomerAMGJacobiInterp
# ---------------------------------------------------------------------------


def jacobi_improve_interp(
    A: EllMatrix,
    P: EllMatrix,
    cf: jax.Array,
    weight: float = 1.0,
    passes: int = 1,
    max_elmts: int = 0,
    trunc_factor: float = 0.0,
) -> EllMatrix:
    """One or more weighted-Jacobi smoothing passes on P's F-rows
    (par_jacobi_interp.c): P <- P - w D_F^{-1} (A P)|_F, followed by
    re-truncation. Improves energy of the interpolation for hard problems
    at the cost of denser P."""
    from hypre_tpu.seq.spgemm import ell_spgemm

    diag = A.diagonal()
    dinv = jnp.where(diag != 0, weight / jnp.where(diag != 0, diag, 1.0), 0.0)
    is_f = (cf != C_PT).astype(A.dtype)
    for _ in range(passes):
        AP = ell_spgemm(A, P)
        AP = AP.with_vals(AP.vals * (dinv * is_f)[:, None])
        # P - AP on the union pattern
        from hypre_tpu.seq.spgemm import ell_add

        P = ell_add(1.0, P, -1.0, AP)
        P = truncate_interp(P, max_elmts=max_elmts, trunc_factor=trunc_factor)
    return P


# ---------------------------------------------------------------------------
# Multipass interpolation (par_multi_interp.c; interp_type 4)
# ---------------------------------------------------------------------------


def multipass_interp(
    A: EllMatrix,
    S: jax.Array,
    cf: jax.Array,
    cmap: jax.Array,
    n_coarse: int,
    p_max_elmts: int = 0,
) -> EllMatrix:
    """True multipass interpolation (hypre_BoomerAMGBuildMultipass,
    ``parcsr_ls/par_multi_interp.c``; GPU twin ``par_mod_multi_interp.c``):
    the interpolation that makes aggressively-coarsened grids work, where F
    points can sit at graph distance > 1 from every C point.

    Pass assignment: C points are pass 0; F points with a strong C neighbor
    are pass 1 (direct interpolation); a pass-p F point reaches C only
    through strong pass-(p-1) neighbors, so its row is the weighted
    combination of theirs:

        w_i = -(1/a_ii) * sum_{k in S_i, pass(k) < p} a_ik * P_k

    rescaled so the row sum equals -(sum of all off-diagonal a_ik)/a_ii
    (the constant-preserving normalization hypre applies per pass).

    Irregular wavefront construction -> host numpy at setup time, like the
    RS-family coarsenings; rows are truncated to ``p_max_elmts`` largest
    magnitudes (renormalized) as hypre's P_max_elmts does.
    """
    import numpy as np

    Sh = np.asarray(S)
    colsE = np.asarray(A.cols)
    valsE = np.asarray(A.vals)
    cfh = np.asarray(cf)
    cmaph = np.asarray(cmap)
    n, k = colsE.shape

    diag = np.zeros(n)
    offsum = np.zeros(n)
    strong = [[] for _ in range(n)]  # (col, a_ij) strong entries
    for i in range(n):
        for a in range(k):
            j = colsE[i, a]
            if j < 0:
                continue
            v = valsE[i, a]
            if j == i:
                diag[i] += v
            else:
                offsum[i] += v
                if Sh[i, a]:
                    strong[i].append((int(j), float(v)))

    dependents = [[] for _ in range(n)]  # reverse strong adjacency
    for i in range(n):
        for j, _ in strong[i]:
            dependents[j].append(i)
    passes = np.full(n, -1, np.int64)
    passes[cfh == 1] = 0
    frontier = np.nonzero(cfh == 1)[0].tolist()
    p = 0
    while frontier:
        nxt = []
        for j in frontier:
            for i in dependents[j]:
                if passes[i] < 0:
                    passes[i] = p + 1
                    nxt.append(i)
        frontier = nxt
        p += 1

    rows: list[dict] = [dict() for _ in range(n)]
    for i in np.nonzero(cfh == 1)[0]:
        rows[i][int(cmaph[i])] = 1.0
    max_pass = int(passes.max(initial=0))
    for p in range(1, max_pass + 1):
        for i in np.nonzero(passes == p)[0]:
            d = diag[i] if diag[i] != 0 else 1.0
            acc: dict = {}
            for j, aij in strong[i]:
                if 0 <= passes[j] < p and rows[j]:
                    for c, w in rows[j].items():
                        acc[c] = acc.get(c, 0.0) - aij * w / d
            ssum = sum(acc.values())
            target = -offsum[i] / d
            if ssum != 0.0 and target != 0.0:
                scale = target / ssum
                acc = {c: w * scale for c, w in acc.items()}
            if p_max_elmts and len(acc) > p_max_elmts:
                keep = sorted(acc, key=lambda c: -abs(acc[c]))[:p_max_elmts]
                kept = {c: acc[c] for c in keep}
                ks = sum(kept.values())
                if ks != 0.0 and ssum != 0.0:
                    kept = {c: w * (target / ks) for c, w in kept.items()}
                acc = kept
            rows[i] = acc

    width = max(max((len(r) for r in rows), default=1), 1)
    pc = np.full((n, width), -1, np.int64)
    pv = np.zeros((n, width))
    for i, r in enumerate(rows):
        for a, (c, w) in enumerate(sorted(r.items())):
            pc[i, a] = c
            pv[i, a] = w
    return EllMatrix(
        vals=jnp.asarray(pv, A.dtype),
        cols=jnp.asarray(pc, jnp.int32),
        n_cols=int(n_coarse),
    )


# module-level jit wrappers (per-call jax.jit re-traces every setup)
_EXT_PI_BLOCK_JIT = jax.jit(_ext_pi_block, static_argnums=(6, 7, 8))
_CLASSICAL_BLOCK_JIT = jax.jit(_classical_block, static_argnums=(5, 6, 7))
