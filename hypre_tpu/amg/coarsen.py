"""PMIS coarsening (hypre_BoomerAMGCoarsenPMIS, parcsr_ls/par_coarsen.c:2813).

PMIS (parallel modified independent set, De Sterck/Yang/Heys) is hypre's
GPU-default coarsening (type 8) because every round is data-parallel — which
also makes it the natural TPU coarsening. The whole loop runs as one
lax.while_loop on device:

  measure_i = |S^T_i| + rand_i                (rand from a stateless hash of
                                               the global row id, like hypre's
                                               seeded -pmis1 reproducible mode,
                                               test/ij.c:2052)
  repeat until no point is undecided:
    - a point joins C if its measure beats every undecided neighbor in
      S_i ∪ S^T_i (distance-1 independent set on the strength graph),
    - an undecided point becomes F as soon as some C point appears in S_i
      (it strongly depends on a C point, hence can interpolate).

CF marker convention follows hypre: +1 = C-point, -1 = F-point. Points with
no strong connections at all never get selected and are finalized as F with
an empty interpolation row (hypre's 'isolated F points', CF -3 there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hypre_tpu.core.config import hash_rand01
from hypre_tpu.amg.strength import strength_transpose_counts
from hypre_tpu.seq.ell import EllMatrix

C_PT = 1
F_PT = -1
UNDECIDED = 0


def pmis(A: EllMatrix, S: jax.Array, global_row_offset: int | jax.Array = 0) -> jax.Array:
    """Returns the CF marker (n,) int32 in {+1 C, -1 F}.

    global_row_offset makes the tie-breaking hash shard-invariant in the
    distributed setting (measure of global row i is the same wherever it
    lives).
    """
    n, _ = A.cols.shape
    rows_global = jnp.arange(n, dtype=jnp.int32) + global_row_offset
    st_counts = strength_transpose_counts(A, S)
    measure0 = st_counts.astype(A.dtype) + hash_rand01(rows_global).astype(A.dtype)

    has_strong_row = jnp.any(S, axis=1)
    has_strong_col = st_counts > 0
    isolated = ~has_strong_row & ~has_strong_col

    cols_c = jnp.maximum(A.cols, 0)
    overflow = A.n_rows  # scatter overflow slot

    def cond(state):
        cf, _ = state
        return jnp.any(cf == UNDECIDED)

    def body(state):
        cf, measure = state
        undecided = cf == UNDECIDED
        m = jnp.where(undecided, measure, 0.0)

        # neighbor max over S rows (gather) and S columns (scatter-max)
        nbr_vals = jnp.where(S, m[cols_c], 0.0)
        row_nbr_max = jnp.max(nbr_vals, axis=1)
        scatter_cols = jnp.where(S, A.cols, overflow).reshape(-1)
        col_nbr_max = (
            jnp.zeros(A.n_rows + 1, m.dtype)
            .at[scatter_cols]
            .max(jnp.broadcast_to(m[:, None], S.shape).reshape(-1))
        )[:-1]
        nbr_max = jnp.maximum(row_nbr_max, col_nbr_max)

        new_c = undecided & (m > nbr_max) & (m > 0)
        cf = jnp.where(new_c, C_PT, cf)

        # undecided points strongly depending on a C point become F
        dep_on_c = jnp.any(S & (cf[cols_c] == C_PT), axis=1)
        cf = jnp.where((cf == UNDECIDED) & dep_on_c, F_PT, cf)
        # points that can never be selected or interpolate: finalize as F
        cf = jnp.where((cf == UNDECIDED) & isolated, F_PT, cf)
        # stall guard: if nothing changed this round (pathological ties),
        # promote all remaining undecided to C to guarantee termination
        stalled = jnp.all(cf == state[0])
        cf = jnp.where(stalled & (cf == UNDECIDED), C_PT, cf)
        return (cf, measure)

    cf0 = jnp.where(isolated, F_PT, UNDECIDED).astype(jnp.int32)
    # points with measure < 1 (nobody depends on them) but with strong
    # dependencies can safely start as F candidates once a C neighbor exists;
    # hypre additionally pre-F's them — the loop above subsumes that.
    cf, _ = jax.lax.while_loop(cond, body, (cf0, measure0))
    return cf


def coarse_map(cf: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(map, n_coarse): map[i] = coarse index of C-point i, -1 for F-points.

    hypre's coarse-grid numbering pass (par_coarse_parms.c).
    """
    is_c = cf == C_PT
    idx = jnp.cumsum(is_c.astype(jnp.int32)) - 1
    return jnp.where(is_c, idx, -1), jnp.sum(is_c.astype(jnp.int32))


# ---------------------------------------------------------------------------
# CLJP coarsening (hypre_BoomerAMGCoarsen, par_coarsen.c:93, types 0/7)
# ---------------------------------------------------------------------------


def cljp(A: EllMatrix, S: jax.Array, global_row_offset: int | jax.Array = 0) -> jax.Array:
    """Cleary-Luby-Jones-Plassmann coarsening.

    Same independent-set engine as PMIS but with CLJP's weight updates: when
    a point is decided, the measures of its undecided strong neighbors are
    decremented (each decided edge loses its 'vote'), and points whose
    measure falls below 1 become F. Produces denser coarse grids than PMIS
    (hypre's classical default via Falgout type 6 = RS interior + CLJP
    boundary).
    """
    n, _ = A.cols.shape
    rows_global = jnp.arange(n, dtype=jnp.int32) + global_row_offset
    st_counts = strength_transpose_counts(A, S)
    measure0 = st_counts.astype(A.dtype) + hash_rand01(rows_global).astype(A.dtype)

    has_strong_row = jnp.any(S, axis=1)
    isolated = ~has_strong_row & (st_counts == 0)
    cols_c = jnp.maximum(A.cols, 0)
    overflow = A.n_rows

    def cond(state):
        cf, _ = state
        return jnp.any(cf == UNDECIDED)

    def body(state):
        cf, measure = state
        undecided = cf == UNDECIDED
        m = jnp.where(undecided, measure, 0.0)

        nbr_vals = jnp.where(S, m[cols_c], 0.0)
        row_nbr_max = jnp.max(nbr_vals, axis=1)
        scatter_cols = jnp.where(S, A.cols, overflow).reshape(-1)
        col_nbr_max = (
            jnp.zeros(A.n_rows + 1, m.dtype)
            .at[scatter_cols]
            .max(jnp.broadcast_to(m[:, None], S.shape).reshape(-1))
        )[:-1]
        nbr_max = jnp.maximum(row_nbr_max, col_nbr_max)

        new_c = undecided & (m > nbr_max) & (m > 0)
        cf = jnp.where(new_c, C_PT, cf)

        # CLJP weight update: every edge to a newly-decided C point loses its
        # vote — decrement the measure of undecided points per such edge
        newly_c = cf == C_PT  # includes this round's selections
        dep_edges = S & newly_c[cols_c]  # i depends on a C point
        dec_row = jnp.sum(dep_edges, axis=1).astype(measure.dtype)
        # edges where a C point depends on undecided i: scatter from C rows
        c_rows = newly_c[:, None] & S
        dec_col = (
            jnp.zeros(A.n_rows + 1, measure.dtype)
            .at[jnp.where(c_rows, A.cols, overflow).reshape(-1)]
            .add(jnp.ones_like(measure[0]) * c_rows.reshape(-1))
        )[:-1]
        measure = jnp.where(undecided & ~new_c, measure0 - dec_row - dec_col, measure)

        # measures below 1 can no longer be selected: finalize as F
        cf = jnp.where((cf == UNDECIDED) & (measure < 1.0), F_PT, cf)
        cf = jnp.where((cf == UNDECIDED) & isolated, F_PT, cf)
        stalled = jnp.all(cf == state[0])
        cf = jnp.where(stalled & (cf == UNDECIDED), C_PT, cf)
        return (cf, measure)

    cf0 = jnp.where(isolated, F_PT, UNDECIDED).astype(jnp.int32)
    cf, _ = jax.lax.while_loop(cond, body, (cf0, measure0))
    return cf


# ---------------------------------------------------------------------------
# Ruge-Stüben first pass + HMIS (par_coarsen.c:908, 2846; host-side)
# ---------------------------------------------------------------------------


def ruge_stuben(A: EllMatrix, S: jax.Array) -> jax.Array:
    """Classical RS first-pass coarsening (hypre_BoomerAMGCoarsenRuge,
    par_coarsen.c:908, coarsen_type 1 'cheap RS').

    Inherently sequential (greedy max-measure selection with neighbor
    updates), so it runs on host numpy at setup time — the TPU design keeps
    irregular setup on host (SURVEY §7); PMIS/CLJP remain the device-native
    defaults. Returns a device CF marker.
    """
    import numpy as np

    Sh = np.asarray(S)
    cols = np.asarray(A.cols)
    n, k = cols.shape
    # build adjacency lists: S_i (depends on) and S^T_i (depended on by)
    dep = [cols[i][Sh[i]].tolist() for i in range(n)]
    inf = [[] for _ in range(n)]
    for i in range(n):
        for j in dep[i]:
            inf[j].append(i)
    measure = np.array([len(inf[i]) for i in range(n)], dtype=np.int64)
    cf = np.zeros(n, dtype=np.int32)
    # bucket queue over integer measures
    import heapq

    heap = [(-measure[i], i) for i in range(n)]
    heapq.heapify(heap)
    decided = 0
    while heap:
        negm, i = heapq.heappop(heap)
        if cf[i] != UNDECIDED or -negm != measure[i]:
            continue  # stale entry
        if measure[i] <= 0:
            cf[i] = F_PT
            continue
        cf[i] = C_PT
        # neighbors that depend on i become F; their dependencies gain weight
        for j in inf[i]:
            if cf[j] == UNDECIDED:
                cf[j] = F_PT
                for l in dep[j]:
                    if cf[l] == UNDECIDED:
                        measure[l] += 1
                        heapq.heappush(heap, (-measure[l], l))
        for j in dep[i]:
            if cf[j] == UNDECIDED:
                measure[j] -= 1
                heapq.heappush(heap, (-measure[j], j))
    cf[cf == UNDECIDED] = F_PT
    return jnp.asarray(cf)


def hmis(A: EllMatrix, S: jax.Array, global_row_offset: int | jax.Array = 0) -> jax.Array:
    """HMIS coarsening (par_coarsen.c:2846, type 10): RS first pass on the
    shard interior, PMIS to reconcile across shards. On a single shard this
    reduces to the RS pass plus a PMIS cleanup of any F point left without a
    strong C dependency."""
    cf = ruge_stuben(A, S)
    cols_c = jnp.maximum(A.cols, 0)
    # F points with no strong C neighbor cannot interpolate: rerun PMIS on them
    dep_on_c = jnp.any(S & (cf[cols_c] == C_PT), axis=1)
    has_strong = jnp.any(S, axis=1)
    bad = (cf == F_PT) & has_strong & ~dep_on_c
    if bool(jnp.any(bad)):
        cf = jnp.where(bad, C_PT, cf)
    return cf


# ---------------------------------------------------------------------------
# Compatible-relaxation coarsening (par_cr.c, coarsen types 98/99)
# ---------------------------------------------------------------------------


def cr(
    A: EllMatrix,
    S: jax.Array,
    num_relax: int = 5,
    theta_cr: float = 0.7,
    max_rounds: int = 10,
) -> jax.Array:
    """Compatible relaxation (Brandt; hypre par_cr.c): points where
    F-relaxation on A e = 0 contracts slowly are promoted to C.

    Each round runs ``num_relax`` F-point Jacobi sweeps on the homogeneous
    system from a deterministic-random error; points whose error decays
    slower than ``theta_cr`` per round join the coarse grid, seeded by a
    PMIS pass over the remaining slow points to keep C sets independent.
    """
    n, _ = A.cols.shape
    diag = A.diagonal()
    dinv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0)
    cf = jnp.full(n, F_PT, jnp.int32)
    e0 = hash_rand01(jnp.arange(n, dtype=jnp.int32)).astype(A.dtype) - 0.5

    for _ in range(max_rounds):
        is_f = cf == F_PT
        e = jnp.where(is_f, e0, 0.0)
        before = jnp.abs(e)
        for _ in range(num_relax):
            # F-relaxation: Jacobi on F points, C points pinned to 0
            e = jnp.where(is_f, e - dinv * A.mv(e), 0.0)
        after = jnp.abs(e)
        # per-point contraction factor over the sweep block
        ratio = (after / jnp.maximum(before, 1e-30)) ** (1.0 / num_relax)
        slow = is_f & (ratio > theta_cr)
        n_slow = int(jnp.sum(slow))
        if n_slow == 0:
            break
        # independent subset of the slow points becomes C (hypre seeds its
        # next candidate set the same way)
        sub_S = S & slow[jnp.maximum(A.cols, 0)] & slow[:, None]
        cand_cf = pmis(A, sub_S)
        newly_c = slow & (cand_cf == C_PT)
        # isolated slow points (no slow strong neighbors) also become C
        newly_c = newly_c | (slow & ~jnp.any(sub_S, axis=1))
        if int(jnp.sum(newly_c)) == 0:
            newly_c = slow
        cf = jnp.where(newly_c, C_PT, cf)
    return cf


# ---------------------------------------------------------------------------
# CGC — coarse grid classification (par_cgc_coarsen.c, coarsen types 21/22)
# ---------------------------------------------------------------------------


def cgc(
    A: EllMatrix,
    S: jax.Array,
    num_candidates: int = 4,
    n_blocks: int = 0,
    cc_penalty: float = 2.0,
) -> jax.Array:
    """Coarse-grid-classification coarsening (Griebel/Metsch/Schweitzer;
    hypre_BoomerAMGCoarsenCGC, ``parcsr_ls/par_cgc_coarsen.c``, coarsen
    types 21/22).

    The reference has each MPI rank build several candidate RS coarse grids,
    then solves a global weighted-graph problem choosing one candidate per
    rank so the grids fit together at rank boundaries (few strong C-C
    couplings across the cut, every boundary F point covered by some C).
    Here the "ranks" are contiguous row blocks of the shard: each block runs
    the RS first pass restricted to intra-block strong edges with
    ``num_candidates`` different tie-breaking perturbations (the reference
    derives candidates from repeated RS passes; perturbed tie-breaking
    produces the same kind of family with one code path), then a greedy
    sweep over blocks picks the candidate minimizing

        cc_penalty * (#cross strong C-C pairs) + (#uncovered cross F points)

    against already-fixed neighbors. A final PMIS-style cleanup promotes any
    strong F point left without a strong C dependency (same repair HMIS
    uses).
    """
    import numpy as np

    Sh = np.asarray(S)
    cols = np.asarray(A.cols)
    n, k = cols.shape
    if n_blocks <= 0:
        n_blocks = int(min(max(n // 256, 1), 8))
    bounds = np.linspace(0, n, n_blocks + 1).astype(np.int64)
    block_of = np.zeros(n, np.int64)
    for b in range(n_blocks):
        block_of[bounds[b]:bounds[b + 1]] = b

    # strong edge list (i -> j)
    ei, ea = np.nonzero(Sh)
    ej = cols[ei, ea]
    intra = block_of[ei] == block_of[ej]
    cross_i, cross_j = ei[~intra], ej[~intra]

    def rs_block(lo: int, hi: int, seed: int) -> np.ndarray:
        """RS first pass on rows [lo,hi) over intra-block strong edges, with
        seed-perturbed tie-breaking."""
        import heapq

        idx = np.arange(lo, hi)
        dep = {i: [] for i in idx}
        inf = {i: [] for i in idx}
        for i, j in zip(ei[intra], ej[intra]):
            if lo <= i < hi:
                dep[i].append(j)
                inf[j].append(i)
        rng = np.random.RandomState(12345 + seed)
        tie = rng.permutation(hi - lo)
        measure = {i: len(inf[i]) * (hi - lo) + int(tie[i - lo]) for i in idx}
        cf = np.zeros(n, np.int32)
        heap = [(-measure[i], i) for i in idx]
        heapq.heapify(heap)
        while heap:
            negm, i = heapq.heappop(heap)
            if cf[i] != UNDECIDED or -negm != measure[i]:
                continue
            if measure[i] < (hi - lo):  # no influence left
                cf[i] = F_PT
                continue
            cf[i] = C_PT
            for j in inf[i]:
                if cf[j] == UNDECIDED:
                    cf[j] = F_PT
                    for l in dep[j]:
                        if cf[l] == UNDECIDED:
                            measure[l] += hi - lo
                            heapq.heappush(heap, (-measure[l], l))
            for j in dep[i]:
                if cf[j] == UNDECIDED:
                    measure[j] -= hi - lo
                    heapq.heappush(heap, (-measure[j], j))
        cf[lo:hi][cf[lo:hi] == UNDECIDED] = F_PT
        return cf[lo:hi]

    cands = [
        [rs_block(int(bounds[b]), int(bounds[b + 1]), c)
         for c in range(num_candidates)]
        for b in range(n_blocks)
    ]

    def score(cf_full: np.ndarray, b: int, cand: np.ndarray) -> float:
        """Cost of picking `cand` for block b against currently-fixed blocks."""
        trial = cf_full.copy()
        trial[bounds[b]:bounds[b + 1]] = cand
        m = (block_of[cross_i] == b) | (block_of[cross_j] == b)
        ti, tj = cross_i[m], cross_j[m]
        fixed = (trial[ti] != UNDECIDED) & (trial[tj] != UNDECIDED)
        ti, tj = ti[fixed], tj[fixed]
        cc = np.sum((trial[ti] == C_PT) & (trial[tj] == C_PT))
        # cross F points in b's frontier with no strong C neighbor anywhere
        fpts = np.unique(ti[trial[ti] == F_PT])
        uncov = 0
        for i in fpts:
            nbr = cols[i][Sh[i]]
            if not np.any(trial[nbr] == C_PT):
                uncov += 1
        return cc_penalty * float(cc) + float(uncov)

    cf_full = np.zeros(n, np.int32)
    # fix blocks in order of most cross edges first (most constrained)
    cross_count = np.bincount(block_of[cross_i], minlength=n_blocks)
    order = np.argsort(-cross_count)
    for b in order:
        best = min(range(num_candidates),
                   key=lambda c: score(cf_full, b, cands[b][c]))
        cf_full[bounds[b]:bounds[b + 1]] = cands[b][best]

    cf = jnp.asarray(cf_full)
    # repair: strong F points without a strong C dependency become C
    cols_c = jnp.maximum(A.cols, 0)
    dep_on_c = jnp.any(S & (cf[cols_c] == C_PT), axis=1)
    has_strong = jnp.any(S, axis=1)
    bad = (cf == F_PT) & has_strong & ~dep_on_c
    return jnp.where(bad, C_PT, cf)
