"""Slab primitives for on-device sparse setup — merge, compact, cap, gather.

The TPU cost model measured on this chip (see bench notes): element gathers
and scatters run on the scalar unit at ~8-11 ns/element, global sorts at
~4-6 ns/element, but *axis-1 slab sorts* run at vector speed (~0.7 ns/elt
per bitonic pass) and rolls/shifts are nearly free. hypre's GPU SpGEMM
(``seq_mv/csr_spgemm_device.c``) leans on hash tables — random access that
GPUs do well and this chip does not — so every merge here is reformulated
as: variadic axis-1 sort (columns + values sorted together, no argsort+
gather), segmented Hillis-Steele doubling scan to collapse duplicates (log K
shifted adds, gather-free), and a second slab sort to left-compact the
unique entries. Row gathers pack auxiliary data into trailing dims so the
11x row-gather advantage applies, and shift-structured (DIA) index maps skip
gathering entirely via rolls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hypre_tpu.core.config import PAD_COL

_BIG = jnp.int32(2**30)


def sort_slab(key, *vals, dimension=1, num_keys=1):
    """Variadic sort along an axis (cols+vals together, no argsort+gather)."""
    return lax.sort((key, *vals), dimension=dimension, num_keys=num_keys)


def seg_total_sorted(key_s: jax.Array, val_s: jax.Array) -> jax.Array:
    """Per-entry segment totals over axis 1 of a *column-sorted* slab.

    Returns t where t[i, j] = sum of val_s[i, j'] over the maximal run of
    equal key_s around j — but only guaranteed correct at the FIRST entry of
    each run (inclusive suffix scan by doubling; sorted keys make the
    distance-d equality test transitive). log2(K) shifted adds, no gathers.
    """
    n, K = key_s.shape
    s = val_s
    d = 1
    while d < K:
        same = key_s[:, : K - d] == key_s[:, d:]
        add = jnp.where(same, s[:, d:], 0)
        s = jnp.concatenate([s[:, : K - d] + add, s[:, K - d:]], axis=1)
        d *= 2
    return s


def merge_slab(cols: jax.Array, vals: jax.Array, out_k: int,
               max_elmts: int = 0, trunc_factor: float = 0.0,
               rescale_rowsum: bool = False):
    """Merge duplicate columns within each row of a candidate slab and
    left-compact the unique entries to width ``out_k``.

    Replaces spgemm._merge_rows' scatter formulation (the scatter cost
    ~8 ns/elt dominated setup). Optionally fuses hypre's interpolation
    truncation (``par_interp_trunc_device.c``): keep the ``max_elmts``
    largest |value| uniques per row, drop those below trunc_factor*rowmax,
    and rescale survivors to preserve the row sum.

    Returns (out_cols, out_vals, required_k) — required_k is the true
    max unique count per row BEFORE truncation capping, so callers can
    detect out_k overflow (only meaningful when max_elmts == 0).
    """
    n, K = cols.shape
    key = jnp.where(cols >= 0, cols, _BIG)
    key_s, val_s = sort_slab(key, vals)
    valid_s = key_s < _BIG
    is_new = valid_s & jnp.concatenate(
        [jnp.ones((n, 1), bool), key_s[:, 1:] != key_s[:, :-1]], axis=1
    )
    tot = seg_total_sorted(key_s, val_s)  # segment totals at first-of-run
    nuniq = jnp.sum(is_new, axis=1).astype(jnp.int32)
    required_k = jnp.max(nuniq)

    if max_elmts > 0 or trunc_factor > 0.0:
        mag = jnp.where(is_new, jnp.abs(tot), -1.0)
        if trunc_factor > 0.0:
            row_max = jnp.max(mag, axis=1, keepdims=True)
            keep_mag = mag >= trunc_factor * row_max
        else:
            keep_mag = is_new
        # rank uniques by |total| descending: sort by -mag, slice, re-sort
        # (tie-break equal magnitudes by column so truncation picks the
        # same entries regardless of candidate slot order)
        skey = jnp.where(is_new & keep_mag, -mag, jnp.inf).astype(val_s.dtype)
        sk, c2, v2 = sort_slab(skey, key_s, tot, num_keys=2)
        kk = max_elmts if max_elmts > 0 else out_k
        alive = ~jnp.isinf(sk[:, :kk])  # dead slots carried a +inf key
        c2 = jnp.where(alive, c2[:, :kk], PAD_COL)
        v2 = jnp.where(alive, v2[:, :kk], 0)
        if rescale_rowsum:
            old_sum = jnp.sum(jnp.where(is_new, tot, 0), axis=1)
            new_sum = jnp.sum(v2, axis=1)
            scale = jnp.where(
                new_sum != 0, old_sum / jnp.where(new_sum != 0, new_sum, 1.0), 1.0
            )
            v2 = v2 * scale[:, None]
        # restore column order within rows (downstream kernels assume it)
        ck = jnp.where(c2 >= 0, c2, _BIG)
        _, v3, c3 = sort_slab(ck, v2, c2)
        return c3, v3, required_k

    # plain compaction: stable-partition uniques left via position keys
    pos = jnp.arange(K, dtype=jnp.int32)[None, :]
    pkey = jnp.broadcast_to(jnp.where(is_new, pos, _BIG), (n, K))
    pk, c2, v2 = sort_slab(pkey, key_s, tot)
    alive = pk[:, :out_k] < _BIG
    c2 = jnp.where(alive, c2[:, :out_k], PAD_COL)
    v2 = jnp.where(alive, v2[:, :out_k], 0)
    return c2, v2, required_k


def cap_slab(cols: jax.Array, vals: jax.Array, kcap: int,
             rescale_rowsum: bool = False, lump_largest: bool = False,
             extra: tuple = (), tie_cols=None):
    """Keep the ``kcap`` largest-|v| entries per row (col-sorted output).

    The setup-path analogue of hypre's P_max_elmts applied to arbitrary
    slabs; used to bound SpGEMM candidate growth (dropped mass optionally
    lumped onto the row's largest surviving entry to preserve row sums —
    the par_nongalerkin.c lumping idea applied early).

    ``extra``: additional per-entry payload slabs carried through the same
    selection (returned appended to the (cols, vals) pair).
    """
    n, K = cols.shape
    if kcap >= K:
        return (cols, vals, *extra)
    vals = jnp.where(cols >= 0, vals, 0)
    mag = jnp.where(cols >= 0, jnp.abs(vals), -1.0).astype(vals.dtype)
    # tie-break equal magnitudes by column so the selection is independent
    # of slot order (the distributed path sees diag/offd-reordered slabs);
    # tie_cols lets that path substitute GLOBAL ids for its local indices
    tcols = cols if tie_cols is None else tie_cols
    tie = jnp.where(cols >= 0, tcols, _BIG)
    _, _, c2, v2, *e2 = sort_slab(-mag, tie, cols, vals, *extra, num_keys=2)
    c2, v2 = c2[:, :kcap], v2[:, :kcap]
    e2 = [e[:, :kcap] for e in e2]
    c2 = jnp.where(c2 >= 0, c2, PAD_COL)
    v2 = jnp.where(c2 >= 0, v2, 0)
    if lump_largest:
        dropped = jnp.sum(vals, axis=1) - jnp.sum(v2, axis=1)
        v2 = v2.at[:, 0].add(dropped)  # slot 0 holds the largest |v|
    elif rescale_rowsum:
        old = jnp.sum(vals, axis=1)
        new = jnp.sum(v2, axis=1)
        scale = jnp.where(new != 0, old / jnp.where(new != 0, new, 1.0), 1.0)
        v2 = v2 * scale[:, None]
    ck = jnp.where(c2 >= 0, c2, _BIG)
    _, v3, c3, *e3 = sort_slab(ck, v2, c2, *e2)
    c3 = jnp.where(c3 < _BIG, c3, PAD_COL)
    return (c3, v3, *e3)


def compact_mask_slab(cols: jax.Array, vals: jax.Array, keep: jax.Array,
                      out_k: int):
    """Left-compact entries where ``keep`` (no dedup), PAD elsewhere."""
    n, K = cols.shape
    pos = jnp.arange(K, dtype=jnp.int32)[None, :]
    pkey = jnp.broadcast_to(jnp.where(keep & (cols >= 0), pos, _BIG), (n, K))
    pk, c2, v2 = sort_slab(pkey, cols, vals)
    alive = pk[:, :out_k] < _BIG
    c2 = jnp.where(alive, c2[:, :out_k], PAD_COL)
    v2 = jnp.where(alive, v2[:, :out_k], 0)
    return c2, v2


# ---------------------------------------------------------------------------
# Gather strategies: plain row gather vs shift (DIA) dynamic slices
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class StencilPack:
    """Shift-structured index map with VALUE-dynamic offsets.

    The per-slot offsets live in a traced int32 array, so compiled
    programs specialize only on the STRUCTURE (slot count ``k``, padding
    ``margin``, transpose pairing, distance-2 composition groups) — a
    96^3 and a 128^3 Laplacian share every setup program. This is the
    TPU answer to hypre compiling its setup ONCE for any problem shape
    (``par_amg_setup.c`` is shape-generic C): gathers become
    ``lax.dynamic_slice`` from a margin-padded copy, which on this chip
    measured ~2x FASTER than the static-roll+mask formulation it
    replaces.

    margin: static bound with ``|offset| <= margin`` for every slot
    (host-verified at construction).
    pair_idx[a]: slot index carrying -offs[a], or -1 (transpose pairing
    for paired_transpose_vals).
    d2: optional distance-2 composition structure for second_pass_pmis:
    a tuple of per-output-offset groups ``(singles, pairs)`` where
    ``singles`` are slot ids with offs[s] equal to the output offset and
    ``pairs`` are (a, b) with offs[a]+offs[b] equal to it.
    """

    def __init__(self, offs, margin: int, pair_idx: tuple = (),
                 d2: tuple | None = None):
        self.offs = offs
        self.margin = int(margin)
        self.pair_idx = tuple(pair_idx)
        self.d2 = d2

    @property
    def k(self) -> int:
        return self.offs.shape[0]

    def slice(self, s0: int, s1: int) -> "StencilPack":
        """Static sub-range of slots (blocked kernels); drops pair/d2."""
        return StencilPack(self.offs[s0:s1], self.margin)

    def tree_flatten(self):
        return (self.offs,), (self.margin, self.pair_idx, self.d2)

    @classmethod
    def tree_unflatten(cls, aux, children):
        margin, pair_idx, d2 = aux
        return cls(children[0], margin, pair_idx, d2)


# Margin menu: margins are n_bucket >> j so programs never specialize on
# the actual stencil extent — only on (n_bucket, j).
_MARGIN_SHIFTS = (6, 5, 4, 3, 2, 1, 0)


def _pick_margin(n_bucket: int, max_abs_off: int) -> int:
    """Smallest menu margin covering the stencil extent (menu entries are
    fixed fractions of n_bucket so the static signature is scale-free)."""
    for j in _MARGIN_SHIFTS:
        m = max(n_bucket >> j, 8)
        if m >= max_abs_off + 1:
            return m
    return int(max_abs_off + 1)


def make_stencil_pack(shifts_host, n_bucket: int,
                      with_d2: bool = False,
                      margin: int | None = None) -> StencilPack:
    """Build a StencilPack from HOST offset values (numpy ints).

    The static aux (margin, pairing, d2 groups) is derived from the host
    values but is scale-free for any non-degenerate grid: two Laplacians
    of different sizes produce identical aux, so they trace to the same
    program.
    """
    sh = [int(s) for s in shifts_host]
    if margin is None:
        margin = _pick_margin(n_bucket, max(abs(s) for s in sh) if sh else 0)
    pair_idx = tuple(sh.index(-s) if -s in sh else -1 for s in sh)
    d2 = None
    if with_d2:
        groups: dict = {}
        for a, sa in enumerate(sh):
            if sa != 0:
                groups.setdefault(sa, ([], []))[0].append(a)
            for b, sb in enumerate(sh):
                o = sa + sb
                if o != 0:
                    groups.setdefault(o, ([], []))[1].append((a, b))
        d2 = tuple(
            (tuple(s), tuple(p))
            for o, (s, p) in sorted(groups.items())
        )
    return StencilPack(
        jnp.asarray(sh, jnp.int32), margin, pair_idx, d2
    )


def _pad_rows(X: jax.Array, m: int, fill):
    pad = jnp.full((m,) + X.shape[1:], fill, X.dtype)
    return jnp.concatenate([pad, X, pad], axis=0)


def shift_gather_dyn(X: jax.Array, sp: StencilPack, fill=0,
                     flat: bool = False):
    """g[i, s, ...] = X[i + offs[s], ...] with out-of-range rows = fill.

    One margin-padded copy + k dynamic slices at traced offsets; the
    padding supplies the fill so no masks are needed. flat=True with 2-D
    X returns (n, k*W) by concatenation (minor-dim lane-padding note in
    shift_gather_rows applies)."""
    n = X.shape[0]
    Xp = _pad_rows(X, sp.margin, fill)
    outs = [
        lax.dynamic_slice_in_dim(Xp, sp.margin + sp.offs[s], n, axis=0)
        for s in range(sp.k)
    ]
    if flat and X.ndim == 2:
        return jnp.concatenate(outs, axis=1)
    return jnp.stack(outs, axis=1)


def shift_scatter_add_dyn(contrib: jax.Array, sp: StencilPack):
    """out[j] = sum_s contrib[j - offs[s], s] (reverse of the gather).
    contrib is (n, k); invalid slots must already hold 0."""
    n = contrib.shape[0]
    acc = None
    for s in range(sp.k):
        cp = _pad_rows(contrib[:, s], sp.margin, 0)
        sl = lax.dynamic_slice_in_dim(cp, sp.margin - sp.offs[s], n, axis=0)
        acc = sl if acc is None else acc + sl
    return acc


def shift_scatter_max_dyn(contrib: jax.Array, sp: StencilPack, fill=0.0):
    """out[j] = max_s contrib[j - offs[s], s]; invalid slots must hold
    ``fill`` (the identity for the max in use)."""
    n = contrib.shape[0]
    acc = None
    for s in range(sp.k):
        cp = _pad_rows(contrib[:, s], sp.margin, fill)
        sl = lax.dynamic_slice_in_dim(cp, sp.margin - sp.offs[s], n, axis=0)
        acc = sl if acc is None else jnp.maximum(acc, sl)
    return acc


def detect_shifts(cols_np: np.ndarray) -> np.ndarray | None:
    """If cols[i, s] == i + shift_s at every valid entry (a boundary-
    truncated stencil in lexicographic order — what par_laplace.c-style
    generators emit), return the per-slot shifts. Host-side, once."""
    n, k = cols_np.shape
    if n == 0:
        return None
    rows = np.arange(n, dtype=np.int64)[:, None]
    diff = cols_np.astype(np.int64) - rows
    valid = cols_np >= 0
    shifts = np.zeros(k, np.int64)
    for s in range(k):
        v = diff[valid[:, s], s]
        if v.size == 0:
            shifts[s] = 0
            continue
        if not (v == v[0]).all():
            return None
        shifts[s] = v[0]
    return shifts


def shift_gather_rows(X: jax.Array, shifts, fill=0, flat: bool = False):
    """g[i, s, ...] = X[i + shifts[s], ...] with out-of-range rows filled.

    The DIA specialization of ``X[cols]``: k rolls instead of n*k scalar
    gathers (~70x cheaper on this chip). Consumers must still mask slots
    that are structurally invalid for interior reasons (the roll only
    handles the range check).

    flat=True with a 2-D X returns (n, k*W) by concatenation — keeping
    every intermediate 2-D with a wide minor dim. TPU tiles pad the minor
    dim to 128 lanes, so 3-D (n, k, smallW) slabs explode 4-16x in HBM;
    the flat form avoids that entirely.
    """
    n = X.shape[0]
    outs = []
    for s in shifts:
        s = int(s)
        r = jnp.roll(X, -s, axis=0)
        if s > 0:
            idx = jnp.arange(n) < n - s
        elif s < 0:
            idx = jnp.arange(n) >= -s
        else:
            outs.append(r)
            continue
        mask = idx.reshape((n,) + (1,) * (X.ndim - 1))
        outs.append(jnp.where(mask, r, fill))
    if flat and X.ndim == 2:
        return jnp.concatenate(outs, axis=1)  # (n, k*W)
    return jnp.stack(outs, axis=1)  # (n, k, ...)


def make_row_gather(shifts):
    """Returns gather(X, cols_c) -> (n, k, ...) choosing rolls when the
    index map is shift-structured (shifts not None) else X[cols_c]."""
    if shifts is None:
        def gather(X, cols_c):
            return X[jnp.maximum(cols_c, 0)]
    else:
        def gather(X, cols_c):
            return shift_gather_rows(X, shifts)
    return gather
