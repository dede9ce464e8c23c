"""AMG-DD — communication-avoiding AMG with per-device composite grids.

Analogue of hypre's AMG-DD (``parcsr_ls/par_amgdd*.c``,
HYPRE_parcsr_ls.h:1384): at setup, every rank assembles a *composite grid* —
its owned rows plus a few layers of padding on every level of an existing
AMG hierarchy — so that each solve cycle needs exactly ONE residual
communication (``hypre_BoomerAMGDD_ResidualCommunication``,
par_amgdd_solve.c:221) followed by communication-free local FAC cycles.

TPU formulation: the composite grids of all devices are padded to a common
static shape and stacked, so the whole "each rank cycles locally" phase is
one ``shard_map`` region with zero collectives inside; the single residual
exchange is the distributed matvec + an all_gather. Owned-row masks make the
correction additive-Schwarz-consistent (hypre masks to owned DOFs the same
way).

Trades arithmetic (padded local hierarchies) for latency — the
communication-avoiding regime AMG-DD targets on large machines.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.amg.boomeramg import BoomerAMG
from hypre_tpu.core.config import PAD_COL, make_convergence_info, ConvergenceInfo
from hypre_tpu.seq.ell import EllMatrix, ell_spmv


def _expand(owned: np.ndarray, cols: np.ndarray, rounds: int) -> np.ndarray:
    """Grow a row set by graph-neighbor layers (padding, hypre's
    'padding'/'num_ghost_layers' knobs)."""
    sel = owned.copy()
    for _ in range(rounds):
        nbr = np.zeros_like(sel)
        touched = cols[sel]
        touched = touched[touched >= 0]
        nbr[np.unique(touched)] = True
        sel = sel | nbr
    return sel


def _extract_rows(vals, cols, rows_sel, gmap, n_local):
    """Local block of an ELL matrix on a selected row set: rows outside the
    set are zero; columns outside map to PAD (zero Dirichlet)."""
    lv = vals[rows_sel]
    lc = cols[rows_sel]
    safe = np.maximum(lc, 0)
    mapped = gmap[safe]
    keep = (lc >= 0) & (mapped >= 0)
    return np.where(keep, lv, 0.0), np.where(keep, mapped, PAD_COL).astype(np.int32)


@dataclasses.dataclass
class AMGDD:
    """HYPRE_BoomerAMGDDCreate analogue (driver solver ids 90/91)."""

    padding: int = 2  # neighbor layers per level (hypre SetPadding)
    num_devices: int = 1
    fac_relax_weight: float = 0.7
    fac_num_relax: int = 2
    amg: Optional[BoomerAMG] = None

    def setup(self, A: EllMatrix, num_devices: int) -> "AMGDD":
        """Build the underlying AMG hierarchy, then every device's composite
        grid (par_amgdd_setup.c)."""
        self.num_devices = num_devices
        self.amg = (self.amg or BoomerAMG(max_coarse_size=min(64, A.n_rows)))
        if self.amg.hierarchy is None:
            self.amg.setup(A, optimize=False)
        hier = self.amg.hierarchy
        levels = hier.levels
        n0 = A.n_rows
        P = num_devices
        block = -(-n0 // P)

        # per-device, per-level: owned + padded row sets
        per_level_sets: List[List[np.ndarray]] = []  # [dev][lev] -> bool mask
        for d in range(P):
            owned0 = np.zeros(n0, bool)
            owned0[d * block : min((d + 1) * block, n0)] = True
            sets = []
            owned = owned0
            for lev in levels:
                cols = np.asarray(lev.A.cols)
                sel = _expand(owned, cols, self.padding)
                sets.append(sel)
                # owned set on the next level: coarse points the padded set
                # interpolates from (reachable through P's columns)
                pcols = np.asarray(lev.P.cols)
                nc = lev.P.n_cols
                nxt = np.zeros(nc, bool)
                touched = pcols[sel]
                touched = touched[touched >= 0]
                nxt[np.unique(touched)] = True
                owned = nxt
            per_level_sets.append(sets)

        # static composite sizes: max per level over devices
        sizes = [
            max(int(per_level_sets[d][l].sum()) for d in range(P))
            for l in range(len(levels))
        ]

        # build stacked local hierarchies
        self._levels = []
        coarse_n = hier.coarse_inv.shape[0]
        for l, lev in enumerate(levels):
            vals = np.asarray(lev.A.vals)
            cols = np.asarray(lev.A.cols)
            pvals = np.asarray(lev.P.vals)
            pcols = np.asarray(lev.P.cols)
            nl = sizes[l]
            n_next = sizes[l + 1] if l + 1 < len(levels) else coarse_n
            AV, AC, PV, PC, DI, OWN, GIDX = [], [], [], [], [], [], []
            for d in range(P):
                sel = per_level_sets[d][l]
                rows_sel = np.nonzero(sel)[0]
                gmap = -np.ones(lev.A.n_rows, np.int64)
                gmap[rows_sel] = np.arange(len(rows_sel))
                if l + 1 < len(levels):
                    sel_c = per_level_sets[d][l + 1]
                    rows_c = np.nonzero(sel_c)[0]
                    gmap_c = -np.ones(levels[l + 1].A.n_rows, np.int64)
                    gmap_c[rows_c] = np.arange(len(rows_c))
                else:
                    # coarsest: composite set = the WHOLE coarse grid (tiny)
                    gmap_c = np.arange(coarse_n, dtype=np.int64)
                av, ac = _extract_rows(vals, cols, rows_sel, gmap, nl)
                pv, pc = _extract_rows(pvals, pcols, rows_sel, gmap_c, n_next)
                # pad rows up to the static nl
                pad = nl - len(rows_sel)
                av = np.vstack([av, np.zeros((pad, av.shape[1]))])
                ac = np.vstack([ac, np.full((pad, ac.shape[1]), PAD_COL, np.int32)])
                pv = np.vstack([pv, np.zeros((pad, pv.shape[1]))])
                pc = np.vstack([pc, np.full((pad, pc.shape[1]), PAD_COL, np.int32)])
                diag = np.zeros(nl)
                rr = np.arange(len(rows_sel))
                dm = ac[: len(rows_sel)] == rr[:, None]
                diag[: len(rows_sel)] = (av[: len(rows_sel)] * dm).sum(1)
                own = np.zeros(nl)
                if l == 0:
                    own[: len(rows_sel)] = (
                        (rows_sel >= d * block) & (rows_sel < (d + 1) * block)
                    ).astype(float)
                gidx = np.full(nl, 0, np.int32)
                gidx[: len(rows_sel)] = rows_sel
                AV.append(av); AC.append(ac); PV.append(pv); PC.append(pc)
                DI.append(np.where(diag != 0, 1.0 / np.where(diag != 0, diag, 1), 0))
                OWN.append(own); GIDX.append(gidx)
            dt = np.asarray(vals).dtype
            self._levels.append(dict(
                av=jnp.asarray(np.stack(AV), dt), ac=jnp.asarray(np.stack(AC)),
                pv=jnp.asarray(np.stack(PV), dt), pc=jnp.asarray(np.stack(PC)),
                dinv=jnp.asarray(np.stack(DI), dt),
                own=jnp.asarray(np.stack(OWN), dt),
                gidx=jnp.asarray(np.stack(GIDX)),
                n_next=n_next,
            ))
        self._coarse_inv = hier.coarse_inv
        self._n0 = n0
        self._block = block
        return self

    # -- the communication-free local FAC cycle (vmapped over devices) -------

    def _local_cycle(self, r_comp):
        """r_comp: (P, n_comp0) composite residuals -> corrections."""

        def lmv(av, ac, x):
            g = jnp.take(x, jnp.maximum(ac, 0), axis=0)
            return jnp.sum(jnp.where(ac >= 0, av, 0.0) * g, axis=1)

        def lmv_t(pv, pc, x, n_out):
            contrib = jnp.where(pc >= 0, pv * x[:, None], 0.0).reshape(-1)
            return jnp.zeros(n_out, x.dtype).at[
                jnp.maximum(pc, 0).reshape(-1)
            ].add(contrib)

        def cycle_dev(levels_dev, f):
            def descend(l, f, u):
                if l == len(self._levels):
                    return self._coarse_inv @ f
                lv = levels_dev[l]
                for _ in range(self.fac_num_relax):
                    u = u + self.fac_relax_weight * lv["dinv"] * (
                        f - lmv(lv["av"], lv["ac"], u)
                    )
                r = f - lmv(lv["av"], lv["ac"], u)
                rc = lmv_t(lv["pv"], lv["pc"], r, lv["n_next"])
                ec = descend(l + 1, rc, jnp.zeros_like(rc))
                u = u + lmv(lv["pv"], lv["pc"], ec)
                for _ in range(self.fac_num_relax):
                    u = u + self.fac_relax_weight * lv["dinv"] * (
                        f - lmv(lv["av"], lv["ac"], u)
                    )
                return u

            return descend(0, f, jnp.zeros_like(f))

        # vmap over the device axis of the stacked hierarchies
        stacked = [
            {k: v for k, v in lev.items() if k != "n_next"}
            for lev in self._levels
        ]
        def body(per_dev_slices, f):
            levels_dev = []
            for l, lev in enumerate(self._levels):
                d = {k: per_dev_slices[l][k] for k in ("av", "ac", "pv", "pc", "dinv")}
                d["n_next"] = lev["n_next"]
                levels_dev.append(d)
            return cycle_dev(levels_dev, f)

        return jax.vmap(body)(stacked, r_comp)

    def cycle(self, b: jax.Array, u: jax.Array) -> jax.Array:
        """One AMG-DD cycle: ONE global residual + local composite cycles
        (par_amgdd_solve.c structure)."""
        A0 = self.amg.hierarchy.levels[0].A
        r = b - ell_spmv(A0, u)  # the single communication point
        lev0 = self._levels[0]
        r_comp = jnp.take(r, lev0["gidx"], axis=0)  # (P, n_comp0) gather
        e_comp = self._local_cycle(r_comp)
        # additive owned-row correction back to the global vector
        contrib = (lev0["own"] * e_comp).reshape(-1)
        upd = jnp.zeros_like(u).at[lev0["gidx"].reshape(-1)].add(contrib)
        return u + upd

    def solve(
        self,
        b: jax.Array,
        x0: Optional[jax.Array] = None,
        rtol: float = 1e-8,
        maxiter: int = 200,
    ) -> tuple[jax.Array, ConvergenceInfo]:
        A0 = self.amg.hierarchy.levels[0].A
        x = jnp.zeros_like(b) if x0 is None else x0
        b2 = jnp.sum(b * b)
        eps = rtol * rtol * b2

        def cond(state):
            _, r2, it = state
            return (r2 > eps) & (it < maxiter) & jnp.isfinite(r2)

        def body(state):
            x, _, it = state
            x = self.cycle(b, x)
            r = b - ell_spmv(A0, x)
            return x, jnp.sum(r * r), it + 1

        r0 = b - ell_spmv(A0, x)
        x, r2, iters = jax.lax.while_loop(
            cond, body, (x, jnp.sum(r0 * r0), jnp.int32(0))
        )
        safe = jnp.where(b2 > 0, b2, 1.0)
        rel = jnp.sqrt(jnp.maximum(r2, 0.0) / safe)
        return x, make_convergence_info(iters, rel, (r2 <= eps) | (b2 == 0))

    def precond(self):
        zero = None

        def M(r):
            return self.cycle(r, jnp.zeros_like(r))

        return M
