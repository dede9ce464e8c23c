"""SysPFMG — PFMG for multi-variable structured systems.

Analogue of hypre's SysPFMG (``sstruct_ls/sys_pfmg*.c``): one structured
part, nvars coupled variables, stencil blocks A[vi][vj]. Semicoarsening
direction and interpolation come from the variable-diagonal blocks
(``sys_pfmg_setup_interp.c`` builds P block-diagonally); the Galerkin coarse
operator is recovered by lattice probing per source variable — the same
engine as scalar PFMG, with the variable index as a batch axis.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.core.config import make_convergence_info, ConvergenceInfo
from hypre_tpu.struct.matrix import StructMatrix, shift, struct_matvec
from hypre_tpu.struct.pfmg import compute_dxyz
from hypre_tpu.struct.semi import SemiInterp, coarse_shape, semi_interp_from_matrix
from hypre_tpu.struct.stencil import StructStencil


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SysStructMatrix:
    """coeffs[vi, vj, s, ...]: coupling of variable vj into vi's equation."""

    coeffs: jax.Array  # (nvars, nvars, S, *shape)
    stencil: StructStencil = dataclasses.field(metadata=dict(static=True))
    shape: tuple[int, ...] = dataclasses.field(metadata=dict(static=True))

    @property
    def nvars(self) -> int:
        return self.coeffs.shape[0]

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def n_rows(self) -> int:
        return self.nvars * int(np.prod(self.shape))

    @property
    def dtype(self):
        return self.coeffs.dtype

    def block(self, vi: int, vj: int) -> StructMatrix:
        return StructMatrix(
            coeffs=self.coeffs[vi, vj], stencil=self.stencil, shape=self.shape
        )

    def mv(self, x: jax.Array) -> jax.Array:
        """x: (nvars, *shape) -> (nvars, *shape)."""
        ys = []
        for vi in range(self.nvars):
            acc = None
            for vj in range(self.nvars):
                for s, off in enumerate(self.stencil.offsets):
                    term = self.coeffs[vi, vj, s] * shift(x[vj], off)
                    acc = term if acc is None else acc + term
            ys.append(acc)
        return jnp.stack(ys)

    def as_linear_op(self):
        nv, shape = self.nvars, self.shape
        return lambda v: self.mv(v.reshape((nv,) + shape)).reshape(-1)

    def to_dense(self) -> jax.Array:
        n = self.n_rows
        eye = jnp.eye(n, dtype=self.dtype).reshape((n, self.nvars) + self.shape)
        cols = jax.vmap(lambda e: self.mv(e).reshape(-1))(eye)
        return cols.T


def _probe_sys(apply_fn, nvars, shape, extent, dtype) -> "SysStructMatrix":
    """Recover a SysStructMatrix from a linear map on (nvars, *shape) —
    probing per (source variable, lattice class)."""
    ndim = len(shape)
    mods = tuple(2 * e + 1 for e in extent)
    probes = {}
    apply_jit = jax.jit(apply_fn)
    for v in range(nvars):
        for c in itertools.product(*(range(m) for m in mods)):
            x = np.zeros((nvars,) + shape, dtype)
            x[(v,) + tuple(slice(ci, None, mi) for ci, mi in zip(c, mods))] = 1
            probes[(v, c)] = apply_jit(jnp.asarray(x))  # (nvars, *shape)
    idx = np.indices(shape)
    offsets = list(itertools.product(*(range(-e, e + 1) for e in extent)))
    coeffs = np.zeros(
        (nvars, nvars, len(offsets)) + tuple(shape), dtype
    )
    for vj in range(nvars):
        # class of (i + off) per point, per offset
        for s, off in enumerate(offsets):
            cls = tuple(
                (idx[d] + off[d]) % mods[d] for d in range(ndim)
            )
            # gather from the probe with matching class — assemble per class
            for c in itertools.product(*(range(m) for m in mods)):
                mask = np.ones(shape, bool)
                for d in range(ndim):
                    mask &= cls[d] == c[d]
                if not mask.any():
                    continue
                y = np.asarray(probes[(vj, c)])  # (nvars, *shape)
                coeffs[:, vj, s][:, mask] = y[:, mask]
    keep = [
        s
        for s, off in enumerate(offsets)
        if off == (0,) * ndim or np.any(coeffs[:, :, s])
    ]
    return SysStructMatrix(
        coeffs=jnp.asarray(coeffs[:, :, keep]),
        stencil=StructStencil(tuple(offsets[s] for s in keep)),
        shape=tuple(shape),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SysPFMGLevel:
    A: SysStructMatrix
    P: Optional[tuple]  # tuple of per-variable SemiInterp
    dinv: jax.Array  # (nvars, *shape)
    # per-point inverse of the (nvars, nvars) center coupling block —
    # nodal relaxation (sstruct_ls/node_relax.c); None when relax is
    # pointwise
    node_dinv: Optional[jax.Array] = None  # (nvars, nvars, *shape)


def _node_block_inverse(A: SysStructMatrix) -> jax.Array:
    """Per-grid-point inverse of the nvars x nvars center-coefficient
    block (node_relax.c solves these little systems per node; on TPU they
    batch into one jnp.linalg.inv over the grid)."""
    c = A.stencil.center_index()
    nv = A.nvars
    blocks = A.coeffs[:, :, c]  # (nv, nv, *shape) — may be broadcastable
    blocks = jnp.broadcast_to(blocks, (nv, nv) + tuple(A.shape))
    flat = jnp.moveaxis(blocks.reshape(nv, nv, -1), -1, 0)  # (npts, nv, nv)
    # guard singular nodes (Dirichlet-eliminated dofs): fall back to the
    # scaled identity so the relaxation leaves them harmlessly damped
    eye = jnp.eye(nv, dtype=A.dtype)
    det_ok = jnp.abs(jnp.linalg.det(flat)) > 1e-30
    safe = jnp.where(det_ok[:, None, None], flat, eye)
    inv = jnp.linalg.inv(safe)
    return jnp.moveaxis(inv, 0, -1).reshape((nv, nv) + tuple(A.shape))


@dataclasses.dataclass
class SysPFMG:
    """HYPRE_SStructSysPFMG* object protocol (HYPRE_sstruct_ls.h:92)."""

    max_levels: int = 25
    max_coarse_size: int = 512
    jacobi_weight: float = 0.7
    num_pre_relax: int = 1
    num_post_relax: int = 1
    # 'jacobi' = pointwise weighted Jacobi on the variable diagonals;
    # 'node-jacobi' / 'node-rbgs' = nodal relaxation solving the coupled
    # nvars x nvars block per grid point (node_relax.c — hypre's SysPFMG
    # default smoother family; rbgs sweeps the red/black checkerboard)
    relax_type: str = "jacobi"

    levels: Optional[List[SysPFMGLevel]] = dataclasses.field(default=None, repr=False)
    coarse_inv: Optional[jax.Array] = dataclasses.field(default=None, repr=False)
    coarse_meta: Optional[tuple] = None

    def setup(self, A: SysStructMatrix) -> "SysPFMG":
        levels: List[SysPFMGLevel] = []
        dxyz = sum(compute_dxyz(A.block(v, v)) for v in range(A.nvars))
        while (
            len(levels) < self.max_levels - 1
            and A.n_rows > self.max_coarse_size
        ):
            candidates = [d for d in range(A.ndim) if A.shape[d] >= 3]
            if not candidates:
                break
            cdir = min(candidates, key=lambda d: dxyz[d])
            dxyz = np.asarray(dxyz, float).copy()
            dxyz[cdir] *= 2
            # block-diagonal interpolation (sys_pfmg_setup_interp.c)
            Ps = tuple(
                semi_interp_from_matrix(A.block(v, v), cdir)
                for v in range(A.nvars)
            )
            cshape = coarse_shape(A.shape, cdir)
            ext = tuple(
                1 if d == cdir else A.stencil.extent[d] for d in range(A.ndim)
            )

            def composite(xc, A=A, Ps=Ps):
                xf = jnp.stack([P.apply(xc[v]) for v, P in enumerate(Ps)])
                yf = A.mv(xf)
                return jnp.stack([P.apply_t(yf[v]) for v, P in enumerate(Ps)])

            Ac = _probe_sys(composite, A.nvars, cshape, ext, A.dtype)
            diag = jnp.stack(
                [
                    jnp.broadcast_to(
                        A.coeffs[v, v, A.stencil.center_index()], A.shape
                    )
                    for v in range(A.nvars)
                ]
            )
            dinv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0)
            node_dinv = (
                _node_block_inverse(A)
                if self.relax_type.startswith("node")
                else None
            )
            levels.append(
                SysPFMGLevel(A=A, P=Ps, dinv=dinv, node_dinv=node_dinv)
            )
            A = Ac
        self.coarse_inv = jnp.linalg.pinv(A.to_dense())
        self.coarse_meta = (A.nvars, A.shape)
        self.levels = levels
        return self

    def _relax(self, lev: SysPFMGLevel, u, f, sweeps):
        if self.relax_type == "node-jacobi":
            for _ in range(sweeps):
                r = f - lev.A.mv(u)
                u = u + self.jacobi_weight * jnp.einsum(
                    "ij...,j...->i...", lev.node_dinv, r
                )
            return u
        if self.relax_type == "node-rbgs":
            # red-black nodal Gauss-Seidel: full node solves on the red
            # checkerboard, then the black, each against a fresh residual
            # (node_relax.c's nodal GS ordering; no damping needed)
            idx = np.indices(lev.A.shape)
            parity = jnp.asarray(sum(idx) % 2)
            for _ in range(sweeps):
                for color in (0, 1):
                    r = f - lev.A.mv(u)
                    du = jnp.einsum("ij...,j...->i...", lev.node_dinv, r)
                    u = u + jnp.where(parity == color, du, 0.0)
            return u
        for _ in range(sweeps):
            u = u + self.jacobi_weight * lev.dinv * (f - lev.A.mv(u))
        return u

    def cycle(self, f: jax.Array, u: Optional[jax.Array] = None) -> jax.Array:
        assert self.levels is not None, "call setup(A) first"

        def descend(level, f, u):
            if level == len(self.levels):
                nv, shp = self.coarse_meta
                xc = self.coarse_inv @ f.reshape(-1)
                return xc.reshape((nv,) + shp)
            lev = self.levels[level]
            u = self._relax(lev, u, f, self.num_pre_relax)
            r = f - lev.A.mv(u)
            rc = jnp.stack([P.apply_t(r[v]) for v, P in enumerate(lev.P)])
            ec = descend(level + 1, rc, jnp.zeros_like(rc))
            u = u + jnp.stack([P.apply(ec[v]) for v, P in enumerate(lev.P)])
            return self._relax(lev, u, f, self.num_post_relax)

        if u is None:
            u = jnp.zeros_like(f)
        return descend(0, f, u)

    def precond(self):
        lev0 = self.levels[0] if self.levels else None
        nv, shp = (
            (lev0.A.nvars, lev0.A.shape) if lev0 is not None else self.coarse_meta
        )

        def M(r):
            flat = r.ndim == 1
            z = self.cycle(r.reshape((nv,) + shp) if flat else r)
            return z.reshape(-1) if flat else z

        return M

    def solve(
        self,
        b: jax.Array,
        x0: Optional[jax.Array] = None,
        rtol: float = 1e-6,
        maxiter: int = 200,
    ) -> tuple[jax.Array, ConvergenceInfo]:
        assert self.levels is not None, "call setup(A) first"
        if not self.levels:  # problem fit entirely in the coarse solve
            nv, shp = self.coarse_meta
            x = (self.coarse_inv @ b.reshape(-1)).reshape((nv,) + shp)
            return x, make_convergence_info(1, 0.0, True)
        A0 = self.levels[0].A
        x = jnp.zeros_like(b) if x0 is None else x0
        b2 = jnp.sum(b * b)
        eps = rtol * rtol * b2

        def cond(state):
            _, r2, it = state
            return (r2 > eps) & (it < maxiter) & jnp.isfinite(r2)

        def body(state):
            x, _, it = state
            x = self.cycle(b, x)
            r = b - A0.mv(x)
            return x, jnp.sum(r * r), it + 1

        r0 = b - A0.mv(x)
        x, r2, iters = jax.lax.while_loop(
            cond, body, (x, jnp.sum(r0 * r0), jnp.int32(0))
        )
        safe = jnp.where(b2 > 0, b2, 1.0)
        rel = jnp.sqrt(jnp.maximum(r2, 0.0) / safe)
        return x, make_convergence_info(iters, rel, (r2 <= eps) | (b2 == 0))
