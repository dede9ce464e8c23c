"""Saddle-point solvers/preconditioners — Uzawa and block preconditioning.

Analogues of the FEI/LSI one-off solvers for mixed (velocity/pressure)
systems: ``FEI_mv/fei-hypre/HYPRE_LSI_UZAWA.cxx`` (Uzawa iteration with an
A11 sub-solver and an S22 Schur sub-solver) and ``HYPRE_LSI_blkprec.cxx``
(block factorization preconditioner that splits the system into the
velocity block A11, gradient block A12, and a pressure Schur approximation
built from diag(A11)). The LSI Schur reduction (``HYPRE_LSI_schur.cxx``)
is the ``reduce`` solve mode below.

The block system is

    [ A   Bt ] [u]   [f]
    [ B  -C  ] [p] = [g]

with A SPD (velocity), B the divergence, C >= 0 stabilization. TPU
formulation: the blocks stay ELL operators; inner solves are BoomerAMG
cycles or diagonal sweeps (everything jit-fuses); the Schur approximation
S_hat = B diag(A)^{-1} Bt + C is built with the native SpGEMM once at
setup — the same recipe the reference uses to build its pressure block.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from hypre_tpu.amg.boomeramg import BoomerAMG
from hypre_tpu.core.config import ConvergenceInfo
from hypre_tpu.seq.ell import EllMatrix, ell_spmv


@dataclasses.dataclass
class SaddleSystem:
    """The 2x2 block operator (velocity block A, divergence B, its
    transpose Bt, stabilization C; C may be None for unstabilized)."""

    A: EllMatrix
    B: EllMatrix
    Bt: EllMatrix
    C: Optional[EllMatrix] = None

    @property
    def n_u(self) -> int:
        return self.A.n_rows

    @property
    def n_p(self) -> int:
        return self.B.n_rows

    def mv(self, x: jax.Array) -> jax.Array:
        u, p = x[: self.n_u], x[self.n_u:]
        top = ell_spmv(self.A, u) + ell_spmv(self.Bt, p)
        bot = ell_spmv(self.B, u)
        if self.C is not None:
            bot = bot - ell_spmv(self.C, p)
        return jnp.concatenate([top, bot])


def _schur_hat(sys: SaddleSystem) -> EllMatrix:
    """S_hat = B diag(A)^{-1} Bt (+ C) via the native SpGEMM — the
    pressure-block approximation HYPRE_LSI_blkprec builds."""
    from hypre_tpu import native
    from hypre_tpu.amg.hierarchy import _csr_to_ell_device, _ell_to_csr_arrays

    dinv = 1.0 / sys.A.diagonal()
    Bs = EllMatrix(
        vals=sys.B.vals * jnp.where(
            sys.B.cols >= 0, dinv[jnp.maximum(sys.B.cols, 0)], 0.0
        ),
        cols=sys.B.cols,
        n_cols=sys.B.n_cols,
    )
    _, Bp, Bj, Bx = _ell_to_csr_arrays(Bs)
    _, Tp, Tj, Tx = _ell_to_csr_arrays(sys.Bt)
    Sp, Sj, Sx = native.spgemm(sys.n_p, sys.n_p, Bp, Bj, Bx, Tp, Tj, Tx)
    S = _csr_to_ell_device(sys.n_p, sys.n_p, Sp, Sj, Sx, sys.A.dtype)
    if sys.C is not None:
        from hypre_tpu.seq.spgemm import ell_add

        S = ell_add(1.0, S, 1.0, sys.C)
    return S


@dataclasses.dataclass
class Uzawa:
    """HYPRE_LSI_Uzawa analogue: stationary Uzawa iteration

        A u_{k+1} = f - Bt p_k          (A11 sub-solve: AMG cycles)
        p_{k+1}   = p_k + omega * S_hat_inv (B u_{k+1} - C p_k - g)

    The reference drives the same two sub-solves per sweep
    (HYPRE_LSI_UZAWA.cxx::solve, A11Solver_/S22Solver_)."""

    omega: float = 0.5
    inner_cycles: int = 2     # AMG V-cycles per A11 solve
    schur_sweeps: int = 4     # Jacobi sweeps on S_hat per pressure update
    maxiter: int = 100
    rtol: float = 1e-8

    sys: Optional[SaddleSystem] = dataclasses.field(default=None, repr=False)
    amg: Optional[BoomerAMG] = dataclasses.field(default=None, repr=False)
    S: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    s_dinv: Optional[jax.Array] = dataclasses.field(default=None, repr=False)

    def setup(self, sys: SaddleSystem) -> "Uzawa":
        self.sys = sys
        self.amg = BoomerAMG(relax="l1-jacobi").setup(sys.A)
        self.S = _schur_hat(sys)
        d = self.S.diagonal()
        self.s_dinv = jnp.where(d != 0, 1.0 / jnp.where(d != 0, d, 1.0), 0.0)
        return self

    def _solve_a(self, rhs: jax.Array) -> jax.Array:
        u = jnp.zeros_like(rhs)
        for _ in range(self.inner_cycles):
            u = self.amg.cycle(rhs, u)
        return u

    def _solve_s(self, rhs: jax.Array) -> jax.Array:
        z = self.s_dinv * rhs
        for _ in range(self.schur_sweeps):
            z = z + self.s_dinv * (rhs - ell_spmv(self.S, z))
        return z

    def solve(
        self, f: jax.Array, g: jax.Array
    ) -> tuple[jax.Array, jax.Array, ConvergenceInfo]:
        from hypre_tpu.core.config import make_convergence_info

        sys = self.sys
        p = jnp.zeros(sys.n_p, f.dtype)
        u = jnp.zeros(sys.n_u, f.dtype)
        bnorm = jnp.sqrt(jnp.vdot(f, f) + jnp.vdot(g, g))
        rel = jnp.asarray(jnp.inf, f.dtype)
        it_done = 0
        for it in range(self.maxiter):
            u = self._solve_a(f - ell_spmv(sys.Bt, p))
            rp = ell_spmv(sys.B, u) - g
            if sys.C is not None:
                rp = rp - ell_spmv(sys.C, p)
            p = p + self.omega * self._solve_s(rp)
            ru = f - ell_spmv(sys.A, u) - ell_spmv(sys.Bt, p)
            rel = jnp.sqrt(jnp.vdot(ru, ru) + jnp.vdot(rp, rp)) / bnorm
            it_done = it + 1
            if float(rel) < self.rtol:
                break
        return u, p, make_convergence_info(
            it_done, float(rel), float(rel) < self.rtol
        )


@dataclasses.dataclass
class BlockPrecond:
    """HYPRE_LSI_blkprec analogue: block-diagonal or block-triangular
    preconditioner for the saddle operator, applied inside FlexGMRES.

    mode='diag':       M^{-1} = blkdiag(A_amg^{-1}, S_hat_inv)
    mode='triangular': also applies the Bt coupling on the back-solve
                       (the reference's block LU option)
    mode='reduce':     the LSI Schur reduction (HYPRE_LSI_schur.cxx):
                       eliminate u, iterate on the pressure Schur system
                       only (exposed through solve_reduced())."""

    mode: str = "triangular"
    inner_cycles: int = 1
    schur_sweeps: int = 4

    sys: Optional[SaddleSystem] = dataclasses.field(default=None, repr=False)
    amg: Optional[BoomerAMG] = dataclasses.field(default=None, repr=False)
    S: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    s_dinv: Optional[jax.Array] = dataclasses.field(default=None, repr=False)

    def setup(self, sys: SaddleSystem) -> "BlockPrecond":
        self.sys = sys
        self.amg = BoomerAMG(relax="l1-jacobi").setup(sys.A)
        self.S = _schur_hat(sys)
        d = self.S.diagonal()
        self.s_dinv = jnp.where(d != 0, 1.0 / jnp.where(d != 0, d, 1.0), 0.0)
        return self

    def _inv_a(self, r):
        u = jnp.zeros_like(r)
        for _ in range(self.inner_cycles):
            u = self.amg.cycle(r, u)
        return u

    def _inv_s(self, r):
        z = self.s_dinv * r
        for _ in range(self.schur_sweeps):
            z = z + self.s_dinv * (r - ell_spmv(self.S, z))
        return z

    def precond(self) -> Callable[[jax.Array], jax.Array]:
        sys = self.sys
        n_u = sys.n_u

        def M(r):
            ru, rp = r[:n_u], r[n_u:]
            # pressure first (negative Schur: the operator carries -C and
            # B u, so S z = -rp gives a consistent sign)
            zp = -self._inv_s(rp)
            if self.mode == "triangular":
                zu = self._inv_a(ru - ell_spmv(sys.Bt, zp))
            else:
                zu = self._inv_a(ru)
            return jnp.concatenate([zu, zp])

        return M

    def solve_reduced(
        self, f: jax.Array, g: jax.Array, rtol: float = 1e-8,
        maxiter: int = 200,
    ):
        """LSI Schur-reduction solve: iterate PCG on
        S p = B A^{-1} f - g (with A^{-1} by AMG cycles), then back out
        u = A^{-1}(f - Bt p) — HYPRE_LSI_schur.cxx's reduced system."""
        from hypre_tpu.krylov import pcg

        sys = self.sys

        def s_op(p):
            w = self._inv_a(ell_spmv(sys.Bt, p))
            out = ell_spmv(sys.B, w)
            if sys.C is not None:
                out = out + ell_spmv(sys.C, p)
            return out

        rhs = ell_spmv(sys.B, self._inv_a(f)) - g
        p, info = pcg(s_op, rhs, M=self._inv_s, rtol=rtol, maxiter=maxiter)
        u = self._inv_a(f - ell_spmv(sys.Bt, p))
        return u, p, info
