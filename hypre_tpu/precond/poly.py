"""Least-squares polynomial preconditioner.

Analogue of hypre's LSI polynomial preconditioner
(``FEI_mv/fei-hypre/HYPRE_LSI_poly.c``): M^{-1} = p(A) with p a degree-d
polynomial chosen so that lambda * p(lambda) ~ 1 in a least-squares sense
over [0, lambda_max] — i.e. p minimizes

    integral_0^L (1 - lambda p(lambda))^2 d lambda.

Expanding p(lambda) = sum_j c_j lambda^j, the normal equations are the
(shifted) Hilbert system  sum_j c_j L^{i+j+2}/(i+j+3) = L^{i+2}/(i+2),
solved once at setup (the reference solves the same small moment system by
Gaussian elimination, HYPRE_LSI_poly.c's polySetup). lambda_max comes from
the Gershgorin row-sum bound, as the reference uses the max row sum.

This is the TPU-sweet-spot preconditioner: application is d SpMVs and
axpys — zero irregular memory access, no triangular solves, and the whole
Horner chain fuses into one XLA program. Also available as a smoother
through ``apply_factory``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.seq.ell import EllMatrix, ell_spmv


def ls_poly_coefficients(lmax: float, degree: int) -> np.ndarray:
    """Coefficients c_0..c_d of the LS polynomial on [0, lmax].

    Solved in float64 on host with diagonal scaling — the raw moment
    matrix is Hilbert-conditioned, which is also why useful degrees stop
    around 8 (the reference caps at order 8 too).
    """
    d = degree
    i, j = np.indices((d + 1, d + 1))
    # G_ij = L^{i+j+3} / (i+j+3)   (from integral lambda^{i+1} lambda^{j+1})
    G = lmax ** (i + j + 3) / (i + j + 3)
    b = lmax ** (i[:, 0] + 2) / (i[:, 0] + 2)
    # scale columns/rows by powers of L for conditioning: c_j' = c_j L^j
    s = lmax ** np.arange(d + 1)
    Gs = G / s[:, None] / s[None, :]
    bs = b / s
    cs = np.linalg.solve(Gs, bs)
    return cs / s


@dataclasses.dataclass
class PolyPrecond:
    """HYPRE_LSI_poly object protocol: SetOrder -> Setup -> Solve."""

    order: int = 4

    coeffs: Optional[np.ndarray] = None
    A: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)

    def setup(self, A: EllMatrix) -> "PolyPrecond":
        # Gershgorin upper bound via max absolute row sum
        # (HYPRE_LSI_poly.c estimates max_eigen from row sums)
        lmax = float(jnp.max(jnp.sum(jnp.abs(A.vals), axis=1)))
        self.coeffs = ls_poly_coefficients(lmax, self.order)
        self.A = A
        return self

    def apply(self, r: jax.Array) -> jax.Array:
        """p(A) r by Horner's rule: d SpMVs."""
        cs = self.coeffs
        z = cs[-1] * r
        for c in reversed(cs[:-1]):
            z = ell_spmv(self.A, z) + c * r
        return z

    def precond(self):
        return self.apply
