"""AMS — auxiliary-space Maxwell solver for H(curl) problems.

Analogue of hypre's AMS (``parcsr_ls/ams.c``, HYPRE_parcsr_ls.h:2057,
Hiptmair-Xu): for an edge-element curl-curl matrix A, the user supplies the
discrete gradient G (edge x node incidence) and nodal coordinates. The
preconditioner combines

- pointwise smoothing on A (l1-Jacobi — hypre's default A-relaxation),
- a correction in the gradient space:  G B_G G^T,  A_G = G^T A G,
- corrections in the vector-nodal space: Pi_d B_d Pi_d^T per component,
  with Pi_d[e, v] = 1/2 |G[e, v]| * (G @ coords[:, d])[e]
  (ams.c hypre_AMSComputePi),

each inner B_* being a BoomerAMG V-cycle on the projected operator
(hypre's internal AMG sub-solvers, ams.c:879-897), combined multiplicatively
in hypre's default palindromic "01210" order (smooth, Pi-corrections,
gradient correction, Pi, smooth) so the preconditioner stays symmetric for
PCG. cycle="additive" gives the cheaper additive variant.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.amg.boomeramg import BoomerAMG
from hypre_tpu.seq.csr import HostCSR
from hypre_tpu.seq.ell import EllMatrix, csr_to_ell, ell_spmv, ell_spmv_t, ell_to_csr


def _host_rap(A: EllMatrix, P: EllMatrix) -> EllMatrix:
    """P^T A P through the native CSR kernels (setup phase)."""
    from hypre_tpu import native
    from hypre_tpu.amg.hierarchy import _csr_to_ell_device, _ell_to_csr_arrays

    n, Ap, Aj, Ax = _ell_to_csr_arrays(A)
    _, Pp, Pj, Px = _ell_to_csr_arrays(P)
    nc = P.n_cols
    Tp, Tj, Tx = native.transpose(n, nc, Pp, Pj, Px)
    APp, APj, APx = native.spgemm(n, nc, Ap, Aj, Ax, Pp, Pj, Px)
    Cp, Cj, Cx = native.spgemm(nc, nc, Tp, Tj, Tx, APp, APj, APx)
    return _csr_to_ell_device(nc, nc, Cp, Cj, Cx, A.dtype)


@dataclasses.dataclass
class AMS:
    """HYPRE_AMSCreate / SetDiscreteGradient / SetCoordinateVectors."""

    smooth_sweeps: int = 1
    cycle: str = "01210"  # hypre AMS cycle_type 1 | 'additive'
    amg_knobs: Optional[dict] = None

    A: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    G: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    Pis: Optional[List[EllMatrix]] = dataclasses.field(default=None, repr=False)
    B_G: Optional[BoomerAMG] = dataclasses.field(default=None, repr=False)
    B_Pi: Optional[List[BoomerAMG]] = dataclasses.field(default=None, repr=False)
    l1inv: Optional[jax.Array] = dataclasses.field(default=None, repr=False)

    def setup(self, A: EllMatrix, G: EllMatrix, coords: np.ndarray) -> "AMS":
        self.A = A
        self.G = G
        d = 1.0 / jnp.maximum(A.abs_row_sums(), 1e-300)
        self.l1inv = d

        knobs = self.amg_knobs or dict(max_coarse_size=64)

        # gradient-space operator A_G = G^T A G
        A_G = _host_rap(A, G)
        self.B_G = BoomerAMG(**knobs).setup(A_G)

        # Pi_d from the discrete gradient and coordinates
        coords = np.asarray(coords)
        gcsr = ell_to_csr(G)
        rows = np.repeat(np.arange(gcsr.n_rows), gcsr.row_nnz())
        self.Pis, self.B_Pi = [], []
        for dim in range(coords.shape[1]):
            t = gcsr.matvec(coords[:, dim])  # edge tangent component
            pv = 0.5 * np.abs(gcsr.data) * t[rows]
            Pi = csr_to_ell(
                HostCSR.from_coo(rows, gcsr.indices, pv, gcsr.shape),
                dtype=A.dtype,
            )
            A_Pi = _host_rap(A, Pi)
            self.Pis.append(Pi)
            self.B_Pi.append(BoomerAMG(**knobs).setup(A_Pi))
        return self

    def precond(self):
        """One auxiliary-space correction cycle (hypre_AMSSolve inner)."""
        A, G, Pis = self.A, self.G, self.Pis
        l1inv = self.l1inv
        B_G, B_Pi = self.B_G, self.B_Pi
        sweeps = self.smooth_sweeps

        def smooth(z, r):
            for _ in range(sweeps):
                z = z + l1inv * (r - ell_spmv(A, z))
            return z

        def grad_corr(z, r):
            res = r - ell_spmv(A, z)
            return z + ell_spmv(G, B_G.cycle(ell_spmv_t(G, res)))

        def pi_corr(z, r):
            res = r - ell_spmv(A, z)
            for Pi, B in zip(Pis, B_Pi):
                z = z + ell_spmv(Pi, B.cycle(ell_spmv_t(Pi, res)))
            return z

        if self.cycle == "additive":

            def M(r):
                z = smooth(jnp.zeros_like(r), r)
                z = z + ell_spmv(G, B_G.cycle(ell_spmv_t(G, r)))
                for Pi, B in zip(Pis, B_Pi):
                    z = z + ell_spmv(Pi, B.cycle(ell_spmv_t(Pi, r)))
                return z

        else:  # '01210' multiplicative (symmetric)

            def M(r):
                z = smooth(jnp.zeros_like(r), r)
                z = pi_corr(z, r)
                z = grad_corr(z, r)
                z = pi_corr(z, r)
                return smooth(z, r)

        return M
