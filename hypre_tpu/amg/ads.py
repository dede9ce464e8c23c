"""ADS — auxiliary-space solver for H(div) (face-element) problems.

Analogue of hypre's ADS (``parcsr_ls/ads.c``, HYPRE_parcsr_ls.h:2367):
for a face-element div-div + mass matrix A_F, the user supplies the
discrete curl C (face x edge), the discrete gradient G (edge x node), and
nodal coordinates. Following Hiptmair-Xu for H(div), the preconditioner
combines

- pointwise l1-Jacobi smoothing on A_F,
- a correction in the curl space: C B_C C^T, where A_C = C^T A_F C is an
  H(curl) operator solved by one AMS cycle (hypre builds a full internal
  AMS there too, ads.c),
- corrections in the vector-nodal (Raviart-Thomas-interpolated) space:
  Pi_d B_d Pi_d^T with Pi_d derived from the face-node incidence and the
  face normals (hypre_ADSComputePi), each B_d a BoomerAMG cycle,

applied in the symmetric multiplicative order smooth-Pi-C-Pi-smooth.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.amg.ams import AMS, _host_rap
from hypre_tpu.amg.boomeramg import BoomerAMG
from hypre_tpu.seq.csr import HostCSR
from hypre_tpu.seq.ell import EllMatrix, csr_to_ell, ell_spmv, ell_spmv_t, ell_to_csr


def _host_product(A: EllMatrix, B: EllMatrix) -> EllMatrix:
    from hypre_tpu import native
    from hypre_tpu.amg.hierarchy import _csr_to_ell_device, _ell_to_csr_arrays

    n, Ap, Aj, Ax = _ell_to_csr_arrays(A)
    _, Bp, Bj, Bx = _ell_to_csr_arrays(B)
    Cp, Cj, Cx = native.spgemm(n, B.n_cols, Ap, Aj, Ax, Bp, Bj, Bx)
    return _csr_to_ell_device(n, B.n_cols, Cp, Cj, Cx, A.dtype)


@dataclasses.dataclass
class ADS:
    """HYPRE_ADSCreate / SetDiscreteCurl / SetDiscreteGradient analogue."""

    smooth_sweeps: int = 1
    amg_knobs: Optional[dict] = None

    A: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    C: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    ams: Optional[AMS] = dataclasses.field(default=None, repr=False)
    Pis: Optional[List[EllMatrix]] = dataclasses.field(default=None, repr=False)
    B_Pi: Optional[List[BoomerAMG]] = dataclasses.field(default=None, repr=False)
    l1inv: Optional[jax.Array] = dataclasses.field(default=None, repr=False)

    def setup(
        self, A: EllMatrix, C: EllMatrix, G: EllMatrix, coords: np.ndarray
    ) -> "ADS":
        self.A, self.C = A, C
        self.l1inv = 1.0 / jnp.maximum(A.abs_row_sums(), 1e-300)
        knobs = self.amg_knobs or dict(max_coarse_size=64)

        # curl-space operator A_C = C^T A C, handled by a full AMS
        A_C = _host_rap(A, C)
        self.ams = AMS(amg_knobs=knobs).setup(A_C, G, coords)

        # Pi_d: face <- nodal vector field, via face-node incidence and
        # face tangent-plane geometry (hypre_ADSComputePi). Face-node
        # incidence N = |C||G|/2 (each face node is hit through 2 edges);
        # the normal component uses the coordinate differences along the
        # face diagonal pair — approximated here from the edge tangents.
        coords = np.asarray(coords, float)
        Cc = ell_to_csr(C)
        Gc = ell_to_csr(G)
        absC = HostCSR(Cc.indptr, Cc.indices, np.abs(Cc.data), Cc.shape)
        absG = HostCSR(Gc.indptr, Gc.indices, np.abs(Gc.data), Gc.shape)
        # face-node incidence (values = multiplicity 2 -> normalize later)
        from hypre_tpu import native

        nf = Cc.shape[0]
        FN_p, FN_j, FN_x = native.spgemm(
            nf, Gc.shape[1],
            Cc.indptr.astype(np.int32), Cc.indices.astype(np.int32),
            np.abs(Cc.data).astype(np.float64),
            Gc.indptr.astype(np.int32), Gc.indices.astype(np.int32),
            np.abs(Gc.data).astype(np.float64),
        )
        counts = np.diff(FN_p)
        frows = np.repeat(np.arange(nf), counts)
        weight = FN_x / np.maximum(
            np.add.reduceat(FN_x, FN_p[:-1]), 1e-300
        )[frows]
        # face normals: n_f ~ cross-ish from the span of the face's nodes;
        # use the centroid-relative coordinate extent per dimension and take
        # the dimension with (near) zero extent as the normal direction.
        dim = coords.shape[1]
        self.Pis, self.B_Pi = [], []
        cen = np.zeros((nf, dim))
        np.add.at(cen, frows, coords[FN_j] * weight[:, None])
        ext = np.zeros((nf, dim))
        np.maximum.at(ext, frows, np.abs(coords[FN_j] - cen[frows]))
        normal = (ext < 1e-12).astype(float)  # axis-aligned grids: 0-extent axis
        nrm = np.linalg.norm(normal, axis=1, keepdims=True)
        normal = normal / np.maximum(nrm, 1e-300)
        for d in range(dim):
            pv = weight * normal[frows, d]
            Pi = csr_to_ell(
                HostCSR.from_coo(frows, FN_j, pv, (nf, Gc.shape[1])),
                dtype=A.dtype,
            )
            A_Pi = _host_rap(A, Pi)
            self.Pis.append(Pi)
            self.B_Pi.append(BoomerAMG(**knobs).setup(A_Pi))
        return self

    def precond(self):
        A, C, Pis = self.A, self.C, self.Pis
        l1inv, B_Pi = self.l1inv, self.B_Pi
        ams_M = self.ams.precond()
        sweeps = self.smooth_sweeps

        def smooth(z, r):
            for _ in range(sweeps):
                z = z + l1inv * (r - ell_spmv(A, z))
            return z

        def curl_corr(z, r):
            res = r - ell_spmv(A, z)
            return z + ell_spmv(C, ams_M(ell_spmv_t(C, res)))

        def pi_corr(z, r):
            res = r - ell_spmv(A, z)
            for Pi, B in zip(Pis, B_Pi):
                z = z + ell_spmv(Pi, B.cycle(ell_spmv_t(Pi, res)))
            return z

        def M(r):
            z = smooth(jnp.zeros_like(r), r)
            z = pi_corr(z, r)
            z = curl_corr(z, r)
            z = pi_corr(z, r)
            return smooth(z, r)

        return M
