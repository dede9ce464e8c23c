"""Semicoarsening transfer operators (hypre struct_ls/semi*.c).

Stride-2 coarsening in one direction ``cdir``: coarse points are fine points
with even index in ``cdir``. Interpolation at an odd fine point uses the two
coarse neighbors with operator-induced weights obtained by collapsing the
fine stencil perpendicular to ``cdir`` (hypre_PFMGSetupInterpOp,
``struct_ls/pfmg_setup_interp.c``):

    w_lo = -(sum of coefficients with offset_cdir < 0) / (sum with offset_cdir = 0)
    w_hi = -(sum of coefficients with offset_cdir > 0) / (same)

Application is injection + two shifted multiplies; restriction is the exact
transpose. hypre's separate semi_interp.c / semi_restrict.c comm+BoxLoop
machinery reduces to strided slicing, which XLA shards and fuses.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.struct.matrix import StructMatrix, shift


def coarse_shape(shape: tuple[int, ...], cdir: int) -> tuple[int, ...]:
    """C-points sit at even indices: coarse size = ceil(n/2)."""
    return tuple(-(-n // 2) if d == cdir else n for d, n in enumerate(shape))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SemiInterp:
    """P: coarse -> fine for stride-2 semicoarsening in ``cdir``.

    w_lo/w_hi: (fine_shape) weights, nonzero only at odd-in-cdir points.
    """

    w_lo: jax.Array
    w_hi: jax.Array
    cdir: int = dataclasses.field(metadata=dict(static=True))
    # grid periodicity (struct_mv's pgrid periodic): interpolation at the
    # wrap seam reads the coarse neighbor on the other side
    periodic: tuple[bool, ...] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    @property
    def fine_shape(self) -> tuple[int, ...]:
        return self.w_lo.shape

    @property
    def coarse_shape(self) -> tuple[int, ...]:
        return coarse_shape(self.fine_shape, self.cdir)

    def _unit(self) -> tuple[int, ...]:
        e = [0] * self.w_lo.ndim
        e[self.cdir] = 1
        return tuple(e)

    def _cslices(self):
        return tuple(
            slice(None, None, 2) if d == self.cdir else slice(None)
            for d in range(self.w_lo.ndim)
        )

    def apply(self, xc: jax.Array) -> jax.Array:
        """fine = P @ coarse (hypre_SemiInterp, semi_interp.c)."""
        xe = jnp.zeros(self.fine_shape, xc.dtype).at[self._cslices()].set(xc)
        e = self._unit()
        ne = tuple(-v for v in e)
        p = self.periodic
        return xe + self.w_lo * shift(xe, ne, p) + self.w_hi * shift(xe, e, p)

    def apply_t(self, r: jax.Array) -> jax.Array:
        """coarse = P.T @ fine (hypre_SemiRestrict, semi_restrict.c)."""
        e = self._unit()
        ne = tuple(-v for v in e)
        p = self.periodic
        acc = r + shift(self.w_lo * r, e, p) + shift(self.w_hi * r, ne, p)
        return acc[self._cslices()]


def semi_interp_from_matrix(A: StructMatrix, cdir: int) -> SemiInterp:
    """Operator-induced weights (hypre_PFMGSetupInterpOp,
    pfmg_setup_interp.c): collapse A perpendicular to cdir."""
    lo = jnp.zeros(A.shape, A.dtype)
    hi = jnp.zeros(A.shape, A.dtype)
    center = jnp.zeros(A.shape, A.dtype)
    for s, off in enumerate(A.stencil.offsets):
        c = jnp.broadcast_to(A.coeffs[s], A.shape)
        if off[cdir] < 0:
            lo = lo + c
        elif off[cdir] > 0:
            hi = hi + c
        else:
            center = center + c
    safe = jnp.where(center != 0, center, 1.0)
    w_lo = jnp.where(center != 0, -lo / safe, 0.0)
    w_hi = jnp.where(center != 0, -hi / safe, 0.0)
    # zero the weights at C-points (even index in cdir) — P injects there
    # (broadcasted_iota, not np.indices: this runs inside the fused
    # per-level setup programs and must not bake an n-sized constant)
    odd = jax.lax.broadcasted_iota(jnp.int32, A.shape, cdir) % 2 == 1
    if A.periodic and A.periodic[cdir] and A.shape[cdir] % 2 != 0:
        raise NotImplementedError(
            "semicoarsening a periodic dim requires an even grid size "
            f"(dim {cdir} has {A.shape[cdir]})"
        )
    return SemiInterp(
        w_lo=jnp.where(odd, w_lo, 0.0),
        w_hi=jnp.where(odd, w_hi, 0.0),
        cdir=cdir,
        periodic=A.periodic,
    )
