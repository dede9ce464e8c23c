"""StructMatrix and the stencil matvec — hypre's struct_mv kernels on TPU.

hypre stores a StructMatrix as per-box coefficient arrays over a padded "data
space" and applies it with BoxLoop stencil kernels overlapped with ghost
exchange (``struct_mv/struct_matvec.c:92-531``). The TPU formulation: the
coefficient slab is a dense ``(S, *shape)`` array, and

    y[i] = sum_s  coeffs[s, i] * x[i + offset_s]

is computed as one pad + S static slices + fused multiply-adds — a single
HBM pass after XLA fusion, with no ghost storage, pack buffers, or comm
scheduling (sharded arrays get their halos from the SPMD partitioner).

Constant-coefficient matrices (hypre's ``constant_coefficient`` mode,
``struct_mv/struct_matrix.h``) store ``coeffs`` of shape ``(S,)``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.struct.stencil import StructStencil


def shift(x: jax.Array, offset, periodic=None) -> jax.Array:
    """z[i] = x[i + offset], zero-filled (periodic dims wrap instead).

    The ghost-zone read of hypre's BoxLoop kernels: out-of-grid reads return
    0, matching hypre's zeroed boundary ghost layers.
    """
    ndim = x.ndim
    periodic = periodic or (False,) * ndim
    pads = []
    slices = []
    for d in range(ndim):
        o = int(offset[d]) if d < len(offset) else 0
        a = abs(o)
        pads.append((a, a))
        slices.append(slice(a + o, a + o + x.shape[d]))
    if not any(p[0] for p in pads):
        return x
    if any(periodic):
        # pad periodic dims with wrap first, the rest with zeros
        wrap_pads = [p if periodic[d] else (0, 0) for d, p in enumerate(pads)]
        zero_pads = [(0, 0) if periodic[d] else p for d, p in enumerate(pads)]
        x = jnp.pad(x, wrap_pads, mode="wrap")
        x = jnp.pad(x, zero_pads)
    else:
        x = jnp.pad(x, pads)
    return x[tuple(slices)]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StructMatrix:
    """Stencil matrix over a single logical box.

    coeffs: (S, *shape) variable-coefficient or (S,) constant-coefficient.
    """

    coeffs: jax.Array
    stencil: StructStencil = dataclasses.field(metadata=dict(static=True))
    shape: tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    periodic: tuple[bool, ...] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    def __post_init__(self):
        if self.periodic is None:
            object.__setattr__(self, "periodic", (False,) * len(self.shape))

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def is_constant(self) -> bool:
        return self.coeffs.ndim == 1

    @property
    def n_rows(self) -> int:
        return int(np.prod(self.shape))

    @property
    def dtype(self):
        return self.coeffs.dtype

    def coeff(self, s: int) -> jax.Array:
        c = self.coeffs[s]
        return c if not self.is_constant else jnp.broadcast_to(c, self.shape)

    def diagonal(self) -> jax.Array:
        return self.coeff(self.stencil.center_index())

    def mv(self, x: jax.Array) -> jax.Array:
        return struct_matvec(self, x)

    def mv_t(self, x: jax.Array) -> jax.Array:
        return struct_matvec_t(self, x)

    # -- flattened-operator views for the Krylov layer ------------------------

    def as_linear_op(self):
        """1-D operator on raveled vectors (struct_ls/pcg_struct.c glue)."""
        shape = self.shape
        return lambda v: struct_matvec(self, v.reshape(shape)).reshape(-1)

    def to_dense(self) -> jax.Array:
        """Materialize as a dense (n, n) matrix — coarse direct solves and
        test oracles (hypre gathers the coarsest struct op the same way)."""
        n = self.n_rows
        eye = jnp.eye(n, dtype=self.dtype).reshape((n,) + self.shape)
        cols = jax.vmap(lambda e: struct_matvec(self, e).reshape(-1))(eye)
        return cols.T


def struct_matvec(A: StructMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x (hypre_StructMatvecCompute, ``struct_matvec.c:92``)."""
    y = None
    for s, off in enumerate(A.stencil.offsets):
        term = A.coeffs[s] * shift(x, off, A.periodic)
        y = term if y is None else y + term
    return y


def struct_matvec_t(A: StructMatrix, x: jax.Array) -> jax.Array:
    """y = A.T @ x: scatter form — shift(coeff*x, -offset) summed."""
    y = None
    for s, off in enumerate(A.stencil.offsets):
        term = shift(A.coeffs[s] * x, tuple(-o for o in off), A.periodic)
        y = term if y is None else y + term
    return y


def struct_from_dense_coeffs(
    coeff_map: dict, shape: tuple[int, ...], periodic=None, dtype=None
) -> StructMatrix:
    """Build from {offset: coefficient (scalar or array)} — the analogue of
    HYPRE_StructMatrixSetBoxValues over the whole grid."""
    offsets = tuple(coeff_map.keys())
    arrs = []
    constant = all(np.ndim(c) == 0 for c in coeff_map.values())
    for off in offsets:
        c = coeff_map[off]
        if constant:
            arrs.append(jnp.asarray(c, dtype=dtype))
        else:
            arrs.append(jnp.broadcast_to(jnp.asarray(c, dtype=dtype), shape))
    coeffs = jnp.stack(arrs)
    return StructMatrix(
        coeffs=coeffs,
        stencil=StructStencil(offsets),
        shape=tuple(shape),
        periodic=periodic,
    )
