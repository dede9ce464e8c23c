"""Stencil recovery by lattice probing — the struct-layer RAP engine.

hypre computes Galerkin coarse operators RAP with ~8k LoC of per-stencil
hand-differentiated kernels (``struct_ls/pfmg_setup_rap*.c``,
``smg2_setup_rap.c``, ``smg3_setup_rap.c``, ``semi_setup_rap.c``). The TPU
design replaces all of them with one exact, generic algorithm:

Any linear operator on a grid whose matrix is a stencil of extent ``e``
(A[i,j] = 0 unless |j-i| <= e componentwise) is fully determined by its
action on the (2e+1)^d lattice indicator vectors x_c[j] = 1 iff j === c
(mod 2e+1): within the stencil range of any row i there is exactly one
j === c, so (A x_c)[i] reads off a single coefficient. Probing the *composed*
``restrict ∘ A ∘ interp`` callable therefore recovers the coarse stencil in
(2e+1)^d fused dense applications — boundary rows come out exactly right
because the probe exercises the true operator, ghost handling included.

This is the structured-grid version of graph-coloring-based Jacobian
compression (Curtis-Powell-Reid); on TPU every probe is a handful of fused
shifted multiplies, so the whole 27-probe 3-D RAP costs less than one
fine-grid matvec per probe.
"""

from __future__ import annotations

import itertools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.struct.matrix import StructMatrix
from hypre_tpu.struct.stencil import StructStencil


def probe_stencil(
    apply_fn: Callable[[jax.Array], jax.Array],
    shape: tuple[int, ...],
    extent: tuple[int, ...],
    dtype,
    prune: bool = True,
    periodic: tuple[bool, ...] | None = None,
) -> StructMatrix:
    """Recover the StructMatrix of a linear ``apply_fn`` on grid ``shape``.

    extent: per-dim stencil extent bound (over-estimates are safe).
    prune: drop offsets whose recovered coefficient array is identically 0
    (e.g. Galerkin RAP of a 7-pt operator is 19-pt, not the full 27 box).

    Periodic dims: the lattice-class identification ``class(j) = class(i+o)``
    survives wraparound iff the modulus divides the grid size (j = i+o-N and
    N % m == 0). So for a periodic dim the modulus is the smallest divisor of
    ``shape[d]`` that is >= 2e+1 (worst case shape[d] itself, where each
    class is a single coordinate plane) instead of 2e+1.
    """
    ndim = len(shape)
    periodic = periodic or (False,) * ndim

    def pick_mod(d: int) -> int:
        need = 2 * extent[d] + 1
        if not periodic[d]:
            return need
        if shape[d] < need:
            raise NotImplementedError(
                f"periodic dim {d}: grid size {shape[d]} smaller than the "
                f"stencil span {need}; the wrapped operator is not a stencil"
            )
        for m in range(need, shape[d] + 1):
            if shape[d] % m == 0:
                return m
        return shape[d]

    mods = tuple(pick_mod(d) for d in range(ndim))

    # lattice indicator probes, applied through the (jitted) operator
    probes = []
    apply_jit = jax.jit(apply_fn)
    for c in itertools.product(*(range(m) for m in mods)):
        x = np.zeros(shape, dtype=dtype)
        x[tuple(slice(ci, None, mi) for ci, mi in zip(c, mods))] = 1
        probes.append(apply_jit(jnp.asarray(x)))
    Y = jnp.stack(probes)  # (prod(mods), *shape)

    # coefficient for offset o at point i lives in probe class (i + o) mod m
    idx = np.indices(shape)  # (ndim, *shape)
    offsets = list(itertools.product(*(range(-e, e + 1) for e in extent)))
    coeffs = []
    for off in offsets:
        cls = np.zeros(shape, dtype=np.int64)
        for d in range(ndim):
            cls = cls * mods[d] + (idx[d] + off[d]) % mods[d]
        coeffs.append(jnp.take_along_axis(Y, jnp.asarray(cls)[None], axis=0)[0])

    if prune:
        keep = [
            s
            for s, c in enumerate(coeffs)
            if offsets[s] == (0,) * ndim or bool(jnp.any(c != 0))
        ]
        offsets = [offsets[s] for s in keep]
        coeffs = [coeffs[s] for s in keep]

    return StructMatrix(
        coeffs=jnp.stack(coeffs),
        stencil=StructStencil(tuple(offsets)),
        shape=tuple(shape),
        periodic=periodic,
    )
