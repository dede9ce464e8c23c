"""Multivector layer — hypre's ``multivector/`` abstraction, TPU-shaped.

hypre's LOBPCG runs over an abstract ``mv_MultiVector`` whose operations
are supplied through an ``mv_InterfaceInterpreter`` vtable
(``multivector/interpreter.h:13-51``: CreateVector/InnerProd/CopyVector/
Axpy/..., multivector variants in ``temp_multivector.c``), so any vector
object — ParCSR, struct, SStruct (``krylov_sstruct.c``) — can feed the
eigensolver.

Under JAX the natural "any vector object" is a *pytree*: the interpreter
reduces to the pair (flatten, unflatten), everything else is dense algebra
on the flat (n, m) block, which is exactly what the MXU wants. This module
provides:

- ``Interpreter``: the vtable, auto-derived from an example vector pytree
  via ``jax.flatten_util.ravel_pytree`` (slot names follow interpreter.h);
- ``MultiVector``: an (n, m) column block carrying its interpreter, with
  the temp_multivector.c operations (copy/axpy/inner-product-matrix/
  by-matrix linear combination) as MXU-friendly dense ops;
- ``lobpcg_interpreted``: hypre_LOBPCGSolve over pytree vectors — operators
  take and return USER vectors, the interpreter shuttles them through the
  flat block formulation in ``krylov/lobpcg.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Interpreter:
    """mv_InterfaceInterpreter analogue: how to move one user vector in and
    out of flat coordinates. Derive with ``Interpreter.for_vector(example)``.
    """

    ravel: Callable[[Any], jax.Array]
    unravel: Callable[[jax.Array], Any]
    size: int

    @classmethod
    def for_vector(cls, example: Any) -> "Interpreter":
        from jax.flatten_util import ravel_pytree

        flat, unravel = ravel_pytree(example)
        return cls(
            ravel=lambda v: ravel_pytree(v)[0],
            unravel=unravel,
            size=int(flat.shape[0]),
        )

    # -- interpreter.h single-vector slots (dense on flat coords) ---------
    def inner_prod(self, x, y) -> jax.Array:
        return jnp.vdot(self.ravel(x), self.ravel(y))

    def axpy(self, a, x, y):
        return self.unravel(self.ravel(y) + a * self.ravel(x))

    def copy(self, x):
        return self.unravel(self.ravel(x))

    def clear(self, x):
        return self.unravel(jnp.zeros(self.size, self.ravel(x).dtype))

    def scale(self, a, x):
        return self.unravel(a * self.ravel(x))


@dataclasses.dataclass(frozen=True)
class MultiVector:
    """mv_TempMultiVector analogue: m user vectors as an (n, m) flat block
    (columns) plus the interpreter that defined the flattening."""

    data: jax.Array  # (n, m)
    interp: Interpreter

    @classmethod
    def from_vectors(cls, vectors, interp: Optional[Interpreter] = None):
        interp = interp or Interpreter.for_vector(vectors[0])
        return cls(
            data=jnp.stack([interp.ravel(v) for v in vectors], axis=1),
            interp=interp,
        )

    @property
    def num_vectors(self) -> int:
        return int(self.data.shape[1])

    def vectors(self) -> list:
        return [self.interp.unravel(self.data[:, j])
                for j in range(self.num_vectors)]

    # -- temp_multivector.c block operations ------------------------------
    def inner_prod_matrix(self, other: "MultiVector") -> jax.Array:
        """G[i,j] = <x_i, y_j> — one MXU matmul (mv_TempMultiVectorByMultiVector)."""
        return self.data.T @ other.data

    def by_matrix(self, coef: jax.Array) -> "MultiVector":
        """Linear combinations Y = X @ coef (mv_TempMultiVectorByMatrix)."""
        return MultiVector(data=self.data @ coef, interp=self.interp)

    def axpy(self, a: float, other: "MultiVector") -> "MultiVector":
        return MultiVector(data=other.data + a * self.data, interp=self.interp)

    def apply(self, op: Callable[[Any], Any]) -> "MultiVector":
        """Column-wise application of a user-vector operator."""
        interp = self.interp

        def flat_op(col):
            return interp.ravel(op(interp.unravel(col)))

        return MultiVector(
            data=jax.vmap(flat_op, in_axes=1, out_axes=1)(self.data),
            interp=interp,
        )


def lobpcg_interpreted(
    A: Callable[[Any], Any],
    X0: MultiVector,
    B: Optional[Callable[[Any], Any]] = None,
    T: Optional[Callable[[Any], Any]] = None,
    tol: float = 1e-6,
    maxiter: int = 100,
):
    """hypre_LOBPCGSolve over user vector pytrees (HYPRE_LOBPCGSetup wires
    the interpreter the same way, ``HYPRE_lobpcg.c:401``).

    A/B/T take and return ONE user vector; X0 is the initial MultiVector.
    Returns (eigenvalues (m,), eigenvector MultiVector, residual norms (m,)).
    """
    from hypre_tpu.krylov.lobpcg import lobpcg

    interp = X0.interp

    def block(op):
        def flat_col(col):
            return interp.ravel(op(interp.unravel(col)))

        return lambda V: jax.vmap(flat_col, in_axes=1, out_axes=1)(V)

    w, V, res = lobpcg(
        block(A),
        X0.data,
        B=block(B) if B is not None else None,
        T=block(T) if T is not None else None,
        tol=tol,
        maxiter=maxiter,
    )
    return w, MultiVector(data=V, interp=interp), res
