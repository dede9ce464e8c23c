"""Model problem generators — hypre's driver problem suite.

Mirrors ``parcsr_ls/par_laplace.c`` (7-pt), ``par_laplace_9pt.c``,
``par_laplace_27pt.c``, ``par_difconv.c`` and ``par_rotate_7pt.c``, which back
the ``ij`` test driver's ``-laplacian/-9pt/-27pt/-difconv/-rotate`` flags
(``test/ij.c:521-575``). hypre assembles these row-by-row into ParCSR; here a
stencil problem goes *directly* to the static ELL layout — for a constant
stencil every row has the same slot structure, so assembly is a vectorized
neighbor-index computation with no sort, and scales to bench-size grids
(128^3 x 27pt) in milliseconds.

Dirichlet boundary handling matches hypre's generators: the stencil is simply
truncated at the boundary (eliminated boundary conditions), keeping the
matrix SPD for the Laplacian cases.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp

from hypre_tpu.core.config import PAD_COL, default_real_dtype
from hypre_tpu.seq.ell import EllMatrix


def stencil_to_ell(grid_shape, offsets, coeffs, dtype=None) -> EllMatrix:
    """Assemble a constant-coefficient stencil operator on a dense grid.

    grid_shape: tuple of grid dims (row index = C-order flattening).
    offsets: (k, ndim) int array of stencil offsets.
    coeffs: (k,) stencil coefficients, aligned with offsets.

    Assembly is pure index arithmetic, so it runs as jnp ops on the
    default device — a 128^3 x 27pt operator assembles in milliseconds
    (hypre's par_laplace.c row loops took ~3 s of host time here).
    """
    dtype = dtype or default_real_dtype()
    grid_shape = tuple(int(g) for g in grid_shape)
    offsets = np.asarray(offsets, dtype=np.int64)
    ndim = len(grid_shape)
    n = int(np.prod(grid_shape))
    k = offsets.shape[0]
    strides = np.array(
        [int(np.prod(grid_shape[d + 1 :])) for d in range(ndim)], dtype=np.int64
    )
    shifts = tuple(int(v) for v in (offsets * strides).sum(axis=1))
    vals, cols = _stencil_slabs(
        grid_shape,
        tuple(tuple(int(v) for v in o) for o in offsets),
        tuple(float(c) for c in np.asarray(coeffs, dtype)),
        shifts,
        jnp.dtype(dtype).name,
    )
    return EllMatrix(vals=vals, cols=cols, n_cols=n, shifts=shifts)


@functools.lru_cache(maxsize=64)
def _stencil_builder(grid_shape, offsets, coeffs, shifts, dtype_name):
    ndim = len(grid_shape)
    n = int(np.prod(grid_shape))
    strides = [int(np.prod(grid_shape[d + 1 :])) for d in range(ndim)]
    dtype = jnp.dtype(dtype_name)

    @jax.jit
    def build():
        rows = jnp.arange(n, dtype=jnp.int32)
        coords = [(rows // strides[d]) % grid_shape[d] for d in range(ndim)]
        cols_list, vals_list = [], []
        for s in range(len(offsets)):
            inside = jnp.ones(n, bool)
            for d in range(ndim):
                c = coords[d] + offsets[s][d]
                inside = inside & (c >= 0) & (c < grid_shape[d])
            cols_list.append(jnp.where(inside, rows + shifts[s], PAD_COL))
            vals_list.append(
                jnp.where(inside, jnp.asarray(coeffs[s], dtype), 0)
            )
        return (
            jnp.stack(vals_list, axis=1),
            jnp.stack(cols_list, axis=1).astype(jnp.int32),
        )

    return build


def _stencil_slabs(grid_shape, offsets, coeffs, shifts, dtype_name):
    # ONE jitted dispatch: unjitted op-by-op assembly paid this tunnel's
    # ~20 ms per-dispatch overhead dozens of times (~45 s at 128^3)
    return _stencil_builder(grid_shape, offsets, coeffs, shifts, dtype_name)()


def laplacian_2d_5pt(nx: int, ny: int, dtype=None) -> EllMatrix:
    """-Δ on an nx x ny grid, 5-point stencil (ij.c -laplacian ... -n 2D)."""
    offsets = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)]
    coeffs = [4.0, -1.0, -1.0, -1.0, -1.0]
    return stencil_to_ell((nx, ny), offsets, coeffs, dtype)


def laplacian_2d_9pt(nx: int, ny: int, dtype=None) -> EllMatrix:
    """9-point Laplacian (par_laplace_9pt.c: 8 on diag, -1 on all 8 neighbors)."""
    offsets = [(0, 0)] + [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    coeffs = [8.0] + [-1.0] * 8
    return stencil_to_ell((nx, ny), offsets, coeffs, dtype)


def laplacian_3d_7pt(nx: int, ny: int, nz: int, dtype=None) -> EllMatrix:
    offsets = [(0, 0, 0), (-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1)]
    coeffs = [6.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0]
    return stencil_to_ell((nx, ny, nz), offsets, coeffs, dtype)


def laplacian_3d_27pt(nx: int, ny: int, nz: int, dtype=None) -> EllMatrix:
    """27-point Laplacian (par_laplace_27pt.c: 26 on diag, -1 on 26 neighbors)."""
    offsets = [(0, 0, 0)] + [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
        if (dx, dy, dz) != (0, 0, 0)
    ]
    coeffs = [26.0] + [-1.0] * 26
    return stencil_to_ell((nx, ny, nz), offsets, coeffs, dtype)


def difconv_3d_7pt(
    nx: int, ny: int, nz: int, ax: float = 1.0, ay: float = 1.0, az: float = 1.0,
    cx: float = 1.0, cy: float = 0.0, cz: float = 0.0, dtype=None,
) -> EllMatrix:
    """Convection-diffusion -a·Δu + c·∇u, upwind first-order (par_difconv.c).

    h-scaled like hypre: h = 1/(nx+1) per direction, central diffusion +
    upwind convection, giving a nonsymmetric M-matrix for c != 0.
    """
    hx, hy, hz = 1.0 / (nx + 1), 1.0 / (ny + 1), 1.0 / (nz + 1)
    # diffusion / h^2 plus upwind convection / h (flow assumed positive)
    wdiag = 2 * ax / hx**2 + 2 * ay / hy**2 + 2 * az / hz**2 + cx / hx + cy / hy + cz / hz
    offsets = [(0, 0, 0), (-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1)]
    coeffs = [
        wdiag,
        -ax / hx**2 - cx / hx,
        -ax / hx**2,
        -ay / hy**2 - cy / hy,
        -ay / hy**2,
        -az / hz**2 - cz / hz,
        -az / hz**2,
    ]
    return stencil_to_ell((nx, ny, nz), offsets, coeffs, dtype)


def rotated_anisotropy_2d(nx: int, ny: int, eps: float = 0.001, theta_deg: float = 45.0, dtype=None) -> EllMatrix:
    """Rotated anisotropic diffusion, 7-pt stencil (par_rotate_7pt.c).

    -div(K grad u) with K = R(theta) diag(1, eps) R(theta)^T discretized on a
    7-point (2-D) stencil; the classic AMG stress test for strength-of-
    connection and coarsening (ij driver flag ``-rotate``).
    """
    th = np.deg2rad(theta_deg)
    c, s = np.cos(th), np.sin(th)
    cxx = c * c + eps * s * s
    cyy = s * s + eps * c * c
    cxy = 2 * (1.0 - eps) * c * s
    offsets = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1), (-1, -1), (1, 1)]
    coeffs = [
        2 * cxx + 2 * cyy - cxy,
        -cxx + cxy / 2,
        -cxx + cxy / 2,
        -cyy + cxy / 2,
        -cyy + cxy / 2,
        -cxy / 2,
        -cxy / 2,
    ]
    return stencil_to_ell((nx, ny), offsets, coeffs, dtype)


def laplacian_1d(n: int, dtype=None) -> EllMatrix:
    """-u'' on n points, 3-point stencil (the 1-D driver problem)."""
    return stencil_to_ell((n,), [(0,), (-1,), (1,)], [2.0, -1.0, -1.0], dtype)


def elasticity_2d(nx: int, ny: int, lam: float = 1.0, mu: float = 1.0,
                  dtype=None) -> EllMatrix:
    """2-D linear elasticity (Navier) FD operator, 2 dofs (u,v) per node —
    the systems test problem for nodal/block AMG (hypre's num_functions=2
    cases; driver -sysL analogue):

        -( (lam+2mu) u_xx + mu u_yy ) - (lam+mu) v_xy = f_u
        -( mu v_xx + (lam+2mu) v_yy ) - (lam+mu) u_xy = f_v

    Dirichlet truncation at the boundary; dof ordering = node-major
    (node (i,j) -> unknowns 2*(i*ny+j) + {0,1}), so ``ell_to_bsr(A, 2)``
    recovers the nodal block structure exactly.
    """
    dtype = dtype or default_real_dtype()
    n_nodes = nx * ny
    n = 2 * n_nodes
    rows, cols, vals = [], [], []

    def node(i, j):
        return i * ny + j

    def add(r, c, v):
        rows.append(r)
        cols.append(c)
        vals.append(v)

    a = lam + 2 * mu
    c4 = (lam + mu) / 4.0
    for i in range(nx):
        for j in range(ny):
            nu = 2 * node(i, j)
            nv = nu + 1
            add(nu, nu, 2 * a + 2 * mu)
            add(nv, nv, 2 * a + 2 * mu)
            for di, dj, cu, cv in (
                (-1, 0, -a, -mu), (1, 0, -a, -mu),
                (0, -1, -mu, -a), (0, 1, -mu, -a),
            ):
                ii, jj = i + di, j + dj
                if 0 <= ii < nx and 0 <= jj < ny:
                    add(nu, 2 * node(ii, jj), cu)
                    add(nv, 2 * node(ii, jj) + 1, cv)
            # mixed derivative couples u<->v at the diagonal corners
            for di, dj, sgn in (
                (1, 1, -1.0), (1, -1, 1.0), (-1, 1, 1.0), (-1, -1, -1.0)
            ):
                ii, jj = i + di, j + dj
                if 0 <= ii < nx and 0 <= jj < ny:
                    add(nu, 2 * node(ii, jj) + 1, sgn * c4)
                    add(nv, 2 * node(ii, jj), sgn * c4)
    from hypre_tpu.seq.csr import HostCSR
    from hypre_tpu.seq.ell import csr_to_ell

    csr = HostCSR.from_coo(
        np.asarray(rows), np.asarray(cols), np.asarray(vals, dtype), (n, n)
    )
    return csr_to_ell(csr, dtype=dtype)


def _vdc_jump(x, y, z):
    """par_vardifconv.c's a/b/cfun: 0.01 in the eight corner cubes, 1000
    in the interior cube [0.1,0.9]^3, 1.0 in the remaining shell."""
    lo, hi = 0.1, 0.9
    corner = (
        ((x < lo) | (x > hi)) & ((y < lo) | (y > hi)) & ((z < lo) | (z > hi))
    )
    interior = (
        (x >= lo) & (x <= hi) & (y >= lo) & (y <= hi) & (z >= lo) & (z <= hi)
    )
    return jnp.where(corner, 0.01, jnp.where(interior, 1000.0, 1.0))


def vardifconv_3d(nx: int, ny: int, nz: int, eps: float = 1.0,
                  dtype=None) -> EllMatrix:
    """Variable (jump-coefficient) diffusion problem — the ``-vardifconv``
    generator (``parcsr_ls/par_vardifconv.c``): -eps div(a(x) grad u) on
    the unit cube, face coefficients evaluated at face midpoints
    (``par_vardifconv.c:215-220``), Dirichlet truncation at the box. The
    default d/e/f/g convection/reaction functions are zero in the
    reference, so the operator is SPD with 5 orders of coefficient jump.
    Assembly is device-side index arithmetic like the other generators.
    """
    dtype = dtype or default_real_dtype()
    n = nx * ny * nz
    shape = (nx, ny, nz)
    strides = (ny * nz, nz, 1)
    hh = (1.0 / (nx + 1), 1.0 / (ny + 1), 1.0 / (nz + 1))

    rows = jnp.arange(n, dtype=jnp.int32)
    coords = [(rows // strides[d]) % shape[d] for d in range(3)]
    xyz = [(coords[d] + 1.0) * hh[d] for d in range(3)]

    vals_list, cols_list = [], []
    center = jnp.zeros(n, dtype)
    shifts = []
    for d in range(3):
        for sgn in (-1, 1):
            mid = list(xyz)
            mid[d] = xyz[d] + 0.5 * sgn * hh[d]
            cf = (eps * _vdc_jump(*mid) / hh[d] / hh[d]).astype(dtype)
            center = center + cf
            inside = (
                (coords[d] + sgn >= 0) & (coords[d] + sgn < shape[d])
            )
            shift = sgn * strides[d]
            shifts.append(shift)
            cols_list.append(jnp.where(inside, rows + shift, -1))
            vals_list.append(jnp.where(inside, -cf, 0))
    cols_list.insert(0, rows)
    vals_list.insert(0, center)
    shifts.insert(0, 0)
    return EllMatrix(
        vals=jnp.stack(vals_list, axis=1),
        cols=jnp.stack(cols_list, axis=1).astype(jnp.int32),
        n_cols=n,
        shifts=tuple(shifts),
    )
