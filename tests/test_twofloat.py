"""Error-free-transform kernels + the on-chip 1e-8 refinement tier.

hypre's goldens are f64 residuals in the 1e-8/1e-9 class
(``TEST_ij/solvers.saved:1-30``); these tests pin that the two-float
residual path reproduces that accuracy from pure-f32 arithmetic (f64 is
used only as the *oracle* here, never inside the solve).
"""

import numpy as np
import jax
import jax.numpy as jnp

from hypre_tpu.problems.laplacian import laplacian_3d_7pt
from hypre_tpu.seq.dia import try_dia
from hypre_tpu.seq.twofloat import (
    dia_mv_2f, dia_residual_2f, two_prod, two_sum,
)


def test_eft_identities():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(1000), jnp.float32) * 1e3
    b = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    s, e = two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_allclose(got, exact, rtol=0, atol=0)
    p, pe = two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(pe, np.float64)
    np.testing.assert_allclose(got, exact, rtol=1e-14)


def test_dia_mv_2f_beats_plain_f32():
    A = laplacian_3d_7pt(12, 12, 12)
    D = try_dia(A)
    assert D is not None
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(A.n_rows), jnp.float32)
    # f64 oracle of the f32 data
    dv = np.asarray(D.dvals, np.float64)
    xv = np.asarray(x, np.float64)
    y64 = np.zeros(A.n_rows)
    for d, o in enumerate(D.offsets):
        sh = np.zeros_like(xv)
        if o == 0:
            sh = xv
        elif o > 0:
            sh[:-o] = xv[o:]
        else:
            sh[-o:] = xv[:o]
        y64 += dv[d] * sh
    hi, lo = jax.jit(dia_mv_2f)(D, x)
    err2f = np.abs(np.asarray(hi, np.float64) + np.asarray(lo, np.float64) - y64).max()
    err32 = np.abs(np.asarray(D.mv(x), np.float64) - y64).max()
    scale = np.abs(y64).max() + 1
    assert err2f < 1e-5 * err32 + 1e-12 * scale, (err2f, err32)


def test_refiner_reaches_1e8_on_chip_arithmetic():
    """Refinement with two-float residuals must hit a 1e-8 TRUE relative
    residual using only f32 device arithmetic (hypre golden class)."""
    from hypre_tpu.refine import make_device_refiner
    from hypre_tpu.krylov import pcg

    A = laplacian_3d_7pt(16, 16, 16)
    D = try_dia(A)
    dinv = (1.0 / A.diagonal()).astype(jnp.float32)

    def inner(Af, dinv, r):
        return pcg(lambda v: Af.mv(v), r, M=lambda z: dinv * z,
                   rtol=1e-5, maxiter=80)

    refined = make_device_refiner([inner] * 3, residual_2f=True)
    b = jnp.ones(A.n_rows, jnp.float32)
    x_hi, x_lo, info = refined(D, dinv, b)
    # f64 oracle residual
    from hypre_tpu import native
    from hypre_tpu.amg.hierarchy import _ell_to_csr_arrays

    n, Ap, Aj, Ax = _ell_to_csr_arrays(A)
    x64 = np.asarray(x_hi, np.float64) + np.asarray(x_lo, np.float64)
    r = np.ones(n) - native.matvec(n, Ap, Aj, Ax, x64)
    rel = np.linalg.norm(r) / np.sqrt(n)
    assert rel < 1e-8, rel
    # the plain-f32-residual refiner CANNOT reach this (sanity contrast)
    plain = make_device_refiner([inner] * 3, residual_2f=False)
    p_hi, p_lo, _ = plain(D, dinv, b)
    p64 = np.asarray(p_hi, np.float64) + np.asarray(p_lo, np.float64)
    rp = np.ones(n) - native.matvec(n, Ap, Aj, Ax, p64)
    assert np.linalg.norm(rp) / np.sqrt(n) > rel
