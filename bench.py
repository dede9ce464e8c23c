"""Benchmark driver — prints ONE JSON line for the round harness.

Headline metric (BASELINE.json): BoomerAMG-PCG setup+solve wall time on a
3-D 7-pt Laplacian, matched per-device against hypre's TEST_bench golden:
hypre solves 256x256x128 on 4xV100 in 0.155 s setup + 0.486 s solve
(``src/test/TEST_bench/benchmark_ij.perf.saved.lassen:2-3``), i.e. ~2.1M rows
per GPU. One TPU chip here solves 128^3 = 2.097M rows — the same per-device
load. vs_baseline = hypre_per_device_time / our_time (>1 means faster than
the reference's V100 number).

Also measured and printed to stderr: SpMV effective GB/s vs the chip's HBM
roofline, and the solve iteration count/residual for sanity.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

HYPRE_SETUP_S = 0.155  # benchmark_ij.perf.saved.lassen:2 (4xV100, 2.1M rows/GPU)
HYPRE_SOLVE_S = 0.486  # benchmark_ij.perf.saved.lassen:3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_spmv(A, n_iter=50):
    from hypre_tpu.seq.ell import ell_spmv

    x = jnp.ones(A.n_cols, A.dtype)
    f = jax.jit(lambda x: ell_spmv(A, x))
    f(x).block_until_ready()
    t0 = time.perf_counter()
    y = x
    for _ in range(n_iter):
        y = f(y)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter
    # bytes: vals + cols read, x read (gathered ~ nnz), y written
    itemsize = jnp.dtype(A.dtype).itemsize
    bytes_moved = A.vals.size * (itemsize + 4) + (A.n_cols + A.n_rows) * itemsize
    return dt, bytes_moved / dt / 1e9


def main():
    from hypre_tpu.amg import BoomerAMG
    from hypre_tpu.krylov import pcg
    from hypre_tpu.problems.laplacian import laplacian_3d_7pt

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    n = 128
    dtype = jnp.float32

    t0 = time.perf_counter()
    A = laplacian_3d_7pt(n, n, n, dtype=dtype)
    jax.block_until_ready(A.vals)
    log(f"assembly {n}^3 7pt: {time.perf_counter()-t0:.3f}s")

    dt, gbps = bench_spmv(A)
    log(f"SpMV: {dt*1e3:.3f} ms, effective {gbps:.1f} GB/s")

    # --- AMG-PCG setup ---
    t0 = time.perf_counter()
    amg = BoomerAMG().setup(A)
    jax.block_until_ready(amg.hierarchy.coarse_inv)
    setup_s = time.perf_counter() - t0
    log(f"AMG setup: {setup_s:.3f}s")
    log(amg.stats())

    # --- AMG-PCG solve (rtol 1e-6 in f32; hypre bench runs rtol 1e-6 too,
    # benchmark_ij.jobs uses -tol 1e-6) ---
    b = jnp.ones(A.n_rows, dtype)
    op = lambda v: A.mv(v)
    solve = jax.jit(lambda b: pcg(op, b, M=amg.precond(), rtol=1e-6, maxiter=100))
    x, info = solve(b)  # compile + first run
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x, info = solve(b)
    jax.block_until_ready(x)
    solve_s = time.perf_counter() - t0
    log(
        f"AMG-PCG solve: {solve_s:.3f}s, {int(info.iterations)} iters, "
        f"rel_res={float(info.relative_residual):.2e}, converged={bool(info.converged)}"
    )

    total = setup_s + solve_s
    hypre_total = HYPRE_SETUP_S + HYPRE_SOLVE_S
    print(
        json.dumps(
            {
                "metric": "amg_pcg_setup_plus_solve_128cube_7pt",
                "value": round(total, 4),
                "unit": "seconds",
                "vs_baseline": round(hypre_total / total, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
