import time, jax, jax.numpy as jnp, numpy as np
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
from hypre_tpu.problems.laplacian import laplacian_3d_7pt
from hypre_tpu.seq.dia import try_dia, dia_spmv_pallas

n = 128
A = laplacian_3d_7pt(n, n, n, dtype=jnp.float32)
D = try_dia(A)
jax.block_until_ready(D.dvals)
N = D.n_rows
offs = jnp.asarray(D.offsets, jnp.int32)
m = 32768  # margin bucket

def chain(body):
    @jax.jit
    def run(dvals, x, offs, iters):
        def f(i, v):
            y = body(dvals, v, offs)
            return y * (1.0 / 7.0)
        y = lax.fori_loop(0, iters, f, x)
        return jnp.sum(y)
    return run

def pallas_body(dvals, x, offs):
    return dia_spmv_pallas(D.__class__(dvals=dvals, offsets=D.offsets, n_cols=N), x)

def dyn_body(dvals, x, offs):
    xp = jnp.concatenate([jnp.zeros(m, x.dtype), x, jnp.zeros(m, x.dtype)])
    acc = None
    for d in range(dvals.shape[0]):
        t = dvals[d] * lax.dynamic_slice_in_dim(xp, m + offs[d], N)
        acc = t if acc is None else acc + t
    return acc

x = jnp.ones(N, jnp.float32)
for name, body in [("xla_dynslice", dyn_body)]:
    run = chain(body)
    try:
        for iters in (5, 55):
            float(run(D.dvals, x, offs, iters))
        ts = {}
        for iters in (5, 55):
            t0 = time.perf_counter(); float(run(D.dvals, x, offs, iters)); ts[iters] = time.perf_counter()-t0
        per = (ts[55]-ts[5])/50
        traffic = (D.dvals.size + 2*N) * 4
        print(f"{name}: {per*1e3:.3f} ms/SpMV ({traffic/per/1e9:.0f} GB/s)")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}")
