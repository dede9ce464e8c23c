"""Micro-profile of the device-setup pieces on the real chip (ad-hoc)."""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from hypre_tpu.amg import device_setup as ds
from hypre_tpu.problems.laplacian import laplacian_3d_7pt

n = int(os.environ.get("N", "128"))
A = laplacian_3d_7pt(n, n, n, dtype=jnp.float32)
jax.block_until_ready(A.vals)
shifts = A.shifts
print(f"n={A.n_rows} k={A.k} shifts={shifts}", file=sys.stderr, flush=True)


def timed(tag, fn, *args, reps=2):
    out = None
    for i in range(reps + 1):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        print(f"[{tag}] run{i}: {t1-t0:.3f}s", file=sys.stderr, flush=True)
    return out


theta = jnp.asarray(0.25, jnp.float32)
s_cap = min(12, A.k)

# 1. split (aggressive: strength + PMIS + 2nd pass + vectors)
out = timed(
    "split_agg2",
    lambda: ds._jit_split_agg2(
        A.vals, A.cols, theta, s_cap, ds._bucket(4 * s_cap), shifts, True,
        mxrs=1.0,
    ),
)
scols, svals, cf, cmap, n_c, dinv, l1inv, lmax = out
n_coarse = int(n_c)
print(f"n_coarse={n_coarse}", file=sys.stderr, flush=True)

# pieces of the split
timed(
    "strength",
    jax.jit(lambda v, c: ds.strength_and_cap(
        ds.EllMatrix(vals=v, cols=c, n_cols=v.shape[0]), 0.25, s_cap, shifts
    )[1]),
    A.vals, A.cols,
)
timed(
    "pmis1",
    jax.jit(lambda sc: ds.pmis_device(sc, A.n_rows, shifts=shifts)),
    scols,
)
cf1 = ds.pmis_device(scols, A.n_rows, shifts=shifts)
timed(
    "second_pass",
    jax.jit(lambda sc, c1: ds.second_pass_pmis(
        sc, c1, A.n_rows, ds._bucket(4 * s_cap), shifts
    )),
    scols, cf1,
)

# 2. multipass interp alone
pmax = 4
mp = timed(
    "multipass",
    jax.jit(lambda v, c, sc, sv, cfx, cm: ds.multipass_interp_device(
        ds.EllMatrix(vals=v, cols=c, n_cols=v.shape[0]), sc, sv, cfx, cm,
        pmax, shifts=shifts,
    )),
    A.vals, A.cols, scols, svals, cf, cmap,
)
pc, pv, _ = mp
pc, pv = pc[:, :4], pv[:, :4]

# 3. galerkin pieces with the plan widths from the log
out_ap, out_t, out_ac = 12, 48, 40
ch_ap = 1
while A.n_rows * (A.k * 4) / ch_ap > 48e6:
    ch_ap *= 2
ch_ac = 1
while n_coarse * (out_t * out_ap) / ch_ac > 48e6:
    ch_ac *= 2
print(f"ch_ap={ch_ap} ch_ac={ch_ac}", file=sys.stderr, flush=True)

ap = timed(
    "spgemm AP",
    jax.jit(lambda av, ac, p_c, p_v: ds.spgemm_slab(
        ac, av, p_c, p_v, out_ap, shifts=shifts, chunks=ch_ap
    )),
    A.vals, A.cols, pc, pv,
)
apc, apv, _ = ap
apc, apv = apc[:, :out_ap], apv[:, :out_ap]

tr = timed(
    "transpose P",
    jax.jit(lambda p_c, p_v: ds.transpose_slab(p_c, p_v, n_coarse, out_t)),
    pc, pv,
)
tc, tv, _ = tr
tc, tv = tc[:, :out_t], tv[:, :out_t]

acr = timed(
    "spgemm Pt(AP)",
    jax.jit(lambda a, b, c, d: ds.spgemm_slab(a, b, c, d, out_ac,
                                              chunks=ch_ac)),
    tc, tv, apc, apv,
)

# 4. drop/lump
acc, acv, _ = acr
timed(
    "drop_lump",
    jax.jit(lambda c, v: ds._jit_drop_lump(c, v, 0.02)),
    acc[:, :out_ac], acv[:, :out_ac],
)
