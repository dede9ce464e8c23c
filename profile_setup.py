"""Ad-hoc setup-time breakdown on the real chip (not part of the library)."""
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

os.environ.setdefault("HYPRE_TPU_LOG_SETUP", "1")

import dataclasses

from hypre_tpu.amg.device_setup import setup_hierarchy_device
from hypre_tpu.amg.hierarchy import optimize_hierarchy
from hypre_tpu.problems.laplacian import laplacian_3d_7pt

n = int(os.environ.get("N", "128"))
A = laplacian_3d_7pt(n, n, n, dtype=jnp.float32)
jax.block_until_ready(A.vals)
width_plan = {}


def build(Ax, tag):
    t0 = time.perf_counter()
    hier = setup_hierarchy_device(
        Ax, max_coarse_size=1500, relax="chebyshev", agg_num_levels=1,
        width_plan=width_plan, coarse_drop_tol=0.02, transfer_dia=True,
    )
    t1 = time.perf_counter()
    fast = optimize_hierarchy(hier, gather_precision=0)
    # block on the FULL result pytree (the DIA/BandedEll conversions are
    # dispatched asynchronously; blocking only on dinv/coarse_inv — which
    # pass through unchanged — under-reported this phase)
    jax.block_until_ready(jax.tree_util.tree_leaves(fast))
    t2 = time.perf_counter()
    print(f"[{tag}] setup_hierarchy_device: {t1-t0:.3f}s  "
          f"optimize_hierarchy+sync: {t2-t1:.3f}s  total {t2-t0:.3f}s",
          file=sys.stderr, flush=True)
    return fast


build(dataclasses.replace(A, vals=A.vals * 2.0), "warm")
build(A, "timed1")
build(dataclasses.replace(A, vals=A.vals * 0.5), "timed2")
