"""Shape-robustness measurement: prime with 128^3, then time 96^3 first-sight."""
import dataclasses, os, sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
os.environ.setdefault("HYPRE_TPU_LOG_SETUP", "1")

from hypre_tpu.amg.device_setup import setup_hierarchy_device
from hypre_tpu.amg.hierarchy import optimize_hierarchy

def log(*a):
    print(*a, file=sys.stderr, flush=True)

from hypre_tpu.problems.laplacian import laplacian_3d_7pt

def build(A, plan):
    t0 = time.perf_counter()
    h = setup_hierarchy_device(A, max_coarse_size=1500, relax="chebyshev",
                               agg_num_levels=1, width_plan=plan,
                               coarse_drop_tol=0.02, transfer_dia=True)
    f = optimize_hierarchy(h, gather_precision=0)
    jax.block_until_ready(jax.tree_util.tree_leaves(f))
    return f, time.perf_counter() - t0

plan = {}
for tag, nn in [("128-a", 128), ("128-b", 128), ("128-c", 128),
                ("96-cold", 96), ("96-warm", 96), ("112-cold", 112)]:
    A = laplacian_3d_7pt(nn, nn, nn, dtype=jnp.float32)
    jax.block_until_ready(A.vals)
    scale = {"128-b": 2.0, "128-c": 0.5, "96-warm": 2.0}.get(tag)
    if scale:
        A = dataclasses.replace(A, vals=A.vals * scale)
    h, dt = build(A, plan)
    log(f"[{tag}] setup+optimize: {dt:.3f}s")
