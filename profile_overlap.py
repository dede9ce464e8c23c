"""Quantify halo-exchange/compute overlap in the distributed SpMV.

hypre overlaps its halo exchange with the diag-block SpMV explicitly
(Isend/Irecv -> diag SpMV -> Waitall -> offd SpMV,
``parcsr_mv/par_csr_matvec.c:293-340``). The TPU build relies on XLA's
async collectives + latency-hiding scheduler for the same effect
(``parallel/halo.py``). This script MEASURES whether that holds, by timing
three jitted loops on the mesh:

  full     — the real par_spmv (pack -> ppermute exchange -> diag + offd)
  compute  — the same minus the exchange (diag + offd on a zero halo)
  exchange — the exchange alone (pack -> ppermute -> sum)

overlap fraction = (t_compute + t_exchange - t_full) / min(t_exchange,
t_compute): 1.0 = perfectly hidden, <= 0 = fully serialized.

Also writes a jax.profiler trace of the full loop to ./profiles/ for
inspection (xprof/tensorboard).

Run on the 8-device CPU mesh (default) or real multi-chip hardware:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python profile_overlap.py
"""

import functools
import os
import sys
import time

import jax

# jax.devices() initializes the backend; decide from env/config only
if os.environ.get("HYPRE_TPU_PROFILE_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from hypre_tpu.parallel import make_mesh, par_spmv, partition_ell
from hypre_tpu.parallel.mesh import ROW_AXIS
from hypre_tpu.parallel.par_ell import (
    _exchange, _local_spmv, distribute_vector,
)
from hypre_tpu.problems.laplacian import laplacian_3d_7pt

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def timed_loop(fn, x, n_iter=60, trials=3):
    @jax.jit
    def loop(x):
        def body(i, v):
            return fn(v) * (1.0 + 1e-7)

        y = lax.fori_loop(0, n_iter, body, x)
        return y, jnp.sum(y)

    _, s = loop(x)
    float(s)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        _, s = loop(x)
        float(s)
        best = min(best, time.perf_counter() - t0)
    return best / n_iter


def main():
    n = int(os.environ.get("N", "64"))
    ndev = len(jax.devices())
    mesh = make_mesh(ndev)
    A = laplacian_3d_7pt(n, n, n)
    Ap = partition_ell(A, mesh)
    x = distribute_vector(np.random.default_rng(0).standard_normal(A.n_rows),
                          mesh, A.n_rows)
    nshards = Ap.num_shards
    offsets, sizes = Ap.offsets, Ap.sizes

    full = lambda v: par_spmv(Ap, v)

    def compute_only(v):
        def shard_fn(dvals, dcols, ovals, ocols, x_local):
            halo = jnp.zeros((max(sum(sizes), 1),), x_local.dtype)
            return _local_spmv(dvals, dcols, x_local) + _local_spmv(
                ovals, ocols, halo
            )

        spec = P(ROW_AXIS)
        return _shard_map(
            shard_fn, mesh=Ap.mesh, in_specs=(spec,) * 5, out_specs=spec,
        )(Ap.diag_vals, Ap.diag_cols, Ap.offd_vals, Ap.offd_cols, v)

    def exchange_only(v):
        def shard_fn(send_idx, x_local):
            send = jnp.take(x_local, jnp.maximum(send_idx[0], 0), axis=0)
            halo = _exchange(send, offsets, sizes, nshards)
            out = jnp.zeros_like(x_local)
            return out.at[: halo.shape[0]].add(halo)

        spec = P(ROW_AXIS)
        return _shard_map(
            shard_fn, mesh=Ap.mesh, in_specs=(spec, spec), out_specs=spec,
        )(Ap.send_idx, v)

    t_full = timed_loop(full, x)
    t_comp = timed_loop(compute_only, x)
    t_exch = timed_loop(exchange_only, x)
    hidden = t_comp + t_exch - t_full
    denom = min(t_comp, t_exch)
    frac = hidden / denom if denom > 0 else float("nan")
    print(
        f"devices={ndev} n={n}^3 rows={A.n_rows} "
        f"halo_bytes={Ap.exchange_bytes()}"
    )
    print(
        f"t_full={t_full*1e3:.3f} ms  t_compute={t_comp*1e3:.3f} ms  "
        f"t_exchange={t_exch*1e3:.3f} ms"
    )
    print(
        f"overlap: hidden={hidden*1e3:.3f} ms of min-phase "
        f"{denom*1e3:.3f} ms -> {100*frac:.0f}% hidden"
        f" (100% = fully overlapped, <=0% = serialized)"
    )

    os.makedirs("profiles", exist_ok=True)
    with jax.profiler.trace("profiles"):
        for _ in range(5):
            y = full(x)
        jax.block_until_ready(y)
    print("trace written to ./profiles/ (xprof format)")


if __name__ == "__main__":
    main()
