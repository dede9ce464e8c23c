"""Multi-host layer: mesh construction and the distributed-init path.

The real pod path needs >1 process; these tests pin the single-host
degenerate behavior and the device-ordering/partition logic that the pod
path relies on (the same split hypre tests with its mpistubs serial
build vs real MPI, utilities/mpistubs.c:763)."""

import jax
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
import numpy as np

from hypre_tpu.parallel import (
    ParEllMatrix, flat_row_mesh, host_row_ranges, init_multihost,
    make_pod_mesh, par_spmv, partition_ell,
)
from hypre_tpu.parallel.mesh import ROW_AXIS
from hypre_tpu.parallel.multihost import DCN_AXIS


def test_init_multihost_single_process_noop():
    # single process, no cluster env: must not try to reach a coordinator
    rank = init_multihost()
    assert rank == 0
    assert jax.process_count() == 1


def test_make_pod_mesh_axes():
    mesh = make_pod_mesh()
    assert mesh.axis_names == (DCN_AXIS, ROW_AXIS)
    assert mesh.devices.shape == (1, len(jax.devices()))
    # explicit hosts: 8 virtual devices as 2 hosts x 4
    mesh2 = make_pod_mesh(hosts=2)
    assert mesh2.devices.shape == (2, 4)


def test_flat_row_mesh_host_contiguous():
    mesh = flat_row_mesh()
    assert mesh.axis_names == (ROW_AXIS,)
    procs = [d.process_index for d in mesh.devices.flatten()]
    assert procs == sorted(procs), "host blocks must stay contiguous"


def test_host_row_ranges_cover_disjoint():
    mesh = flat_row_mesh()
    n = 1003
    ranges = host_row_ranges(n, mesh)
    assert ranges[0][0] == 0 and ranges[-1][1] == n
    for (a, b), (c, d) in zip(ranges, ranges[1:]):
        assert b == c


def test_pod_mesh_spmv_matches_flat():
    # the same operator partitioned over the flat row mesh gives the same
    # matvec — the pod mesh only re-groups devices
    from hypre_tpu.problems.laplacian import laplacian_2d_5pt

    A = laplacian_2d_5pt(24, 24)
    mesh = flat_row_mesh()
    Ap = partition_ell(A, mesh)
    x = np.random.default_rng(0).standard_normal(A.n_rows).astype(np.float32)
    import jax.numpy as jnp

    y_ref = np.asarray(A.mv(jnp.asarray(x, A.dtype)))
    from hypre_tpu.parallel.par_ell import collect_vector, distribute_vector

    xd = distribute_vector(jnp.asarray(x, A.dtype), mesh)
    y = collect_vector(par_spmv(Ap, xd), A.n_rows)
    np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=2e-5)


def test_two_process_distributed_bringup(tmp_path):
    # REAL multi-controller bring-up: two OS processes join through
    # init_multihost (coordinator on loopback), build the flat row mesh
    # over both processes' devices, and run a cross-process psum. This is
    # the single-machine stand-in for hypre's 2-rank mpirun smoke tests.
    import socket
    import subprocess
    import sys
    import textwrap

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = textwrap.dedent(f"""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        sys.path.insert(0, {repr(str(ROOT))})
        import jax
        jax.config.update("jax_platforms", "cpu")
        pid = int(sys.argv[1])
        from hypre_tpu.parallel import init_multihost, flat_row_mesh
        rank = init_multihost(coordinator_address="127.0.0.1:{port}",
                              num_processes=2, process_id=pid)
        import numpy as np, jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        assert jax.process_count() == 2
        mesh = flat_row_mesh()
        x = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("rows")),
            np.full(8, rank + 1.0, np.float32), (16,))
        s = jax.jit(lambda v: jnp.sum(v),
                    out_shardings=NamedSharding(mesh, P()))(x)
        assert float(s) == 8 * 1.0 + 8 * 2.0, float(s)
        print("RANK_OK", rank)
    """)
    f = tmp_path / "worker.py"
    f.write_text(script)
    procs = [
        subprocess.Popen(
            [sys.executable, str(f), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in (0, 1)
    ]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-2000:]}"
        assert f"RANK_OK {i}" in out


def test_par_ilu_matches_sequential():
    # distributed Chow-Patel ILU(0) (precond/par_ilu.py) must converge to
    # the same fixed point as the single-device kernel (precond/ilu.py) —
    # Euclid's external-row exchange applied to the factor slab
    import jax.numpy as jnp

    from hypre_tpu.precond.ilu import ILU
    from hypre_tpu.precond.par_ilu import ParILU
    from hypre_tpu.problems.laplacian import laplacian_2d_5pt
    from hypre_tpu.parallel.par_ell import collect_vector, distribute_vector

    A = laplacian_2d_5pt(24, 24)
    n = A.n_rows
    mesh = flat_row_mesh()
    Ap = partition_ell(A, mesh)

    seq = ILU(factor_sweeps=8, solve_sweeps=6).setup(A)
    par = ParILU(factor_sweeps=8, solve_sweeps=6).setup(Ap)

    r = np.random.default_rng(3).standard_normal(n).astype(np.float32)
    z_seq = np.asarray(seq.precond()(jnp.asarray(r, A.dtype)))
    rd = distribute_vector(jnp.asarray(r, A.dtype), mesh)
    z_par = collect_vector(par.precond()(rd), n)
    np.testing.assert_allclose(z_par, z_seq, rtol=2e-4, atol=2e-4)


def test_par_ilu_pcg_iteration_parity():
    # PCG preconditioned by the distributed ILU must match the sequential
    # ILU's iteration count (the splitting is identical, only the storage
    # is sharded)
    import jax.numpy as jnp

    from hypre_tpu.krylov import pcg
    from hypre_tpu.precond.ilu import ILU
    from hypre_tpu.precond.par_ilu import ParILU
    from hypre_tpu.problems.laplacian import laplacian_2d_5pt
    from hypre_tpu.parallel.par_ell import distribute_vector

    A = laplacian_2d_5pt(24, 24)
    n = A.n_rows
    mesh = flat_row_mesh()
    Ap = partition_ell(A, mesh)

    seq = ILU(factor_sweeps=8, solve_sweeps=6).setup(A)
    b = jnp.ones(n, A.dtype)
    _, info_seq = pcg(lambda v: A.mv(v), b, M=seq.precond(), rtol=1e-8)

    par = ParILU(factor_sweeps=8, solve_sweeps=6).setup(Ap)
    bd = distribute_vector(b, mesh)
    _, info_par = pcg(lambda v: par_spmv(Ap, v), bd, M=par.precond(),
                      rtol=1e-8)
    assert abs(int(info_par.iterations) - int(info_seq.iterations)) <= 1, (
        int(info_par.iterations), int(info_seq.iterations),
    )
    assert bool(info_par.converged)


def test_euclid_distributed_dispatch():
    # Euclid on a ParEllMatrix takes the true distributed path
    import jax.numpy as jnp

    from hypre_tpu.krylov import pcg
    from hypre_tpu.precond import Euclid
    from hypre_tpu.problems.laplacian import laplacian_2d_5pt
    from hypre_tpu.parallel.par_ell import distribute_vector

    A = laplacian_2d_5pt(16, 16)
    mesh = flat_row_mesh()
    Ap = partition_ell(A, mesh)
    eu = Euclid().setup(Ap)
    assert eu._par is not None
    bd = distribute_vector(jnp.ones(A.n_rows, A.dtype), mesh)
    _, info = pcg(lambda v: par_spmv(Ap, v), bd, M=eu.precond(), rtol=1e-6)
    assert bool(info.converged)


def test_par_sails_matches_sequential():
    # distributed ParaSails (precond/par_sails.py): level-0-pattern SAI
    # rows solved from halo-fetched remote rows must match the sequential
    # normal-equations version and give PCG iteration parity
    import jax.numpy as jnp

    from hypre_tpu.krylov import pcg
    from hypre_tpu.precond import ParaSails
    from hypre_tpu.precond.par_sails import ParSails
    from hypre_tpu.problems.laplacian import laplacian_2d_5pt
    from hypre_tpu.parallel.par_ell import collect_vector, distribute_vector

    A = laplacian_2d_5pt(24, 24)
    n = A.n_rows
    mesh = flat_row_mesh()
    Ap = partition_ell(A, mesh)

    seq = ParaSails().setup(A)
    par = ParSails().setup(Ap)
    r = np.random.default_rng(5).standard_normal(n).astype(np.float32)
    z_seq = np.asarray(seq.precond()(jnp.asarray(r, A.dtype)))
    z_par = collect_vector(
        par.precond()(distribute_vector(jnp.asarray(r, A.dtype), mesh)), n
    )
    np.testing.assert_allclose(z_par, z_seq, rtol=1e-3, atol=1e-4)

    b = jnp.ones(n, A.dtype)
    _, i_seq = pcg(lambda v: A.mv(v), b, M=seq.precond(), rtol=1e-8)
    bd = distribute_vector(b, mesh)
    _, i_par = pcg(lambda v: par_spmv(Ap, v), bd, M=par.precond(), rtol=1e-8)
    assert abs(int(i_par.iterations) - int(i_seq.iterations)) <= 1
