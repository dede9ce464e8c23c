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


def test_par_ilut_sharded_vs_single_shard_parity():
    """TRUE distributed ILUT (precond/par_ilu.ParILUT — the pilut
    capability): the 8-shard factorization must produce the same
    preconditioner action as the same algorithm on a 1-shard mesh."""
    import jax.numpy as jnp

    from hypre_tpu.parallel import make_mesh
    from hypre_tpu.precond.par_ilu import ParILUT
    from hypre_tpu.problems.laplacian import laplacian_2d_5pt
    from hypre_tpu.parallel.par_ell import collect_vector, distribute_vector

    A = laplacian_2d_5pt(24, 24)
    n = A.n_rows
    knobs = dict(fill_levels=1, drop_tolerance=1e-3, factor_row_size=8,
                 factor_sweeps=8, solve_sweeps=6)
    p1 = ParILUT(**knobs).setup(partition_ell(A, make_mesh(1)))
    p8 = ParILUT(**knobs).setup(partition_ell(A, flat_row_mesh()))
    r = np.random.default_rng(5).standard_normal(n).astype(np.float32)
    z1 = collect_vector(
        p1.precond()(distribute_vector(jnp.asarray(r), make_mesh(1))), n
    )
    z8 = collect_vector(
        p8.precond()(distribute_vector(jnp.asarray(r), flat_row_mesh())), n
    )
    np.testing.assert_allclose(z8, z1, rtol=2e-4, atol=2e-4)


def test_par_ilut_fill_and_drop_semantics():
    """fill_levels grows the factor pattern (ILU(k) envelope) and the
    dual-drop rule caps per-side row fill at factor_row_size."""
    from hypre_tpu.precond.par_ilu import ParILUT, par_extend_pattern

    from hypre_tpu.problems.laplacian import laplacian_2d_5pt

    A = laplacian_2d_5pt(16, 16)
    Ap = partition_ell(A, flat_row_mesh())
    Ax = par_extend_pattern(Ap, 1)
    nnz0 = int(np.sum(np.asarray(Ap.diag_cols) >= 0)) + int(
        np.sum(np.asarray(Ap.offd_cols) >= 0)
    )
    nnz1 = int(np.sum(np.asarray(Ax.diag_cols) >= 0)) + int(
        np.sum(np.asarray(Ax.offd_cols) >= 0)
    )
    assert nnz1 > nnz0  # fill happened
    p = ParILUT(fill_levels=1, drop_tolerance=0.0, factor_row_size=3,
                factor_sweeps=6, solve_sweeps=4).setup(Ap)
    l_fill = np.sum(
        np.concatenate(
            [np.asarray(p.L.diag_cols), np.asarray(p.L.offd_cols)], axis=1
        ) >= 0,
        axis=1,
    )
    assert l_fill.max() <= 3  # factor_row_size honored per side


def test_par_ilut_gmres_golden_vs_shared_memory():
    """Distributed PILUT-GMRES golden: iteration parity with the
    shared-memory ILUT on the same problem/knobs (hypre runs pilut through
    GMRES in the ij driver, solver id 7)."""
    import jax.numpy as jnp

    from hypre_tpu.krylov import gmres
    from hypre_tpu.precond.euclid import PILUT
    from hypre_tpu.problems.laplacian import laplacian_2d_5pt
    from hypre_tpu.parallel.par_ell import distribute_vector

    A = laplacian_2d_5pt(24, 24)
    n = A.n_rows
    b = jnp.ones(n, A.dtype)
    seq = PILUT(factor_row_size=10, drop_tolerance=1e-3).setup(A)
    _, info_seq = gmres(lambda v: A.mv(v), b, M=seq.precond(), rtol=1e-8)
    Ap = partition_ell(A, flat_row_mesh())
    par = PILUT(factor_row_size=10, drop_tolerance=1e-3).setup(Ap)
    bd = distribute_vector(b, flat_row_mesh())
    _, info_par = gmres(lambda v: par_spmv(Ap, v), bd, M=par.precond(),
                        rtol=1e-8)
    assert bool(info_par.converged) and bool(info_seq.converged)
    assert abs(int(info_par.iterations) - int(info_seq.iterations)) <= 2, (
        int(info_par.iterations), int(info_seq.iterations),
    )


def test_par_sails_power_pattern_sharded_vs_single_shard_parity():
    """Distributed ParaSails LEVEL-1 pattern (pattern of thresh(A)^2 —
    ParaSails.c / PrunedRows.c pattern-of-powers): the 8-shard build,
    whose least-squares rows need A-rows at graph distance 2 (the second
    halo layer), must produce the same preconditioner action as the same
    algorithm on a 1-shard mesh."""
    import jax.numpy as jnp

    from hypre_tpu.parallel import make_mesh
    from hypre_tpu.parallel.par_ell import collect_vector, distribute_vector
    from hypre_tpu.precond.par_sails import ParSails
    from hypre_tpu.problems.laplacian import laplacian_2d_5pt

    A = laplacian_2d_5pt(16, 16)
    n = A.n_rows
    knobs = dict(nlevels=1, thresh=0.0, pattern_cap=32)
    p1 = ParSails(**knobs).setup(partition_ell(A, make_mesh(1)))
    p8 = ParSails(**knobs).setup(partition_ell(A, flat_row_mesh()))
    r = np.random.default_rng(7).standard_normal(n).astype(np.float32)
    z1 = collect_vector(
        p1.precond()(distribute_vector(jnp.asarray(r), make_mesh(1))), n
    )
    z8 = collect_vector(
        p8.precond()(distribute_vector(jnp.asarray(r), flat_row_mesh())), n
    )
    np.testing.assert_allclose(z8, z1, rtol=2e-4, atol=2e-4)
    # the level-1 pattern must be wider than A's own pattern
    nnz_a = int(np.sum(np.asarray(p8.M.diag_cols) >= 0)) + int(
        np.sum(np.asarray(p8.M.offd_cols) >= 0)
    )
    Ap = partition_ell(A, flat_row_mesh())
    nnz0 = int(np.sum(np.asarray(Ap.diag_cols) >= 0)) + int(
        np.sum(np.asarray(Ap.offd_cols) >= 0)
    )
    assert nnz_a > nnz0


def test_par_sails_power_improves_pcg():
    """A level-1 ParaSails preconditioner must beat diagonal scaling in
    PCG iterations (the reason the pattern power exists)."""
    import jax.numpy as jnp

    from hypre_tpu.krylov import pcg
    from hypre_tpu.parallel.par_ell import (
        collect_vector, distribute_vector, par_spmv,
    )
    from hypre_tpu.precond.par_sails import ParSails
    from hypre_tpu.problems.laplacian import laplacian_2d_5pt

    mesh = flat_row_mesh()
    A = laplacian_2d_5pt(16, 16)
    n = A.n_rows
    Ap = partition_ell(A, mesh)
    ps = ParSails(nlevels=1, pattern_cap=32).setup(Ap)
    b = distribute_vector(jnp.ones(n, A.dtype), mesh)
    M = ps.precond()
    _, info_ps = pcg(lambda v: par_spmv(Ap, v), b, M=M, rtol=1e-8,
                     maxiter=300)
    dinv = 0.25  # constant-diagonal Laplacian
    _, info_ds = pcg(lambda v: par_spmv(Ap, v), b,
                     M=lambda r: dinv * r, rtol=1e-8, maxiter=300)
    assert bool(info_ps.converged)
    assert int(info_ps.iterations) < int(info_ds.iterations)
