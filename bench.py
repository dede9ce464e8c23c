"""Benchmark driver — prints the headline JSON line for the round harness.

Headline metric (BASELINE.json): BoomerAMG-PCG setup+solve wall time on a
3-D 7-pt Laplacian, matched per-device against hypre's TEST_bench golden:
hypre solves 256x256x128 on 4xV100 in 0.155 s setup + 0.486 s solve
(``src/test/TEST_bench/benchmark_ij.perf.saved.lassen:2-3``,
``benchmark_ij.jobs:12``), i.e. ~2.1M rows per GPU. One TPU chip here solves
128^3 = 2.097M rows — the same per-device load, same rtol=1e-6 stopping rule
(benchmark_ij.jobs -tol default).

Output protocol (mirrors runtest.sh's independent per-job outputs,
``src/test/runtest.sh:9-28``): the HEADLINE JSON line is printed to stdout
IMMEDIATELY after the headline pipeline finishes — before any auxiliary
section runs — so an aux OOM/hang/timeout can never lose the round's perf
number. Aux sections (27-pt, SpGEMM, PFMG/SMG struct) each run under an env
gate AND a wall-clock deadline (SIGALRM + remaining-budget check); if any
complete, a SECOND augmented JSON line (headline fields + aux fields) is
printed at the end. Budget: HYPRE_TPU_BENCH_BUDGET seconds (default 540)
from process start.
"""

from __future__ import annotations

import contextlib
import json
import signal
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: the tunnel's AOT compiles cost 20s-minutes
# per program; the fused setup mega-programs are compiled once per sparsity
# pattern and served from this cache on every later run (axon installs
# fingerprint-keyed sidechannel hooks that make this work remotely).
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

HYPRE_SETUP_S = 0.155  # benchmark_ij.perf.saved.lassen:2 (4xV100, 2.1M rows/GPU)
HYPRE_SOLVE_S = 0.486  # benchmark_ij.perf.saved.lassen:3

_T_START = time.monotonic()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _budget_s() -> float:
    import os

    return float(os.environ.get("HYPRE_TPU_BENCH_BUDGET", "540"))


def remaining_s() -> float:
    return _budget_s() - (time.monotonic() - _T_START)


class SectionTimeout(Exception):
    pass


@contextlib.contextmanager
def deadline_guard(name: str, min_s: float, max_s: float | None = None):
    """Skip the section if the remaining budget is under ``min_s``; else run
    it under a SIGALRM alarm so a hung dispatch or compile raises instead of
    starving later output. ``max_s`` is the section's HARD SLICE of the
    budget (round-4 verdict item 3: first-come-all-you-can-eat starved the
    BASELINE sections for three rounds) — the alarm fires at
    min(remaining, max_s). (The alarm fires between Python bytecodes — a
    blocking C call defers it until return, which still beats waiting
    forever: every jitted dispatch returns eventually or the harness's own
    timeout ends us, and the headline JSON is already out.)"""
    import os as _os

    if _os.environ.get("HYPRE_TPU_BENCH_NOSLICE", "0") == "1":
        max_s = None  # priming runs: let every section compile to the end
    rem = remaining_s()
    if rem < min_s:
        log(f"{name} SKIPPED: {rem:.0f}s budget left < {min_s:.0f}s needed")
        yield False
        return

    def on_alarm(signum, frame):
        raise SectionTimeout(f"{name}: exceeded bench budget")

    old = signal.signal(signal.SIGALRM, on_alarm)
    # REPEATING alarm: a single SIGALRM's exception can be swallowed by a
    # library except-handler mid-flight (observed: jax's compilation-cache
    # reader converted the SectionTimeout into a warning and the section
    # ran on to the harness kill); the interval re-fires every 10 s until
    # the section actually unwinds.
    slice_s = rem if max_s is None else min(rem, max_s)
    signal.setitimer(signal.ITIMER_REAL, max(slice_s, 1.0), 10.0)
    try:
        yield True
    except SectionTimeout as e:
        log(f"{name} TIMED OUT: {e}")
    except Exception as e:  # pragma: no cover - device-dependent
        log(f"{name} FAILED: {e!r}")
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0.0)
        signal.signal(signal.SIGALRM, old)


# v5e HBM bandwidth (public spec ~819 GB/s) — the STREAM roofline the
# BASELINE.json >=70% target is measured against
HBM_ROOFLINE_GBPS = 819.0


def bench_spmv(A, n_trials=3, specialize=False):
    """Honest tunnel protocol, two-length slope version: FRESH random input
    per trial (the tunnel serves identical (program, inputs) dispatches
    from a response cache), scalar readbacks closing every window
    (block_until_ready does not always await remote completion), each
    iteration's input perturbed inside the chain, and the per-SpMV time
    taken as the SLOPE between a 50- and a 250-iteration chained loop —
    this subtracts the ~20-25 ms fixed per-dispatch overhead this tunnel
    adds to programs touching large buffers, which is transport cost, not
    kernel time."""
    import numpy as np

    from hypre_tpu.seq.fastmv import optimize_operator

    dev = jax.devices()[0]
    Af = jax.device_put(optimize_operator(A, specialize=specialize), dev)

    def make_loop(n_iter):
        @jax.jit
        def loop(Af, x):
            def body(i, v):
                return Af.mv(v) * (1.0 + 1e-7)

            y = jax.lax.fori_loop(0, n_iter, body, x)
            return y, jnp.sum(y)

        return loop

    # 400-iteration spread: the tunnel adds +-5 ms of transport noise per
    # dispatch, so a 200-iteration denominator left ~50% error bars on the
    # slope (one run reported a non-physical 208% of roofline)
    n1, n2 = 50, 450
    n_trials = max(n_trials, 4)
    loops = (make_loop(n1), make_loop(n2))
    rng = np.random.default_rng(0)
    x0 = jax.device_put(
        jnp.asarray(rng.standard_normal(A.n_cols), A.dtype), dev
    )
    for l in loops:
        _, s = l(Af, x0)  # compile + warm
        float(s)

    def timed(l):
        best = float("inf")
        for _ in range(n_trials):
            xt = jax.device_put(
                jnp.asarray(rng.standard_normal(A.n_cols), A.dtype), dev
            )
            float(jnp.sum(xt))  # ensure resident before the window opens
            t0 = time.perf_counter()
            _, s = l(Af, xt)
            float(s)  # scalar readback closes the window
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(loops[1]) - timed(loops[0])) / (n2 - n1)
    itemsize = jnp.dtype(A.dtype).itemsize
    nnz = int(A.vals.size)
    bytes_moved = nnz * itemsize + (A.n_cols + A.n_rows) * itemsize
    gbps = bytes_moved / dt / 1e9
    return Af, dt, gbps, gbps / HBM_ROOFLINE_GBPS


# --- width-plan disk cache -------------------------------------------------
# The setup width protocol retries with grown/shrunk slab widths on the
# FIRST sighting of a sparsity pattern; through the tunnel every retry is a
# fresh mega-program compile (30-150 s each). Persisting the verified plan
# lets any later bench process (e.g. the harness's own run after this round
# primed the caches) issue exactly one dispatch per level, all served from
# the XLA persistent cache.

_PLAN_PATH = None


def _plan_path():
    import os

    global _PLAN_PATH
    if _PLAN_PATH is None:
        _PLAN_PATH = os.environ.get(
            "HYPRE_TPU_PLAN_CACHE", "/root/.cache/hypre_tpu_width_plans.json"
        )
    return _PLAN_PATH


def load_width_plan(key: str) -> dict:
    import os

    try:
        with open(_plan_path()) as f:
            raw = json.load(f).get(key, {})
    except (OSError, ValueError):
        return {}
    plan = {}
    for k, v in raw.items():
        lev, name = k.split("|", 1)
        plan[(int(lev), name)] = tuple(v) if isinstance(v, list) else v
    return plan


def save_width_plan(key: str, plan: dict) -> None:
    import os

    try:
        try:
            with open(_plan_path()) as f:
                allp = json.load(f)
        except (OSError, ValueError):
            allp = {}
        allp[key] = {
            f"{lev}|{name}": (list(v) if isinstance(v, tuple) else v)
            for (lev, name), v in plan.items()
        }
        os.makedirs(os.path.dirname(_plan_path()), exist_ok=True)
        with open(_plan_path(), "w") as f:
            json.dump(allp, f)
    except OSError as e:  # pragma: no cover
        log(f"width-plan save failed: {e!r}")


@jax.jit
def _probe_tree(t):
    """A scalar depending on the first element of every array leaf —
    reading it back guarantees the whole pytree finished materializing."""
    import jax.numpy as _jnp

    def acc(a, leaf):
        return a + _jnp.sum(_jnp.ravel(leaf)[:1]).astype(_jnp.float32)

    return jax.tree_util.tree_reduce(acc, t, _jnp.float32(0))


def main():
    import os
    import socket as _socket  # noqa: F811
    # Backend liveness gate: jax.devices() blocks FOREVER inside a C-level
    # retry loop when the tunnel-attached chip is unreachable (observed: a
    # giant remote compile killed the terminal; backend init then hung for
    # hours — SIGALRM cannot interrupt the blocked C call). Probe the
    # terminal's stateless port first; wait up to ~20 min for the pool to
    # recover, then emit an honest parseable line instead of a
    # harness-timeout null.
    if os.environ.get("JAX_PLATFORMS", "") == "axon":
        def _terminal_up() -> bool:
            try:
                with _socket.create_connection(("127.0.0.1", 8083),
                                               timeout=5):
                    return True
            except OSError:
                return False

        waited = 0.0
        while not _terminal_up() and waited < 1200:
            log(f"TPU terminal port closed — waiting ({waited:.0f}s)")
            time.sleep(30)
            waited += 30
        if not _terminal_up():
            print(
                json.dumps({
                    "metric": "amg_pcg_setup_plus_solve_128cube_7pt",
                    "value": None,
                    "unit": "seconds",
                    "vs_baseline": 0.0,
                    "note": ("TPU backend unreachable at bench time "
                             "(terminal port 8083 closed for 20 min) — "
                             "infra outage, not a library failure"),
                }),
                flush=True,
            )
            return
    import dataclasses
    import os as _os

    import numpy as np

    from hypre_tpu.amg.device_setup import setup_hierarchy_device
    from hypre_tpu.amg.hierarchy import (
        amg_cycle,
        make_smoother,
        optimize_hierarchy,
    )
    from hypre_tpu.krylov import pcg
    from hypre_tpu.problems.laplacian import laplacian_3d_7pt
    from hypre_tpu.seq.ell import ell_spmv

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    log(f"bench budget: {_budget_s():.0f}s")
    n = int(_os.environ.get("HYPRE_TPU_BENCH_N", "128"))  # CPU smoke: small n
    dtype = jnp.float32

    # device-side assembly (index arithmetic; par_laplace.c's host row
    # loops took ~3 s here)
    t0 = time.perf_counter()
    A = laplacian_3d_7pt(n, n, n, dtype=dtype)
    jax.block_until_ready(A.vals)
    log(f"assembly {n}^3 7pt (device): {time.perf_counter()-t0:.3f}s")

    from hypre_tpu.warmup import shape_seen as _seen

    Afast, dt, gbps, roofline_frac = bench_spmv(
        A, specialize=_seen(A, record=False)
    )
    log(
        f"SpMV (DIA path): {dt*1e3:.3f} ms, {gbps:.1f} GB/s "
        f"({100*roofline_frac:.0f}% of the {HBM_ROOFLINE_GBPS:.0f} GB/s "
        "HBM roofline)"
    )

    # Last-resort fallback: a fully COLD compile cache puts the first setup
    # warmup at 700+ s on this tunnel (measured), which can outlast the
    # harness timeout before the real headline exists. `timeout` kills with
    # SIGTERM first — catch it and emit the already-measured SpMV metric as
    # an honest partial headline (BASELINE.json names SpMV GB/s per chip as
    # a co-headline metric) so the round still records a real number.
    _printed_real_headline = [False]

    def _sigterm_fallback(signum, frame):
        if not _printed_real_headline[0]:
            print(
                json.dumps(
                    {
                        "metric": "spmv_gbps_per_chip_7pt_128cube",
                        "value": round(gbps, 1),
                        "unit": "GB/s",
                        "vs_baseline": round(roofline_frac, 3),
                        "note": (
                            "partial: killed during cold-cache AMG setup "
                            "compile; vs_baseline = fraction of the 819 "
                            "GB/s v5e HBM roofline"
                        ),
                    }
                ),
                flush=True,
            )
        raise SystemExit(124)

    signal.signal(signal.SIGTERM, _sigterm_fallback)

    # --- AMG-PCG setup, fully on-device (amg/device_setup.py: PMIS +
    # aggressive distance-2 second pass + multipass interp + slab RAP —
    # hypre's par_amg_setup.c device path). Warmup runs the identical
    # pipeline on 2*A: exact power-of-two scaling keeps every comparison
    # bit-identical (same shapes, same compiled programs, zero retries via
    # the width plan) while defeating the tunnel's response cache. ---
    # v2: plans are keyed by stencil FAMILY, not problem size — the round-4
    # shape-generic setup (bucketed rows + dynamic stencil offsets) uses the
    # same widths for every grid in a family
    plan_key = "v2-7pt"
    width_plan = load_width_plan(plan_key)
    log(f"width plan: {'disk hit' if width_plan else 'cold'} ({plan_key})")
    # two-path dispatch (round-4 verdict item 2): shapes recorded by an
    # earlier process run the SPECIALIZED (static-offset) solve programs —
    # persistent-cache hits — while first-sight shapes run the
    # shape-generic dynamic programs and are recorded for next time
    from hypre_tpu.warmup import shape_seen

    spec = shape_seen(A)
    log(f"solve-program dispatch: {'specialized' if spec else 'generic'}")

    def build(Ax):
        hier = setup_hierarchy_device(
            Ax, max_coarse_size=1500, relax="chebyshev", agg_num_levels=1,
            width_plan=width_plan, coarse_drop_tol=0.02,
            transfer_dia=True,
        )
        fast = optimize_hierarchy(hier, gather_precision=0, specialize=spec)
        # ONE scalar readback that depends on EVERY leaf closes the build:
        # on this tunnel block_until_ready does not always await remote
        # completion, and an unfinished warm build queues ahead of the
        # timed one (observed as a 12 s "timed" setup whose time was
        # really warmup-2's work)
        _ = float(_probe_tree(fast))
        return fast

    # Warmup is TWO passes: the first compiles (and retries widths when the
    # plan is cold); the second, plan-hit, restores the tunnel's loaded-
    # program working set — measured on this chip, the first post-compile
    # build pays ~10-50 s/level of program (re)loads, the next runs at true
    # dispatch speed (profile_setup.py: timed1 61 s vs timed2 1.9 s).
    t0 = time.perf_counter()
    build(dataclasses.replace(A, vals=A.vals * 2.0))  # compile + warm
    warm_s = time.perf_counter() - t0
    save_width_plan(plan_key, width_plan)
    log(f"AMG setup warmup 1 (compile+run): {warm_s:.3f}s")
    t0 = time.perf_counter()
    build(dataclasses.replace(A, vals=A.vals * 0.5))  # stabilize loads
    log(f"AMG setup warmup 2 (load-stabilize): {time.perf_counter()-t0:.3f}s")
    t0 = time.perf_counter()
    hier_fast = build(A)
    s_check = float(jnp.sum(hier_fast.coarse_inv[:1, :1]))  # readback
    setup_s = time.perf_counter() - t0
    log(f"AMG setup (device): {setup_s:.3f}s")
    log("levels: " + str(
        [lev.A.n_rows for lev in hier_fast.levels]
        + [hier_fast.coarse_inv.shape[0]]
    ))

    # --- AMG-PCG solve; hierarchy passed as a jit ARGUMENT (closure capture
    # would bake 100s of MB of constants into the XLA program) ---
    b = jnp.ones(A.n_rows, dtype)
    smoother = make_smoother("chebyshev", 1.0, 2, 0.3)

    @jax.jit
    def solve(hier, Af, b):
        M = lambda r: amg_cycle(hier, r, smoother=smoother)
        return pcg(lambda v: Af.mv(v), b, M=M, rtol=1e-6, maxiter=100)

    # measurement notes for this tunnel-attached TPU: identical repeat
    # dispatches can be served from a response cache and block_until_ready
    # does not always await remote completion — so every timed trial uses a
    # FRESH random rhs and a scalar readback closes the timing window
    rng = np.random.default_rng(int.from_bytes(_os.urandom(4), "little"))
    x, info = solve(hier_fast, Afast, b)  # compile + first run
    _ = float(jnp.sum(x))
    solve_s = float("inf")
    for _ in range(3):
        bt = jnp.asarray(rng.random(A.n_rows, np.float32))
        _ = float(jnp.sum(bt))
        t0 = time.perf_counter()
        x, info = solve(hier_fast, Afast, bt)
        _ = float(jnp.sum(x))
        solve_s = min(solve_s, time.perf_counter() - t0)
    x, info = solve(hier_fast, Afast, b)  # stats reported for b=ones
    r = b - ell_spmv(A, x)
    true_rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    log(
        f"AMG-PCG solve: {solve_s:.3f}s, {int(info.iterations)} iters, "
        f"rel_res={float(info.relative_residual):.2e}, true={true_rel:.2e}, "
        f"converged={bool(info.converged)}"
    )
    log(
        f"solve-only vs hypre: {HYPRE_SOLVE_S/solve_s:.2f}x; "
        f"setup+solve vs hypre: {(HYPRE_SETUP_S+HYPRE_SOLVE_S)/(setup_s+solve_s):.3f}x"
    )

    # =====================================================================
    # HEADLINE JSON — printed NOW, the instant setup+solve are measured,
    # before the refined tier (extra compiles) and any auxiliary section,
    # so nothing downstream can lose it (round 2's number died this way:
    # BENCH_r02 was rc=124/parsed=null behind a 73 s struct setup + an
    # un-gated 27-pt OOM; a cold compile cache can starve later stages the
    # same way). Later stages re-print the line AUGMENTED with their
    # fields; consumers take the last parseable line.
    # =====================================================================
    total = setup_s + solve_s
    hypre_total = HYPRE_SETUP_S + HYPRE_SOLVE_S
    headline = {
        "metric": "amg_pcg_setup_plus_solve_128cube_7pt",
        "value": round(total, 4),
        "unit": "seconds",
        "vs_baseline": round(hypre_total / total, 4),
        "setup_seconds": round(setup_s, 4),
        "solve_seconds": round(solve_s, 4),
        "solve_vs_baseline": round(HYPRE_SOLVE_S / solve_s, 4),
        "iterations": int(info.iterations),
        "true_rel_res": true_rel,
        "spmv_gbps": round(gbps, 1),
        "spmv_roofline_frac": round(roofline_frac, 3),
    }
    print(json.dumps(headline), flush=True)
    _printed_real_headline[0] = True

    aux: dict = {}

    # Section order & hard slices (round-4 verdict item 3): BASELINE-
    # named metrics first (27-pt, struct PFMG/SMG, SpGEMM, 9-pt), then
    # shape-robustness and the refined tier. Each section runs under
    # max_s so no section can starve the ones after it.
    # --- BASELINE.json's named metric: 27-pt 3-D Laplacian at the same
    # per-device load (hypre: 0.237 s setup + 0.197 s solve, interp 6,
    # benchmark_ij.perf.saved.lassen:14-15) ---
    H27_SETUP, H27_SOLVE = 0.237, 0.197
    if _os.environ.get("HYPRE_TPU_BENCH_27PT", "1") != "0":
      with deadline_guard("27-pt section", min_s=60, max_s=120) as go:
        if go:
            from hypre_tpu.problems.laplacian import laplacian_3d_27pt
            from hypre_tpu.seq.fastmv import optimize_operator

            A27 = laplacian_3d_27pt(n, n, n, dtype=dtype)
            jax.block_until_ready(A27.vals)
            spec27 = shape_seen(A27)
            plan27 = "v2-27pt"
            wp27 = load_width_plan(plan27)

            def build27(Ax):
                hier = setup_hierarchy_device(
                    Ax, max_coarse_size=1500, relax="chebyshev",
                    agg_num_levels=1, width_plan=wp27, coarse_drop_tol=0.02,
                    transfer_dia=True,
                )
                fast = optimize_hierarchy(hier, gather_precision=0,
                                          specialize=spec27)
                _ = float(_probe_tree(fast))  # close the build (see build())
                return fast

            build27(dataclasses.replace(A27, vals=A27.vals * 2.0))
            save_width_plan(plan27, wp27)
            build27(dataclasses.replace(A27, vals=A27.vals * 0.5))
            t0 = time.perf_counter()
            hier27 = build27(A27)
            _ = float(jnp.sum(hier27.coarse_inv[:1, :1]))
            setup27_s = time.perf_counter() - t0
            A27f = jax.device_put(optimize_operator(A27, specialize=spec27),
                                  jax.devices()[0])
            b27 = jnp.ones(A27.n_rows, dtype)
            x, info27 = solve(hier27, A27f, b27)
            _ = float(jnp.sum(x))
            solve27_s = float("inf")
            for _ in range(3):
                bt = jnp.asarray(rng.random(A27.n_rows, np.float32))
                _ = float(jnp.sum(bt))
                t0 = time.perf_counter()
                x, info27 = solve(hier27, A27f, bt)
                _ = float(jnp.sum(x))
                solve27_s = min(solve27_s, time.perf_counter() - t0)
            x, info27 = solve(hier27, A27f, b27)
            r27 = b27 - ell_spmv(A27, x)
            true27 = float(jnp.linalg.norm(r27) / jnp.linalg.norm(b27))
            log(
                f"27-pt: setup {setup27_s:.3f}s solve {solve27_s:.3f}s "
                f"({int(info27.iterations)} iters, true={true27:.2e}); vs "
                f"hypre setup+solve "
                f"{(H27_SETUP+H27_SOLVE)/(setup27_s+solve27_s):.3f}x, "
                f"solve {H27_SOLVE/solve27_s:.2f}x"
            )
            aux.update(
                p27_setup_seconds=round(setup27_s, 4),
                p27_solve_seconds=round(solve27_s, 4),
                p27_iterations=int(info27.iterations),
                p27_true_rel_res=true27,
                p27_vs_baseline=round(
                    (H27_SETUP + H27_SOLVE) / (setup27_s + solve27_s), 4
                ),
            )

    # --- struct path: PFMG-PCG + SMG-PCG on a 2-D 2048^2 Laplacian (hypre
    # struct driver solver 11: 0.0123 s setup + 0.138 s solve; solver 10:
    # 0.121 / 0.577 s — benchmark_struct.perf.saved.lassen:2-3,14-15). One
    # V100's share of the np=4 2048^2 run is 1M points; one chip here takes
    # the full 2048^2 = 4x that load. ---
    if _os.environ.get("HYPRE_TPU_BENCH_STRUCT", "1") != "0":
      with deadline_guard("struct PFMG section", min_s=30, max_s=60) as go:
        if go:
            from hypre_tpu.krylov import pcg as _pcg
            from hypre_tpu.problems.struct_problems import struct_laplacian
            from hypre_tpu.struct import PFMG
            from hypre_tpu.struct.matrix import struct_matvec

            ns = min(2048, 16 * n)
            As = struct_laplacian((ns, ns), dtype=dtype)

            def build_pf(Ax):
                pf = PFMG().setup(Ax)
                _ = float(_probe_tree(pf.hierarchy))  # close the build
                return pf

            build_pf(
                dataclasses.replace(As, coeffs=As.coeffs * 2.0)
            )  # compile/warm the probe programs on identical shapes
            build_pf(dataclasses.replace(As, coeffs=As.coeffs * 0.5))
            t0 = time.perf_counter()
            pf = build_pf(As)
            _ = float(jnp.sum(pf.hierarchy.coarse_inv[:1, :1]))
            pf_setup_s = time.perf_counter() - t0

            bs = jnp.ones((ns, ns), dtype)
            Ms = pf.precond()

            @jax.jit
            def struct_solve(b):
                A0 = pf.hierarchy.levels[0].A
                return _pcg(
                    lambda v: struct_matvec(A0, v.reshape(ns, ns)).reshape(-1),
                    b.reshape(-1),
                    M=lambda r: Ms(r.reshape(ns, ns)).reshape(-1),
                    rtol=1e-6,
                    maxiter=100,
                )

            xs, sinfo = struct_solve(bs)
            _ = float(jnp.sum(xs))
            pf_solve_s = float("inf")
            for _ in range(3):
                bt = jnp.asarray(rng.random(ns * ns, np.float32)).reshape(ns, ns)
                _ = float(jnp.sum(bt))
                t0 = time.perf_counter()
                xs, sinfo = struct_solve(bt)
                _ = float(jnp.sum(xs))
                pf_solve_s = min(pf_solve_s, time.perf_counter() - t0)
            HS_SETUP, HS_SOLVE = 0.0123, 0.138
            log(
                f"PFMG-PCG 2-D {ns}^2: setup {pf_setup_s:.3f}s solve "
                f"{pf_solve_s:.3f}s ({int(sinfo.iterations)} iters); vs hypre "
                f"setup+solve {(HS_SETUP+HS_SOLVE)/(pf_setup_s+pf_solve_s):.3f}x "
                f"(hypre per-GPU load is 1/4 of this grid)"
            )
            aux.update(
                pfmg_setup_seconds=round(pf_setup_s, 4),
                pfmg_solve_seconds=round(pf_solve_s, 4),
                pfmg_iterations=int(sinfo.iterations),
                pfmg_vs_baseline=round(
                    (HS_SETUP + HS_SOLVE) / (pf_setup_s + pf_solve_s), 4
                ),
            )

      with deadline_guard("struct SMG section", min_s=30, max_s=75) as go:
        if go:
            from hypre_tpu.krylov import pcg as _pcg
            from hypre_tpu.problems.struct_problems import struct_laplacian
            from hypre_tpu.struct import SMG
            from hypre_tpu.struct.matrix import struct_matvec

            ns = min(2048, 16 * n)
            As = struct_laplacian((ns, ns), dtype=dtype)

            def build_smg(Ax):
                sm = SMG().setup(Ax)
                _ = float(_probe_tree(sm.hierarchy))  # close the build
                return sm

            build_smg(dataclasses.replace(As, coeffs=As.coeffs * 2.0))
            build_smg(dataclasses.replace(As, coeffs=As.coeffs * 0.5))
            t0 = time.perf_counter()
            smg = build_smg(As)
            _ = float(jnp.sum(smg.hierarchy.coarse_inv[:1, :1]))
            smg_setup_s = time.perf_counter() - t0
            Msm = smg.precond()
            bs = jnp.ones((ns, ns), dtype)

            @jax.jit
            def smg_solve(b):
                A0 = smg.hierarchy.levels[0].A
                return _pcg(
                    lambda v: struct_matvec(A0, v.reshape(ns, ns)).reshape(-1),
                    b.reshape(-1),
                    M=lambda r: Msm(r.reshape(ns, ns)).reshape(-1),
                    rtol=1e-6,
                    maxiter=100,
                )

            xs, minfo = smg_solve(bs)
            _ = float(jnp.sum(xs))
            smg_solve_s = float("inf")
            for _ in range(3):
                bt = jnp.asarray(rng.random(ns * ns, np.float32)).reshape(ns, ns)
                _ = float(jnp.sum(bt))
                t0 = time.perf_counter()
                xs, minfo = smg_solve(bt)
                _ = float(jnp.sum(xs))
                smg_solve_s = min(smg_solve_s, time.perf_counter() - t0)
            HG_SETUP, HG_SOLVE = 0.121, 0.577
            log(
                f"SMG-PCG 2-D {ns}^2: setup {smg_setup_s:.3f}s solve "
                f"{smg_solve_s:.3f}s ({int(minfo.iterations)} iters); vs hypre "
                f"setup+solve {(HG_SETUP+HG_SOLVE)/(smg_setup_s+smg_solve_s):.3f}x"
            )
            aux.update(
                smg_setup_seconds=round(smg_setup_s, 4),
                smg_solve_seconds=round(smg_solve_s, 4),
                smg_iterations=int(minfo.iterations),
                smg_vs_baseline=round(
                    (HG_SETUP + HG_SOLVE) / (smg_setup_s + smg_solve_s), 4
                ),
            )

    # --- SpGEMM (TEST_bench/benchmark_spgemm: hypre V100 A*A times
    # 0.0065-0.123 s on the 7-pt 128^3 and 0.078-0.654 s on the 27-pt) ---
    if _os.environ.get("HYPRE_TPU_BENCH_SPGEMM", "1") != "0":
      with deadline_guard("SpGEMM section", min_s=25, max_s=50) as go:
        if go:
            from hypre_tpu.drivers import ij_mm

            with contextlib.redirect_stdout(sys.stderr):  # stdout = JSON only
                spgemm7 = ij_mm.run(f"-n {n} {n} {n} -7pt -job 1 -rep 5".split())
                spgemm27 = ij_mm.run(
                    f"-n {n} {n} {n} -27pt -job 1 -rep 3".split()
                )
            log(
                f"SpGEMM A*A: 7pt {spgemm7:.4f}s (hypre 0.0065-0.123), "
                f"27pt {spgemm27:.4f}s (hypre 0.078-0.654)"
            )
            aux.update(
                spgemm_7pt_seconds=round(spgemm7, 5),
                spgemm_27pt_seconds=round(spgemm27, 5),
            )

    # --- 2-D 9-pt 4096^2 BASELINE row (benchmark_ij.perf.saved.lassen:8-9:
    # 0.176 s setup + 1.019 s solve on 4xV100 = 4.19M rows/GPU; one chip
    # here takes 2048^2 = 4.19M rows, the same per-device load) ---
    H9_SETUP, H9_SOLVE = 0.176, 1.019
    if _os.environ.get("HYPRE_TPU_BENCH_9PT", "1") != "0":
      with deadline_guard("2-D 9-pt section", min_s=40, max_s=90) as go:
        if go:
            from hypre_tpu.problems.laplacian import laplacian_2d_9pt
            from hypre_tpu.seq.fastmv import optimize_operator

            n9 = 16 * n  # 2048 for the n=128 headline
            A9 = laplacian_2d_9pt(n9, n9, dtype=dtype)
            jax.block_until_ready(A9.vals)
            spec9 = shape_seen(A9)
            plan9 = load_width_plan("v2-9pt")

            def build9(Ax):
                hier = setup_hierarchy_device(
                    Ax, max_coarse_size=1500, relax="chebyshev",
                    agg_num_levels=1, width_plan=plan9,
                    coarse_drop_tol=0.02, transfer_dia=True,
                )
                fast = optimize_hierarchy(hier, gather_precision=0,
                                          specialize=spec9)
                _ = float(_probe_tree(fast))
                return fast

            build9(dataclasses.replace(A9, vals=A9.vals * 2.0))
            save_width_plan("v2-9pt", plan9)
            build9(dataclasses.replace(A9, vals=A9.vals * 0.5))
            t0 = time.perf_counter()
            h9 = build9(A9)
            _ = float(jnp.sum(h9.coarse_inv[:1, :1]))
            setup9_s = time.perf_counter() - t0
            A9f = jax.device_put(optimize_operator(A9, specialize=spec9),
                                 jax.devices()[0])
            b9 = jnp.ones(A9.n_rows, dtype)
            x9, i9 = solve(h9, A9f, b9)
            _ = float(jnp.sum(x9))
            solve9_s = float("inf")
            for _ in range(3):
                bt = jnp.asarray(rng.random(A9.n_rows, np.float32))
                _ = float(jnp.sum(bt))
                t0 = time.perf_counter()
                x9, i9 = solve(h9, A9f, bt)
                _ = float(jnp.sum(x9))
                solve9_s = min(solve9_s, time.perf_counter() - t0)
            log(
                f"2-D 9-pt {n9}^2: setup {setup9_s:.3f}s solve "
                f"{solve9_s:.3f}s ({int(i9.iterations)} iters); vs hypre "
                f"setup+solve {(H9_SETUP+H9_SOLVE)/(setup9_s+solve9_s):.3f}x"
            )
            aux.update(
                p9_setup_seconds=round(setup9_s, 4),
                p9_solve_seconds=round(solve9_s, 4),
                p9_iterations=int(i9.iterations),
                p9_vs_baseline=round(
                    (H9_SETUP + H9_SOLVE) / (setup9_s + solve9_s), 4
                ),
            )
            print(json.dumps({**headline, **aux}), flush=True)

    # --- shape robustness (round-4 verdict item 1): a NEVER-BEFORE-SEEN
    # grid size must set up without paying an AOT recompile of the
    # program suite. The bucketed-row + dynamic-offset setup keys every
    # program on buckets, so 96^3 (bucket 2^20) after the 128^3 headline
    # reuses the cached suite (coarse-level programs are shared outright;
    # fine-level programs come from the persistent cache primed by
    # hypre_tpu.warmup). hypre's cold-binary setup is 0.155 s; the
    # round-3 judge measured OUR cold 64^3 at 1009.9 s. Targets:
    # <= 60 s cold-in-process, <= 1 s warm. ---
    if _os.environ.get("HYPRE_TPU_BENCH_SHAPE", "1") != "0":
      with deadline_guard("shape-robust 96^3 section", min_s=40, max_s=100) as go:
        if go:
            from hypre_tpu.seq.fastmv import optimize_operator

            n96 = 3 * n // 4
            A96 = laplacian_3d_7pt(n96, n96, n96, dtype=dtype)
            jax.block_until_ready(A96.vals)
            spec96 = shape_seen(A96)

            def build96(Ax):
                hier = setup_hierarchy_device(
                    Ax, max_coarse_size=1500, relax="chebyshev",
                    agg_num_levels=1, width_plan=width_plan,
                    coarse_drop_tol=0.02, transfer_dia=True,
                )
                fast = optimize_hierarchy(hier, gather_precision=0,
                                          specialize=spec96)
                _ = float(_probe_tree(fast))
                return fast

            t0 = time.perf_counter()
            h96 = build96(A96)
            cold96_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            h96 = build96(dataclasses.replace(A96, vals=A96.vals * 0.5))
            warm96_s = time.perf_counter() - t0
            log(
                f"shape-robust {n96}^3: first-sight setup {cold96_s:.3f}s, "
                f"warm {warm96_s:.3f}s (hypre from cold binary: 0.155 s; "
                f"round-3 judge measured 1009.9 s at 64^3)"
            )
            # drive one solve so the number is for a USABLE hierarchy
            A96f = jax.device_put(optimize_operator(A96, specialize=spec96),
                                  jax.devices()[0])
            b96 = jnp.ones(A96.n_rows, dtype)
            x96, i96 = solve(h96, A96f, b96)
            _ = float(jnp.sum(x96))
            aux.update(
                shape96_cold_setup_seconds=round(cold96_s, 3),
                shape96_warm_setup_seconds=round(warm96_s, 3),
                shape96_solve_iters=int(i96.iterations),
            )
            print(json.dumps({**headline, **aux}), flush=True)

    # higher-accuracy tier: device-resident refinement with error-free-
    # transform residuals (seq/twofloat.py) — pure f32 chip arithmetic
    # reproducing hypre's f64 1e-8-class golden residuals
    # (TEST_ij/solvers.saved). Compare against hypre's 0.486 s f64 solve.
    from hypre_tpu.refine import make_device_refiner

    def make_inner(rtol_p, maxiter_p):
        def inner(Af, hier, r):
            M = lambda rr: amg_cycle(hier, rr, smoother=smoother)
            return pcg(lambda v: Af.mv(v), r, M=M, rtol=rtol_p,
                       maxiter=maxiter_p)

        return inner

    # tolerance schedule: two heavy-reduction passes + a polish — each pass
    # multiplies the TRUE residual by its contraction since the two-float
    # residual evaluation never floors at f32 rounding
    with deadline_guard("refined tier", min_s=25, max_s=60) as go:
      if go:
        refined = make_device_refiner(
            [make_inner(1e-4, 30), make_inner(1e-4, 20), make_inner(1e-2, 10)],
            residual_2f=True,
        )
        xh, xl, _ = refined(Afast, hier_fast, b)
        _ = float(jnp.sum(xh))
        refined_s = float("inf")
        for _ in range(3):
            bt = jnp.asarray(rng.random(A.n_rows, np.float32))
            _ = float(jnp.sum(bt))
            t0 = time.perf_counter()
            xh2, xl2, _ = refined(Afast, hier_fast, bt)
            _ = float(jnp.sum(xh2))
            refined_s = min(refined_s, time.perf_counter() - t0)
        xh, xl, _ = refined(Afast, hier_fast, b)
        x64 = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
        from hypre_tpu import native as _nat
        from hypre_tpu.amg.hierarchy import _ell_to_csr_arrays as _e2c

        _n, _Ap, _Aj, _Ax = _e2c(A)
        rres = np.ones(_n) - _nat.matvec(_n, _Ap, _Aj, _Ax, x64)
        rel_ref = float(np.linalg.norm(rres) / np.sqrt(_n))
        log(
            f"two-float refined solve: {refined_s:.3f}s, true rel "
            f"{rel_ref:.2e} — {HYPRE_SOLVE_S/refined_s:.2f}x hypre solve"
        )
        headline["refined_solve_seconds"] = round(refined_s, 4)
        headline["refined_true_rel_res"] = rel_ref
        print(json.dumps(headline), flush=True)  # augmented re-print
    if aux:
        # augmented line: a strict superset of the headline, so a harness
        # reading either the first or the last JSON line gets all headline
        # fields
        print(json.dumps({**headline, **aux}), flush=True)
    log(f"bench done in {time.monotonic()-_T_START:.0f}s "
        f"({remaining_s():.0f}s budget left)")


if __name__ == "__main__":
    main()
