#!/bin/bash
# Full suite in process batches. One long-lived XLA-CPU process segfaults
# deterministically after ~140 compiled test programs (compile-path crash,
# not OOM — 120 GB free at the time); fresh processes per batch sidestep
# it and bound in-process executable-cache growth on this 1-CPU host.
# Usage: ./run_tests.sh [-m "not slow"] [extra pytest args]
set -e
P="python -m pytest -q"
$P tests/test_ads.py tests/test_amg.py tests/test_amg2.py tests/test_device_setup.py "$@"
$P tests/test_drivers.py tests/test_fei.py tests/test_hypre_parity.py tests/test_ij_io.py tests/test_krylov.py tests/test_krylov2.py "$@"
$P tests/test_mgr_ams.py tests/test_misc_components.py tests/test_multihost.py tests/test_par_setup.py tests/test_parallel.py "$@"
$P tests/test_precond.py tests/test_seq.py tests/test_slabops.py "$@"
$P tests/test_sstruct.py tests/test_struct.py tests/test_struct_parallel.py tests/test_twofloat.py tests/test_unstructured.py "$@"
$P tests/test_bench_smoke.py "$@"
echo "ALL BATCHES PASSED"
