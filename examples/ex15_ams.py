"""ex15 analogue (src/examples/ex15.c): edge-element curl-curl system
preconditioned with AMS (discrete gradient + coordinates)."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax.numpy as jnp

from hypre_tpu.amg.ams import AMS
from hypre_tpu.krylov import pcg
from hypre_tpu.seq.ell import ell_spmv


def main(n=12, beta=0.01):
    from test_mgr_ams import _curl_curl_2d

    A, G, coords = _curl_curl_2d(n, n, beta=beta)
    ams = AMS().setup(A, G, coords)
    b = jnp.ones(A.n_rows, A.dtype)
    x, info = pcg(lambda v: ell_spmv(A, v), b, M=ams.precond(), rtol=1e-6)
    print(f"ex15: AMS-PCG on curl-curl (beta={beta}): {int(info.iterations)} iterations")
    assert bool(info.converged) and int(info.iterations) <= 15
    return info


if __name__ == "__main__":
    main()
