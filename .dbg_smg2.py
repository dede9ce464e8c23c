import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from hypre_tpu.problems.struct_problems import struct_laplacian
from hypre_tpu.struct.smg import _plane_interp, _smg_coarsen
from hypre_tpu.struct.semi import semi_interp_from_matrix

A = struct_laplacian((16, 16))
P1 = semi_interp_from_matrix(A, 1)
P2 = _plane_interp(A, 1, None)
for nm in ("w_lo", "w_hi"):
    d = np.abs(np.asarray(getattr(P1, nm)) - np.asarray(getattr(P2, nm)))
    print("L0", nm, "maxdiff", d.max(), "at", np.unravel_index(d.argmax(), d.shape))
# coarse level
P, Ac, even, odd, flags = _smg_coarsen(A, 1)
print("coarse offsets:", Ac.stencil.offsets, Ac.shape)
P1c = semi_interp_from_matrix(Ac, 1)
P2c = _plane_interp(Ac, 1, None)
for nm in ("w_lo", "w_hi"):
    a1 = np.asarray(getattr(P1c, nm)); a2 = np.asarray(getattr(P2c, nm))
    d = np.abs(a1 - a2)
    i = np.unravel_index(d.argmax(), d.shape)
    print("L1", nm, "maxdiff", d.max(), "at", i, "collapsed", a1[i], "plane", a2[i])
print("L1 plane w_lo row4:", np.asarray(P2c.w_lo)[4, :8])
print("L1 coll  w_lo row4:", np.asarray(P1c.w_lo)[4, :8])
