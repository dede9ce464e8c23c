"""COGMRES — communication-reducing GMRES (hypre krylov/cogmres.c).

hypre's COGMRES replaces modified Gram-Schmidt's j sequential inner products
per Arnoldi step with one or two blocked classical-Gram-Schmidt passes, so
each step costs a constant number of global reductions regardless of the
basis size. Our base GMRES already orthogonalizes that way (CGS2 = hypre's
gs_option 2/3 class); COGMRES here is the single-reduction variant
(one CGS pass, hypre gs_option 1) — fastest per step, adequate for
well-conditioned systems.
"""

from __future__ import annotations

from functools import partial

from hypre_tpu.krylov.gmres import gmres

cogmres = partial(gmres, gs_passes=1)
cogmres.__doc__ = gmres.__doc__
