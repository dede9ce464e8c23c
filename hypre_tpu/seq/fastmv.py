"""BandedEll — windowed-gather SpMV Pallas kernel for scattered matrices.

AMG coarse operators don't decompose into diagonals (PMIS renumbering
scatters the column offsets — ``seq/dia.py``), but they stay *banded*: a
block of 1024 consecutive rows touches a bounded window of x (measured <=7k
entries on 48^3-Laplacian hierarchies). The kernel exploits that:

per row-block i (grid dimension):
  1. DMA the x-window x[start_i : start_i + W] HBM->VMEM (start prefetched
     via PrefetchScalarGridSpec, 1024-aligned for the HBM tiling);
  2. gather each slot's x values from the VMEM window. Mosaic has no
     arbitrary-gather primitive, so the gather is factored through the MXU:
     one-hot(row-of-128) matmul selects the window row, an iota mask selects
     the lane — (128, W/128) @ (W/128, B) per slot, all systolic-array work;
  3. fused multiply-accumulate with the slot's values.

Measured ~14x over XLA's scalar-unit gather on coarse-level shapes; the
fine stencil level uses the 324x DIA path instead. Together they replace
hypre's cuSPARSE/warp-per-row device SpMV (``seq_mv/csr_spmv_device.c``).

f32-only (TPU Pallas has no f64); x64 runs fall back to the ELL gather.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.seq.ell import EllMatrix, ell_spmv

ALIGN = 1024  # HBM 1-D tiling: dynamic-slice starts must be multiples


def _wbucket(w: int) -> int:
    """Window-size bucket ({1, 1.5} x 2^k, ALIGN multiples only — the
    kernel reshapes the window to (W/128, 128) and Mosaic needs W/128 a
    multiple of 8 sublanes, i.e. W a multiple of 1024): the program keys
    on W, and per-problem exact windows would recompile the whole solve
    program for every new grid (round-4 shape robustness)."""
    b = ALIGN
    while b < w:
        half = 3 * b // 2
        if half >= w and half % ALIGN == 0:
            return half
        b *= 2
    return b


def _xpad_bucket(m: int) -> int:
    """Padded-x length bucket (same ladder, ALIGN multiples)."""
    return _wbucket(m)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BandedEll:
    """ELL matrix + per-block window schedule for the Pallas kernel.

    ell: the original matrix (structural queries, CPU fallback, transpose).
    vals_t/lcols_t: (k, n_pad) slot-major copies; lcols are window-relative.
    starts: (n_pad/B,) aligned window starts into the padded x.
    """

    ell: "EllMatrix | None"  # None once dropped for transfer thrift
    vals_t: jax.Array
    lcols_t: jax.Array
    starts: jax.Array
    W: int = dataclasses.field(metadata=dict(static=True))
    B: int = dataclasses.field(metadata=dict(static=True))
    n_xpad: int = dataclasses.field(metadata=dict(static=True))
    # gather-matmul precision: 0 = single-pass bf16 (fast; rounds x to
    # ~1e-3 relative — NONLINEAR rounding, only safe inside flexible
    # methods), 1 = hi/lo bf16 two-pass split (default; error ~1e-6,
    # below the f32 solve floor), 2 = Precision.HIGHEST (f32-exact, ~10x
    # slower — parity/debug runs)
    exact: int = dataclasses.field(default=1, metadata=dict(static=True))

    n_rows_s: int = dataclasses.field(default=0, metadata=dict(static=True))
    n_cols_s: int = dataclasses.field(default=0, metadata=dict(static=True))

    # -- operator protocol -----------------------------------------------------
    @property
    def n_rows(self) -> int:
        return self.n_rows_s

    @property
    def n_cols(self) -> int:
        return self.n_cols_s

    @property
    def shape(self):
        return (self.n_rows_s, self.n_cols_s)

    @property
    def dtype(self):
        return self.vals_t.dtype

    @property
    def vec_len_rows(self) -> int:
        return self.n_rows_s

    @property
    def vec_len_cols(self) -> int:
        return self.n_cols_s

    def drop_ell(self) -> "BandedEll":
        """Shed the duplicate ELL payload (halves device-transfer bytes);
        fallback paths (f64, multivector) become unavailable."""
        return dataclasses.replace(self, ell=None)

    def _need_ell(self):
        if self.ell is None:
            raise ValueError(
                "this BandedEll dropped its ELL payload (drop_ell); the "
                "requested operation needs the generic representation"
            )
        return self.ell

    def diagonal(self):
        return self._need_ell().diagonal()

    def row_sums(self):
        return self._need_ell().row_sums()

    def abs_row_sums(self):
        return self._need_ell().abs_row_sums()

    def mv(self, x: jax.Array) -> jax.Array:
        return banded_spmv(self, x)

    def mv_t(self, x: jax.Array) -> jax.Array:
        return banded_spmv_t(self, x)


def _split_dot(a, b, exact: int):
    """a @ b with selectable accuracy (see BandedEll.exact)."""
    if exact >= 2:
        return jnp.dot(
            a, b, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if exact == 1:
        ahi = a.astype(jnp.bfloat16)
        alo = (a - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
        bb = b.astype(jnp.bfloat16)
        return jnp.dot(ahi, bb, preferred_element_type=jnp.float32) + jnp.dot(
            alo, bb, preferred_element_type=jnp.float32
        )
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _spmv_kernel(k: int, W: int, B: int, exact: int, start_ref, x_hbm,
                 v_ref, c_ref, y_ref, xw, sem):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    st = pl.multiple_of(start_ref[i], ALIGN)
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(st, W)], xw, sem)
    cp.start()
    cp.wait()
    WR = W // 128
    xw2 = xw[:].reshape(WR, 128).T  # (128, WR) lane-major window

    def slot(s, acc):
        idx = c_ref[pl.ds(s, 1), :]  # (1, B)
        rowi = idx // 128
        lane = idx % 128
        ohT = (jax.lax.broadcasted_iota(jnp.int32, (WR, B), 0) == rowi).astype(
            jnp.float32
        )
        rowselT = _split_dot(xw2, ohT, exact)  # (128, B)
        lmaskT = jax.lax.broadcasted_iota(jnp.int32, (128, B), 0) == lane
        g = jnp.sum(jnp.where(lmaskT, rowselT, 0.0), axis=0, keepdims=True)
        return acc + v_ref[pl.ds(s, 1), :] * g

    acc = jax.lax.fori_loop(0, k, slot, jnp.zeros((1, B), jnp.float32))
    y_ref[:] = acc.reshape(B)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _banded_call(k, W, B, n_pad, n_xpad, exact, starts, xpad, vals_t, lcols_t):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, B), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, B), lambda i, s: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B,), lambda i, s: (i,), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((W,), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    f = pl.pallas_call(
        functools.partial(_spmv_kernel, k, W, B, exact),
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.float32),
        grid_spec=grid_spec,
    )
    return f(starts, xpad, vals_t, lcols_t)


def _spmv_t_kernel(k: int, W: int, B: int, exact: int, start_ref, y0_hbm,
                   v_ref, c_ref, r_ref, y_ref, tmp, sem):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    st = pl.multiple_of(start_ref[i], ALIGN)
    WR = W // 128
    rrow = r_ref[:].reshape(1, B)

    def slot(s, acc2):
        idx = c_ref[pl.ds(s, 1), :]  # (1, B)
        rowi = idx // 128
        lane = idx % 128
        contrib = v_ref[pl.ds(s, 1), :] * rrow  # (1, B)
        ohRows = (jax.lax.broadcasted_iota(jnp.int32, (WR, B), 0) == rowi).astype(
            jnp.float32
        )
        ohLane = (
            jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1) == lane.reshape(B, 1)
        ).astype(jnp.float32)
        return acc2 + _split_dot(ohRows * contrib, ohLane, exact)

    acc2 = jax.lax.fori_loop(0, k, slot, jnp.zeros((WR, 128), jnp.float32))
    # sequential read-modify-write accumulation into the aliased output
    # (the TPU grid runs serially on the core, so overlapping windows of
    # consecutive blocks are safe)
    cin = pltpu.make_async_copy(y_ref.at[pl.ds(st, W)], tmp, sem)
    cin.start()
    cin.wait()
    tmp[:] = tmp[:] + acc2.reshape(W)
    cout = pltpu.make_async_copy(tmp, y_ref.at[pl.ds(st, W)], sem)
    cout.start()
    cout.wait()


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _banded_t_call(k, W, B, n_pad, n_xpad, exact, starts, vals_t, lcols_t, rpad):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # y0 (aliased to output)
            pl.BlockSpec((k, B), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, B), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B,), lambda i, s: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((W,), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    f = pl.pallas_call(
        functools.partial(_spmv_t_kernel, k, W, B, exact),
        out_shape=jax.ShapeDtypeStruct((n_xpad,), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},  # y0 buffer becomes the output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    y0 = jnp.zeros((n_xpad,), jnp.float32)
    return f(starts, y0, vals_t, lcols_t, rpad)


def banded_spmv_t(A: BandedEll, r: jax.Array) -> jax.Array:
    """y = A.T @ r via per-block local scatter (one-hot matmuls) and
    sequential window accumulation — the restriction kernel. Reuses A's
    forward window schedule: A's columns ARE the transpose's rows."""
    if (
        r.dtype != jnp.float32
        or r.ndim != 1
        or jax.default_backend() != "tpu"
    ):
        return ell_spmv_t_fallback(A._need_ell(), r)
    k, n_pad = A.vals_t.shape
    rpad = jnp.pad(r, (0, n_pad - r.shape[0]))
    y = _banded_t_call(k, A.W, A.B, n_pad, A.n_xpad, A.exact, A.starts,
                       A.vals_t, A.lcols_t, rpad)
    return y[: A.n_cols]


def ell_spmv_t_fallback(ell, r):
    from hypre_tpu.seq.ell import ell_spmv_t

    return ell_spmv_t(ell, r)


def banded_spmv(A: BandedEll, x: jax.Array) -> jax.Array:
    if (
        x.dtype != jnp.float32
        or x.ndim != 1
        or jax.default_backend() != "tpu"
    ):
        return ell_spmv(A._need_ell(), x)  # generic fallback (f64/CPU)
    k, n_pad = A.vals_t.shape
    xpad = jnp.pad(x, (0, A.n_xpad - x.shape[0]))
    y = _banded_call(k, A.W, A.B, n_pad, A.n_xpad, A.exact, A.starts, xpad,
                     A.vals_t, A.lcols_t)
    return y[: A.n_rows]


def banded_from_sched(A: EllMatrix, vals_t, lcols_t, lo_d, wmax: int,
                      lomax: int, exact: int = 1,
                      max_window: int = 131072) -> "BandedEll | None":
    """BandedEll from a PRE-DISPATCHED ``_banded_sched_payload`` result
    whose schedule scalars were pulled by the caller — lets
    optimize_hierarchy batch every level's scalar pull into one transfer
    (each pull costs ~30 ms of tunnel RTT)."""
    W = _wbucket(wmax)
    if W > max_window:
        return None
    return BandedEll(
        ell=A, vals_t=vals_t, lcols_t=lcols_t, starts=lo_d, W=W, B=1024,
        n_xpad=_xpad_bucket(max(lomax + W, A.n_cols)), exact=exact,
        n_rows_s=A.n_rows, n_cols_s=A.n_cols,
    )


def try_banded(
    A: EllMatrix,
    block: int | None = None,
    max_window: int = 131072,
    exact: int = 1,
) -> BandedEll | None:
    """Build the window schedule, or None if every candidate block size
    leaves some window above ``max_window`` (matrix not banded enough).

    The one-hot gather costs n*k*W(B)*2 flops. The analysis and the
    slot-major payload construction run device-side (jnp): only the
    per-block min/max vectors — n/B elements — come back to host to pick
    W and the aligned starts (the full cols slab would cost seconds at
    this tunnel's 25-900 MB/s transfer rate).
    """
    if A.dtype != np.dtype(np.float32):
        return None
    n, k = A.cols.shape
    # XLA's 1-D layout tiling forces output blocks of >=1024 elements, so
    # B is fixed; wide-ratio operators just get wider windows (the scatter
    # formulation for restrictions is the planned upgrade)
    B = block or 1024
    n_pad = -(-n // B) * B
    # ONE dispatch + ONE tiny pull: the schedule (per-block aligned starts)
    # and the slot-major payload come out of a single fused program, and
    # only a 2-scalar vector returns to host (this tunnel charges ~25 ms
    # per dispatch AND per pull — the original minmax-pull-payload protocol
    # cost ~130 ms per operator, 5x this one)
    vals_t, lcols_t, lo_d, sc = _banded_sched_payload(A.vals, A.cols, B, n_pad)
    wmax, lomax = (int(v) for v in np.asarray(sc))
    W = _wbucket(wmax)
    if W > max_window:
        return None
    n_xpad = _xpad_bucket(max(lomax + W, A.n_cols))
    return BandedEll(
        ell=A,
        vals_t=vals_t,
        lcols_t=lcols_t,
        starts=lo_d,
        W=W,
        B=B,
        n_xpad=n_xpad,
        exact=exact,
        n_rows_s=A.n_rows,
        n_cols_s=A.n_cols,
    )


def _sched_impl(cols, B, n_pad):
    """Per-block aligned window starts + [max window span, max start]
    scalars — all device-side (shared by the jit below and the fused
    transfer-dia builder)."""
    valid = cols >= 0
    big = jnp.int32(np.iinfo(np.int32).max)
    blk_min = jnp.min(jnp.where(valid, cols, big).reshape(n_pad // B, -1), axis=1)
    blk_max = jnp.max(jnp.where(valid, cols, -1).reshape(n_pad // B, -1), axis=1)
    empty = blk_max < 0
    blk_min = jnp.where(empty, 0, blk_min)
    blk_max = jnp.where(empty, 0, blk_max)
    lo = ((blk_min // ALIGN) * ALIGN).astype(jnp.int32)
    sc = jnp.stack([jnp.max(blk_max - lo + 1), jnp.max(lo)])
    return lo, sc


def _payload_impl(vals, cols, lo, B):
    valid = cols >= 0
    lcols = jnp.where(
        valid, cols - jnp.repeat(lo, B)[:, None], 0
    ).astype(jnp.int32)
    return vals.T, lcols.T


@functools.partial(jax.jit, static_argnums=(2, 3))
def _banded_sched_payload(vals, cols, B, n_pad):
    n, k = cols.shape
    if n_pad != n:
        cols = jnp.concatenate([cols, jnp.full((n_pad - n, k), -1, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((n_pad - n, k), vals.dtype)])
    lo, sc = _sched_impl(cols, B, n_pad)
    vals_t, lcols_t = _payload_impl(vals, cols, lo, B)
    return vals_t, lcols_t, lo, sc


@functools.partial(jax.jit, static_argnums=(2, 3))
def _banded_minmax(vals, cols, B, n_pad):
    n, k = cols.shape
    if n_pad != n:
        cols = jnp.concatenate([cols, jnp.full((n_pad - n, k), -1, jnp.int32)])
    valid = cols >= 0
    big = jnp.int32(np.iinfo(np.int32).max)
    return (
        jnp.min(jnp.where(valid, cols, big).reshape(n_pad // B, -1), axis=1),
        jnp.max(jnp.where(valid, cols, -1).reshape(n_pad // B, -1), axis=1),
    )


@functools.partial(jax.jit, static_argnums=(3, 4))
def _banded_payload(vals, cols, lo_d, B, n_pad):
    """Slot-major window-relative payload, one fused dispatch (op-by-op
    construction paid the tunnel's per-dispatch overhead ~10x per
    operator)."""
    n, k = cols.shape
    if n_pad != n:
        cols = jnp.concatenate([cols, jnp.full((n_pad - n, k), -1, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((n_pad - n, k), vals.dtype)])
    valid = cols >= 0
    # padded slots point at window slot 0; their values are 0, so the
    # gathered garbage contributes nothing
    lcols = jnp.where(
        valid, cols - jnp.repeat(lo_d, B)[:, None], 0
    ).astype(jnp.int32)
    return vals.T, lcols.T


# below this many gathered elements the XLA take-gather costs < ~2 ms and
# is EXACT — the bf16 one-hot kernel would only add rounding (which wrecks
# deeply composed preconditioners like ADS/AME) and compile time
MIN_BANDED_ELEMENTS = 262144


def optimize_operator(
    A: EllMatrix, prefer_pallas: bool | None = None, exact: int = 1,
    dia_detect: str = "auto", specialize: bool = False,
):
    """Pick the fastest SpMV representation for this matrix on this backend
    (the role of hypre's SetSpGemmUseVendor/exec-policy knobs, collapsed
    into one analysis). exact<2 allows bf16 gather rounding — fine for
    V-cycle internals on large operators, skipped below the size floor.

    dia_detect: 'auto' probes for diagonal structure even without a shifts
    annotation (pulls the index slab to host — seconds through this
    tunnel); 'shifts' trusts only the annotation (what optimize_hierarchy
    uses: AMG coarse operators are never DIA, so the probe is pure cost).
    """
    from hypre_tpu.seq.dia import try_dia

    if dia_detect == "shifts" and A.shifts is None:
        dia = None
    else:
        dia = try_dia(A, specialize=specialize)
    if dia is not None:
        if jax.default_backend() == "tpu":
            # block-major dvals copy: one contiguous DMA per kernel step
            # instead of D strided segments (see DiaMatrix.dvals_blk)
            dia = dia.pack_blocked()
        return dia
    if A.n_rows * A.k < MIN_BANDED_ELEMENTS:
        return A
    if prefer_pallas is None:
        prefer_pallas = jax.default_backend() == "tpu"
    if prefer_pallas:
        banded = try_banded(A, exact=exact)
        if banded is not None:
            return banded
    return A
