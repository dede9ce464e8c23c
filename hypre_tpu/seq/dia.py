"""DiaMatrix — diagonal-offset sparse format, the fastest TPU SpMV path.

hypre's CSR SpMV is a row loop over column indices (``seq_mv/csr_matvec.c:699``)
and its GPU path is a warp-per-row gather kernel. Neither shape survives on
TPU: XLA lowers per-element gathers to the scalar unit (measured 109 ms for a
2M-row 7-pt SpMV — 300x off the roofline on this chip). The TPU-native answer
for PDE matrices is the DIA decomposition:

    y = sum_d  dvals[d] * shift(x, offset_d)

Each diagonal is a contiguous slice — no indices, no gather, pure VPU work in
one HBM pass. Stencil-generated fine-grid operators decompose exactly; AMG
coarse operators do not (their PMIS renumbering scatters the offsets) and use
the windowed-gather kernel in ``fastmv.py`` instead. ``try_dia`` decides.

Round 4: offsets became a DYNAMIC (traced) array — compiled programs key on
(diagonal count, margin bucket, row count) only, so a 96^3 and a 128^3
Laplacian share every SpMV/solve program (the shape-robustness verdict item;
hypre's C kernels are shape-generic the same way). Inside the Pallas kernel
the dynamic in-window shift is an aligned dynamic slice + a two-axis
``tpu.dynamic_rotate`` decomposition (Mosaic cannot prove alignment of raw
dynamic lane slices). Round-5 re-measurement: dynamic and static-offset
kernels are within noise of each other (0.092-0.096 ms at 128^3 D=7 —
round 4's "dynamic is 2x faster" reading was slope-method noise); the
static specialization (``offsets_static``) is kept as the two-path
dispatch option, and the performance lever that actually mattered was the
block-major dvals layout (``pack_blocked`` — see ``dvals_blk``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hypre_tpu.seq.ell import EllMatrix

ALIGN = 1024  # HBM 1-D tiling alignment for dynamic-slice starts


def _shift1d(x: jax.Array, o: int) -> jax.Array:
    """z[i] = x[i+o], zero fill, STATIC offset (struct/matrix.py shares
    this convention; kept for static callers like the struct layer)."""
    if o == 0:
        return x
    if o > 0:
        return jnp.concatenate([x[o:], jnp.zeros(o, x.dtype)])
    return jnp.concatenate([jnp.zeros(-o, x.dtype), x[:o]])


def _shift1d_dyn(x: jax.Array, o: jax.Array, margin: int) -> jax.Array:
    """z[i] = x[i+o] with TRACED offset |o| <= margin, zero fill."""
    n = x.shape[0]
    xp = jnp.concatenate(
        [jnp.zeros(margin, x.dtype), x, jnp.zeros(margin, x.dtype)]
    )
    return lax.dynamic_slice_in_dim(xp, margin + o, n, axis=0)


def _margin_for(offsets_host, n: int) -> int:
    """ALIGN-multiple margin bucket covering the offsets: the smallest
    n>>j (j in 6..0) that does — scale-free so programs key on the ratio,
    not the extent."""
    mx = max((abs(int(o)) for o in offsets_host), default=0)
    for j in (6, 5, 4, 3, 2, 1, 0):
        m = -(-max(n >> j, ALIGN) // ALIGN) * ALIGN
        if m >= mx + 1:
            return m
    return -(-(mx + 1) // ALIGN) * ALIGN


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiaMatrix:
    """dvals[d, i] = A[i, i + offsets[d]] (row-indexed diagonal storage).

    offsets is a traced int32 (D,) array; ``margin`` is the static
    |offset| bound (an ALIGN multiple). Construct via ``make_dia`` (or
    pass host offsets — __post_init__ converts and derives margin).

    offsets_static: the two-path dispatch (round-5). When set (a host
    tuple mirroring ``offsets``), SpMV runs the SPECIALIZED kernels —
    offset values baked into the program, tight windows, static slices —
    at the cost of one compile per offset family (served by the
    persistent cache after first sight). When None, the shape-generic
    dynamic-offset kernels run: slightly slower (wider x windows + a
    rotate decomposition per diagonal) but shared by every same-structure
    operator. ``try_dia(specialize=True)`` sets it; the policy layer
    (BoomerAMG / warmup registry) decides per shape.
    """

    dvals: jax.Array  # (D, n_rows)
    offsets: jax.Array  # (D,) int32 — DYNAMIC
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    margin: int = dataclasses.field(default=0, metadata=dict(static=True))
    offsets_static: tuple | None = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    # Block-major duplicate of dvals for the pallas kernels: (nb*D, blk_B)
    # with block i's D row-segments contiguous at rows [i*D, (i+1)*D).
    # The (D, n) layout makes each grid step fetch D strided row-segments —
    # measured ~0.25 us of DMA descriptor overhead each, which at D=64
    # dominated the transfer SpMV (2.4 ms vs the 0.68 ms roofline). The
    # blocked copy is ONE contiguous DMA per step: measured 820 GB/s.
    # Built by pack_blocked(); None = stream from dvals directly.
    dvals_blk: jax.Array | None = None
    blk_B: int = dataclasses.field(default=0, metadata=dict(static=True))

    def __post_init__(self):
        offs = self.offsets
        if isinstance(offs, (tuple, list, np.ndarray)):
            if self.margin == 0:
                object.__setattr__(
                    self, "margin",
                    _margin_for(offs, int(self.dvals.shape[1])),
                )
            object.__setattr__(
                self, "offsets", jnp.asarray(offs, jnp.int32)
            )
        elif self.margin == 0:
            raise ValueError(
                "DiaMatrix with traced offsets needs an explicit margin"
            )

    @property
    def D(self) -> int:
        return self.dvals.shape[0]

    @property
    def n_rows(self) -> int:
        return self.dvals.shape[1]

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.dvals.dtype

    @property
    def vec_len_rows(self) -> int:
        return self.n_rows

    @property
    def vec_len_cols(self) -> int:
        return self.n_cols

    def diagonal(self) -> jax.Array:
        sel = (self.offsets == 0).astype(self.dtype)
        return jnp.einsum("d,dn->n", sel, self.dvals)

    def row_sums(self) -> jax.Array:
        return jnp.sum(self.dvals, axis=0)

    def abs_row_sums(self) -> jax.Array:
        return jnp.sum(jnp.abs(self.dvals), axis=0)

    def pack_blocked(self) -> "DiaMatrix":
        """Attach the block-major dvals copy the pallas kernels stream at
        roofline speed (one contiguous DMA per grid step). One extra
        device pass at build time; a no-op if already packed."""
        if self.dvals_blk is not None:
            return self
        n, D = self.n_rows, self.D
        B = _pick_B(D, n)
        if n < 4096:
            return self  # pallas path never engages below the size floor
        if D < 16:
            # narrow operators (the 7-pt fine level) lose more to the
            # D->8k sublane padding (+14% dvals traffic) than they pay in
            # strided-segment overhead: measured 821 GB/s unblocked vs
            # 782 blocked at D=7. Blocking wins from D~16 up (64-diagonal
            # transfers: 233 -> 820 GB/s).
            return self
        nb = -(-n // B)
        n_pad = nb * B
        blk = _jit_pack_blocked(self.dvals, B, n_pad)
        return dataclasses.replace(self, dvals_blk=blk, blk_B=B)

    def mv(self, x: jax.Array) -> jax.Array:
        if x.shape[0] != self.n_cols:
            raise ValueError(f"shape mismatch: {self.shape} @ {x.shape}")
        if (
            x.dtype == jnp.float32
            and x.ndim == 1
            and jax.default_backend() == "tpu"
            and self.n_rows >= 4096
        ):
            if self.offsets_static is not None:
                return dia_spmv_pallas_static(self, x)
            return dia_spmv_pallas(self, x)
        if self.offsets_static is not None:
            y = None
            for d, o in enumerate(self.offsets_static):
                term = self.dvals[d] * _shift1d(x, o)
                y = term if y is None else y + term
            return y
        y = None
        for d in range(self.D):
            term = self.dvals[d] * _shift1d_dyn(x, self.offsets[d],
                                                self.margin)
            y = term if y is None else y + term
        return y

    def mv_t(self, x: jax.Array) -> jax.Array:
        """A^T x: entry (i, i+o) of A contributes at output row i+o."""
        if self.offsets_static is not None:
            y = None
            for d, o in enumerate(self.offsets_static):
                term = _shift1d(self.dvals[d] * x, -o)
                y = term if y is None else y + term
            return y
        y = None
        for d in range(self.D):
            term = _shift1d_dyn(self.dvals[d] * x, -self.offsets[d],
                                self.margin)
            y = term if y is None else y + term
        return y

    def lower_apply(self, x: jax.Array) -> jax.Array:
        if self.offsets_static is not None:
            y = jnp.zeros_like(x)
            for d, o in enumerate(self.offsets_static):
                if o < 0:
                    y = y + self.dvals[d] * _shift1d(x, o)
            return y
        y = jnp.zeros_like(x)
        for d in range(self.D):
            mask = (self.offsets[d] < 0).astype(self.dtype)
            y = y + mask * self.dvals[d] * _shift1d_dyn(
                x, self.offsets[d], self.margin
            )
        return y

    def upper_apply(self, x: jax.Array) -> jax.Array:
        if self.offsets_static is not None:
            y = jnp.zeros_like(x)
            for d, o in enumerate(self.offsets_static):
                if o > 0:
                    y = y + self.dvals[d] * _shift1d(x, o)
            return y
        y = jnp.zeros_like(x)
        for d in range(self.D):
            mask = (self.offsets[d] > 0).astype(self.dtype)
            y = y + mask * self.dvals[d] * _shift1d_dyn(
                x, self.offsets[d], self.margin
            )
        return y


def _pick_B(D: int, n: int) -> int:
    """Row-block size for the pallas kernels: VMEM budget — the
    auto-pipelined dvals block costs 2*D*B*4 bytes and the two x windows
    2*W*4; size B so many-diagonal operators (fine-space transfers carry
    ~63) stay under the 16 MB limit."""
    b_cap = max(4096, min(32768,
                          (8_000_000 // (max(D, 1) * 8)) // 1024 * 1024))
    return b_cap if n >= b_cap else max(1024, 1 << (n - 1).bit_length())


@functools.partial(jax.jit, static_argnames=("B", "n_pad"))
def _jit_pack_blocked(dvals, B, n_pad):
    # D padded to a multiple of 8: pallas requires block sublane counts
    # divisible by 8 (the pad rows are zeros the kernel never reads)
    D, n = dvals.shape
    D8 = -(-D // 8) * 8
    nb = n_pad // B
    p = jnp.pad(dvals, ((0, D8 - D), (0, n_pad - n)))
    return p.reshape(D8, nb, B).transpose(1, 0, 2).reshape(nb * D8, B)


def make_dia(dvals, offsets_host, n_cols: int) -> DiaMatrix:
    """DiaMatrix from HOST offsets (margin derived, offsets go dynamic)."""
    return DiaMatrix(
        dvals=dvals,
        offsets=tuple(int(o) for o in offsets_host),
        n_cols=n_cols,
    )


@functools.partial(jax.jit, static_argnames=("D",))
def _dia_planes_dyn(vals, cols, offs, D):
    """Diagonal planes with TRACED offsets: one searchsorted + scatter-add
    (keyed only on shapes + D, not offset values). offs must be sorted."""
    n, k = cols.shape
    rows = jnp.arange(n, dtype=cols.dtype)[:, None]
    diff = cols - rows
    oid = jnp.clip(jnp.searchsorted(offs, diff), 0, D - 1)
    hit = (cols >= 0) & (offs[oid] == diff)
    rows_b = jnp.broadcast_to(rows, (n, k))
    return (
        jnp.zeros((D, n), vals.dtype)
        .at[oid, rows_b]
        .add(jnp.where(hit, vals, 0))
    )


def try_dia(A: EllMatrix, max_offsets: int = 48,
            specialize: bool = False) -> DiaMatrix | None:
    """Exact DIA decomposition, or None if A has too many distinct offsets.

    Square row/col index spaces only. When the matrix carries a ``shifts``
    annotation (stencil generators / the device setup), the decomposition
    is pure device-side slot arithmetic — no host pull of the index slab
    (device_put of 2M-row cols measured at 25-900 MB/s on this tunnel).
    """
    if A.n_rows != A.n_cols:
        return None  # DIA is for square (level-operator) matrices
    if A.shifts is not None and len(set(A.shifts)) <= max_offsets:
        offs = sorted(set(int(s) for s in A.shifts))
        return DiaMatrix(
            dvals=_dia_planes_dyn(
                A.vals, A.cols, jnp.asarray(offs, jnp.int32), len(offs)
            ),
            offsets=tuple(offs),
            n_cols=A.n_cols,
            offsets_static=tuple(offs) if specialize else None,
        )
    cols = np.asarray(A.cols)
    vals = np.asarray(A.vals)
    n, k = cols.shape
    rows = np.arange(n)[:, None]
    valid = cols >= 0
    offs = np.unique((cols - rows)[valid])
    if len(offs) > max_offsets:
        return None
    dvals = np.zeros((len(offs), n), vals.dtype)
    for d, o in enumerate(offs):
        m = valid & ((cols - rows) == o)
        np.add.at(dvals[d], np.nonzero(m)[0], vals[m])
    return DiaMatrix(
        dvals=jnp.asarray(dvals),
        offsets=tuple(int(o) for o in offs),
        n_cols=A.n_cols,
        offsets_static=(tuple(int(o) for o in offs) if specialize
                        else None),
    )


# ---------------------------------------------------------------------------
# Pallas DIA SpMV — the roofline kernel (csr_spmv_device.c's role on TPU)
# ---------------------------------------------------------------------------


def _dia_kernel(D, W, B, nb, offs_ref, x_hbm, v_ref, y_ref, xw0, xw1, sx):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)

    def x_dma(buf, slot, blk):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(blk * B, ALIGN), W)], buf,
            sx.at[slot],
        )

    # TPU grid steps run sequentially and scratch persists: step i waits
    # the window DMA started at step i-1 and prefetches window i+1 — the
    # x stream overlaps the (auto-pipelined) dvals stream and compute.
    # Two named buffers sidestep Mosaic's dim-0 slice tiling constraint.
    @pl.when(i == 0)
    def _():
        x_dma(xw0, 0, 0).start()

    @pl.when((i + 1 < nb) & ((i + 1) % 2 == 0))
    def _():
        x_dma(xw0, 0, i + 1).start()

    @pl.when((i + 1 < nb) & ((i + 1) % 2 == 1))
    def _():
        x_dma(xw1, 1, i + 1).start()

    def compute(buf):
        # dynamic shift = aligned dynamic slice (provable via multiple_of)
        # + two-axis dynamic_rotate decomposition of the lane remainder;
        # the second row shift is a STATIC +1 roll of the first rotated
        # grid, so each diagonal costs 2 dynamic rotates + 1 static roll
        L = B + ALIGN
        nrow = L // 128
        lane = jax.lax.broadcasted_iota(jnp.int32, (nrow, 128), 1)
        acc = None
        for d in range(D):
            off = offs_ref[d]
            q = (off // ALIGN) * ALIGN
            r = off - q
            a = buf[pl.ds(pl.multiple_of(q, ALIGN), L)]
            A2 = a.reshape(nrow, 128)
            q2 = r // 128
            r2 = r - q2 * 128
            R1 = pltpu.roll(A2, nrow - q2, 0)
            L1 = pltpu.roll(R1, 128 - r2, 1)
            L2 = pltpu.roll(L1, nrow - 1, 0)
            g = jnp.where(lane < 128 - r2, L1, L2).reshape(L)
            t = v_ref[d, :].astype(jnp.float32) * g[:B]
            acc = t if acc is None else acc + t
        y_ref[:] = acc

    @pl.when(i % 2 == 0)
    def _():
        x_dma(xw0, 0, i).wait()
        compute(xw0)

    @pl.when(i % 2 == 1)
    def _():
        x_dma(xw1, 1, i).wait()
        compute(xw1)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _dia_pallas_call(D, W, B, n_pad, blocked, offs_rel, xpad, dvals_pad):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = n_pad // B
    D8 = -(-D // 8) * 8  # blocked copies pad D to a sublane multiple
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # offs_rel lands in SMEM
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x, windowed manually
            # blocked: (nb*D8, B) block-major dvals — one contiguous DMA
            # per grid step (see DiaMatrix.dvals_blk)
            (pl.BlockSpec((D8, B), lambda i, o: (i, 0)) if blocked
             else pl.BlockSpec((D, B), lambda i, o: (0, i))),
        ],
        out_specs=pl.BlockSpec((B,), lambda i, o: (i,)),
        scratch_shapes=[
            pltpu.VMEM((W,), jnp.float32),
            pltpu.VMEM((W,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    f = pl.pallas_call(
        functools.partial(_dia_kernel, D, W, B, nb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.float32),
    )
    return f(offs_rel, xpad, dvals_pad)


def _dia_kernel_static(D, W, B, nb, offs_rel, x_hbm, v_ref, y_ref, xw0,
                       xw1, sx):
    """Specialized variant: offset VALUES are compile-time constants, so
    each diagonal is one static in-window slice (no rotates, no selects) —
    the round-3 roofline kernel (834 GB/s measured on the 128^3 7-pt)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)

    def x_dma(buf, slot, blk):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(blk * B, ALIGN), W)], buf,
            sx.at[slot],
        )

    @pl.when(i == 0)
    def _():
        x_dma(xw0, 0, 0).start()

    @pl.when((i + 1 < nb) & ((i + 1) % 2 == 0))
    def _():
        x_dma(xw0, 0, i + 1).start()

    @pl.when((i + 1 < nb) & ((i + 1) % 2 == 1))
    def _():
        x_dma(xw1, 1, i + 1).start()

    def compute(buf):
        # v_ref may be bf16 (half-bandwidth transfer slabs) — the multiply
        # promotes to f32, accumulation stays f32
        acc = v_ref[0, :].astype(jnp.float32) * buf[pl.ds(offs_rel[0], B)]
        for d in range(1, D):
            acc = acc + v_ref[d, :].astype(jnp.float32) * buf[
                pl.ds(offs_rel[d], B)
            ]
        y_ref[:] = acc

    @pl.when(i % 2 == 0)
    def _():
        x_dma(xw0, 0, i).wait()
        compute(xw0)

    @pl.when(i % 2 == 1)
    def _():
        x_dma(xw1, 1, i).wait()
        compute(xw1)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _dia_pallas_call_static(D, W, B, n_pad, offs_rel, blocked, xpad,
                            dvals_pad):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = n_pad // B
    D8 = -(-D // 8) * 8  # blocked copies pad D to a sublane multiple
    f = pl.pallas_call(
        functools.partial(_dia_kernel_static, D, W, B, nb, offs_rel),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x, windowed manually
            # block-major (nb*D8, B): ONE contiguous DMA per step vs D
            # strided row-segments (descriptor overhead measured ~0.25 us
            # each — 3.5x the whole kernel at D=64)
            (pl.BlockSpec((D8, B), lambda i: (i, 0)) if blocked
             else pl.BlockSpec((D, B), lambda i: (0, i))),
        ],
        out_specs=pl.BlockSpec((B,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((W,), jnp.float32),
            pltpu.VMEM((W,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return f(xpad, dvals_pad)


def dia_spmv_pallas_static(A: DiaMatrix, x: jax.Array) -> jax.Array:
    """Specialized SpMV: tight (offset-value-derived) window, static
    slices. One program per (offset family, n) — the fast path once a
    shape has been seen (persistent cache makes the compile one-time)."""
    n = A.n_rows
    offs = A.offsets_static
    D = len(offs)
    B = A.blk_B if A.dvals_blk is not None else _pick_B(D, n)
    n_pad = -(-n // B) * B
    min_o, max_o = min(offs + (0,)), max(offs + (0,))
    lead = -(-(-min_o) // ALIGN) * ALIGN  # aligned left pad >= -min_o
    W = -(-(B + max_o + lead) // ALIGN) * ALIGN
    offs_rel = tuple(int(o + lead) for o in offs)
    xpad = jnp.zeros(lead + n_pad + (W - B), x.dtype).at[
        lead : lead + n
    ].set(x)
    if A.dvals_blk is not None:
        y = _dia_pallas_call_static(D, W, B, n_pad, offs_rel, True,
                                    xpad, A.dvals_blk)
        return y[:n]
    dvals_pad = (
        A.dvals
        if n_pad == n
        else jnp.pad(A.dvals, ((0, 0), (0, n_pad - n)))
    )
    y = _dia_pallas_call_static(D, W, B, n_pad, offs_rel, False, xpad,
                                dvals_pad)
    return y[:n]


def dia_spmv_pallas(A: DiaMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x in one HBM pass: per row-block, DMA the x window once and
    accumulate every diagonal as a dynamic in-window shift — pure VPU work
    at streaming bandwidth, keyed only on (D, margin, n) so any same-family
    operator shares the program."""
    n = A.n_rows
    D = A.D
    B = A.blk_B if A.dvals_blk is not None else _pick_B(D, n)
    n_pad = -(-n // B) * B
    lead = A.margin  # ALIGN multiple by construction
    W = 2 * lead + B + ALIGN
    offs_rel = (A.offsets + lead).astype(jnp.int32)
    xpad = jnp.zeros(lead + n_pad + (W - B), x.dtype).at[
        lead : lead + n
    ].set(x)
    if A.dvals_blk is not None:
        y = _dia_pallas_call(D, W, B, n_pad, True, offs_rel, xpad,
                             A.dvals_blk)
        return y[:n]
    dvals_pad = (
        A.dvals
        if n_pad == n
        else jnp.pad(A.dvals, ((0, 0), (0, n_pad - n)))
    )
    y = _dia_pallas_call(D, W, B, n_pad, False, offs_rel, xpad, dvals_pad)
    return y[:n]
