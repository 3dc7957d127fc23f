"""Pallas TPU kernel for banded/stencil SpMV.

The hot inner op of every Krylov solve on the PDE benchmark family
(SURVEY.md §3: one SpMV per CG iteration).  The banded matvec is
HBM-bandwidth-bound: ideal traffic is ``(ndiag + 2) * N`` words (coefficient
planes + x read + y write).  XLA's fusion of the shifted-slice formulation
materializes intermediates and pays misalignment penalties (measured ~12% of
roofline for the flattened 1-D form, ~52% for the padded 2-D form on v5e);
this kernel streams every operand exactly once.

Layout contract: the grid is collapsed to 2-D ``(M, ny)`` — any n-D stencil
flattens here (e.g. 3-D ``(nz, ny, nx)`` becomes ``(nz * ny, nx)`` with row
offsets ``dz * ny + dy``).  Each band is a ``(row_offset, col_offset)``
pair; the kernel computes

    y[i, j] = sum_d  c[d, i, j] * x[i + dr[d], j + dc[d]]

Row shifts: the row block is tiled over the grid; the ``h`` rows crossing a
block boundary come from two small pre-gathered halo-plane arrays (built
with cheap strided slices outside the kernel — ``2 * h * n_blocks * ny``
extra words, negligible), so every slice inside the kernel is static and
aligned.  Column shifts are lane rolls (``pltpu.roll``).  Rolled-in
wrap-around values are multiplied by coefficients that the stencil
constructors zero at domain boundaries (Dirichlet masking lives in the
data, not the kernel), so no branch or mask appears in the inner loop;
row-halo reads outside the domain are explicit zeros.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_vmem_budget():
    """Soft VMEM budget (bytes) for the fused-CG phase kernels.

    v5e has 128 MB of VMEM but Mosaic's default scoped limit is 16 MB;
    budgets above 13 MB make the kernels pass an explicit
    ``vmem_limit_bytes``.  The variable-coefficient phase A holds 11
    tm-row planes per block, so the budget sets the block height at
    ny=4096: 13 MB -> tm=32 (DMA-latency-bound, measured 644 GB/s),
    26 MB -> tm=64 (689 GB/s, the sweep's optimum), 52 MB -> tm=128
    (464 GB/s — too-deep blocks starve the pipeline).  Default 26;
    ``KRYLOV_TPU_FUSED_VMEM_MB`` overrides (read at trace time).
    """
    return int(os.environ.get("KRYLOV_TPU_FUSED_VMEM_MB", "26")) * 1024 * 1024


def _fused_compiler_params(budget):
    if budget <= 13 * 1024 * 1024:
        return None  # Mosaic default limit suffices
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(2 * budget + (8 << 20), 120 << 20)
    )


def _pick_tm(M, rows_per_block, halo_rows, bytes_per_row, min_tm=8,
             budget=10 * 1024 * 1024):
    """Largest divisor-of-M block height fitting the VMEM budget.

    ``rows_per_block`` counts how many tm-sized row buffers the kernel holds
    (inputs + outputs), ``halo_rows`` the fixed halo-plane rows; the whole
    set is double-buffered by the pipeline, and the scoped VMEM limit is
    16 MB, so the budget is conservative.
    """
    cap = (budget // 2 // bytes_per_row - halo_rows) // rows_per_block
    cap = max(min(int(cap), M), 1)
    if cap >= min_tm:
        tm = next(
            (t for t in range(cap, 7, -1)
             if M % t == 0 and t % 8 == 0 and t >= min_tm),
            None,
        )
        if tm is not None:
            return tm
    # halo width forces blocks larger than the soft budget: take the
    # smallest feasible block (scoped VMEM hard limit is 16 MB)
    return next(
        (t for t in range(max(min_tm, 8), M + 1)
         if M % t == 0 and t % 8 == 0),
        M,
    )


def _band_accumulate(x, c_ref, row_offsets, col_offsets, tm, get_top_row,
                     get_bot_row):
    """Shared band loop: sublane-roll row shifts + per-edge-row splices.

    ``get_top_row(k)`` / ``get_bot_row(k)`` supply the out-of-block rows
    (already masked/zeroed as appropriate).  bf16 inputs compute in f32:
    Mosaic has no bf16 lane rotate, and f32 accumulation is the right
    numerics anyway.
    """
    ny = x.shape[1]
    rid = lax.broadcasted_iota(jnp.int32, (tm, ny), 0)
    acc = None
    for d, (dr, dc) in enumerate(zip(row_offsets, col_offsets)):
        seg = x if dr == 0 else pltpu.roll(x, (-dr) % tm, axis=0)
        if dr < 0:
            # y rows [0, -dr) read x rows [dr, 0) = the top halo's tail
            for k in range(-dr):
                seg = jnp.where(rid == k, get_top_row(dr + k), seg)
        elif dr > 0:
            # y rows [tm-dr, tm) read x rows [tm, tm+dr) = the bottom halo
            for k in range(dr):
                seg = jnp.where(rid == tm - dr + k, get_bot_row(k), seg)
        if dc:
            # lanes j + dc == roll left by dc (wrap killed by zero boundary
            # coefficients); pltpu.roll needs a non-negative static shift
            seg = pltpu.roll(seg, (-dc) % ny, axis=1)
        term = c_ref[d].astype(x.dtype) * seg
        acc = term if acc is None else acc + term
    return acc


def _kernel(c_ref, x_ref, top_ref, bot_ref, y_ref, *, row_offsets,
            col_offsets, h, tm):
    # explicit pre-gathered halo planes (shard halos / h > 8 stencils)
    x = x_ref[...]
    if x.dtype == jnp.bfloat16:
        x = x.astype(jnp.float32)

    def top_row(off):  # off = dr + k in [-h, 0)
        return top_ref[0, h + off : h + off + 1].astype(x.dtype)

    def bot_row(k):
        return bot_ref[0, k : k + 1].astype(x.dtype)

    acc = _band_accumulate(
        x, c_ref, row_offsets, col_offsets, tm, top_row, bot_row
    )
    y_ref[...] = acc.astype(y_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("row_offsets", "col_offsets", "block_rows", "alias_x"),
)
def stencil2d_matvec(
    coeffs, x, row_offsets, col_offsets, block_rows=None,
    top_halo=None, bot_halo=None, alias_x=False,
):
    """``y[i,j] = sum_d coeffs[d,i,j] * x[i+row_offsets[d], j+col_offsets[d]]``.

    ``coeffs``: (ndiag, M, ny); ``x``: (M, ny).  Out-of-range row reads are
    zero; column reads wrap — callers must zero the wrap coefficients (the
    Poisson/stencil constructors do).

    ``top_halo``/``bot_halo`` (optional, ``(h, ny)``): rows logically at
    ``x[-h:0]`` / ``x[M:M+h]`` — used by the row-partitioned distributed
    operator to splice in neighbor shards' boundary rows so the same kernel
    computes a shard-local matvec (zeros when omitted).
    """
    ndiag, M, ny = coeffs.shape
    h = max((max(0, -min(row_offsets)), max(0, max(row_offsets))))

    bpr = ny * coeffs.dtype.itemsize
    if block_rows is None:
        # coeff planes + x + y buffers of tm rows, plus 2h halo rows
        tm = _pick_tm(M, ndiag + 2, 2 * h, bpr, min_tm=h)
    else:
        tm = _pick_tm(M, ndiag + 2, 2 * h, bpr, min_tm=h,
                      budget=2 * block_rows * (ndiag + 2) * bpr)
    nb = M // tm

    # halo planes: top[k] = x[k*tm - h : k*tm], bottom[k] = x[(k+1)*tm : +h]
    # (zeros -- or caller-provided shard halos -- outside the array).  The
    # strided gather costs ~12% of the streaming-regime rate; see
    # docs/design.md "streaming-regime bound analysis" for why the measured
    # alternatives (x as a second operand, halo-emitting chained calls) are
    # slower, bounding this kernel at ~77% of HBM peak in that regime.
    if h > 0:
        xr = x.reshape(nb, tm, ny)
        top0 = (
            jnp.zeros((1, h, ny), x.dtype)
            if top_halo is None
            else top_halo.astype(x.dtype)[None]
        )
        botN = (
            jnp.zeros((1, h, ny), x.dtype)
            if bot_halo is None
            else bot_halo.astype(x.dtype)[None]
        )
        tops = jnp.concatenate([top0, xr[:-1, tm - h :]], axis=0)
        bots = jnp.concatenate([xr[1:, :h], botN], axis=0)
    else:
        # dummy 1-row planes: zero-size arrays break Mosaic's layout check;
        # the kernels ignore these refs when h == 0
        tops = jnp.zeros((nb, 1, ny), x.dtype)
        bots = jnp.zeros((nb, 1, ny), x.dtype)

    kern = functools.partial(
        _kernel, row_offsets=row_offsets, col_offsets=col_offsets,
        h=max(h, 1), tm=tm,
    )
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (ndiag, tm, ny), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, max(h, 1), ny), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, max(h, 1), ny), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, ny), jnp.result_type(coeffs, x)),
        # y may reuse x's buffer: blocks read only their own rows (halo rows
        # come from the pre-gathered planes); ~2x HBM rate when x is dead
        input_output_aliases={1: 0} if alias_x else {},
    )(coeffs, x, tops, bots)


def supports(dtype, M, ny, row_offsets):
    """Whether the Pallas path applies: TPU backend, lane-aligned columns."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        return False
    h = max((max(0, -min(row_offsets)), max(0, max(row_offsets))))
    return (
        on_tpu
        and ny % 128 == 0
        and M % 8 == 0
        and h <= M // 2
        and jnp.dtype(dtype) in (jnp.float32, jnp.bfloat16)
    )


# ---------------------------------------------------------------------------
# Constant-coefficient stencils
# ---------------------------------------------------------------------------
#
# For constant-coefficient operators (the Poisson/Laplacian benchmark family)
# the coefficient planes carry no information except the Dirichlet boundary
# masks, yet they are (ndiag)/(ndiag+2) of all HBM traffic.  This variant
# replaces them with scalar weights + in-kernel boundary masks computed from
# iota: traffic drops to ~2N words (x read + y write), a further ~3x over the
# variable-coefficient kernel.
#
# Each band is (dr, dc, weight, row_constraints) where row_constraints is a
# tuple of (stride, size, step) triples: the band is valid on global row i
# iff for every triple 0 <= (i // stride) % size + step < size (the n-D grid
# coordinate along each collapsed axis stays in range).  The column
# constraint 0 <= j + dc < ny is applied on the lane dimension.


def _const_kernel(r0_ref, x_ref, top_ref, bot_ref, y_ref, *, bands, h, tm, ny, masked):
    if h > 0:
        xw = jnp.concatenate([top_ref[0], x_ref[...], bot_ref[0]], axis=0)
    else:
        xw = x_ref[...]
    if xw.dtype == jnp.bfloat16:
        # no bf16 lane rotate in Mosaic; f32 accumulation, cast on store
        xw = xw.astype(jnp.float32)
    if masked:
        # r0 = this shard's first global row (0 on a single chip): the
        # row-coordinate boundary masks are defined on GLOBAL indices
        gi0 = pl.program_id(0) * tm + r0_ref[0, 0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0) + gi0
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, ny), 1)
    acc = None
    for dr, dc, w, row_constraints in bands:
        seg = xw[h + dr : h + dr + tm]
        if dc:
            seg = pltpu.roll(seg, (-dc) % ny, axis=1)
        mask = None
        if masked:
            for stride, size, step in row_constraints:
                c = jax.lax.rem(
                    jax.lax.div(rows, jnp.int32(stride)), jnp.int32(size)
                )
                m = (c + step >= 0) & (c + step < size)
                mask = m if mask is None else mask & m
            if dc:
                mc = (cols + dc >= 0) & (cols + dc < ny)
                mask = mc if mask is None else mask & mc
        term = w * seg if mask is None else jnp.where(mask, w * seg, 0)
        acc = term if acc is None else acc + term
    y_ref[...] = acc.astype(y_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bands", "block_rows", "masked", "alias_x")
)
def const_stencil2d_matvec(x, bands, block_rows=None, masked=True,
                           alias_x=False, row0=None, top_halo=None,
                           bot_halo=None):
    """Constant-coefficient stencil matvec on the collapsed (M, ny) grid.

    ``bands``: static tuple of (dr, dc, weight, row_constraints) — see the
    comment above.  Only x and y touch HBM.

    ``masked=False`` skips ALL in-kernel boundary masking; callers must
    then fix the wrapped boundary contributions outside (see
    ConstStencilOperator._apply_grid: O(N/ny) corrections).

    ``alias_x=True`` writes y into x's buffer (``input_output_aliases``):
    a fresh-output pallas_call runs at half the aliased HBM rate on v5e
    (measured 327 vs 646 GB/s), so chained applications where x is dead
    afterwards should alias.  Safe with this kernel because each block
    reads only its own rows (halo rows come from the separate pre-gathered
    plane arrays); XLA copies x first if it is still live.
    """
    M, ny = x.shape
    row_offsets = tuple(b[0] for b in bands)
    h = max((max(0, -min(row_offsets)), max(0, max(row_offsets))))

    bpr = ny * x.dtype.itemsize
    if block_rows is None:
        # x + y buffers of tm rows, plus 2h halo rows (f32 working set
        # even for bf16 inputs: the kernel upcasts)
        tm = _pick_tm(M, 3, 3 * h, max(bpr, 4 * ny), min_tm=h)
    else:
        tm = _pick_tm(M, 3, 3 * h, max(bpr, 4 * ny), min_tm=h,
                      budget=2 * block_rows * 3 * max(bpr, 4 * ny))
    nb = M // tm

    if h > 0:
        xr = x.reshape(nb, tm, ny)
        top0 = (
            jnp.zeros((1, h, ny), x.dtype)
            if top_halo is None
            else top_halo.astype(x.dtype)[None]
        )
        botN = (
            jnp.zeros((1, h, ny), x.dtype)
            if bot_halo is None
            else bot_halo.astype(x.dtype)[None]
        )
        tops = jnp.concatenate([top0, xr[:-1, tm - h :]], axis=0)
        bots = jnp.concatenate([xr[1:, :h], botN], axis=0)
    else:
        # dummy 1-row planes: zero-size arrays break Mosaic's layout check;
        # the kernels ignore these refs when h == 0
        tops = jnp.zeros((nb, 1, ny), x.dtype)
        bots = jnp.zeros((nb, 1, ny), x.dtype)

    r0 = jnp.zeros((1, 1), jnp.int32) if row0 is None else (
        jnp.asarray(row0, jnp.int32).reshape(1, 1)
    )
    kern = functools.partial(
        _const_kernel, bands=bands, h=h, tm=tm, ny=ny, masked=masked
    )
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, max(h, 1), ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, max(h, 1), ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, ny), x.dtype),
        input_output_aliases={1: 0} if alias_x else {},
    )(r0, x, tops, bots)


# ---------------------------------------------------------------------------
# Fused CG iteration kernels (const- and variable-coefficient stencils)
# ---------------------------------------------------------------------------
#
# One CG iteration is two dependent phases separated by the pAp reduction
# (SURVEY.md §3.2).  Fusing each phase into a single pass over the vectors
# cuts HBM traffic from ~15N words to ~10N (const; the variable-coefficient
# variant adds the unavoidable ndiag*N coefficient stream to phase A,
# ~19N -> ~15N):
#
#   phase A:  p = r + omega * p;  Ap = A p;  partial <p, Ap>   (4N words)
#   phase B:  y += alpha * p;  r -= alpha * Ap;  partial <r,r> (6N words)
#
# The p-update is recomputed for the halo rows from the r/p halo planes, so
# phase A's stencil needs no second kernel's output — each block is
# self-contained.


def _jacobi_sweep_kernel(w_ref, z_ref, r_ref, zt_ref, zb_ref, zn_ref, *,
                         bands, h, tm, ny, update):
    """One fused damped-Jacobi sweep on a const stencil:
    ``z' = z + w * (r - A z)`` (``update=True``) or the plain residual
    ``d = r - A z`` (``update=False``) in a single pass — 3N words vs the
    6N (5N) of a separate matvec + elementwise composition."""
    w = w_ref[0, 0]
    if h > 0:
        z_ext = jnp.concatenate([zt_ref[0], z_ref[...], zb_ref[0]], axis=0)
    else:
        z_ext = z_ref[...]
    gi0 = pl.program_id(0) * tm
    rows = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0) + gi0
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, ny), 1)
    acc = None
    for dr, dc, wt, row_constraints in bands:
        seg = z_ext[h + dr : h + dr + tm]
        if dc:
            seg = pltpu.roll(seg, (-dc) % ny, axis=1)
        mask = None
        for stride, size, step in row_constraints:
            c = jax.lax.rem(
                jax.lax.div(rows, jnp.int32(stride)), jnp.int32(size)
            )
            m = (c + step >= 0) & (c + step < size)
            mask = m if mask is None else mask & m
        if dc:
            mc = (cols + dc >= 0) & (cols + dc < ny)
            mask = mc if mask is None else mask & mc
        term = wt * seg if mask is None else jnp.where(mask, wt * seg, 0)
        acc = term if acc is None else acc + term
    if update:
        zn_ref[...] = z_ref[...] + w * (r_ref[...] - acc)
    else:
        zn_ref[...] = r_ref[...] - acc


@functools.partial(
    jax.jit, static_argnames=("bands", "block_rows", "update")
)
def jacobi_sweep_const(w, z, r, bands, block_rows=None, update=True):
    """Fused damped-Jacobi smoothing sweep for const-coefficient stencils.

    ``update=True``: returns ``z + w * (r - A z)`` in ONE pallas pass
    (z/r read + z' write = 3N words; the separate matvec + XLA
    elementwise composition streams ~6N), writing in place into ``z``'s
    buffer.  ``update=False``: returns the residual ``r - A z`` (3N vs
    5N), fresh output (both operands stay live in the V-cycle).  The
    multigrid V-cycle's smoothing and residual steps are made of exactly
    these two shapes (multigrid.py::MultigridPreconditioner._smooth /
    _vcycle) — fusing them cut the measured 4096^2 V(2,2) cycle by ~25%.
    ``w`` is the scalar damped-Jacobi weight ``omega / center``.
    """
    M, ny = z.shape
    row_offsets = tuple(b[0] for b in bands)
    h = max((max(0, -min(row_offsets)), max(0, max(row_offsets))))

    bpr = ny * z.dtype.itemsize
    tm = _pick_tm(M, 4, 4 * h, bpr, min_tm=h)
    if block_rows is not None:
        tm = _pick_tm(M, 4, 4 * h, bpr, min_tm=h,
                      budget=2 * block_rows * 4 * bpr)
    nb = M // tm

    if h > 0:
        zt, zb = _halo_planes(z, nb, tm, h)
    else:
        zt = jnp.zeros((nb, 1, ny), z.dtype)
        zb = jnp.zeros((nb, 1, ny), z.dtype)
    ws = jnp.asarray(w, z.dtype).reshape(1, 1)
    kern = functools.partial(
        _jacobi_sweep_kernel, bands=bands, h=h, tm=tm, ny=ny, update=update
    )
    blk = pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM)
    halo = pl.BlockSpec(
        (1, max(h, 1), ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            blk, blk, halo, halo,
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((M, ny), z.dtype),
        # update sweeps consume z (halo reads come from the pre-gathered
        # planes, so in-place is safe — same argument as alias_x above);
        # the residual keeps both operands live and writes fresh
        input_output_aliases={1: 0} if update else {},
    )(ws, z, r, zt, zb)


def _jacobi_sweep_var_kernel(c_ref, *refs, row_offsets, col_offsets, h,
                             tm, ny, update):
    """Variable-coefficient twin of :func:`_jacobi_sweep_kernel`: the
    damped-Jacobi weight is a per-point plane (``omega / diag``) and the
    stencil streams the coefficient stack; Dirichlet masking lives in
    the coefficient data (see :func:`_cg_a_var_kernel`).  The weight
    block is only an input in update mode (the residual mode would
    stream an N-word plane it never reads)."""
    if update:
        w_ref, z_ref, r_ref, zt_ref, zb_ref, zn_ref = refs
    else:
        z_ref, r_ref, zt_ref, zb_ref, zn_ref = refs
    if h > 0:
        z_ext = jnp.concatenate([zt_ref[0], z_ref[...], zb_ref[0]], axis=0)
    else:
        z_ext = z_ref[...]
    acc = None
    for d, (dr, dc) in enumerate(zip(row_offsets, col_offsets)):
        seg = z_ext[h + dr : h + dr + tm]
        if dc:
            seg = pltpu.roll(seg, (-dc) % ny, axis=1)
        term = c_ref[d] * seg
        acc = term if acc is None else acc + term
    if update:
        zn_ref[...] = z_ref[...] + w_ref[...] * (r_ref[...] - acc)
    else:
        zn_ref[...] = r_ref[...] - acc


@functools.partial(
    jax.jit,
    static_argnames=("row_offsets", "col_offsets", "block_rows", "update"),
)
def jacobi_sweep_var(w, z, r, coeffs, row_offsets, col_offsets,
                     block_rows=None, update=True):
    """Fused damped-Jacobi sweep for variable-coefficient grid stencils:
    ``z + w ⊙ (r - A z)`` (``update=True``, in place into ``z``) or the
    residual ``r - A z`` (``update=False``) in one pallas pass.  ``w``
    is the per-point weight plane (``omega / diag``); traffic is
    ``(ndiag + 4)N`` words vs ``(ndiag + 7)N`` for the matvec + XLA
    elementwise composition.  Serves the Galerkin multigrid cycle's
    smoothing/residual steps (multigrid.py)."""
    M, ny = z.shape
    ndiag = coeffs.shape[0]
    h = max((max(0, -min(row_offsets)), max(0, max(row_offsets)), 1))

    budget = _fused_vmem_budget()
    bpr = ny * z.dtype.itemsize
    # c planes + w, z, r, zn blocks + 2 halo planes + z_ext intermediate
    tm = _pick_tm(M, ndiag + 5, 3 * h, bpr, min_tm=h, budget=budget)
    nb = M // tm

    if h > 0:
        zt, zb = _halo_planes(z, nb, tm, h)
    else:
        zt = jnp.zeros((nb, 1, ny), z.dtype)
        zb = jnp.zeros((nb, 1, ny), z.dtype)

    kern = functools.partial(
        _jacobi_sweep_var_kernel, row_offsets=row_offsets,
        col_offsets=col_offsets, h=h, tm=tm, ny=ny, update=update,
    )
    blk = pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM)
    halo = pl.BlockSpec(
        (1, max(h, 1), ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    c_spec = pl.BlockSpec(
        (ndiag, tm, ny), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    if update:
        w2 = jnp.broadcast_to(jnp.asarray(w, z.dtype), (M, ny))
        operands = (coeffs, w2, z, r, zt, zb)
        in_specs = [c_spec, blk, blk, blk, halo, halo]
        aliases = {2: 0}  # zn reuses z's buffer
    else:
        operands = (coeffs, z, r, zt, zb)
        in_specs = [c_spec, blk, blk, halo, halo]
        aliases = {}
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((M, ny), z.dtype),
        input_output_aliases=aliases,
        compiler_params=_fused_compiler_params(budget),
    )(*operands)


def _cg_a_kernel(om_ref, r_ref, p_ref, rt_ref, rb_ref, pt_ref, pb_ref,
                 pn_ref, ap_ref, pap_ref, *, bands, h, tm, ny):
    om = om_ref[0, 0]
    r_ext = jnp.concatenate([rt_ref[0], r_ref[...], rb_ref[0]], axis=0)
    p_ext = jnp.concatenate([pt_ref[0], p_ref[...], pb_ref[0]], axis=0)
    pn_ext = r_ext + om * p_ext  # halo rows recomputed locally
    pn = pn_ext[h : h + tm]
    pn_ref[...] = pn

    gi0 = pl.program_id(0) * tm
    rows = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0) + gi0
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, ny), 1)
    acc = None
    for dr, dc, w, row_constraints in bands:
        seg = pn_ext[h + dr : h + dr + tm]
        if dc:
            seg = pltpu.roll(seg, (-dc) % ny, axis=1)
        mask = None
        for stride, size, step in row_constraints:
            c = jax.lax.rem(
                jax.lax.div(rows, jnp.int32(stride)), jnp.int32(size)
            )
            m = (c + step >= 0) & (c + step < size)
            mask = m if mask is None else mask & m
        if dc:
            mc = (cols + dc >= 0) & (cols + dc < ny)
            mask = mc if mask is None else mask & mc
        term = w * seg if mask is None else jnp.where(mask, w * seg, 0)
        acc = term if acc is None else acc + term
    ap_ref[...] = acc

    # per-block partial <p, Ap> written to this block's OWN (8, 128) output
    # tile (revisiting a shared accumulator serializes the pipeline; a
    # per-step SMEM scalar store stalls it); final sum happens outside
    prod = pn * acc
    if prod.size % 128 == 0:
        part = prod.reshape(-1, 128).sum(axis=0).reshape(1, 128)
    else:  # tiny/odd blocks (tests): scalar in lane 0
        part = jnp.zeros((1, 128), prod.dtype).at[0, 0].set(jnp.sum(prod))
    pap_ref[...] = jnp.concatenate(
        [part, jnp.zeros((7, 128), part.dtype)], axis=0
    )[None]


def _cg_b_kernel(al_ref, y_ref, r_ref, p_ref, ap_ref,
                 yn_ref, rn_ref, rho_ref):
    al = al_ref[0, 0]
    rn = r_ref[...] - al * ap_ref[...]
    yn_ref[...] = y_ref[...] + al * p_ref[...]
    rn_ref[...] = rn

    prod = rn * rn
    if prod.size % 128 == 0:
        part = prod.reshape(-1, 128).sum(axis=0).reshape(1, 128)
    else:
        part = jnp.zeros((1, 128), prod.dtype).at[0, 0].set(jnp.sum(prod))
    rho_ref[...] = jnp.concatenate(
        [part, jnp.zeros((7, 128), part.dtype)], axis=0
    )[None]


def _cg_a_var_kernel(om_ref, c_ref, r_ref, p_ref, rt_ref, rb_ref, pt_ref,
                     pb_ref, pn_ref, ap_ref, pap_ref, *, row_offsets,
                     col_offsets, h, tm, ny):
    """Variable-coefficient twin of :func:`_cg_a_kernel`.

    Boundary handling follows the :func:`stencil2d_matvec` contract:
    Dirichlet masking lives in the coefficient DATA (constructors zero
    every entry whose 2-D neighbor leaves the grid), halo rows outside
    the domain are explicit zeros — so the p-update recomputed on the
    halo rows (``0 + omega * 0``) stays zero at the domain edges and no
    in-kernel mask is needed.
    """
    om = om_ref[0, 0]
    r_ext = jnp.concatenate([rt_ref[0], r_ref[...], rb_ref[0]], axis=0)
    p_ext = jnp.concatenate([pt_ref[0], p_ref[...], pb_ref[0]], axis=0)
    pn_ext = r_ext + om * p_ext  # halo rows recomputed locally
    pn = pn_ext[h : h + tm]
    pn_ref[...] = pn

    acc = None
    for d, (dr, dc) in enumerate(zip(row_offsets, col_offsets)):
        seg = pn_ext[h + dr : h + dr + tm]
        if dc:
            # lane wrap-around killed by the zero boundary coefficients
            seg = pltpu.roll(seg, (-dc) % ny, axis=1)
        term = c_ref[d] * seg
        acc = term if acc is None else acc + term
    ap_ref[...] = acc

    # per-block partial <p, Ap> on this block's own (8, 128) tile (see
    # _cg_a_kernel for why not a shared accumulator / SMEM scalar)
    prod = pn * acc
    if prod.size % 128 == 0:
        part = prod.reshape(-1, 128).sum(axis=0).reshape(1, 128)
    else:  # tiny/odd blocks (tests): scalar in lane 0
        part = jnp.zeros((1, 128), prod.dtype).at[0, 0].set(jnp.sum(prod))
    pap_ref[...] = jnp.concatenate(
        [part, jnp.zeros((7, 128), part.dtype)], axis=0
    )[None]


@functools.partial(
    jax.jit, static_argnames=("row_offsets", "col_offsets", "block_rows")
)
def cg_fused_phase_a_var(omega, r, p, coeffs, row_offsets, col_offsets,
                         block_rows=None):
    """Returns (p_new, Ap, pAp) in one pass — variable-coefficient bands.

    ``coeffs``: the operator's ``(ndiag, M, ny)`` plane stack (streamed
    once per iteration; it is (ndiag)/(ndiag+4) of this phase's traffic).
    """
    M, ny = r.shape
    ndiag = coeffs.shape[0]
    h = max((max(0, -min(row_offsets)), max(0, max(row_offsets)), 1))

    budget = _fused_vmem_budget()
    bpr = ny * r.dtype.itemsize
    # c planes + r, p, p_new, Ap blocks + 4 halo planes + p_ext intermediate
    tm = _pick_tm(M, ndiag + 6, 6 * h, bpr, min_tm=h,
                  budget=budget)
    nb = M // tm

    rt, rb = _halo_planes(r, nb, tm, h)
    pt, pb = _halo_planes(p, nb, tm, h)
    om = jnp.asarray(omega, r.dtype).reshape(1, 1)

    kern = functools.partial(
        _cg_a_var_kernel, row_offsets=row_offsets, col_offsets=col_offsets,
        h=h, tm=tm, ny=ny,
    )
    pn, ap, pap = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (ndiag, tm, ny), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max(h, 1), ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max(h, 1), ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max(h, 1), ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max(h, 1), ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, ny), r.dtype),
            jax.ShapeDtypeStruct((M, ny), r.dtype),
            jax.ShapeDtypeStruct((nb, 8, 128), r.dtype),
        ),
        # pn reuses p's buffer (p is dead after this phase; halo reads come
        # from the plane arrays) — fresh outputs halve the HBM rate
        input_output_aliases={3: 0},
        compiler_params=_fused_compiler_params(budget),
    )(om, coeffs, r, p, rt, rb, pt, pb)
    return pn, ap, jnp.sum(pap)


def _cg_a_var_jac_kernel(om_ref, c_ref, d_ref, r_ref, p_ref, rt_ref, rb_ref,
                         pt_ref, pb_ref, dt_ref, db_ref, pn_ref, ap_ref,
                         pap_ref, *, row_offsets, col_offsets, h, tm, ny):
    """Jacobi-preconditioned twin of :func:`_cg_a_var_kernel`.

    The search-direction update reads the M-preconditioned residual
    ``z = dinv * r`` (``dinv`` streamed as one extra plane):
    ``p = z + omega * p``; halo rows recompute the same update from the
    r/p/dinv halo planes (dinv halos are zero outside the domain, so
    edge halo rows stay zero exactly as in the unpreconditioned kernel).
    """
    om = om_ref[0, 0]
    r_ext = jnp.concatenate([rt_ref[0], r_ref[...], rb_ref[0]], axis=0)
    p_ext = jnp.concatenate([pt_ref[0], p_ref[...], pb_ref[0]], axis=0)
    d_ext = jnp.concatenate([dt_ref[0], d_ref[...], db_ref[0]], axis=0)
    pn_ext = d_ext * r_ext + om * p_ext  # halo rows recomputed locally
    pn = pn_ext[h : h + tm]
    pn_ref[...] = pn

    acc = None
    for d, (dr, dc) in enumerate(zip(row_offsets, col_offsets)):
        seg = pn_ext[h + dr : h + dr + tm]
        if dc:
            seg = pltpu.roll(seg, (-dc) % ny, axis=1)
        term = c_ref[d] * seg
        acc = term if acc is None else acc + term
    ap_ref[...] = acc

    prod = pn * acc
    if prod.size % 128 == 0:
        part = prod.reshape(-1, 128).sum(axis=0).reshape(1, 128)
    else:  # tiny/odd blocks (tests): scalar in lane 0
        part = jnp.zeros((1, 128), prod.dtype).at[0, 0].set(jnp.sum(prod))
    pap_ref[...] = jnp.concatenate(
        [part, jnp.zeros((7, 128), part.dtype)], axis=0
    )[None]


@functools.partial(
    jax.jit, static_argnames=("row_offsets", "col_offsets", "block_rows")
)
def cg_fused_phase_a_var_jac(omega, r, p, coeffs, dinv, row_offsets,
                             col_offsets, block_rows=None):
    """Returns (p_new, Ap, pAp) in one pass — variable-coefficient bands,
    Jacobi (diagonal) preconditioner ``dinv`` applied inside the p-update.
    """
    M, ny = r.shape
    ndiag = coeffs.shape[0]
    h = max((max(0, -min(row_offsets)), max(0, max(row_offsets)), 1))

    budget = _fused_vmem_budget()
    bpr = ny * r.dtype.itemsize
    # c + dinv planes + r, p, p_new, Ap blocks + 6 halo planes + p_ext
    tm = _pick_tm(M, ndiag + 7, 8 * h, bpr, min_tm=h,
                  budget=budget)
    nb = M // tm

    rt, rb = _halo_planes(r, nb, tm, h)
    pt, pb = _halo_planes(p, nb, tm, h)
    dt, db = _halo_planes(dinv, nb, tm, h)
    om = jnp.asarray(omega, r.dtype).reshape(1, 1)

    kern = functools.partial(
        _cg_a_var_jac_kernel, row_offsets=row_offsets,
        col_offsets=col_offsets, h=h, tm=tm, ny=ny,
    )
    halo_spec = pl.BlockSpec(
        (1, max(h, 1), ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    blk_spec = pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pn, ap, pap = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (ndiag, tm, ny), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            blk_spec, blk_spec, blk_spec,
            halo_spec, halo_spec, halo_spec, halo_spec, halo_spec, halo_spec,
        ],
        out_specs=(
            blk_spec, blk_spec,
            pl.BlockSpec(
                (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, ny), r.dtype),
            jax.ShapeDtypeStruct((M, ny), r.dtype),
            jax.ShapeDtypeStruct((nb, 8, 128), r.dtype),
        ),
        # pn reuses p's buffer (input 4: om, coeffs, dinv, r, p)
        input_output_aliases={4: 0},
        compiler_params=_fused_compiler_params(budget),
    )(om, coeffs, dinv, r, p, rt, rb, pt, pb, dt, db)
    return pn, ap, jnp.sum(pap)


def _cg_b_jac_kernel(al_ref, d_ref, y_ref, r_ref, p_ref, ap_ref,
                     yn_ref, rn_ref, rho_ref):
    """Jacobi twin of :func:`_cg_b_kernel`: rho accumulates the
    M-weighted norm ``<r, dinv r>`` of the new residual."""
    al = al_ref[0, 0]
    rn = r_ref[...] - al * ap_ref[...]
    yn_ref[...] = y_ref[...] + al * p_ref[...]
    rn_ref[...] = rn

    prod = rn * (d_ref[...] * rn)
    if prod.size % 128 == 0:
        part = prod.reshape(-1, 128).sum(axis=0).reshape(1, 128)
    else:
        part = jnp.zeros((1, 128), prod.dtype).at[0, 0].set(jnp.sum(prod))
    rho_ref[...] = jnp.concatenate(
        [part, jnp.zeros((7, 128), part.dtype)], axis=0
    )[None]


@jax.jit
def cg_fused_phase_b_jac(alpha, y, r, p, ap, dinv):
    """Returns (y_new, r_new, rho_new) with ``rho = <r_new, dinv r_new>``."""
    M, ny = r.shape
    budget = _fused_vmem_budget()
    tm = _pick_tm(M, 7, 0, ny * r.dtype.itemsize, budget=budget)
    nb = M // tm
    al = jnp.asarray(alpha, r.dtype).reshape(1, 1)
    blk = pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM)

    yn, rn, rho = pl.pallas_call(
        _cg_b_jac_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            blk, blk, blk, blk, blk,
        ],
        out_specs=(
            blk, blk,
            pl.BlockSpec(
                (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, ny), r.dtype),
            jax.ShapeDtypeStruct((M, ny), r.dtype),
            jax.ShapeDtypeStruct((nb, 8, 128), r.dtype),
        ),
        # inputs: al, dinv, y, r, p, ap — yn and rn update y/r in place
        input_output_aliases={2: 0, 3: 1},
        compiler_params=_fused_compiler_params(budget),
    )(al, dinv, y, r, p, ap)
    return yn, rn, jnp.sum(rho)


def _halo_planes(x, nb, tm, h):
    ny = x.shape[1]
    xr = x.reshape(nb, tm, ny)
    zero = jnp.zeros((1, h, ny), x.dtype)
    tops = jnp.concatenate([zero, xr[:-1, tm - h :]], axis=0)
    bots = jnp.concatenate([xr[1:, :h], zero], axis=0)
    return tops, bots


@functools.partial(jax.jit, static_argnames=("bands", "block_rows"))
def cg_fused_phase_a(omega, r, p, bands, block_rows=None):
    """Returns (p_new, Ap, pAp) in one pass."""
    M, ny = r.shape
    row_offsets = tuple(b[0] for b in bands)
    h = max((max(0, -min(row_offsets)), max(0, max(row_offsets)), 1))

    budget = _fused_vmem_budget()
    bpr = ny * r.dtype.itemsize
    # r, p, p_new, Ap blocks + 4 halo planes + the p_ext intermediate
    tm = _pick_tm(M, 6, 6 * h, bpr, min_tm=h, budget=budget)
    nb = M // tm

    rt, rb = _halo_planes(r, nb, tm, h)
    pt, pb = _halo_planes(p, nb, tm, h)
    om = jnp.asarray(omega, r.dtype).reshape(1, 1)

    kern = functools.partial(_cg_a_kernel, bands=bands, h=h, tm=tm, ny=ny)
    pn, ap, pap = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max(h, 1), ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max(h, 1), ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max(h, 1), ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max(h, 1), ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, ny), r.dtype),
            jax.ShapeDtypeStruct((M, ny), r.dtype),
            jax.ShapeDtypeStruct((nb, 8, 128), r.dtype),
        ),
        # pn reuses p's buffer (p is dead after this phase; halo reads come
        # from the plane arrays) — fresh outputs halve the HBM rate
        input_output_aliases={2: 0},
        compiler_params=_fused_compiler_params(budget),
    )(om, r, p, rt, rb, pt, pb)
    return pn, ap, jnp.sum(pap)


@jax.jit
def cg_fused_phase_b(alpha, y, r, p, ap):
    """Returns (y_new, r_new, rho_new) in one pass."""
    M, ny = r.shape
    budget = _fused_vmem_budget()
    tm = _pick_tm(M, 6, 0, ny * r.dtype.itemsize, budget=budget)
    nb = M // tm
    al = jnp.asarray(alpha, r.dtype).reshape(1, 1)

    yn, rn, rho = pl.pallas_call(
        _cg_b_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, ny), r.dtype),
            jax.ShapeDtypeStruct((M, ny), r.dtype),
            jax.ShapeDtypeStruct((nb, 8, 128), r.dtype),
        ),
        # pure blockwise elementwise phase: yn and rn update in place
        input_output_aliases={1: 0, 2: 1},
        compiler_params=_fused_compiler_params(budget),
    )(al, y, r, p, ap)
    return yn, rn, jnp.sum(rho)
