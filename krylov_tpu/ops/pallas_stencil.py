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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(c_ref, x_ref, top_ref, bot_ref, y_ref, *, row_offsets, col_offsets, h, tm):
    # full extended window [top halo | block | bottom halo] is materialized
    # once; the per-band reads below are static slices of it.  bf16 inputs
    # compute in f32: Mosaic has no bf16 lane rotate, and f32 accumulation
    # is the right numerics anyway; cast on store.
    xw = jnp.concatenate([top_ref[0], x_ref[...], bot_ref[0]], axis=0)
    if xw.dtype == jnp.bfloat16:
        xw = xw.astype(jnp.float32)
    acc = None
    for d, (dr, dc) in enumerate(zip(row_offsets, col_offsets)):
        seg = xw[h + dr : h + dr + tm]
        if dc:
            # lanes j + dc == roll left by dc (wrap killed by zero boundary
            # coefficients); pltpu.roll requires a non-negative static shift
            seg = pltpu.roll(seg, (-dc) % seg.shape[1], axis=1)
        term = c_ref[d].astype(seg.dtype) * seg
        acc = term if acc is None else acc + term
    y_ref[...] = acc.astype(y_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("row_offsets", "col_offsets", "block_rows")
)
def stencil2d_matvec(
    coeffs, x, row_offsets, col_offsets, block_rows=None,
    top_halo=None, bot_halo=None,
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

    if block_rows is None:
        # fit (double-buffered) operand blocks in ~12 MB of VMEM
        budget = 12 * 1024 * 1024 // 2
        per_row = (ndiag + 2) * ny * coeffs.dtype.itemsize
        block_rows = max(8, min(512, budget // per_row))
    cap = min(block_rows, M)
    # largest divisor of M that is <= cap, a multiple of 8, and >= h
    tm = next(
        (t for t in range(cap, 7, -1) if M % t == 0 and t % 8 == 0 and t >= h),
        None,
    )
    if tm is None:  # tiny/odd shapes: fall back to one block
        tm = M
    nb = M // tm

    # halo planes: top[k] = x[k*tm - h : k*tm], bottom[k] = x[(k+1)*tm : +h]
    # (zeros — or caller-provided shard halos — outside the array); built
    # from strided slices: reads only 2*h*nb*ny elements of x
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
        tops = jnp.zeros((nb, 0, ny), x.dtype)
        bots = jnp.zeros((nb, 0, ny), x.dtype)

    kern = functools.partial(
        _kernel, row_offsets=row_offsets, col_offsets=col_offsets, h=h, tm=tm
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
                (1, h, ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, h, ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, ny), jnp.result_type(coeffs, x)),
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


def _const_kernel(x_ref, top_ref, bot_ref, y_ref, *, bands, h, tm, ny):
    xw = jnp.concatenate([top_ref[0], x_ref[...], bot_ref[0]], axis=0)
    if xw.dtype == jnp.bfloat16:
        # no bf16 lane rotate in Mosaic; f32 accumulation, cast on store
        xw = xw.astype(jnp.float32)
    gi0 = pl.program_id(0) * tm
    rows = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0) + gi0
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, ny), 1)
    acc = None
    for dr, dc, w, row_constraints in bands:
        seg = xw[h + dr : h + dr + tm]
        if dc:
            seg = pltpu.roll(seg, (-dc) % ny, axis=1)
        mask = None
        for stride, size, step in row_constraints:
            c = jax.lax.rem(jax.lax.div(rows, stride), size)
            m = (c + step >= 0) & (c + step < size)
            mask = m if mask is None else mask & m
        if dc:
            mc = (cols + dc >= 0) & (cols + dc < ny)
            mask = mc if mask is None else mask & mc
        term = w * seg if mask is None else jnp.where(mask, w * seg, 0)
        acc = term if acc is None else acc + term
    y_ref[...] = acc.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bands", "block_rows"))
def const_stencil2d_matvec(x, bands, block_rows=None):
    """Constant-coefficient stencil matvec on the collapsed (M, ny) grid.

    ``bands``: static tuple of (dr, dc, weight, row_constraints) — see the
    comment above.  Only x and y touch HBM.
    """
    M, ny = x.shape
    row_offsets = tuple(b[0] for b in bands)
    h = max((max(0, -min(row_offsets)), max(0, max(row_offsets))))

    if block_rows is None:
        budget = 12 * 1024 * 1024 // 2
        per_row = 2 * ny * x.dtype.itemsize
        block_rows = max(8, min(1024, budget // per_row))
    cap = min(block_rows, M)
    tm = next(
        (t for t in range(cap, 7, -1) if M % t == 0 and t % 8 == 0 and t >= h),
        None,
    )
    if tm is None:
        tm = M
    nb = M // tm

    if h > 0:
        xr = x.reshape(nb, tm, ny)
        zero = jnp.zeros((1, h, ny), x.dtype)
        tops = jnp.concatenate([zero, xr[:-1, tm - h :]], axis=0)
        bots = jnp.concatenate([xr[1:, :h], zero], axis=0)
    else:
        tops = jnp.zeros((nb, 0, ny), x.dtype)
        bots = jnp.zeros((nb, 0, ny), x.dtype)

    kern = functools.partial(_const_kernel, bands=bands, h=h, tm=tm, ny=ny)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, h, ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, h, ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tm, ny), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, ny), x.dtype),
    )(x, tops, bots)
