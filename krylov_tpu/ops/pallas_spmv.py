"""Pallas row-chunked CSR SpMV for TPU: the PET (page-ELL tiles) kernel.

The reference accepts arbitrary scipy-sparse operators in every solver
(reference: tests/test_solvers.py:199-209) and gets its SpMV from scipy's
native CSR matvec.  On TPU the portable XLA gather+segment_sum path
(:class:`krylov_tpu.ops.sparse.CSROperator`) is catastrophically slow for
large matrices (~0.06 Gnnz/s measured on v5e -- XLA lowers the x-gather to
serial dynamic slices), so general sparsity needs a real kernel.

TPU constraints that shape the design (measured on v5e, jax 0.9):

* Mosaic supports exactly ONE in-VMEM gather primitive: ``take_along_axis``
  along the 128-lane axis with ``idx.shape == table.shape``
  (``tpu.dynamic_gather``).  Each sublane row of the index tile reads from a
  private 128-value table row.  There is no scatter and no sublane-direction
  gather on this hardware generation.
* Grid-step streaming reaches peak only with >=64 KB blocks per step.

**PET format.**  Rows are grouped 128-per-*subgroup* (lane = row % 128) and
``GS`` subgroups per *group* (one output tile ``(GS, 128)``).  The x vector
is viewed as 128-wide *pages*.  A *slot* is a (subgroup, page, occurrence)
triple: it holds, for each of the subgroup's 128 rows, that row's k-th
matrix entry whose column falls in that page -- so a slot's 128 lanes share
one x-page and one output row of the group tile.  Slots are packed ``LC``
per *chunk*; every slot in a chunk reads its page from one of (up to) two
``CWP``-page sub-windows, both inside the chunk's aligned ``WPAGES``-page
x-window (the two sub-windows let chunks pack densely across groups whose
column span straddles a sub-window boundary).

Per chunk the kernel then needs only four cheap dense ops:

1. build the per-slot page tables with masked one-hot MXU matmuls
   ``(LC, CWP) @ (CWP, 128)`` from the two sub-windows,
2. ``take_along_axis`` (the hardware lane-gather) with the 7-bit in-page
   column indices,
3. multiply by the streamed data tile,
4. route the per-slot partial sums to the ``GS`` output rows with a second
   one-hot matmul ``(GS, LC) @ (LC, 128)`` and accumulate into the output
   tile (revisited across all chunks of the group).

Index traffic is 1 byte per slot-lane: only the 7-bit in-page column index
streams per lane (int8); the per-SLOT descriptors (page_rel, window select,
output row) are packed one int32 per slot into the chunk's metadata tile,
lane-major, and relayouted in-kernel with one small (8,128) transpose.
Total stream: 5 bytes per (padded) slot-lane in f32 -- 37% below raw CSR's
8-byte data+index stream, which pays for the padding.  Padding (empty
lanes / chunk tails) is structure-dependent and is reported by
:func:`build_pet` as ``fill``; matrices with column locality (stencils,
meshes, RCM-ordered graphs) fill well, while adversarially random columns
degrade gracefully (still orders of magnitude above the XLA fallback).

The x window DMA is driven by scalar-prefetched per-chunk metadata
(window block, group, zero-init flag, sub-window bases), so the pipeline
overlaps the window fetch with compute and skips re-fetches while
consecutive chunks share a window.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.tree_util import register_pytree_node_class

# static layout parameters (powers of two; bit packing below assumes these)
LC = 256        # slots per chunk
WPAGES = 256    # pages per DMA'd x window (32768 x values, 128 KB f32)
CWP = 32        # pages per chunk-local sub-window (kept small: the one-hot
                # table matmul cost is LC * 2*CWP * 128 MACs per chunk)
GS = 32         # subgroups (of 128 rows) per output group tile (5 bits).
                # GS=128 would fill the routing matmul's 128-row MXU
                # height, but measured SLOWER: the per-chunk += on a
                # 4x-larger output tile costs more VMEM read/write
                # traffic than the routing passes save.
# per-slot descriptor word: pidx (6 bits) | wid << 6 | sgr << 7


def _schedule_slots(slot_grp, slot_page, ngroups, lc, cwp=CWP):
    """Greedy per-group schedule: sub-window runs, then <=2-window chunks.

    Returns per-slot (chunk, pos-in-chunk, wid 0/1, cbase of its window)
    and per-chunk (group, wblock, cbase0, cbase1).
    """
    n_slots = len(slot_page)
    chunk_of = np.empty(n_slots, np.int64)
    pos_of = np.empty(n_slots, np.int64)
    wid_of = np.empty(n_slots, np.int8)
    cbase_of = np.empty(n_slots, np.int64)

    chunks_grp, chunks_wblk, chunks_cb0, chunks_cb1 = [], [], [], []

    grp_bounds = np.r_[
        0, np.flatnonzero(slot_grp[1:] != slot_grp[:-1]) + 1, n_slots
    ] if n_slots else np.array([0])

    for gi in range(len(grp_bounds) - 1):
        lo, hi = grp_bounds[gi], grp_bounds[gi + 1]
        pages = slot_page[lo:hi]
        g = slot_grp[lo]
        # greedy sub-window runs, clipped inside aligned WPAGES blocks
        runs = []  # (start, end, base_page)
        i = 0
        while i < hi - lo:
            p = pages[i]
            blk = p // WPAGES
            base = min(p - p % 8, (blk + 1) * WPAGES - cwp)
            base = max(base, blk * WPAGES)
            j = np.searchsorted(pages, base + cwp)
            jb = np.searchsorted(pages, (blk + 1) * WPAGES)
            j = min(j, jb)
            runs.append((i, j, base))
            i = j
        # pack runs into chunks: <=LC slots, <=2 windows, one WPAGES block
        cur_cnt, cur_wins = lc, []  # force new chunk at first slot
        for (i, j, base) in runs:
            blk = base // WPAGES
            k = i
            while k < j:
                win_ok = (
                    any(b == base for (b, _) in cur_wins)
                    or (len(cur_wins) < 2
                        and all(bb // WPAGES == blk for (bb, _) in cur_wins))
                )
                if cur_cnt >= lc or not win_ok:
                    chunks_grp.append(g)
                    chunks_wblk.append(blk)
                    cur_wins = [(base, 0)]
                    cur_cnt = 0
                elif not any(b == base for (b, _) in cur_wins):
                    cur_wins.append((base, len(cur_wins)))
                wid = next(w for (b, w) in cur_wins if b == base)
                take = min(lc - cur_cnt, j - k)
                c = len(chunks_grp) - 1
                sl = slice(lo + k, lo + k + take)
                chunk_of[sl] = c
                pos_of[sl] = cur_cnt + np.arange(take)
                wid_of[sl] = wid
                cbase_of[sl] = base
                cur_cnt += take
                k += take
                # keep per-chunk window bases up to date
                while len(chunks_cb0) <= c:
                    chunks_cb0.append(base)
                    chunks_cb1.append(base)
                if wid == 0:
                    chunks_cb0[c] = base
                else:
                    chunks_cb1[c] = base

    return (
        chunk_of, pos_of, wid_of, cbase_of,
        np.asarray(chunks_grp, np.int64),
        np.asarray(chunks_wblk, np.int64),
        np.asarray(chunks_cb0, np.int64),
        np.asarray(chunks_cb1, np.int64),
    )


def choose_cwp(csr, sample_groups=8, seed=0):
    """Pick the chunk sub-window size (16 or 32 pages) per matrix.

    The page-selection one-hot contraction is the kernel's only
    k-scaled MXU op; its stacked depth is ``3 * 2 * cwp`` bf16 rows,
    which the 128-deep MXU pads to full passes — cwp=16 costs ONE pass
    (96 -> 128) and cwp=32 TWO (192 -> 256).  Smaller windows can
    fragment groups whose slot pages span more than ``2 * cwp`` pages
    (wide-band stencil groups) into extra chunks, which costs stream
    fill — so sample a few row-groups, run the REAL scheduler on their
    slot streams for both sizes, and take the half-cost window only
    when it does not inflate the chunk count ("multi-geometry chunks":
    the geometry is per-matrix, static at trace time)."""
    n = csr.shape[0]
    nsg = -(-n // 128)
    ngroups = max(1, -(-nsg // GS))
    rng = np.random.default_rng(seed)
    gids = (
        np.arange(ngroups) if ngroups <= sample_groups
        else np.sort(rng.choice(ngroups, sample_groups, replace=False))
    )
    chunks = {16: 0, 32: 0}
    for g in gids:
        r0, r1 = int(g) * GS * 128, min((int(g) + 1) * GS * 128, n)
        lo, hi = csr.indptr[r0], csr.indptr[r1]
        if hi <= lo:
            continue
        rows = np.repeat(
            np.arange(r0, r1, dtype=np.int64),
            np.diff(csr.indptr[r0:r1 + 1]),
        )
        pages = csr.indices[lo:hi].astype(np.int64) >> 7
        # slots per (subgroup, page) = max lane multiplicity (occurrence
        # rank), exactly as the builder derives them
        key = (rows >> 7) * (int(pages.max()) + 2) * 128 + pages * 128 + (
            rows & 127
        )
        uk, cnt = np.unique(key, return_counts=True)
        sgp = uk // 128  # (subgroup, page) id per unique (sg, page, lane)
        starts = np.flatnonzero(np.r_[True, sgp[1:] != sgp[:-1]])
        slot_mult = np.maximum.reduceat(cnt, starts)
        slot_pages = (uk[starts] // 128) % (int(pages.max()) + 2)
        # slot stream sorted by page (the scheduler's per-group order),
        # with multiplicity (k-occurrences each own a slot)
        order = np.argsort(slot_pages, kind="stable")
        sp_pages = np.repeat(slot_pages[order], slot_mult[order])
        sp_grp = np.zeros(len(sp_pages), np.int64)
        lc_probe = 512 if len(sp_pages) >= 384 else 256
        for cwp in (16, 32):
            out = _schedule_slots(sp_grp, sp_pages, 1, lc_probe, cwp=cwp)
            chunks[cwp] += len(out[4])
    return 16 if chunks[16] <= 1.1 * max(1, chunks[32]) else 32


def build_pet(sp, dtype=np.float32, data_dtype=None, lc=None,
              to_device=True, cwp=None):
    """Build PET arrays from a scipy sparse matrix (host-side, one-time).

    ``cwp`` — pages per chunk sub-window (16 or 32); None picks per
    matrix via :func:`choose_cwp` (16 halves the kernel's page-select
    MXU cost when the matrix's groups are page-compact).

    ``to_device=False`` keeps the arrays as host numpy so a caller
    assembling many PETs (e.g. an AMG hierarchy) can move them all in
    ONE ``jax.device_put`` of the enclosing pytree — per-array puts cost
    a full round-trip each on remote-TPU backends (~0.2 s apiece).

    Returns a dict of device arrays + static geometry:
      ent    (nchunks*LC, 128) int8   in-page column index per slot-lane
      dat    (nchunks*LC, 128)        matrix entries (0 in padded lanes);
                                      ``data_dtype`` (e.g. bf16) halves the
                                      value stream for mixed-precision use
      meta   (nchunks,) int32         packed (wblock << 16 | group), SMEM
      meta_v (nchunks*8, 128) int32   [first, cbase0, cbase1] + per-slot
                                      descriptor words, streamed via VMEM
    plus shape/padding info and the achieved ``fill`` ratio
    (true nnz / streamed slot-lanes).
    """
    import scipy.sparse

    if (
        scipy.sparse.issparse(sp) and sp.format == "csr"
        and sp.dtype == dtype and sp.has_canonical_format
        and sp.has_sorted_indices
    ):
        csr = sp  # already canonical f32: skip the O(nnz) astype copy
    else:
        csr = scipy.sparse.csr_matrix(sp).astype(dtype)
        csr.sum_duplicates()  # canonical: sorted columns, no duplicates
        csr.sort_indices()
    n, m = csr.shape
    nnz = csr.nnz

    if nnz >= (1 << 16) and dtype == np.float32:
        # the sort/schedule/scatter passes dominate large builds; the C++
        # twin (csrc/pet_build.cpp) produces bit-identical arrays ~10x
        # faster and falls back to this numpy path when unavailable
        from . import _native

        if cwp is None:
            cwp = choose_cwp(csr)
        host = _native.pet_build_native(csr, lc=lc, cwp=cwp)
        if host is not None:
            nsg_ = -(-n // 128)
            pages_tot_ = max(1, -(-m // 128))
            conv = jnp.asarray if to_device else (lambda a: a)
            dat_dev = conv(host["dat"])
            if data_dtype is not None:
                dat_dev = dat_dev.astype(data_dtype)
            return {
                "ent": conv(host["ent"]),
                "dat": dat_dev,
                "meta": conv(host["meta"]),
                "meta_v": conv(host["meta_v"]),
                "shape": (n, m),
                "nchunks": host["nchunks"],
                "ngroups": max(1, -(-nsg_ // GS)),
                "pages_pad": -(-pages_tot_ // WPAGES) * WPAGES,
                "lc": host["lc"],
                "cwp": cwp,
                "nnz": nnz,
                "fill": host["fill"],
            }

    nsg = -(-n // 128)
    ngroups = max(1, -(-nsg // GS))
    pages_tot = max(1, -(-m // 128))
    nwin = -(-pages_tot // WPAGES)
    pages_pad = nwin * WPAGES
    if ngroups > 0xFFFF or nwin > 0x7FFF:
        # the packed SMEM scalar holds (wblock << 16 | group)
        raise ValueError(
            f"matrix too large for PET metadata packing: "
            f"{n} rows / {m} cols"
        )

    row = np.repeat(np.arange(n, dtype=np.int64), np.diff(csr.indptr))
    col = csr.indices.astype(np.int64)
    page = col >> 7
    lcol = (col & 127).astype(np.int32)
    sg = row >> 7
    lane = (row & 127).astype(np.int32)
    grp = (sg // GS).astype(np.int64)
    sgr = (sg % GS).astype(np.int32)

    # occurrence rank k of each entry within its (sg, page, lane) cell
    k = np.zeros(nnz, np.int64)
    if nnz:
        key = (sg * pages_pad + page) * 128 + lane
        order = np.argsort(key, kind="stable")
        sk = key[order]
        run_start = np.r_[0, np.flatnonzero(sk[1:] != sk[:-1]) + 1]
        run_id = np.zeros(nnz, np.int64)
        run_id[run_start] = 1
        run_id = np.cumsum(run_id) - 1
        k[order] = np.arange(nnz) - run_start[run_id]

    # slots = distinct (grp, page, k, sg); order entries by slot, page-sorted
    # within each group so chunk sub-windows are contiguous
    order2 = np.lexsort((lane, sgr, k, page, grp))
    g2, p2, k2, s2 = grp[order2], page[order2], k[order2], sgr[order2]
    if nnz:
        new_slot = np.r_[
            True,
            (g2[1:] != g2[:-1]) | (p2[1:] != p2[:-1])
            | (k2[1:] != k2[:-1]) | (s2[1:] != s2[:-1]),
        ]
        slot_of_entry = np.cumsum(new_slot) - 1
        n_slots = int(slot_of_entry[-1]) + 1
        slot_first = np.flatnonzero(new_slot)
        slot_grp = g2[slot_first]
        slot_page = p2[slot_first]
        slot_sgr = s2[slot_first]
    else:
        n_slots = 0
        slot_of_entry = np.zeros(0, np.int64)
        slot_grp = slot_page = np.zeros(0, np.int64)
        slot_sgr = np.zeros(0, np.int32)

    if lc is None:
        # chunk size: large chunks amortize fixed per-step costs (scattered
        # matrices with many slots per group), small chunks avoid tail
        # padding when groups are slot-poor (measured crossover ~1.5*LC)
        lc = 512 if n_slots >= 384 * ngroups else 256
    if cwp is None:
        cwp = choose_cwp(csr)
    (
        slot_chunk, slot_pos, slot_wid, slot_cbase,
        chunk_grp, chunk_wblk, chunk_cb0, chunk_cb1,
    ) = _schedule_slots(slot_grp, slot_page, ngroups, lc, cwp=cwp)
    nchunks_data = len(chunk_grp)

    # groups with no entries still need one (zero) chunk so their output
    # tile gets zero-initialised
    have = np.zeros(ngroups, bool)
    if nchunks_data:
        have[chunk_grp] = True
    extra_grps = np.flatnonzero(~have)
    nchunks = max(nchunks_data + len(extra_grps), 1)

    # index-map scalars live in SMEM (1 MB budget) -- pack (wblock, group)
    # into one int32 per chunk; the remaining per-chunk words stream through
    # VMEM alongside the entry tiles
    meta = np.zeros(nchunks, np.int32)
    # (nchunks*8, 128) so the streamed block (8, 128) meets the int32
    # sublane tiling constraint; row 0 holds [first, cbase0, cbase1],
    # rows 1..LC/128 hold the per-slot descriptor words lane-major
    # (row 1 + i, lane j = slot i*128 + j)
    meta_v = np.zeros((nchunks, 8, 128), np.int32)
    if nchunks_data:
        meta[:nchunks_data] = (chunk_wblk.astype(np.int32) << 16) | (
            chunk_grp.astype(np.int32)
        )
        meta_v[:nchunks_data, 0, 0] = np.r_[
            True, chunk_grp[1:] != chunk_grp[:-1]
        ]
        meta_v[:nchunks_data, 0, 1] = chunk_cb0 - chunk_wblk * WPAGES
        meta_v[:nchunks_data, 0, 2] = chunk_cb1 - chunk_wblk * WPAGES
    if len(extra_grps):
        meta[nchunks_data:] = extra_grps.astype(np.int32)
        meta_v[nchunks_data:, 0, 0] = 1

    ent = np.zeros((nchunks * lc, 128), np.int8)
    dat = np.zeros((nchunks * lc, 128), dtype)
    if n_slots:
        prel = (slot_page - slot_cbase).astype(np.int32)
        desc = (
            (slot_sgr.astype(np.int32) << 7)
            | (slot_wid.astype(np.int32) << 6)
            | prel
        )
        meta_v[
            slot_chunk, 1 + slot_pos // 128, slot_pos % 128
        ] = desc
        srow = slot_chunk * lc + slot_pos
        erow = srow[slot_of_entry]
        elane = lane[order2]
        ent[erow, elane] = lcol[order2].astype(np.int8)
        dat[erow, elane] = csr.data[order2]
    meta_v = meta_v.reshape(nchunks * 8, 128)

    fill = nnz / float(nchunks * lc * 128)
    conv = jnp.asarray if to_device else (lambda a: a)
    dat_dev = conv(dat)
    if data_dtype is not None:
        dat_dev = dat_dev.astype(data_dtype)
    return {
        "ent": conv(ent),
        "dat": dat_dev,
        "meta": conv(meta),
        "meta_v": conv(meta_v),
        "shape": (n, m),
        "nchunks": nchunks,
        "ngroups": ngroups,
        "pages_pad": pages_pad,
        "lc": lc,
        "cwp": cwp,
        "nnz": nnz,
        "fill": fill,
    }


def _select_dot(oh, x, transpose_lhs=False):
    """One-hot selection/routing matmul with EXACT f32 values in 3 bf16
    MXU passes.

    The one-hot operand is 0/1 — exactly representable in bf16 — so only
    ``x`` needs splitting: ``x = s1 + s2 + s3`` with each ``s_i`` bf16
    (8 mantissa bits x 3 covers f32's 24) and the residuals exactly
    representable (Dekker-style).  Each default-precision bf16 pass
    accumulates in f32, and a one-hot row selects a single ``s_i`` term,
    so the sum reproduces the f32 input bit-for-bit.  Measured ~1.4x the
    ``precision=HIGHEST`` f32 emulation on v5e (which also splits the
    one-hot side redundantly).
    """
    oh16 = oh.astype(jnp.bfloat16)
    dims = (
        (((0,), (0,)), ((), ())) if transpose_lhs
        else (((1,), (0,)), ((), ()))
    )
    if x.dtype == jnp.bfloat16:
        # bf16 operand: already exactly representable — ONE unsplit pass
        # (the data_dtype=bfloat16 kernel mode)
        return lax.dot_general(
            oh16, x, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
    s1 = x.astype(jnp.bfloat16)
    r1 = x - s1.astype(jnp.float32)
    s2 = r1.astype(jnp.bfloat16)
    s3 = (r1 - s2.astype(jnp.float32)).astype(jnp.bfloat16)
    out = None
    for s in (s1, s2, s3):
        p = lax.dot_general(
            oh16, s, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        out = p if out is None else out + p
    return out


def _select_tab_stacked(oh_lanes, x):
    """Page-selection table in ONE deep MXU contraction, exact in f32.

    ``oh_lanes``: (2*CWP, LC) 0/1 — the per-half one-hots concatenated
    along lanes (output slots).  ``x``: (2*CWP, W) f32 window rows.
    Equivalent to running :func:`_select_dot`'s three bf16 passes per
    128-slot half, but the three Dekker splits AND all ``lc/128`` halves
    fuse into a single ``(3*2*CWP) = 192``-deep contraction: the MXU is
    depth-128-native, so the separate 64-deep passes ran at <=50%
    utilization and — being the only k-scaled matmul — capped the SpMM
    amortization at ~2.2x (measured ablation: the tab build was 1.05 ms
    of a 1.5 ms k=8 call while the lane-gathers cost 0.09 ms).  Fused:
    ~2.6x less tab time, same bits (each product selects exactly one
    split term; s1+s2+s3 reconstructs the f32 value exactly in any
    association, zero terms contribute nothing)."""
    oh16 = oh_lanes.astype(jnp.bfloat16)
    if x.dtype == jnp.bfloat16:
        # bf16 window: exact as-is — the 192-deep stack collapses to ONE
        # 2*CWP-deep pass (the data_dtype=bfloat16 kernel mode)
        return lax.dot_general(
            oh16, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    s1 = x.astype(jnp.bfloat16)
    r1 = x - s1.astype(jnp.float32)
    s2 = r1.astype(jnp.bfloat16)
    s3 = (r1 - s2.astype(jnp.float32)).astype(jnp.bfloat16)
    lhs = jnp.concatenate([oh16, oh16, oh16], axis=0)   # (3*2CWP, LC)
    rhs = jnp.concatenate([s1, s2, s3], axis=0)         # (3*2CWP, W)
    return lax.dot_general(
        lhs, rhs, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (LC, W)


def _pet_kernel(meta_ref, mv_ref, ent_ref, dat_ref, xw_ref, o_ref, *, lc,
                cwp=CWP):
    @pl.when(mv_ref[0, 0] == 1)
    def _():
        o_ref[:, :] = jnp.zeros_like(o_ref)

    mv = mv_ref[:, :]                                       # (8, 128) int32
    cb0 = pl.multiple_of(mv_ref[0, 1], 8)
    cb1 = pl.multiple_of(mv_ref[0, 2], 8)
    xs0 = xw_ref[pl.ds(cb0, cwp), :]                        # (cwp, 128)
    xs1 = xw_ref[pl.ds(cb1, cwp), :]
    xs = jnp.concatenate([xs0, xs1], axis=0)                # (2*cwp, 128)
    # bf16 operator data opts the whole kernel into low precision: the
    # products carry bf16-level error regardless, so the page-selection
    # table and the output routing each run as ONE unsplit bf16 pass
    # instead of the 3-way Dekker stack (pairs with solvers.refine for
    # f32-accurate answers at bf16 streaming cost)
    lowp = dat_ref.dtype == jnp.bfloat16
    if lowp:
        xs = xs.astype(jnp.bfloat16)

    # All one-hots are built LANE-MAJOR straight from the metadata rows (no
    # transpose: Mosaic relayouts of small int tiles cost ~15% of the whole
    # kernel).  The page table per 128-slot half comes out of a transposed
    # contraction: tab_half[l, j] = sum_q ohT[q, l] * xs[q, j], computed
    # by _select_dot (exact selection, 3 bf16 MXU passes).
    iota_q = lax.broadcasted_iota(jnp.int32, (2 * cwp, 128), 0)
    iota_s = lax.broadcasted_iota(jnp.int32, (GS, 128), 0)
    oh_halves, ohs_halves = [], []
    for i in range(lc // 128):
        drow = mv[1 + i : 2 + i, :]                         # (1, 128)
        pw = (drow & (cwp - 1)) + ((drow >> 6) & 1) * cwp
        oh_halves.append((pw == iota_q).astype(xs.dtype))   # (2*cwp, 128)
        ohs_halves.append((drow >> 7) == iota_s)
    oh_lanes = (
        jnp.concatenate(oh_halves, axis=1) if lc > 128 else oh_halves[0]
    )                                                       # (2*CWP, LC)
    tab = _select_tab_stacked(oh_lanes, xs)                 # (LC, 128)
    onehot_s = (
        jnp.concatenate(ohs_halves, axis=1) if lc > 128 else ohs_halves[0]
    )                                                       # (GS, LC)

    lcol = ent_ref[:, :].astype(jnp.int32)                  # (LC, 128)
    vals = jnp.take_along_axis(tab, lcol, axis=1)           # (LC, 128)
    contrib = dat_ref[:, :].astype(vals.dtype) * vals
    if lowp:
        contrib = contrib.astype(jnp.bfloat16)  # single-pass routing

    o_ref[:, :] += _select_dot(
        onehot_s.astype(jnp.float32 if lowp else contrib.dtype), contrib
    )


@functools.partial(
    jax.jit,
    static_argnames=("nchunks", "ngroups", "pages_pad", "lc", "cwp",
                     "interpret"),
)
def _pet_matvec_padded(
    ent, dat, meta, meta_v, x_pad2d, *, nchunks, ngroups, pages_pad, lc,
    interpret, cwp=CWP,
):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda t, m: (t, 0)),
            pl.BlockSpec((lc, 128), lambda t, m: (t, 0)),
            pl.BlockSpec((lc, 128), lambda t, m: (t, 0)),
            pl.BlockSpec((WPAGES, 128), lambda t, m: (m[t] >> 16, 0)),
        ],
        out_specs=pl.BlockSpec((GS, 128), lambda t, m: (m[t] & 0xFFFF, 0)),
    )
    return pl.pallas_call(
        functools.partial(_pet_kernel, lc=lc, cwp=cwp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ngroups * GS, 128), jnp.float32),
        interpret=interpret,
    )(meta, meta_v, ent, dat, x_pad2d)


def _pet_spmm_kernel(meta_ref, mv_ref, ent_ref, dat_ref, xw_ref, o_ref,
                     *, lc, k, cwp=CWP):
    """Multi-RHS (SpMM) variant of :func:`_pet_kernel`.

    The reference's core selling point #4 is blocked multi-RHS everywhere
    (reference: src/krylov/_helpers.py:101-110).  Here the PET metadata —
    the format's whole streaming cost — is decoded ONCE per chunk and
    amortized over all ``k`` right-hand sides.

    The RHS block is laid out **column-in-lane-major**: ``xw`` has
    ``k * 128`` lanes where lane ``c*128 + j`` holds column ``c``'s value
    at in-page position ``j``.  With that layout the window slice, the
    one-hot page-table contraction ``(2*CWP, k*128)`` and the output
    routing ``(GS, k*128)`` are each ONE wide MXU op shared by all
    columns; only the hardware lane-gather runs per column, on
    tile-aligned slices of the wide table (its table must be 128 lanes).

    Streamed metadata bytes per chunk are identical to the matvec kernel;
    MXU work scales with k (inherent — every column's values must be
    selected).
    """
    @pl.when(mv_ref[0, 0] == 1)
    def _():
        o_ref[:, :] = jnp.zeros_like(o_ref)

    mv = mv_ref[:, :]                                   # (8, 128) int32
    # _schedule_slots aligns every sub-window base to 8 pages; the hint
    # lets Mosaic prove the sublane alignment of the wide dynamic load
    cb0 = pl.multiple_of(mv_ref[0, 1], 8)
    cb1 = pl.multiple_of(mv_ref[0, 2], 8)
    xs0 = xw_ref[pl.ds(cb0, cwp), :]                    # (cwp, k*128)
    xs1 = xw_ref[pl.ds(cb1, cwp), :]
    xs = jnp.concatenate([xs0, xs1], axis=0)            # (2*cwp, k*128)
    lowp = dat_ref.dtype == jnp.bfloat16  # see _pet_kernel
    if lowp:
        xs = xs.astype(jnp.bfloat16)

    iota_q = lax.broadcasted_iota(jnp.int32, (2 * cwp, 128), 0)
    iota_s = lax.broadcasted_iota(jnp.int32, (GS, 128), 0)
    oh_halves, ohs_halves = [], []
    for i in range(lc // 128):
        drow = mv[1 + i : 2 + i, :]                     # (1, 128)
        pw = (drow & (cwp - 1)) + ((drow >> 6) & 1) * cwp
        oh_halves.append((pw == iota_q).astype(xs.dtype))
        ohs_halves.append((drow >> 7) == iota_s)
    oh_lanes = (
        jnp.concatenate(oh_halves, axis=1) if lc > 128 else oh_halves[0]
    )                                                   # (2*CWP, LC)
    # ONE deep exact-selection contraction shared by all k columns —
    # the k-scaled matmul that previously capped amortization at ~2.2x
    tab = _select_tab_stacked(oh_lanes, xs)             # (LC, k*128)
    onehot_s = (
        jnp.concatenate(ohs_halves, axis=1) if lc > 128 else ohs_halves[0]
    )                                                   # (GS, LC)

    lcol = ent_ref[:, :].astype(jnp.int32)              # (LC, 128)
    dat = dat_ref[:, :]
    contrib_cols = []
    for c in range(k):
        # the gather table must be 128 lanes: slice column c's lane tile
        vals = jnp.take_along_axis(
            lax.slice(tab, (0, c * 128), (lc, (c + 1) * 128)), lcol, axis=1
        )
        contrib_cols.append(dat.astype(vals.dtype) * vals)
    contrib = jnp.concatenate(contrib_cols, axis=1)     # (LC, k*128)
    if lowp:
        contrib = contrib.astype(jnp.bfloat16)  # single-pass routing

    o_ref[:, :] += _select_dot(
        onehot_s.astype(jnp.float32 if lowp else contrib.dtype), contrib
    )                                                   # (GS, k*128)


@functools.partial(
    jax.jit,
    static_argnames=("nchunks", "ngroups", "pages_pad", "lc", "k", "cwp",
                     "interpret"),
)
def _pet_matmat_padded(
    ent, dat, meta, meta_v, x_wide, *, nchunks, ngroups, pages_pad, lc, k,
    interpret, cwp=CWP,
):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda t, m: (t, 0)),
            pl.BlockSpec((lc, 128), lambda t, m: (t, 0)),
            pl.BlockSpec((lc, 128), lambda t, m: (t, 0)),
            pl.BlockSpec((WPAGES, k * 128), lambda t, m: (m[t] >> 16, 0)),
        ],
        out_specs=pl.BlockSpec(
            (GS, k * 128), lambda t, m: (m[t] & 0xFFFF, 0)
        ),
    )
    return pl.pallas_call(
        functools.partial(_pet_spmm_kernel, lc=lc, k=k, cwp=cwp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (ngroups * GS, k * 128), jnp.float32
        ),
        interpret=interpret,
    )(meta, meta_v, ent, dat, x_wide)


# columns per SpMM kernel pass: bounds the x-window VMEM footprint
# (2 pipeline buffers x k x 128 KB) while amortizing the metadata stream
# and the (k-scaled but per-pass-fixed-cost) page-select contraction
PET_SPMM_MAX_COLS = 16


def pet_matmat(pet, x2, interpret=None, max_cols=PET_SPMM_MAX_COLS):
    """Y = A @ X with A in PET form; X of shape ``(shape[1], k)``.

    Columns are processed ``max_cols`` per kernel pass; each pass streams
    the chunk metadata once for its whole column block.
    """
    n, m = pet["shape"]
    if interpret is None:
        interpret = not _on_tpu()
    pages_pad = pet["pages_pad"]
    outs = []
    for c0 in range(0, x2.shape[1], max_cols):
        blk = x2[:, c0 : c0 + max_cols].astype(jnp.float32)
        kb = blk.shape[1]
        # column-in-lane-major: x_wide[p, c*128 + j] = x[p*128 + j, c]
        xp = jnp.pad(blk, ((0, pages_pad * 128 - m), (0, 0)))
        x_wide = (
            xp.reshape(pages_pad, 128, kb)
            .transpose(0, 2, 1)
            .reshape(pages_pad, kb * 128)
        )
        y = _pet_matmat_padded(
            pet["ent"], pet["dat"], pet["meta"], pet["meta_v"], x_wide,
            nchunks=pet["nchunks"], ngroups=pet["ngroups"],
            pages_pad=pages_pad, lc=pet.get("lc", LC), k=kb,
            cwp=pet.get("cwp", CWP), interpret=interpret,
        )
        rows = y.shape[0]
        outs.append(
            y.reshape(rows, kb, 128)
            .transpose(0, 2, 1)
            .reshape(rows * 128, kb)[:n]
        )
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _on_tpu():
    return jax.default_backend() == "tpu"


def rcm_permutation(sp):
    """Symmetric reverse-Cuthill–McKee ordering of ``sp``'s pattern.

    Returns the row/column permutation ``perm`` minimizing (greedily) the
    bandwidth of ``sp[perm][:, perm]``.  PET fill is bounded by how many
    distinct 128-wide x pages each 128-row subgroup touches, so a
    bandwidth-reducing symmetric permutation is THE fill lever for badly
    ordered matrices: measured 31x fill on a randomly permuted banded
    matrix (0.009 -> 0.266) and 147x on a scrambled 2-D Poisson
    (0.002 -> 0.359), while already-ordered matrices are unchanged
    (docs/design.md, PET section).
    """
    import scipy.sparse
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    csr = scipy.sparse.csr_matrix(sp)
    pattern = (csr + csr.T).tocsr()
    return np.asarray(
        reverse_cuthill_mckee(pattern, symmetric_mode=True), dtype=np.int64
    )


def invert_permutation(perm):
    """Inverse of an index permutation: ``inv[perm[i]] = i``."""
    perm = np.asarray(perm)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return inv


def resolve_reorder(sp, reorder, metric="fill"):
    """Resolve a reorder spec to a permutation, or None to keep order.

    ``reorder``: ``"rcm"`` (always reorder), ``"auto"`` (reorder only when
    it pays — by sampled PET fill for ``metric="fill"`` (< 0.15 and RCM
    gains >= 2x), by matrix bandwidth for ``metric="bandwidth"`` (RCM at
    least halves it)), or an explicit index array.  Raises up front for
    rectangular matrices with a symmetric-reorder request; never
    materializes the permuted matrix (callers permute once, if at all).
    """
    import scipy.sparse

    if reorder is None:
        return None
    if isinstance(reorder, str) and sp.shape[0] != sp.shape[1]:
        raise ValueError(
            "reorder= needs a square matrix (symmetric permutation)"
        )
    if isinstance(reorder, str):
        if reorder == "rcm":
            return rcm_permutation(sp)
        if reorder != "auto":
            raise ValueError(f"unknown reorder mode {reorder!r}")
        csr = scipy.sparse.csr_matrix(sp)
        if metric == "fill":
            f0 = estimate_pet_fill(csr)
            if f0 >= 0.15:
                return None
            cand = rcm_permutation(csr)
            return cand if estimate_pet_fill(csr, cand) >= 2.0 * f0 else None
        # bandwidth: compute both without materializing the permutation
        counts = np.diff(csr.indptr)
        rows = np.repeat(np.arange(csr.shape[0]), counts)
        if rows.size == 0:
            return None
        bw0 = int(np.abs(csr.indices - rows).max())
        cand = rcm_permutation(csr)
        inv = invert_permutation(cand)
        bw1 = int(np.abs(inv[csr.indices] - inv[rows]).max())
        return cand if 2 * bw1 <= bw0 else None
    perm = np.asarray(reorder, np.int64)
    if sp.shape[0] != sp.shape[1]:
        raise ValueError(
            "reorder= needs a square matrix (symmetric permutation)"
        )
    return perm


def estimate_pet_fill(sp, perm=None, n_sample=64, seed=0):
    """Estimate PET fill of (a symmetric reordering of) ``sp`` cheaply.

    Counts the exact slot demand — sum over pages of the max-per-lane
    occurrence count — on a random sample of 128-row subgroups, without
    running the full O(nnz log nnz) build.  Chunk quantization makes the
    true fill slightly lower; the estimate is for routing decisions
    (``reorder="auto"``), not reporting.
    """
    import scipy.sparse

    csr = scipy.sparse.csr_matrix(sp)
    n = csr.shape[0]
    nsg = max(1, -(-n // 128))
    rng = np.random.default_rng(seed)
    sgs = (
        np.arange(nsg)
        if nsg <= n_sample
        else np.sort(rng.choice(nsg, n_sample, replace=False))
    )
    indptr = csr.indptr.astype(np.int64)
    indices = csr.indices.astype(np.int64)
    inv = None
    if perm is not None:
        perm = np.asarray(perm, np.int64)
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
    slots = 0
    nnz_s = 0
    for sg in sgs:
        r0, r1 = sg * 128, min((sg + 1) * 128, n)
        rows = np.arange(r0, r1)
        src = perm[rows] if perm is not None else rows
        cnt = indptr[src + 1] - indptr[src]
        if cnt.sum() == 0:
            continue
        lanes = np.repeat(rows - r0, cnt)
        cols = np.concatenate(
            [indices[indptr[s] : indptr[s + 1]] for s in src]
        )
        if inv is not None:
            cols = inv[cols]
        key = (cols >> 7) * 128 + lanes
        uk, c = np.unique(key, return_counts=True)
        pg = uk // 128
        order = np.argsort(pg, kind="stable")
        pgs, cs = pg[order], c[order]
        starts = np.flatnonzero(np.r_[True, pgs[1:] != pgs[:-1]])
        slots += int(np.maximum.reduceat(cs, starts).sum())
        nnz_s += int(cnt.sum())
    return nnz_s / max(1, slots * 128)


def pet_matvec(pet, x, interpret=None):
    """y = A @ x with A in PET form; x 1-D of length shape[1]."""
    n, m = pet["shape"]
    if interpret is None:
        interpret = not _on_tpu()
    pages_pad = pet["pages_pad"]
    xf = x.astype(jnp.float32)
    x_pad = jnp.pad(xf, (0, pages_pad * 128 - m))
    y = _pet_matvec_padded(
        pet["ent"], pet["dat"], pet["meta"], pet["meta_v"],
        x_pad.reshape(pages_pad, 128),
        nchunks=pet["nchunks"], ngroups=pet["ngroups"],
        pages_pad=pages_pad, lc=pet.get("lc", LC),
        cwp=pet.get("cwp", CWP), interpret=interpret,
    )
    return y.reshape(-1)[:n]


@register_pytree_node_class
class PETOperator:
    """General-sparsity operator backed by the Pallas PET SpMV kernel.

    Built host-side from a scipy sparse matrix (one-time cost); ``rmatvec``
    uses a second PET of the conjugate transpose.  f32 only -- f64 parity
    runs use :class:`krylov_tpu.ops.sparse.CSROperator` on CPU.  Resolves
    SURVEY.md §7 stage 6 / the BASELINE SpMV north star for irregular
    sparsity (reference consumes scipy CSR implicitly,
    reference: tests/test_solvers.py:199-209).
    """

    def __init__(self, pet, pet_t, diag, shape, interpret=None, sp=None,
                 data_dtype=None, perm=None, inv_perm=None):
        self._pet = pet
        self._pet_t = pet_t
        self._diag = diag
        self.shape = tuple(shape)
        self._interpret = interpret
        # host handle for lazy adjoint builds: a zero-arg callable
        # returning the scipy matrix (or None when it is gone), so a
        # route-cached operator does not strongly hold the USER's matrix
        # alive — that strong chain would defeat the cache's weakref
        # eviction and leak one O(nnz) entry per time-step matrix
        self._sp = sp
        self._data_dtype = data_dtype
        # symmetric reordering: the PET holds B = A[perm][:, perm]; the
        # matvec gathers x into B's order and scatters y back, so callers
        # see user-order semantics (inner products / solvers unaffected)
        self._perm = perm
        self._inv_perm = inv_perm

    @classmethod
    def from_scipy(cls, sp, with_rmatvec=True, interpret=None,
                   data_dtype=None, reorder=None, to_device=True):
        """``with_rmatvec``: True builds the adjoint PET now, "lazy" defers
        it to the first ``rmatvec`` call (keeping a host-side WEAK handle
        to the scipy matrix — the caller must keep the matrix alive until
        the adjoint is first needed, or use True), False disables the
        adjoint.

        ``reorder``: ``"rcm"`` builds the PET of the symmetric
        reverse-Cuthill–McKee reordering (31-147x fill on badly ordered
        matrices — see :func:`rcm_permutation`), ``"auto"`` samples the
        fill of both orders (:func:`estimate_pet_fill`) and reorders only
        when it pays >=2x, an explicit index array uses that permutation,
        ``None`` keeps the user order.  The reordering is internal: two
        O(N) gathers per matvec keep the operator's user-order contract.
        """
        import scipy.sparse

        conv = jnp.asarray if to_device else np.asarray
        perm_np = resolve_reorder(sp, reorder, metric="fill")
        sp_build = sp
        perm = inv_perm = None
        if perm_np is not None:
            csr = scipy.sparse.csr_matrix(sp)
            sp_build = csr[perm_np][:, perm_np].tocsr()
            perm = conv(np.asarray(perm_np, np.int32))
            inv_perm = conv(
                np.asarray(invert_permutation(perm_np), np.int32)
            )

        pet = build_pet(sp_build, data_dtype=data_dtype,
                        to_device=to_device)
        pet_t = (
            build_pet(sp_build.T.conj().tocsr(), data_dtype=data_dtype,
                      to_device=to_device)
            if with_rmatvec is True
            else None
        )
        # diagonal in USER order (permutation-independent observable)
        diag = conv(
            np.asarray(sp.tocsr().diagonal(), dtype=np.float32)
        )
        sp_handle = None
        if with_rmatvec == "lazy":
            if sp_build is sp:
                # the handle targets the USER's matrix: keep only a
                # weakref so a route-cached operator never extends its
                # lifetime (that strong chain would defeat the cache's
                # weakref eviction and leak per-time-step matrices)
                import weakref

                sp_handle = weakref.ref(sp_build)
            else:
                # we own the permuted copy; hold it strongly
                sp_handle = (lambda _ref=sp_build: _ref)
        return cls(
            pet, pet_t, diag, sp.shape, interpret,
            sp=sp_handle,
            data_dtype=data_dtype, perm=perm, inv_perm=inv_perm,
        )

    @property
    def dtype(self):
        return self._pet["dat"].dtype

    @property
    def nnz(self):
        return self._pet["nnz"]

    @property
    def fill(self):
        """True-nnz fraction of the streamed slot-lanes (1.0 = no padding)."""
        return self._pet["fill"]

    def _apply(self, pet, x):
        if self._perm is not None:
            x = jnp.take(x, self._perm, axis=0)
        if x.ndim == 1:
            y = pet_matvec(pet, x, self._interpret)
        else:
            # blocked multi-RHS: the SpMM kernel amortizes the index/
            # metadata stream over up to PET_SPMM_MAX_COLS columns per pass
            y = pet_matmat(pet, x, self._interpret)
        if self._inv_perm is not None:
            y = jnp.take(y, self._inv_perm, axis=0)
        return y

    def __matmul__(self, x):
        return self._apply(self._pet, x)

    matvec = __matmul__

    def ensure_adjoint(self):
        """Materialize the adjoint PET now (host-side, once).

        Two-sided solvers call this before tracing: after a pytree
        boundary (jit argument) the host scipy handle is gone and a lazy
        adjoint can no longer be built.
        """
        if self._pet_t is None and self._sp is not None:
            spb = self._sp()  # weakref or strong-closure handle
            if spb is not None:
                self._pet_t = build_pet(
                    spb.T.conj().tocsr(), data_dtype=self._data_dtype
                )
        return self

    def rmatvec(self, x):
        self.ensure_adjoint()
        if self._pet_t is None:
            raise ValueError(
                "PETOperator has no adjoint here: construct with "
                "with_rmatvec=True, or call .ensure_adjoint() before "
                "passing a with_rmatvec='lazy' operator across a "
                "jit/pytree boundary (the host scipy handle does not "
                "survive flattening, nor garbage collection of the "
                "source matrix)"
            )
        return self._apply(self._pet_t, x)

    def diagonal(self):
        return self._diag

    _ARR = ("ent", "dat", "meta", "meta_v")

    # diffable.solve: the pytree leaves are FORMAT arrays (slot values /
    # int8 column indices / metadata), and the Pallas kernel has no JVP —
    # parameter cotangents are declined; gradients flow through b
    params_differentiable = False

    def tree_flatten(self):
        # The host-side scipy handle (`with_rmatvec="lazy"`) cannot cross
        # a pytree boundary; laziness is PRESERVED — flattening must not
        # spend an O(nnz) adjoint build + device memory that CG/GMRES
        # never use.  Solvers that need the adjoint call ensure_adjoint()
        # before tracing (solvers/_common.setup); a flattened copy whose
        # adjoint was never built raises a targeted error from rmatvec.
        pt = self._pet_t
        children = (
            tuple(self._pet[k] for k in self._ARR)
            + (tuple(pt[k] for k in self._ARR) if pt else (None,) * 4)
            + (self._diag, self._perm, self._inv_perm)
        )
        aux = (
            {k: v for k, v in self._pet.items() if k not in self._ARR},
            {k: v for k, v in pt.items() if k not in self._ARR} if pt else None,
            self.shape,
            self._interpret,
            self._data_dtype,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        pet_aux, pett_aux, shape, interpret, data_dtype = aux
        pet = dict(pet_aux, **dict(zip(cls._ARR, children[0:4])))
        pet_t = (
            dict(pett_aux, **dict(zip(cls._ARR, children[4:8])))
            if pett_aux is not None
            else None
        )
        return cls(
            pet, pet_t, children[8], shape, interpret, data_dtype=data_dtype,
            perm=children[9], inv_perm=children[10],
        )
