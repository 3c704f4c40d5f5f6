"""Segmented whole-tree kernels: big-taxa trees in O(#segments) dispatches.

The fused tree kernels (ops/plf_tree_pallas.py) hold the entire
traversal's CLV arena in VMEM — ideal until the arena (which preloads
every tip) outgrows the ~10 MiB budget (≈1200 DNA taxa at block 128, far
fewer at useful block sizes).  The reference's own scaling mechanism is
splitting work into independent accelerator instances
(/root/reference/app/src/include.h:181-195); the TPU-native analogue on
the *tree* dimension is subtree segmentation:

* the (reordered) post-order schedule is contracted bottom-up into
  SEGMENTS — each a subtree with at most ``cap_ops`` PLF nodes whose
  leaf-level inputs are tips or the roots of earlier segments
  ("boundary" CLVs);
* the forward pass runs ONE register-machine Pallas dispatch per
  segment: tips expand in VMEM from int32 codes, boundary CLVs stream
  in from HBM, every node CLV lives in the segment's VMEM arena, and
  only the segment root(s) are written back to HBM.  HBM CLV traffic is
  O(#boundaries · sites) instead of the per-node path's O(E · sites);
* the backward pass (``make_tree_diff_segmented``) checkpoints ONLY the
  boundary CLVs (they are the forward's chaining values, so they cost
  nothing extra): each segment's backward recomputes its interior CLVs
  in the arena, reverse-sweeps to per-edge operator gradients, and
  emits the adjoints of its boundary inputs to seed earlier segments —
  VJP residuals are O(#segments · sites), the subtree-segmented
  generalisation of ops/plf_tree_grad.py's single-segment arena.

Segmentation invariant (binary trees): a segment with k nodes has
exactly k+1 inputs (tips + boundaries) and one root, so the arena needs
2k+2 slots; every node has exactly one parent, so each boundary CLV is
produced by one segment and consumed by exactly one later segment — no
adjoint accumulation across segments is ever needed.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..reference import TWO_TO_THE_32
from .plf_grad import _stage, resolve_op_grad, transpose_lane_constants
from .plf_pallas import make_mxu_bwd_ops, make_mxu_dots
from .plf_tree_pallas import (ARENA_VMEM_BUDGET, _expand_tip, _plf_node,
                              _plf_node_mxu, fit_block_sites)

#: VMEM budget for the segmented kernels' scratch (slightly above the
#: single-arena kernels' 10 MiB: the segmented planner's accounting is
#: exact — doubled boundary region, staging, fac/codes slots, and the
#: backward's six double-buffered operator stacks are all counted — so
#: the budget can sit closer to the ~16 MiB Mosaic scoped-VMEM limit;
#: 12 MiB keeps S=20 plans at block 1024, measured Mosaic-accepted and
#: ~equal-speed to 13 MiB on HW, r05_slope.txt).
SEG_VMEM_BUDGET = 12 * 2 ** 20

__all__ = ["plan_segments", "SegPlan", "Segment", "plf_tree_segmented",
           "make_tree_diff_segmented"]


def _pipeline_default() -> bool:
    """Manual-DMA prefetch on/off for the FORWARD kernel
    (PLF_SEG_PIPELINE=0 disables; the serial flow issues+waits every
    copy inline — the bisect control).  Measured +1.7x on the DNA
    forward (r05 slope protocol)."""
    return os.environ.get("PLF_SEG_PIPELINE", "1") != "0"


def _pipeline_bwd_default() -> bool:
    """Manual-DMA prefetch on/off for the BACKWARD kernel — default
    OFF: unlike the forward (+1.7x), prefetch buys the backward nothing
    measurable at steady state (DNA 160x1.05M value_and_grad 186.3 ms
    pipelined vs 186.6 serial, same-process interleaved A/B — the
    backward is recompute-heavy, phase 1 plus a ~3x reverse sweep, so
    its DMA latency hides behind compute either way), and the serial
    flow is the simpler/bisectable one.  Single-shot orderings that
    suggested otherwise were the fresh-process warm-up transient
    (benchmarks/r05_interleave.py docstring).  PLF_SEG_PIPELINE_BWD=1
    re-enables for A/B measurement."""
    return os.environ.get("PLF_SEG_PIPELINE_BWD", "0") == "1"


@dataclasses.dataclass(frozen=True)
class Segment:
    """One contracted subtree, padded to the plan's uniform shape.

    Unified arena coordinates: slots [0, SEG_TIPS) hold expanded tips,
    [SEG_TIPS, SEG_TIPS+SEG_BND) boundary-input CLVs, then one slot per
    op (op j writes slot SEG_TIPS+SEG_BND+j).  Kernel loops run to the
    REAL counts (n_tips/n_bnd_in/n_ops), so padded entries are never
    read — ``ovalid``/``out_slots`` survive only for plan introspection
    and tests (the direct-DMA kernels export the root via
    ``root_slot``/``bnd_out_ids``).
    """

    tip_ids: np.ndarray      # (SEG_TIPS,) global leaf rows (pad: 0)
    n_tips: int
    bnd_in_ids: np.ndarray   # (SEG_BND,) global boundary ids (pad: 0)
    n_bnd_in: int
    lsrc: np.ndarray         # (SEG_OPS,) unified arena coords
    rsrc: np.ndarray
    ovalid: np.ndarray       # (SEG_OPS,) 1 = real op, 0 = padding
    opos: np.ndarray         # (SEG_OPS,) reordered-schedule positions
    n_ops: int
    out_slots: np.ndarray    # (SEG_OUT,) arena slots of exports
    bnd_out_ids: np.ndarray  # (SEG_OUT,) global boundary ids of exports
    n_bnd_out: int
    root_slot: int           # arena slot of the segment root


@dataclasses.dataclass(frozen=True)
class SegPlan:
    segments: Tuple[Segment, ...]
    n_leaves: int
    n_edges: int
    n_boundaries: int
    seg_tips: int
    seg_bnd: int
    seg_ops: int
    seg_out: int
    block_sites: int

    @property
    def arena_slots(self) -> int:
        return self.seg_tips + self.seg_bnd + self.seg_ops


def plan_segments(schedule: Sequence[Tuple], n_leaves: int, *, rows: int,
                  block_sites: int,
                  cap_ops: Optional[int] = None,
                  vmem_budget: int = SEG_VMEM_BUDGET,
                  op_width: int = 0) -> SegPlan:
    """Contract a reordered schedule into uniform-shape segments.

    ``schedule``: reorder_schedule output; operators are indexed by
    schedule POSITION (as in ops/plf_tree_grad.make_tree_diff).

    Bottom-up contraction: walking the post-order schedule, each node
    accumulates the not-yet-emitted entries of its subtree; once that
    reaches the threshold (or the root), the pending subtree becomes a
    segment and the node a boundary.  Each segment is a subtree — k ops,
    k+1 inputs, 1 root — so boundary count ≈ E / threshold, minimising
    the O(#boundaries · sites) HBM checkpoint footprint.

    ``cap_ops``/``block_sites`` auto-tune: the arena (tips + boundary
    inputs + one slot per op + dummy) plus the boundary I/O blocks must
    fit ``vmem_budget`` at the chosen block.  ``op_width`` adds the
    per-op operator-stack footprint to the budget (W = rows for the MXU
    block-matrix variants — 6 stacks of (seg_ops, rows, W) ride VMEM in
    the backward kernel; 0/S is negligible and ignored by default).
    """
    E = len(schedule)
    op_bytes = 6 * rows * op_width * 4     # per-op operator-stack bytes
    if cap_ops is None:
        # Prefer larger site blocks (HBM bandwidth) while keeping
        # segments big enough that boundary checkpoints stay few:
        # slots_needed ≈ 2*cap + 2 (arena) + cap/2-ish I/O; aim
        # cap ≈ slots/3 and pick the largest block giving cap >= 24.
        best = None
        # The minimum worthwhile segment size scales inversely with the
        # row count: boundary-checkpoint traffic per segment is
        # rows-proportional but so is per-op compute, while the BLOCK
        # SIZE sets streaming efficiency for everyone.  At rows=16
        # (DNA) cap>=24 at block 2048 measures near-optimal; at rows=80
        # (protein) block 1024 with cap~10 beats block 256 with cap 29
        # by 1.3x (r04 prot_tune) — so the floor shrinks as rows grow.
        cap_floor = max(4, (24 * 16) // rows)
        for bs in range(block_sites, 127, -128):
            if block_sites % bs:
                continue
            # ~2 arena slots per op (its own slot + one input slot) plus
            # the fac/tip scratch rows
            cap = max(1, (vmem_budget * 2)
                      // (5 * rows * bs * 4 + 2 * op_bytes))
            if cap >= cap_floor or bs == 128:
                best = (bs, min(cap, max(1, E)))
                break
        if best is None:
            raise ValueError("no block size fits the VMEM budget")
        block_sites, cap_ops = best
    return _plan_with_cap(schedule, n_leaves, rows=rows,
                          block_sites=block_sites, cap_ops=cap_ops,
                          vmem_budget=vmem_budget, op_bytes=op_bytes)


def _plan_with_cap(schedule, n_leaves, *, rows, block_sites, cap_ops,
                   vmem_budget, op_bytes=0) -> SegPlan:
    """Build a plan for ``cap_ops``; on VMEM misfit (the cap heuristic
    bounds MEAN segment size, but a pathological tree shape can make one
    segment's tips+boundaries+ops far exceed it) retry with half the
    cap instead of raising — smaller caps always converge because a
    1-op segment's arena is 4 slots."""
    E = len(schedule)
    thresh = max(1, (cap_ops + 1) // 2)

    children = {p: (l, r) for (p, l, r, *_rest) in schedule}

    # ---- contraction ------------------------------------------------------
    pending: Dict[int, List[int]] = {}
    raw_segments: List[Tuple[List[int], int]] = []  # (positions, root node)
    is_boundary: Dict[int, int] = {}                # node -> boundary id
    for i, entry in enumerate(schedule):
        p, l, r = entry[0], entry[1], entry[2]
        ent = pending.pop(l, []) + pending.pop(r, []) + [i]
        if len(ent) >= thresh or i == E - 1:
            raw_segments.append((ent, p))
            if i != E - 1:
                is_boundary[p] = len(is_boundary)
            pending[p] = []
        else:
            pending[p] = ent
    assert not any(pending.get(k) for k in pending), "unemitted entries"
    n_boundaries = len(is_boundary)

    # ---- per-segment arrays ----------------------------------------------
    built = []
    seg_tips = seg_bnd = seg_ops = seg_out = 1
    for ent, root in raw_segments:
        in_seg = {schedule[i][0]: j for j, i in enumerate(ent)}
        tips: List[int] = []
        bnds: List[int] = []
        tip_slot: Dict[int, int] = {}
        bnd_slot: Dict[int, int] = {}
        for i in ent:
            for ch in (schedule[i][1], schedule[i][2]):
                if ch in in_seg:
                    continue
                if ch < n_leaves:
                    if ch not in tip_slot:
                        tip_slot[ch] = len(tips)
                        tips.append(ch)
                else:
                    if ch not in bnd_slot:
                        bnd_slot[ch] = len(bnds)
                        bnds.append(is_boundary[ch])
        outs = [(in_seg[schedule[i][0]], is_boundary[schedule[i][0]])
                for i in ent if schedule[i][0] in is_boundary]
        built.append((ent, root, in_seg, tips, bnds, tip_slot, bnd_slot,
                      outs))
        seg_tips = max(seg_tips, len(tips))
        seg_bnd = max(seg_bnd, len(bnds))
        seg_ops = max(seg_ops, len(ent))
        seg_out = max(seg_out, len(outs))

    dummy = seg_tips + seg_bnd + seg_ops
    segments = []
    for (ent, root, in_seg, tips, bnds, tip_slot, bnd_slot, outs) in built:
        k = len(ent)
        lsrc = np.full(seg_ops, 0, np.int32)
        rsrc = np.full(seg_ops, 0, np.int32)
        ovalid = np.zeros(seg_ops, np.int32)
        opos = np.zeros(seg_ops, np.int32)

        def coord(ch) -> int:
            if ch in in_seg:
                return seg_tips + seg_bnd + in_seg[ch]
            if ch < n_leaves:
                return tip_slot[ch]
            return seg_tips + bnd_slot[ch]

        for j, i in enumerate(ent):
            _p, l, r = schedule[i][0], schedule[i][1], schedule[i][2]
            lsrc[j] = coord(l)
            rsrc[j] = coord(r)
            ovalid[j] = 1
            opos[j] = i
        for j in range(k, seg_ops):      # padding ops: self-contained
            lsrc[j] = rsrc[j] = seg_tips + seg_bnd + j
        out_slots = np.full(seg_out, dummy, np.int32)
        bnd_out_ids = np.zeros(seg_out, np.int32)
        for j, (slot_j, gid) in enumerate(outs):
            out_slots[j] = seg_tips + seg_bnd + slot_j
            bnd_out_ids[j] = gid
        segments.append(Segment(
            tip_ids=np.asarray(tips + [0] * (seg_tips - len(tips)),
                               np.int32),
            n_tips=len(tips),
            bnd_in_ids=np.asarray(bnds + [0] * (seg_bnd - len(bnds)),
                                  np.int32),
            n_bnd_in=len(bnds),
            lsrc=lsrc, rsrc=rsrc, ovalid=ovalid, opos=opos, n_ops=k,
            out_slots=out_slots, bnd_out_ids=bnd_out_ids,
            n_bnd_out=len(outs),
            root_slot=seg_tips + seg_bnd + in_seg[root]))

    # shrink the block until arena + small scratch + operator stacks fit.
    # The boundary region is DOUBLED for DMA prefetch; scratch beyond
    # the (tips + 2*bnd + ops) arena, in slot-equivalents: the forward's
    # scacc/stage/scst double buffers (6 rows total; the backward's
    # gbout double buffer is smaller), the backward's fac array
    # ((seg_ops, 1, BS) f32 ~ seg_ops/rows slots) and the pipelined
    # codes block ((seg_tips, 1, BS) ~ seg_tips/rows slots int32) —
    # without counting these the planner can approve a block the Mosaic
    # compiler then rejects at the budget boundary.
    extra = 6 + -(-(seg_ops + seg_tips) // max(rows, 1))
    if rows % 8:
        # non-tiling-aligned rows (codon 244) route DMAs through
        # padded landing/staging scratch: ~3*seg_bnd extra slots
        extra += 3 * seg_bnd
    fitted = fit_block_sites(seg_tips + 2 * seg_bnd + seg_ops + extra,
                             rows, block_sites,
                             vmem_budget - 2 * seg_ops * op_bytes)
    if fitted is None:
        if cap_ops > 1:
            return _plan_with_cap(schedule, n_leaves, rows=rows,
                                  block_sites=block_sites,
                                  cap_ops=max(1, cap_ops // 2),
                                  vmem_budget=vmem_budget,
                                  op_bytes=op_bytes)
        raise ValueError(
            f"segment arena ({seg_tips}+{seg_bnd}+{seg_ops} slots) does "
            f"not fit VMEM even at cap_ops=1 (rows={rows})")
    return SegPlan(segments=tuple(segments), n_leaves=n_leaves, n_edges=E,
                   n_boundaries=n_boundaries, seg_tips=seg_tips,
                   seg_bnd=seg_bnd, seg_ops=seg_ops, seg_out=seg_out,
                   block_sites=fitted)


# ---------------------------------------------------------------------------
# Fused traversal: ONE pallas dispatch for the whole segmented tree.
#
# Round-4a ran one pallas_call per segment chained by a lax.scan; the
# per-segment dispatch prologue and the scan-of-pallas compile cost both
# grow with segment count.  Round-4b collapses the chain into a single
# kernel with grid (n_segments, n_blocks) — segment-major, so for every
# site block a segment's boundary-row DMA writes complete (in-kernel
# wait, sequential grid) before any later segment reads them; the
# boundary buffer lives in HBM (memory_space=ANY), is aliased
# input->output, and carries a trailing scaler-accumulator row so the
# per-site rescale counts chain across segments without a separate
# reduction.  Per-segment schedule arrays ride scalar-prefetch SMEM and
# are indexed by program_id(0); loop trip counts are the segment's REAL
# counts, so shape padding costs nothing.
#
# Direct-DMA I/O as in round-4a: the kernel async-copies EXACTLY the
# boundary rows each segment consumes (the DMA engine is the gather
# unit — the reference's PL movers stream exactly the window each AIE
# kernel consumes, hls/src/mm2sleft_memDNAwindowComb.cpp); tip codes
# stay pipelined VMEM blocks (Mosaic's DMA engine rejects manual int8
# row copies — minimal repro in benchmarks/results/r04_seg.txt).
# ---------------------------------------------------------------------------


def _phys_slot(v, seg_tips, seg_bnd, ph):
    """Plan arena coord -> physical coord in the double-buffered arena.

    Plan layout: [tips(T) | bnd(B) | ops(O)]; physical layout doubles
    the boundary region for DMA prefetch: [tips | bnd ph0 | bnd ph1 |
    ops].  ``ph`` is the block-parity input phase.
    """
    return v + seg_bnd * jnp.where(v >= seg_tips + seg_bnd, 1,
                                   jnp.where(v >= seg_tips, ph, 0))


def _rows_pad8(rows: int) -> int:
    """HBM buffer row dim, padded to the fp32 sublane tile (8).

    Mosaic rejects HBM memref slices whose dim-1 size is not a tiling
    multiple ("must be aligned to tiling (8)") — rows = S*C is 16/80
    for DNA/protein but 244 for codon.  The boundary/adjoint buffers
    allocate the padded row count and all row DMAs copy the full padded
    height; kernels slice the loaded VALUE back to ``rows``.
    """
    return -(-rows // 8) * 8


def _pad_rows(x, rows_pad: int):
    """Zero-pad the leading (sublane) dim of ``x`` up to ``rows_pad``."""
    rows = x.shape[0]
    if rows == rows_pad:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((rows_pad - rows,) + x.shape[1:], x.dtype)],
        axis=0)


def _seg_fwd_kernel(n_ref, cnt_ref, lsrc_ref, rsrc_ref, rslot_ref,
                    bnd_idx_ref, gout_ref,
                    codes_ref, bbuf_hbm, scbuf_hbm, lcs_ref, rcs_ref,
                    ec_ref, ttab_ref, rr_ref,
                    bbuf_out, scbuf_out, lik_ref, sc_ref,
                    arena_ref, bnd16_ref, scacc_ref, stage_ref, scst_ref,
                    sem_in, sem_out, *,
                    n_seg, n_blocks, n_boundaries, seg_tips, seg_bnd,
                    seg_ops, states, categories, block_sites,
                    variant="vpu", io_bf16=False, rows_pad=None,
                    pipeline=True):
    """Fused segmented forward with double-buffered manual DMA.

    The manual boundary-row DMAs are the one data stream the Pallas grid
    pipeline cannot prefetch (everything bound via BlockSpecs is already
    double-buffered by Mosaic); issuing and waiting them serially per
    grid step left the DMA latency unoverlapped — measured as the bulk
    of the segmented engine's gap vs the fused single-arena kernel.
    Scheme (site blocks innermost, so within a segment the same rows
    stream block after block):

    * boundary-CLV + scaler-chain inputs for block i+1 are ISSUED during
      block i's compute into the opposite phase of a doubled arena
      region (block-parity phase ``ph``); each segment's first block
      issues and waits inline (one stall per segment);
    * the root/scaler exports are staged into ``stage``/``scst`` and
      waited ``lag`` steps later (step-parity phase, so consecutive
      steps never collide even across segment transitions with odd
      block counts); ``lag`` = 2 where the grid allows, which keeps the
      export DMA entirely off the critical path.

    Ordering safety: an input DMA issued at step k only ever reads rows
    exported by SEGMENTS strictly earlier (>= n_blocks - 1 steps away),
    and every export is waited <= lag steps after issue with
    lag <= n_blocks - 1 — so dependents never race an in-flight export.
    """
    S, C = states, categories
    rows = S * C
    BS = block_sites
    nb = n_blocks
    lag = 2 if nb >= 3 else 1
    s = pl.program_id(0)
    i = pl.program_id(1)
    step = s * nb + i
    ph = jax.lax.rem(i, 2)
    pho = jax.lax.rem(step, 2)
    site0 = i * BS
    idx = site0 + jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)
    valid = idx < n_ref[0]
    is_mxu = variant.startswith("mxu")
    dot = make_mxu_dots(variant)[0] if is_mxu else None
    rows_pad_ = rows_pad or rows
    # DMAs must land in / stage from a padded-height scratch whenever
    # the rows dim is not tiling-aligned (codon rows=244) or storage is
    # bf16 (DMA cannot convert)
    use_landing = io_bf16 or rows_pad_ != rows
    n_tips, n_bnd = cnt_ref[s, 0], cnt_ref[s, 1]
    n_ops = cnt_ref[s, 2]

    # All chain rows are read from the ALIASED OUTPUT refs: every row a
    # segment consumes was written earlier in this same call (plan
    # invariant), so reads and writes stay within one buffer — correct
    # on hardware (the alias is the same HBM) AND in interpret mode
    # (which need not model the aliasing as shared memory).
    del bbuf_hbm, scbuf_hbm  # aliasing operands only; never read

    def in_copies(blk, phase):
        """Boundary rows + scaler chain for site block ``blk`` into the
        ``phase`` half of the doubled region.  With bf16 storage the
        rows land in the half-width ``bnd16`` scratch and widen into
        the fp32 arena after the wait (DMA cannot convert).  The scaler
        chain rides its own 8-sublane fp32 buffer (counts must stay
        exact past 256; Mosaic rejects sub-8-sublane HBM slices)."""
        s0 = blk * BS

        def bnd_cp(b):
            dst = (bnd16_ref.at[phase, b] if use_landing
                   else arena_ref.at[seg_tips + phase * seg_bnd + b])
            return pltpu.make_async_copy(
                bbuf_out.at[bnd_idx_ref[s, b], :, pl.ds(s0, BS)],
                dst, sem_in)

        sc_cp = pltpu.make_async_copy(
            scbuf_out.at[:, pl.ds(s0, BS)], scacc_ref.at[phase],
            sem_in)
        return bnd_cp, sc_cp

    def issue_in(blk, phase):
        bnd_cp, sc_cp = in_copies(blk, phase)
        jax.lax.fori_loop(0, n_bnd,
                          lambda b, c: (bnd_cp(b).start(), c)[1], 0)
        sc_cp.start()

    def wait_in(blk, phase):
        bnd_cp, sc_cp = in_copies(blk, phase)
        jax.lax.fori_loop(0, n_bnd,
                          lambda b, c: (bnd_cp(b).wait(), c)[1], 0)
        sc_cp.wait()
        if use_landing:
            def widen(b, c):
                arena_ref[seg_tips + phase * seg_bnd + b] = (
                    bnd16_ref[phase, b][:rows].astype(jnp.float32))
                return c
            jax.lax.fori_loop(0, n_bnd, widen, 0)

    def out_copies(seg, blk, phase):
        s0 = blk * BS
        root_cp = pltpu.make_async_copy(
            stage_ref.at[phase],
            bbuf_out.at[gout_ref[seg], :, pl.ds(s0, BS)],
            sem_out.at[phase])
        sc_cp = pltpu.make_async_copy(
            scst_ref.at[phase],
            scbuf_out.at[:, pl.ds(s0, BS)], sem_out.at[phase])
        return root_cp, sc_cp

    def wait_out_of_step(k):
        sp = k // nb
        ip = k - sp * nb
        r, c = out_copies(sp, ip, jax.lax.rem(k, 2))
        r.wait()
        c.wait()

    if pipeline:
        # retire the export issued ``lag`` steps ago (before any input
        # issue below may depend on its rows)
        @pl.when(step >= lag)
        def _():
            wait_out_of_step(step - lag)

        @pl.when(i == 0)
        def _():
            issue_in(i, ph)
        wait_in(i, ph)
        @pl.when(i + 1 < nb)
        def _():
            issue_in(i + 1, 1 - ph)
    else:
        issue_in(i, ph)
        wait_in(i, ph)

    def expand(t, _):
        arena_ref[t] = _expand_tip(codes_ref[0, t], ttab_ref, dot=dot)
        return 0

    jax.lax.fori_loop(0, n_tips, expand, 0)

    def body(j, scaler):
        lcv = lcs_ref[0, j]
        rcv = rcs_ref[0, j]
        x1 = arena_ref[_phys_slot(lsrc_ref[s, j], seg_tips, seg_bnd, ph)]
        x2 = arena_ref[_phys_slot(rsrc_ref[s, j], seg_tips, seg_bnd, ph)]
        if is_mxu:
            x3, mask = _plf_node_mxu(x1, x2, lcv, rcv, ec_ref[...],
                                     valid, variant=variant)
        else:
            x3, mask = _plf_node(x1, x2, lambda a: lcv[:, a:a + 1],
                                 lambda a: rcv[:, a:a + 1], ec_ref,
                                 valid, S, C)
        arena_ref[seg_tips + 2 * seg_bnd + j] = x3
        return scaler + mask

    scaler = jax.lax.fori_loop(0, n_ops, body,
                               jnp.zeros((1, BS), jnp.int32))
    # the first segment starts the count chain from zero (its sc-row
    # read is the uninitialised buffer)
    prev = jnp.where(s == 0, jnp.zeros((1, BS), jnp.float32),
                     scacc_ref[ph, 0:1, :])
    total = prev + scaler.astype(jnp.float32)

    x_root = arena_ref[_phys_slot(rslot_ref[s], seg_tips, seg_bnd, ph)]
    if is_mxu:
        lik = dot(rr_ref[...], x_root)      # (1, rows) @ (rows, BS)
    else:
        lik = rr_ref[0:1, 0:1] * x_root[0:1, :]
        for rrow in range(1, rows):
            lik = lik + rr_ref[0:1, rrow:rrow + 1] * x_root[rrow:rrow + 1, :]
    # every segment writes its own root lik / running count; the final
    # segment's (last) visit of each site block is what lands in HBM
    lik_ref[...] = lik
    sc_ref[...] = total.astype(jnp.int32)

    # export the root CLV + running scaler count via the step-parity
    # staging slots (the arena root slot is rewritten next step; the
    # staged copy retires ``lag`` steps later, fully overlapped)
    stage_ref[pho] = _pad_rows(x_root.astype(stage_ref.dtype),
                               rows_pad_)
    scst_ref[pho] = jnp.broadcast_to(total, scst_ref.shape[1:])
    r, c = out_copies(s, i, pho)
    r.start()
    c.start()

    if pipeline:
        # drain at the end of the grid
        @pl.when(step == n_seg * nb - 1)
        def _():
            for d in range(min(lag, n_seg * nb) - 1, -1, -1):
                wait_out_of_step(step - d)
    else:
        r.wait()
        c.wait()


@functools.partial(
    jax.jit,
    static_argnames=("n_boundaries", "seg_tips", "seg_bnd", "seg_ops",
                     "states", "categories", "block_sites", "interpret",
                     "variant", "pipeline"))
def _seg_fwd_call(seg_arrs, codes_st, bbuf, scbuf, lcs_st, rcs_st, ec,
                  ttab, rr, n, *, n_boundaries, seg_tips, seg_bnd,
                  seg_ops, states, categories, block_sites, interpret,
                  variant="vpu", pipeline=True):
    """ONE dispatch for the whole segmented forward.

    ``seg_arrs``: (counts (n_seg, 4), lsrc/rsrc (n_seg, seg_ops),
    rslot/gout (n_seg,), bnd_idx (n_seg, seg_bnd)) int32 scalar-prefetch
    arrays; ``codes_st`` (n_seg, seg_tips, 1, n_pad) per-segment tip
    codes; ``lcs_st``/``rcs_st`` (n_seg, seg_ops, rows, W) per-segment
    operator stacks; ``bbuf`` (n_boundaries + 1, rows, n_pad) fp32 or
    bf16 — boundary rows + trash row; ``scbuf`` (8, n_pad) fp32 — the
    cross-segment scaler-count chain (sublane 0 carries the counts; 8
    sublanes keep the DMA tiling-aligned).  Both are consumed and
    returned (aliased in place).
    """
    S, C = states, categories
    rows = S * C
    n_pad = codes_st.shape[-1]
    n_seg = codes_st.shape[0]
    grid = (n_seg, n_pad // block_sites)
    n_arr = jnp.asarray(n, dtype=jnp.int32).reshape((1,))
    ncode = ttab.shape[-1]
    W = rows if variant.startswith("mxu") else S
    io_bf16 = bbuf.dtype == jnp.bfloat16
    io_dtype = bbuf.dtype
    rows_pad = bbuf.shape[1]           # _rows_pad8(rows) by allocation
    use_landing = io_bf16 or rows_pad != rows

    kernel = functools.partial(
        _seg_fwd_kernel, n_seg=n_seg, n_blocks=n_pad // block_sites,
        n_boundaries=n_boundaries, seg_tips=seg_tips,
        seg_bnd=seg_bnd, seg_ops=seg_ops, states=S, categories=C,
        block_sites=block_sites, variant=variant, io_bf16=io_bf16,
        rows_pad=rows_pad, pipeline=pipeline)
    c0 = lambda s, i, *_: (0, 0)
    seg_c = lambda s, i, *_: (s, 0, 0, 0)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    bnd16_shape = ((2, seg_bnd, rows_pad, block_sites) if use_landing
                   else (1, 1, 1, 1))
    bbuf_new, scbuf_new, lik, sc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, seg_tips, 1, block_sites),
                             lambda s, i, *_: (s, 0, 0, i),
                             memory_space=pltpu.VMEM),     # codes_st
                any_spec,                                  # bbuf (HBM)
                any_spec,                                  # scbuf (HBM)
                pl.BlockSpec((1, seg_ops, rows, W), seg_c,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, seg_ops, rows, W), seg_c,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, W), c0, memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, ncode), c0,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows), c0, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                any_spec,                                  # bbuf (aliased)
                any_spec,                                  # scbuf (aliased)
                pl.BlockSpec((1, block_sites),
                             lambda s, i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_sites),
                             lambda s, i, *_: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((seg_tips + 2 * seg_bnd + seg_ops, rows,
                            block_sites), jnp.float32),    # arena
                pltpu.VMEM(bnd16_shape, io_dtype),         # bnd16 landing
                pltpu.VMEM((2, 8, block_sites), jnp.float32),   # scacc
                pltpu.VMEM((2, rows_pad, block_sites), io_dtype),  # stage
                pltpu.VMEM((2, 8, block_sites), jnp.float32),   # scst
                pltpu.SemaphoreType.DMA,                   # sem_in
                pltpu.SemaphoreType.DMA((2,)),             # sem_out
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(bbuf.shape, bbuf.dtype),
            jax.ShapeDtypeStruct(scbuf.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        # operand index counts the 7 scalar-prefetch args (n + the 6
        # segment arrays) as 0..6, then codes_st=7, bbuf=8, scbuf=9
        input_output_aliases={8: 0, 9: 1},
        cost_estimate=pl.CostEstimate(
            flops=23 * rows * n_pad * seg_ops * n_seg,
            bytes_accessed=(seg_tips * 4 + 2 * rows * 4 + 8) * n_pad
            * n_seg,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_arr, *seg_arrs, codes_st, bbuf, scbuf, lcs_st, rcs_st, ec, ttab,
      rr)
    return bbuf_new, scbuf_new, lik, sc


def _stacked_plan(plan: SegPlan):
    """Stack the per-segment schedule arrays (host, cached per plan).

    The segments all share the plan's padded uniform shape, so the whole
    traversal lowers to ONE pallas_call with grid (n_segments,
    n_blocks); these arrays ride scalar-prefetch SMEM and are indexed by
    the segment grid coordinate.  Boundary CLVs live in an HBM buffer of
    ``n_boundaries + 2`` rows: row ``n_boundaries`` is a trash row (the
    final segment's root export target), row ``n_boundaries + 1``
    accumulates the per-site scaler counts across segments.  Kernel
    loops run to the per-segment REAL counts (``counts``), so padding
    in these arrays costs nothing at runtime.
    """
    cached = getattr(plan, "_stacked_cache", None)
    if cached is not None:
        return cached
    trash = plan.n_boundaries
    segs = plan.segments
    for s in segs:
        assert s.n_bnd_out <= 1, "planner invariant: root is the only " \
            "boundary output of a segment"

    def stk(get):
        return np.stack([get(s) for s in segs]).astype(np.int32)

    out = dict(
        tip_ids=stk(lambda s: s.tip_ids),
        bnd_idx=stk(lambda s: s.bnd_in_ids),
        lsrc=stk(lambda s: s.lsrc),
        rsrc=stk(lambda s: s.rsrc),
        opos=stk(lambda s: s.opos),
        rslot=np.asarray([s.root_slot for s in segs], np.int32),
        gout=np.asarray(
            [s.bnd_out_ids[0] if s.n_bnd_out else trash for s in segs],
            np.int32),
        counts=stk(lambda s: np.asarray(
            [s.n_tips, s.n_bnd_in, s.n_ops, s.n_bnd_out])),
    )
    object.__setattr__(plan, "_stacked_cache", out)
    return out


def _stacked_plan_dev(plan: SegPlan):
    """Device-resident stacked plan arrays (cached per plan: the eager
    evaluation path calls per likelihood evaluation, and re-uploading
    even small arrays costs a host->device round-trip each through the
    tunnel)."""
    cached = getattr(plan, "_stacked_dev_cache", None)
    if cached is not None:
        return cached
    xs = {k: jnp.asarray(v) for k, v in _stacked_plan(plan).items()}
    # under an active trace (shard_map/grad), asarray can yield tracers
    # — never cache those, they poison later traces
    if all(not isinstance(v, jax.core.Tracer) for v in xs.values()):
        object.__setattr__(plan, "_stacked_dev_cache", xs)
    return xs


def _seg_args(xs):
    """Scalar-prefetch tuple (order matches the kernels)."""
    return (xs["counts"], xs["lsrc"], xs["rsrc"], xs["rslot"],
            xs["bnd_idx"], xs["gout"])


def _gather_stacks(xs, codes3, lcs3, rcs3, plan=None):
    """Per-segment stacked inputs (one gather per eval, on device).

    The codes gather materialises (n_seg, seg_tips, 1, n_pad) — up to
    GBs of HBM write+read per eval at production sizes — and its inputs
    (tip codes + plan) are constant across evaluations of one model, so
    the eager paths cache it on the plan (skipped under tracing; the
    differentiable path re-runs it inside the compiled graph where XLA
    CSEs the fwd/bwd copies)."""
    cache = getattr(plan, "_codes_st_cache", None) if plan else None
    if cache is not None and cache[0] is codes3:
        codes_st = cache[1]
    else:
        codes_st = jnp.take(codes3, xs["tip_ids"], axis=0)
        if (plan is not None
                and not isinstance(codes3, jax.core.Tracer)
                and not isinstance(xs["tip_ids"], jax.core.Tracer)):
            object.__setattr__(plan, "_codes_st_cache",
                               (codes3, codes_st))
    lcs_st = jnp.take(lcs3, xs["opos"], axis=0)
    rcs_st = jnp.take(rcs3, xs["opos"], axis=0)
    return codes_st, lcs_st, rcs_st


def _run_forward(plan: SegPlan, codes3, lcs3, rcs3, ec, ttab, rr, n, *,
                 states, categories, interpret, variant="vpu",
                 io_dtype=jnp.float32):
    """One fused dispatch; returns (lik, sc, bnd_buffer).

    ``bnd_buffer``: (n_boundaries + 1, rows, n_pad) in ``io_dtype`` —
    every boundary CLV + a trash row (the VJP residual).  With
    ``io_dtype=bfloat16`` the boundary HBM streams (the engine's
    dominant per-site traffic) halve; forward recompute in the backward
    reads the SAME rounded rows, so residuals stay self-consistent.
    """
    xs = _stacked_plan_dev(plan)
    rows = states * categories
    n_pad = codes3.shape[-1]
    codes_st, lcs_st, rcs_st = _gather_stacks(xs, codes3, lcs3, rcs3,
                                              plan=plan)
    bbuf0 = jnp.zeros((plan.n_boundaries + 1, _rows_pad8(rows), n_pad),
                      io_dtype)
    scbuf0 = jnp.zeros((8, n_pad), jnp.float32)
    bbuf, _, lik, sc = _seg_fwd_call(
        _seg_args(xs), codes_st, bbuf0, scbuf0, lcs_st, rcs_st, ec,
        ttab, rr, n,
        n_boundaries=plan.n_boundaries, seg_tips=plan.seg_tips,
        seg_bnd=plan.seg_bnd, seg_ops=plan.seg_ops, states=states,
        categories=categories, block_sites=plan.block_sites,
        interpret=interpret, variant=variant,
        pipeline=_pipeline_default())
    return lik, sc, bbuf


def plf_tree_segmented(plan: SegPlan, codes3, lcs3, rcs3, ec, ttab, rr, n,
                       *, states: int = 4, categories: int = 4,
                       interpret: bool = False, variant: str = "vpu",
                       dtype: str = "float32"):
    """Segmented whole-tree likelihood forward.

    Same contract as plf_tree_pallas_dynamic's leading-dim form:
    codes3 (n_leaves, 1, n_pad) int32; lcs3/rcs3 (E, rows, W) operator
    stacks indexed by REORDERED schedule position (the positions
    ``plan`` was built from); returns ((1, n_pad) lik, (1, n_pad) sc).
    ``dtype="bfloat16"`` selects bf16 boundary-CLV storage (fp32 math
    in VMEM; the single-node kernel's fast CLV-storage mode applied to
    the engine's cross-segment streams).
    """
    io_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    lik, sc, _ = _run_forward(plan, codes3, lcs3, rcs3, ec, ttab, rr, n,
                              states=states, categories=categories,
                              interpret=interpret, variant=variant,
                              io_dtype=io_dtype)
    return lik, sc


# ---------------------------------------------------------------------------
# Backward: one fused dispatch, segments in reverse grid order.
# Phase 1 recomputes a segment's interior in the arena, phase 2
# reverse-sweeps to operator gradients; boundary-input adjoints chain
# through the gbuf HBM buffer exactly like the forward's boundary CLVs
# (a segment's boundary-OUTPUT adjoint was written by its consumer,
# which ran earlier in reverse order).
# ---------------------------------------------------------------------------


def _seg_bwd_kernel(n_ref, cnt_ref, lsrc_ref, rsrc_ref, rslot_ref,
                    bnd_idx_ref, gout_ref,
                    codes_ref, bbuf_hbm, gbuf_hbm, lcs_ref, rcs_ref,
                    lcsT_ref, rcsT_ref, ec_ref, ecT_ref, ttab_ref,
                    rrT_ref, glik_ref,
                    gbuf_out, gl_ref, gr_ref, gec_ref, grrT_ref,
                    arena_ref, bnd16_ref, gexp_ref, fac_ref, gbout_ref,
                    sem_in, sem_out,
                    *, n_seg, n_blocks, n_boundaries, seg_tips, seg_bnd,
                    seg_ops, states, categories, block_sites,
                    variant="vpu", io_bf16=False, rows_pad=None,
                    pipeline=True):
    """Fused segmented backward with double-buffered input DMA.

    Same prefetch discipline as the forward (see _seg_fwd_kernel): the
    boundary-CLV + root-adjoint inputs for block i+1 stream in during
    block i's reverse sweep.  The adjoint EXPORTS source the phase-ph
    boundary arena slots, which the next step's prefetch rewrites — so
    exports are waited at the start of the following step (lag 1, no
    staging; the export count per step is the segment's boundary count,
    typically 1-3, and the wait overlaps the other input waits).
    """
    S, C = states, categories
    rows = S * C
    BS = block_sites
    nb = n_blocks
    sr = pl.program_id(0)
    sf = n_seg - 1 - sr                     # forward segment index
    i = pl.program_id(1)
    step = sr * nb + i
    ph = jax.lax.rem(i, 2)
    site0 = i * BS
    idx = site0 + jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)
    valid = idx < n_ref[0]
    is_mxu = variant.startswith("mxu")
    if is_mxu:
        dot, _ = make_mxu_dots(variant)
        split, dot_s, dot_t_s = make_mxu_bwd_ops(variant)
        ecT_s = split(ecT_ref[...])    # loop-invariant: split once
    else:
        og = resolve_op_grad()
    rows_pad_ = rows_pad or rows
    use_landing = io_bf16 or rows_pad_ != rows
    n_tips, n_bnd = cnt_ref[sf, 0], cnt_ref[sf, 1]
    n_ops = cnt_ref[sf, 2]

    @pl.when(i == 0)
    def _():
        # full zero-init per segment: rows beyond the real op count stay
        # exactly zero, so the caller's scatter-add of padded rows at
        # schedule position 0 is a no-op
        gl_ref[...] = jnp.zeros_like(gl_ref)
        gr_ref[...] = jnp.zeros_like(gr_ref)

    @pl.when(jnp.logical_and(sr == 0, i == 0))
    def _():
        gec_ref[...] = jnp.zeros_like(gec_ref)
        grrT_ref[...] = jnp.zeros_like(grrT_ref)

    # the adjoint of this segment's boundary output, written earlier in
    # the reverse order by its consumer — read from the ALIASED OUTPUT
    # ref (in-call chain, as in the forward); the first reverse segment
    # (the forward root) has no consumer and takes zeros below
    del gbuf_hbm  # aliasing operand only; never read

    def in_copies(blk, phase):
        s0 = blk * BS

        def bnd_cp(b):
            dst = (bnd16_ref.at[phase, b] if use_landing
                   else arena_ref.at[seg_tips + phase * seg_bnd + b])
            return pltpu.make_async_copy(
                bbuf_hbm.at[bnd_idx_ref[sf, b], :, pl.ds(s0, BS)],
                dst, sem_in)

        gbout_cp = pltpu.make_async_copy(
            gbuf_out.at[gout_ref[sf], :, pl.ds(s0, BS)],
            gbout_ref.at[phase], sem_in)
        return bnd_cp, gbout_cp

    def issue_in(blk, phase):
        bnd_cp, gb_cp = in_copies(blk, phase)
        jax.lax.fori_loop(0, n_bnd,
                          lambda b, c: (bnd_cp(b).start(), c)[1], 0)
        gb_cp.start()

    def wait_in(blk, phase):
        bnd_cp, gb_cp = in_copies(blk, phase)
        jax.lax.fori_loop(0, n_bnd,
                          lambda b, c: (bnd_cp(b).wait(), c)[1], 0)
        gb_cp.wait()
        if use_landing:
            def widen(b, c):
                arena_ref[seg_tips + phase * seg_bnd + b] = (
                    bnd16_ref[phase, b][:rows].astype(jnp.float32))
                return c
            jax.lax.fori_loop(0, n_bnd, widen, 0)

    def gexp_copies(seg, blk, phase):
        """Adjoint exports of forward segment ``seg`` at block ``blk``
        from the ``phase`` half of the boundary arena region (staged
        through the narrowing ``gexp`` scratch when storage is bf16)."""
        s0 = blk * BS

        def cp(b):
            src = (gexp_ref.at[b] if use_landing
                   else arena_ref.at[seg_tips + phase * seg_bnd + b])
            return pltpu.make_async_copy(
                src,
                gbuf_out.at[bnd_idx_ref[seg, b], :, pl.ds(s0, BS)],
                sem_out)

        return cp

    if pipeline:
        # retire the previous step's adjoint exports BEFORE the input
        # prefetch below rewrites their source slots
        @pl.when(step >= 1)
        def _():
            kp = step - 1
            sp = n_seg - 1 - kp // nb
            ip = kp - (kp // nb) * nb
            cp = gexp_copies(sp, ip, jax.lax.rem(ip, 2))
            nb_p = cnt_ref[sp, 1]
            jax.lax.fori_loop(0, nb_p,
                              lambda b, c: (cp(b).wait(), c)[1], 0)

        @pl.when(i == 0)
        def _():
            issue_in(i, ph)
        wait_in(i, ph)
        @pl.when(i + 1 < nb)
        def _():
            issue_in(i + 1, 1 - ph)
    else:
        issue_in(i, ph)
        wait_in(i, ph)

    def expand(t, _):
        arena_ref[t] = _expand_tip(codes_ref[0, t], ttab_ref,
                                   dot=dot if is_mxu else None)
        return 0

    jax.lax.fori_loop(0, n_tips, expand, 0)

    def phys(v):
        return _phys_slot(v, seg_tips, seg_bnd, ph)

    # ---- phase 1: forward recompute, every op CLV checkpointed ----------
    def fwd_body(j, _):
        lcv = lcs_ref[0, j]
        rcv = rcs_ref[0, j]
        x1 = arena_ref[phys(lsrc_ref[sf, j])]
        x2 = arena_ref[phys(rsrc_ref[sf, j])]
        if is_mxu:
            x3, mask = _plf_node_mxu(x1, x2, lcv, rcv, ec_ref[...],
                                     valid, variant=variant)
        else:
            x3, mask = _plf_node(x1, x2, lambda a: lcv[:, a:a + 1],
                                 lambda a: rcv[:, a:a + 1], ec_ref,
                                 valid, S, C)
        arena_ref[seg_tips + 2 * seg_bnd + j] = x3
        fac_ref[j] = jnp.where(mask > 0, jnp.float32(TWO_TO_THE_32),
                               jnp.float32(1.0))
        return 0

    jax.lax.fori_loop(0, n_ops, fwd_body, 0)

    # ---- seed the root adjoint: the direct likelihood cotangent (only
    # the FINAL forward segment — the first in reverse order) PLUS the
    # boundary-output adjoint (the zero trash row for that same final
    # segment) — one unconditional sum covers both cases ------------------
    first_rev = sr == 0
    lastf = first_rev.astype(jnp.float32)
    g = glik_ref[...] * valid.astype(jnp.float32) * lastf
    x_root = arena_ref[phys(rslot_ref[sf])]
    # (VPU reduction: a dot_t against the (1, BS) cotangent trips a
    # Mosaic vector.broadcast verification bug on 1-row operands)
    grrT_ref[...] += jnp.sum(x_root * g, axis=1, keepdims=True)
    gbout = jnp.where(first_rev, jnp.zeros((rows, BS), jnp.float32),
                      gbout_ref[ph][:rows].astype(jnp.float32))
    arena_ref[phys(rslot_ref[sf])] = rrT_ref[...] * g + gbout

    # ---- phase 2: reverse sweep (slots flip CLV -> adjoint) -------------
    # (adjoint identities as in plf_tree_grad._tree_bwd_kernel; the MXU
    # branch runs them as block matmuls at the variant's pass count)
    def bwd_body(jj, _):
        j = n_ops - 1 - jj
        g_x3 = arena_ref[seg_tips + 2 * seg_bnd + j]
        g_y = g_x3 * fac_ref[j]
        lcv = lcs_ref[0, j]
        rcv = rcs_ref[0, j]
        x1 = arena_ref[phys(lsrc_ref[sf, j])]
        x2 = arena_ref[phys(rsrc_ref[sf, j])]
        if is_mxu:
            # operand-sharing forms: each distinct operand decomposes
            # once and feeds every contraction that needs it
            # (make_mxu_bwd_ops; bit-identical for mxu / mxu_bf16)
            x1s, x2s, gys = split(x1), split(x2), split(g_y)
            u1 = dot_s(split(lcv), x1s)
            u2 = dot_s(split(rcv), x2s)
            g_p = dot_s(ecT_s, gys)
            gu1s = split(g_p * u2)
            gu2s = split(g_p * u1)
            gl_ref[0, j] += dot_t_s(gu1s, x1s)
            gr_ref[0, j] += dot_t_s(gu2s, x2s)
            gec_ref[...] += dot_t_s(gys, split(u1 * u2))
            gx1 = dot_s(split(lcsT_ref[0, j]), gu1s)
            gx2 = dot_s(split(rcsT_ref[0, j]), gu2s)
        else:
            u1 = _stage(x1, lcv, S, C)
            u2 = _stage(x2, rcv, S, C)
            g_p = _stage(g_y, ecT_ref, S, C)
            g_u1 = g_p * u2
            g_u2 = g_p * u1
            gl_ref[0, j] += og(x1, g_u1, S, C)
            gr_ref[0, j] += og(x2, g_u2, S, C)
            gec_ref[...] += og(u1 * u2, g_y, S, C)
            gx1 = _stage(g_u1, lcsT_ref[0, j], S, C)
            gx2 = _stage(g_u2, rcsT_ref[0, j], S, C)
        arena_ref[phys(lsrc_ref[sf, j])] = gx1
        arena_ref[phys(rsrc_ref[sf, j])] = gx2
        return 0

    jax.lax.fori_loop(0, n_ops, bwd_body, 0)

    # ---- export boundary-input adjoints straight into gbuf rows ---------
    if use_landing:
        def narrow(b, c):
            gexp_ref[b] = _pad_rows(arena_ref[
                seg_tips + ph * seg_bnd + b].astype(gexp_ref.dtype),
                rows_pad_)
            return c
        jax.lax.fori_loop(0, n_bnd, narrow, 0)
    cp = gexp_copies(sf, i, ph)
    jax.lax.fori_loop(0, n_bnd, lambda b, c: (cp(b).start(), c)[1], 0)

    if pipeline:
        # drain at the end of the grid
        @pl.when(step == n_seg * nb - 1)
        def _():
            jax.lax.fori_loop(0, n_bnd,
                              lambda b, c: (cp(b).wait(), c)[1], 0)
    else:
        jax.lax.fori_loop(0, n_bnd, lambda b, c: (cp(b).wait(), c)[1], 0)


@functools.partial(
    jax.jit,
    static_argnames=("n_boundaries", "seg_tips", "seg_bnd", "seg_ops",
                     "states", "categories", "block_sites", "interpret",
                     "variant", "pipeline"))
def _seg_bwd_call(seg_arrs, codes_st, bbuf, gbuf, lcs_st, rcs_st,
                  lcsT_st, rcsT_st, ec, ecT, ttab, rrT, glik, n, *,
                  n_boundaries, seg_tips, seg_bnd, seg_ops, states,
                  categories, block_sites, interpret, variant="vpu",
                  pipeline=True):
    """ONE dispatch for the whole segmented backward (reverse segment
    order).  Returns (gbuf, gl (n_seg, seg_ops, rows, W), gr, gec,
    grrT); ``gl``/``gr`` rows are indexed by FORWARD segment order."""
    S, C = states, categories
    rows = S * C
    n_pad = codes_st.shape[-1]
    n_seg = codes_st.shape[0]
    grid = (n_seg, n_pad // block_sites)
    n_arr = jnp.asarray(n, dtype=jnp.int32).reshape((1,))
    ncode = ttab.shape[-1]
    W = rows if variant.startswith("mxu") else S

    io_bf16 = gbuf.dtype == jnp.bfloat16
    io_dtype = gbuf.dtype
    rows_pad = gbuf.shape[1]
    use_landing = io_bf16 or rows_pad != rows
    kernel = functools.partial(
        _seg_bwd_kernel, n_seg=n_seg, n_blocks=n_pad // block_sites,
        n_boundaries=n_boundaries,
        seg_tips=seg_tips, seg_bnd=seg_bnd, seg_ops=seg_ops, states=S,
        categories=C, block_sites=block_sites, variant=variant,
        io_bf16=io_bf16, rows_pad=rows_pad, pipeline=pipeline)
    c0 = lambda s, i, *_: (0, 0)
    # per-segment blocks are indexed by the FORWARD segment coordinate
    # (reverse of the grid's s) so gl/gr rows line up with fwd order
    seg_r = lambda s, i, *_: (n_seg - 1 - s, 0, 0, 0)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    op4 = pl.BlockSpec((1, seg_ops, rows, W), seg_r,
                       memory_space=pltpu.VMEM)
    const = pl.BlockSpec((rows, W), c0, memory_space=pltpu.VMEM)
    gbuf_new, gl, gr, gec, grrT = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, seg_tips, 1, block_sites),
                             lambda s, i, *_: (n_seg - 1 - s, 0, 0, i),
                             memory_space=pltpu.VMEM),     # codes_st
                any_spec,                                  # bbuf
                any_spec,                                  # gbuf
                op4, op4, op4, op4,
                const, const,
                pl.BlockSpec((rows, ncode), c0,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, 1), c0, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_sites),
                             lambda s, i, *_: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                any_spec,                                  # gbuf (aliased)
                op4, op4, const,
                pl.BlockSpec((rows, 1), c0, memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((seg_tips + 2 * seg_bnd + seg_ops, rows,
                            block_sites), jnp.float32),    # arena
                pltpu.VMEM((2, seg_bnd, rows_pad, block_sites)
                           if use_landing
                           else (1, 1, 1, 1), io_dtype),   # bnd16
                pltpu.VMEM((seg_bnd, rows_pad, block_sites)
                           if use_landing
                           else (1, 1, 1), io_dtype),      # gexp
                pltpu.VMEM((seg_ops, 1, block_sites), jnp.float32),
                pltpu.VMEM((2, rows_pad, block_sites), io_dtype),  # gbout
                pltpu.SemaphoreType.DMA,                   # sem_in
                pltpu.SemaphoreType.DMA,                   # sem_out
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(gbuf.shape, gbuf.dtype),
            jax.ShapeDtypeStruct((n_seg, seg_ops, rows, W), jnp.float32),
            jax.ShapeDtypeStruct((n_seg, seg_ops, rows, W), jnp.float32),
            jax.ShapeDtypeStruct((rows, W), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        # scalars 0..6, codes_st=7, bbuf=8, gbuf=9
        input_output_aliases={9: 0},
        cost_estimate=pl.CostEstimate(
            flops=3 * 23 * rows * n_pad * seg_ops * n_seg,
            bytes_accessed=(seg_tips * 4 + 4 * rows * 4 + 4) * n_pad
            * n_seg,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_arr, *seg_arrs, codes_st, bbuf, gbuf, lcs_st, rcs_st,
      lcsT_st, rcsT_st, ec, ecT, ttab, rrT, glik)
    return gbuf_new, gl, gr, gec, grrT


def make_tree_diff_segmented(schedule: Sequence[Tuple], n_leaves: int, *,
                             states: int = 4, categories: int = 4,
                             block_sites: int = 1024,
                             cap_ops: Optional[int] = None,
                             interpret: bool = False,
                             vmem_budget: int = SEG_VMEM_BUDGET,
                             variant: str = "vpu",
                             dtype: str = "float32"):
    """Differentiable segmented whole-tree likelihood.

    Same contract as ops/plf_tree_grad.make_tree_diff — returns
    ``f(codes3, lcs3, rcs3, ec, ttab, rr, n) -> (lik, sc)`` with
    operators indexed by REORDERED schedule position — but scales to
    trees whose single-segment backward arena cannot fit VMEM: VJP
    residuals are the O(#segments) boundary CLVs, each segment's
    backward recomputes its interior in the arena, and boundary-input
    adjoints chain segment-to-segment in reverse — all inside ONE
    forward and ONE backward pallas dispatch.
    """
    S, C = states, categories
    rows = S * C
    W = rows if variant.startswith("mxu") else S
    plan = plan_segments(schedule, n_leaves, rows=rows,
                         block_sites=block_sites, cap_ops=cap_ops,
                         vmem_budget=vmem_budget,
                         op_width=rows if variant.startswith("mxu") else 0)
    E = len(schedule)
    io_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

    def fwd_run(codes3, lcs3, rcs3, ec, ttab, rr, n):
        return _run_forward(plan, codes3, lcs3, rcs3, ec, ttab, rr, n,
                            states=S, categories=C, interpret=interpret,
                            variant=variant, io_dtype=io_dtype)

    @jax.custom_vjp
    def f(codes3, lcs3, rcs3, ec, ttab, rr, n):
        lik, sc, _ = fwd_run(codes3, lcs3, rcs3, ec, ttab, rr, n)
        return lik, sc

    def fwd(codes3, lcs3, rcs3, ec, ttab, rr, n):
        lik, sc, bbuf = fwd_run(codes3, lcs3, rcs3, ec, ttab, rr, n)
        return (lik, sc), (codes3, lcs3, rcs3, ec, ttab, rr, n, bbuf)

    def bwd(res, cts):
        glik, _ = cts
        codes3, lcs3, rcs3, ec, ttab, rr, n, bbuf = res
        xs = _stacked_plan_dev(plan)
        codes_st, lcs_st, rcs_st = _gather_stacks(xs, codes3, lcs3,
                                                  rcs3)
        if variant.startswith("mxu"):
            tT3 = lambda a: jnp.transpose(a, (0, 2, 1))
            ecT = jnp.transpose(ec)
        else:
            tT = functools.partial(transpose_lane_constants,
                                   states=S, categories=C)
            tT3 = jax.vmap(tT)
            ecT = transpose_lane_constants(ec, S, C)
        lcsT_st = jax.vmap(tT3)(lcs_st)
        rcsT_st = jax.vmap(tT3)(rcs_st)
        rrT = jnp.transpose(rr)
        rows_ = S * C
        n_pad = codes3.shape[-1]
        # bf16 adjoint chain when storage is bf16: halves the bwd's
        # dominant HBM stream; the adjoint values carry the same error
        # class as the rounded boundary CLVs they flow through
        gbuf0 = jnp.zeros((plan.n_boundaries + 1, _rows_pad8(rows_),
                           n_pad), io_dtype)
        _, gl, gr, gec_tot, grrT_tot = _seg_bwd_call(
            _seg_args(xs), codes_st, bbuf, gbuf0, lcs_st, rcs_st,
            lcsT_st, rcsT_st, ec, ecT, ttab, rrT, glik, n,
            n_boundaries=plan.n_boundaries, seg_tips=plan.seg_tips,
            seg_bnd=plan.seg_bnd, seg_ops=plan.seg_ops, states=S,
            categories=C, block_sites=plan.block_sites,
            interpret=interpret, variant=variant,
            pipeline=_pipeline_bwd_default())
        # fold the per-segment operator gradients back to schedule
        # positions (padded rows are exactly zero — zero-init per
        # segment, loops stop at the real op count)
        gl_tot = jnp.zeros_like(lcs3).at[xs["opos"]].add(gl)
        gr_tot = jnp.zeros_like(rcs3).at[xs["opos"]].add(gr)
        return (None, gl_tot, gr_tot, gec_tot, jnp.zeros_like(ttab),
                jnp.transpose(grrT_tot), None)

    f.defvjp(fwd, bwd)
    f.plan = plan
    return f


# ---------------------------------------------------------------------------
# Batched same-shape segmented scoring (tree search beyond the
# register-machine arena): stack many candidates' segment plans into one
# uniform shape and lax.map the fused forward — one dispatch per
# candidate inside ONE compiled program, the big-taxa analogue of
# plf_tree_pallas.batched_tree_loglik_parts (reference: 9-instance
# parallel scoring, /root/reference/Makefile:29).
# ---------------------------------------------------------------------------


def stack_plans(plans: Sequence[SegPlan], rows: int,
                vmem_budget: int = SEG_VMEM_BUDGET,
                op_width: int = 0):
    """Pad per-candidate SegPlans to one batch-uniform shape.

    Different topologies of the same (E, n_leaves) class segment into
    slightly different shapes; the batch pads every dimension to the
    max and front-pads with no-op segments (all counts zero) so the
    segment-grid length is uniform — the kernels' runtime trip counts
    make the padding free.  Arena-slot coordinates (lsrc/rsrc/rslot)
    were assigned against each plan's OWN seg_tips/seg_bnd offsets and
    are REMAPPED to the batch-max layout (slot regions [0, T), [T,
    T+B), [T+B, ...) with the batch statics) — without this every
    candidate whose dims differ from the batch max reads the wrong
    arena slots.  ``op_width``: operator-stack width (rows for MXU
    variants), counted against the VMEM budget like plan_segments does.
    Returns (xs_b, dims) with xs_b a dict of (B, n_seg_max, ...) arrays
    and dims the uniform static shape.
    """
    n_seg_max = max(len(p.segments) for p in plans)
    seg_tips = max(p.seg_tips for p in plans)
    seg_bnd = max(p.seg_bnd for p in plans)
    seg_ops = max(p.seg_ops for p in plans)
    n_bnd_max = max(p.n_boundaries for p in plans)
    trash = n_bnd_max

    def remap_slots(v, plan):
        """Plan-local unified arena coords -> batch-max coords."""
        t, b = plan.seg_tips, plan.seg_bnd
        is_bnd = (v >= t) & (v < t + b)
        is_op = v >= t + b
        return np.where(is_op, v - (t + b) + seg_tips + seg_bnd,
                        np.where(is_bnd, v - t + seg_tips, v))

    def pad_plan(plan):
        st = _stacked_plan(plan)
        n_seg = len(plan.segments)
        out = {}
        for k, v in st.items():
            v = np.asarray(v)
            if k in ("lsrc", "rsrc", "rslot"):
                v = remap_slots(v, plan)
            if v.ndim == 1:          # rslot / gout
                w = np.zeros(n_seg_max, v.dtype)
                if k == "gout":
                    # remap this plan's trash row to the batch trash
                    # row; padded (no-op) segments also export there
                    v = np.where(v == plan.n_boundaries, trash, v)
                    w[:] = trash
                w[n_seg_max - n_seg:] = v
                out[k] = w
                continue
            tgt = {"tip_ids": seg_tips, "bnd_idx": seg_bnd,
                   "lsrc": seg_ops, "rsrc": seg_ops, "opos": seg_ops,
                   "counts": 4}[k]
            if v.shape[1] < tgt:
                v = np.pad(v, ((0, 0), (0, tgt - v.shape[1])))
            w = np.zeros((n_seg_max, tgt), v.dtype)
            w[n_seg_max - n_seg:] = v
            out[k] = w
        return out

    padded = [pad_plan(p) for p in plans]
    xs_b = {k: np.stack([d[k] for d in padded]) for k in padded[0]}
    # refit the block for the batch-max arena (each plan fitted its own
    # dims; the max across plans can be slightly larger), counting the
    # forward kernel's two per-segment operator stacks like
    # plan_segments does (same scratch slot-equivalents accounting)
    extra = 6 + -(-(seg_ops + seg_tips) // max(rows, 1))
    if rows % 8:
        extra += 3 * seg_bnd
    bs = fit_block_sites(seg_tips + 2 * seg_bnd + seg_ops + extra, rows,
                         min(p.block_sites for p in plans),
                         vmem_budget - 2 * seg_ops * rows * op_width * 4)
    if bs is None:
        raise ValueError(
            "batched segment arena does not fit VMEM")
    dims = dict(n_boundaries=n_bnd_max, seg_tips=seg_tips,
                seg_bnd=seg_bnd, seg_ops=seg_ops, block_sites=bs)
    return xs_b, dims


@functools.partial(
    jax.jit,
    static_argnames=("n_boundaries", "seg_tips", "seg_bnd", "seg_ops",
                     "states", "categories", "block_sites", "interpret",
                     "variant", "n_parts", "dtype"))
def batched_seg_loglik_parts(xs_b, codes3, lcs3_b, rcs3_b, ec, ttab, rr,
                             wpad, n, *, n_boundaries, seg_tips, seg_bnd,
                             seg_ops, states, categories, block_sites,
                             interpret, variant="vpu", n_parts=64,
                             dtype="float32"):
    """(B, n_parts) fp32 partial sums of the weighted per-site
    log-likelihood for B same-shape candidates (rescale counts folded
    in); host-sum in float64 for the final ll per candidate."""
    rows = states * categories
    n_pad = codes3.shape[-1]
    chunk = n_pad // n_parts
    io_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    log_minlik = jnp.float32(np.log(np.float64(2.0) ** -32))

    def one(args):
        xs, lcs3, rcs3 = args
        codes_st, lcs_st, rcs_st = _gather_stacks(xs, codes3, lcs3,
                                                  rcs3)
        bbuf0 = jnp.zeros((n_boundaries + 1, _rows_pad8(rows), n_pad),
                          io_dtype)
        scbuf0 = jnp.zeros((8, n_pad), jnp.float32)
        _, _, lik, sc = _seg_fwd_call(
            _seg_args(xs), codes_st, bbuf0, scbuf0, lcs_st, rcs_st, ec,
            ttab, rr, n, n_boundaries=n_boundaries, seg_tips=seg_tips,
            seg_bnd=seg_bnd, seg_ops=seg_ops, states=states,
            categories=categories, block_sites=block_sites,
            interpret=interpret, variant=variant)
        site = (jnp.log(jnp.maximum(lik[0], jnp.float32(1.1754944e-38)))
                + sc[0].astype(jnp.float32) * log_minlik) * wpad
        return jnp.sum(site.reshape(n_parts, chunk), axis=-1)

    return jax.lax.map(one, (xs_b, lcs3_b, rcs3_b))

