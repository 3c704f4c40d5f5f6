"""Whole-tree fused Pallas kernel: the entire likelihood in one pass.

The reference evaluates one PLF node per accelerator invocation, paying
full CLV traffic (2 reads + 1 write = 192 B/site) per node — on its
hardware that is forced by the 16 KiB AIE tile memory.  A TPU core has
~16 MB of VMEM, which fits an entire post-order traversal's live-CLV
stack for a site block.  This kernel exploits that:

* grid over site blocks (like the single-node kernel);
* tip CLVs are NOT materialised in HBM: leaves arrive as int32 state
  codes (4 B/leaf/site) and are expanded to eigen-coordinate CLVs in
  VMEM from a small lookup table;
* the static post-order schedule is unrolled in the kernel body with a
  Sethi-Ullman-style ordering (taller child first) to minimise the live
  stack; every internal CLV lives only in VMEM/registers;
* per-node underflow rescaling accumulates per-site scaler counts
  (identical semantics/op-order to the single-node kernel, so results
  stay bit-exact vs a node-by-node golden traversal);
* outputs are just the per-site likelihood (pre-log fp32) and total
  scaler counts: HBM traffic is n_leaves*4 + 8 bytes/site instead of
  (n_nodes-1)*192 bytes/site — for a 16-taxon tree that is ~40x less.

Branch constants are packed lane-dense as ``(rows, E*S)`` so VMEM holds
them without 128-lane padding per edge.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..reference import MIN_LIKELIHOOD, TWO_TO_THE_32
from . import layout as L
from .plf_pallas import MXU_PRECISION, _dot_bf16x3, make_mxu_dots

__all__ = ["plf_tree_pallas", "plf_tree_pallas_dynamic", "schedule_depth",
           "reorder_schedule", "compile_register_schedule",
           "pack_branch_constants", "fit_block_sites"]

#: VMEM budget for kernel scratch arenas (a v5e core has ~16 MiB VMEM;
#: leave room for operand/output blocks and double-buffering).
ARENA_VMEM_BUDGET = 10 * 2 ** 20


def fit_block_sites(n_arena_slots: int, rows: int, block_sites: int,
                    vmem_budget: int = ARENA_VMEM_BUDGET):
    """Largest 128-multiple divisor of ``block_sites`` whose
    ``n_arena_slots``-slot fp32 arena fits ``vmem_budget``, or None.

    Divisors of the configured block keep the grid exact: any return
    value divides every n_pad that the original block divides.
    """
    per_site = n_arena_slots * rows * 4
    for bs in range(block_sites, 127, -128):
        if block_sites % bs == 0 and per_site * bs <= vmem_budget:
            return bs
    return None


def _tile_rows(x, copies: int):
    if copies == 1:
        return x
    return jnp.concatenate([x] * copies, axis=0)


def reorder_schedule(schedule: Sequence[Tuple], n_leaves: int
                     ) -> List[Tuple]:
    """Reorder a post-order schedule taller-child-first (Sethi-Ullman).

    Returns an equivalent post-order schedule (same nodes, dependencies
    respected) that minimises the peak number of live intermediate CLVs.
    Each entry is (parent, left, right, t_left, t_right) as produced by
    Tree.schedule(); edge index = position in the ORIGINAL schedule is
    preserved alongside as a 6th field so branch constants stay aligned.
    """
    children = {p: (l, r, tl, tr, e)
                for e, (p, l, r, tl, tr) in enumerate(schedule)}
    # Heights in one pass: the input schedule is post-order, so both
    # children precede their parent (iterative — a pectinate tree of
    # thousands of taxa must not hit the interpreter recursion limit).
    height: dict = {}
    for (p, l, r, _tl, _tr) in schedule:
        height[p] = 1 + max(height.get(l, 0), height.get(r, 0))

    # Iterative taller-child-first post-order emission (explicit stack;
    # the taller child is pushed LAST so its subtree pops/emits first).
    out: List[Tuple] = []
    root = schedule[-1][0]
    stack = [(root, False)]
    while stack:
        node, expanded = stack.pop()
        if node not in children:
            continue
        l, r, tl, tr, e = children[node]
        if expanded:
            out.append((node, l, r, tl, tr, e))
        else:
            stack.append((node, True))
            if height.get(l, 0) >= height.get(r, 0):
                stack.append((r, False))
                stack.append((l, False))
            else:
                stack.append((l, False))
                stack.append((r, False))
    assert len(out) == len(schedule)
    return out


def schedule_depth(schedule: Sequence[Tuple], n_leaves: int) -> int:
    """Peak live-CLV count of the (reordered) schedule."""
    live = set()
    peak = 0
    for entry in schedule:
        parent, l, r = entry[0], entry[1], entry[2]
        live.discard(l)
        live.discard(r)
        live.add(parent)
        peak = max(peak, len(live) + 1)  # +1 for in-flight temporaries
    return peak


def _expand_tip(code_row, ttab_ref, dot=None):
    """int32 codes (1, BS) -> (rows, BS) eigen-coordinate tip CLV.

    Exact: sum of one matched table column and zeros (0*x == 0, 0+v == v
    for the finite table values).  The column count (plain states + gap
    + IUPAC partial-ambiguity codes) comes from the table width.

    Codes may be stored int8 (config.tip_dtype) to quarter the HBM
    stream; Mosaic has no int8 vector compare ("Target does not support
    this comparison"), so widen in-register before the ==.

    With ``dot`` (an MXU dot from plf_pallas.make_mxu_dots) the
    expansion runs as ONE ``ttab @ onehot`` matmul on the systolic array
    instead of ncode VPU select/accumulate passes over (rows, BS) —
    ~20x fewer VPU ops, the dominant per-segment cost at small caps for
    S>=20.  For the 6-pass "mxu" dot this stays exact (each output sums
    one matched product and exact zeros); the reduced-pass variants
    inherit their documented error class (the bf16 hi/lo table split
    rounds at ~2^-17 relative — below mxu_3x's 1e-5 matmul class).
    """
    if code_row.dtype != jnp.int32:
        code_row = code_row.astype(jnp.int32)
    if dot is not None:
        ncode = ttab_ref.shape[-1]
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (ncode, code_row.shape[-1]), 0)
        onehot = (code_row == iota).astype(jnp.float32)  # (ncode, BS)
        return dot(ttab_ref[...], onehot)
    acc = None
    for s in range(ttab_ref.shape[-1]):
        m = (code_row == s).astype(jnp.float32)          # (1, BS)
        term = m * ttab_ref[:, s:s + 1]                  # (rows, BS)
        acc = term if acc is None else acc + term
    return acc


def _plf_node(x1, x2, lc_col, rc_col, ec_ref, valid, states, categories):
    """One PLF node on in-VMEM operands; op order == _plf_kernel.

    lc_col/rc_col: callables a -> (rows, 1) column for source state a.
    Returns (x3, mask_int) with rescale applied under ``valid``.
    """
    S, C = states, categories
    ump1 = _tile_rows(x1[0:C, :], S) * lc_col(0)
    ump2 = _tile_rows(x2[0:C, :], S) * rc_col(0)
    for a in range(1, S):
        ump1 = ump1 + _tile_rows(x1[a * C:(a + 1) * C, :], S) * lc_col(a)
        ump2 = ump2 + _tile_rows(x2[a * C:(a + 1) * C, :], S) * rc_col(a)
    p = ump1 * ump2
    x3 = _tile_rows(p[0:C, :], S) * ec_ref[:, 0:1]
    for k in range(1, S):
        x3 = x3 + _tile_rows(p[k * C:(k + 1) * C, :], S) * ec_ref[:, k:k + 1]
    mask = jnp.logical_and(
        jnp.max(jnp.abs(x3), axis=0, keepdims=True) < MIN_LIKELIHOOD, valid)
    x3 = jnp.where(mask, x3 * TWO_TO_THE_32, x3)
    return x3, mask.astype(jnp.int32)


def _plf_node_mxu(x1, x2, ml, mr, me, valid, variant="mxu"):
    """One PLF node as three (rows, rows) block matmuls on the MXU
    (operators from layout.branch_to_block_matrix / ev_to_block_matrix);
    ``variant`` selects the MXU pass count: "mxu" = HIGHEST (6-pass),
    "mxu_3x" = the explicit bf16x3 split (Mosaic cannot lower
    Precision.HIGH), "mxu_bf16" = 1 bf16 pass — same accuracy contract
    as the single-node kernel (plf_pallas._plf_kernel_mxu)."""
    if variant == "mxu_3x":
        dot = _dot_bf16x3
    else:
        dot = functools.partial(jax.lax.dot,
                                precision=MXU_PRECISION[variant],
                                preferred_element_type=jnp.float32)
    ump1 = dot(ml, x1)
    ump2 = dot(mr, x2)
    p = ump1 * ump2
    x3 = dot(me, p)
    mask = jnp.logical_and(
        jnp.max(jnp.abs(x3), axis=0, keepdims=True) < MIN_LIKELIHOOD, valid)
    x3 = jnp.where(mask, x3 * TWO_TO_THE_32, x3)
    return x3, mask.astype(jnp.int32)


def _tree_kernel(n_ref, codes_ref, lcs_ref, rcs_ref, ec_ref, ttab_ref,
                 rr_ref, lik_ref, sc_ref, *, schedule, n_leaves,
                 states, categories, block_sites, variant):
    S, C = states, categories
    BS = block_sites
    site0 = pl.program_id(0) * BS
    idx = site0 + jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)
    valid = idx < n_ref[0]

    stack = {}
    refcount = {}
    for entry in schedule:
        for ch in (entry[1], entry[2]):
            refcount[ch] = refcount.get(ch, 0) + 1
    scaler = jnp.zeros((1, BS), jnp.int32)
    W = S * C if variant.startswith("mxu") else S  # packed operator width
    tip_dot = (make_mxu_dots(variant)[0] if variant.startswith("mxu")
               else None)

    def get_child(node):
        if node < n_leaves:
            code_row = codes_ref[node:node + 1, :]
            return _expand_tip(code_row, ttab_ref, dot=tip_dot)
        return stack[node]

    for (parent, l, r, _, _, e) in schedule:
        x1 = get_child(l)
        x2 = get_child(r)
        if variant.startswith("mxu"):
            x3, mask = _plf_node_mxu(
                x1, x2, lcs_ref[:, e * W:(e + 1) * W],
                rcs_ref[:, e * W:(e + 1) * W], ec_ref[...], valid,
                variant=variant)
        else:
            lc_col = lambda a, e=e: lcs_ref[:, e * S + a:e * S + a + 1]
            rc_col = lambda a, e=e: rcs_ref[:, e * S + a:e * S + a + 1]
            x3, mask = _plf_node(x1, x2, lc_col, rc_col, ec_ref, valid,
                                 S, C)
        scaler = scaler + mask
        stack[parent] = x3
        for ch in (l, r):
            refcount[ch] -= 1
            if refcount[ch] == 0 and ch in stack:
                del stack[ch]

    root = schedule[-1][0]
    x_root = stack[root]
    # Per-site likelihood: sum_r root_rows[r] * x_root[r] (sequential over
    # rows — fixed order, exact and reproducible).
    lik = rr_ref[0:1, 0:1] * x_root[0:1, :]
    for rrow in range(1, S * C):
        lik = lik + rr_ref[0:1, rrow:rrow + 1] * x_root[rrow:rrow + 1, :]
    lik_ref[...] = lik
    sc_ref[...] = scaler


@functools.partial(
    jax.jit,
    static_argnames=("schedule", "n_leaves", "states", "categories",
                     "block_sites", "interpret", "variant"))
def _plf_tree_call(codes, lcs, rcs, ec, ttab, rr, n, *, schedule, n_leaves,
                   states, categories, block_sites, interpret,
                   variant="vpu"):
    S, C = states, categories
    rows = S * C
    n_pad = codes.shape[-1]
    grid = (n_pad // block_sites,)
    n_arr = jnp.asarray(n, dtype=jnp.int32).reshape((1,))
    E = len(schedule)

    W = rows if variant.startswith("mxu") else S
    EW = ec.shape[-1]
    kernel = functools.partial(
        _tree_kernel, schedule=schedule, n_leaves=n_leaves, states=S,
        categories=C, block_sites=block_sites, variant=variant)
    lik, sc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n_leaves, block_sites), lambda i, n: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, E * W), lambda i, n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, E * W), lambda i, n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, EW), lambda i, n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, ttab.shape[-1]), lambda i, n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows), lambda i, n: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, block_sites), lambda i, n: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_sites), lambda i, n: (0, i),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=23 * rows * n_pad * E,
            bytes_accessed=(n_leaves * 4 + 8) * n_pad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_arr, codes, lcs, rcs, ec, ttab, rr)
    return lik, sc


def plf_tree_pallas(codes, schedule, lcs, rcs, ec, tip_table, root_rows,
                    n, *, n_leaves: int, states: int = 4,
                    categories: int = 4, block_sites: int = 1024,
                    interpret: bool = False, max_live: int = 64,
                    variant: str = "vpu"):
    """Fused whole-tree likelihood.

    Args:
      codes: (n_leaves, n_pad) int32 tip state codes (gap/ambiguous = S).
      schedule: reordered schedule from :func:`reorder_schedule` (tuples
        (parent, left, right, t_l, t_r, edge_index), converted internally
        to a hashable static form).
      lcs, rcs: (rows, E*S) lane-dense packed branch constants; columns
        [e*S + a] hold edge e's source-state-a column (see
        pack_branch_constants).
      ec: (rows, S) eigenvector constants (layout.ev_to_lane_constants).
      tip_table: (rows, S+1) fp32 per-row tip expansion table.
      root_rows: (1, rows) fp32 root reduction vector.
      n: valid site count.

    Returns:
      (site_lik, scaler_counts): (1, n_pad) fp32 and (1, n_pad) int32.
    """
    sched = tuple((int(p), int(l), int(r), 0.0, 0.0, int(e))
                  for (p, l, r, _tl, _tr, e) in schedule)
    depth = schedule_depth(sched, n_leaves)
    if depth > max_live:
        raise ValueError(
            f"tree live-CLV depth {depth} exceeds max_live={max_live}; "
            "use the per-node traversal for this tree")
    return _plf_tree_call(
        codes, lcs, rcs, ec, tip_table, root_rows, n, schedule=sched,
        n_leaves=int(n_leaves), states=states, categories=categories,
        block_sites=block_sites, interpret=interpret, variant=variant)


# --------------------------------------------------------------------------
# Dynamic-schedule variant: arbitrary tree sizes, O(1) compile cost.
#
# The static kernel above unrolls the schedule into the kernel body —
# ideal for small trees but compile time grows with node count.  This
# variant is a register machine: the schedule is lowered to int32 arrays
# (operand source + leaf/slot flag + destination slot) prefetched into
# SMEM, a VMEM arena holds the live CLV slots, and a fori_loop executes
# one PLF node per iteration with dynamically indexed arena reads/writes.
# Slot assignment is done on the host with immediate free-after-use, so
# the arena size equals the schedule's peak live-CLV count (O(log taxa)
# after taller-child-first reordering).
# --------------------------------------------------------------------------


def compile_register_schedule(schedule: Sequence[Tuple], n_leaves: int):
    """Lower a (reordered) schedule to register-machine arrays.

    Returns (lsrc, lflag, rsrc, rflag, oslot, edge, n_slots): int32
    arrays of length E.  flag==0 means the operand is leaf code row
    ``src``; flag==1 means arena slot ``src``.  ``edge`` is the original
    edge index (for branch-constant lookup).
    """
    slot_of = {}
    free: List[int] = []
    n_slots = 0
    lsrc, lflag, rsrc, rflag, oslot, eidx = [], [], [], [], [], []

    def operand(node):
        if node < n_leaves:
            return node, 0
        return slot_of[node], 1

    def release(node):
        if node >= n_leaves:
            free.append(slot_of.pop(node))

    def alloc():
        nonlocal n_slots
        if free:
            return free.pop()
        n_slots += 1
        return n_slots - 1

    for entry in schedule:
        parent, l, r, e = entry[0], entry[1], entry[2], entry[5]
        ls, lf = operand(l)
        rs, rf = operand(r)
        release(l)
        release(r)
        out = alloc()
        slot_of[parent] = out
        lsrc.append(ls)
        lflag.append(lf)
        rsrc.append(rs)
        rflag.append(rf)
        oslot.append(out)
        eidx.append(e)
    root_slot = oslot[-1]
    arrs = tuple(np.asarray(a, np.int32)
                 for a in (lsrc, lflag, rsrc, rflag, oslot, eidx))
    return arrs, n_slots, root_slot


def _tree_kernel_dynamic(n_ref, lsrc_ref, rsrc_ref, oslot_ref, eidx_ref,
                         rslot_ref, codes_ref,
                         lcs_ref, rcs_ref, ec_ref, ttab_ref, rr_ref,
                         lik_ref, sc_ref, arena_ref, *, n_edges, n_leaves,
                         states, categories, block_sites, variant):
    S, C = states, categories
    rows = S * C
    BS = block_sites
    site0 = pl.program_id(0) * BS
    idx = site0 + jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)
    valid = idx < n_ref[0]

    # Tips expand ONCE into the arena's leading n_leaves slots so every
    # schedule operand is a plain dynamic arena read — no lax.cond in
    # the hot loop (each leaf is referenced exactly once in a binary
    # tree, so the preload adds no work, only removes branches).  The
    # dynamic index stays on the LEADING dim: Mosaic cannot index lanes
    # or sublanes at runtime-unaligned offsets.
    tip_dot = (make_mxu_dots(variant)[0] if variant.startswith("mxu")
               else None)

    def preload(l, _):
        arena_ref[l] = _expand_tip(codes_ref[l], ttab_ref, dot=tip_dot)
        return 0

    jax.lax.fori_loop(0, n_leaves, preload, 0)

    def body(i, scaler):
        e = eidx_ref[i]
        x1 = arena_ref[lsrc_ref[i]]
        x2 = arena_ref[rsrc_ref[i]]
        # per-edge operators ride an (E, rows, W) ref for the same reason
        lcv = lcs_ref[e]
        rcv = rcs_ref[e]
        if variant.startswith("mxu"):
            x3, mask = _plf_node_mxu(x1, x2, lcv, rcv, ec_ref[...], valid,
                                     variant=variant)
        else:
            x3, mask = _plf_node(
                x1, x2, lambda a: lcv[:, a:a + 1],
                lambda a: rcv[:, a:a + 1], ec_ref, valid, S, C)
        arena_ref[oslot_ref[i]] = x3
        return scaler + mask

    scaler = jax.lax.fori_loop(0, n_edges, body,
                               jnp.zeros((1, BS), jnp.int32))
    x_root = arena_ref[rslot_ref[0]]
    lik = rr_ref[0:1, 0:1] * x_root[0:1, :]
    for rrow in range(1, rows):
        lik = lik + rr_ref[0:1, rrow:rrow + 1] * x_root[rrow:rrow + 1, :]
    lik_ref[...] = lik
    sc_ref[...] = scaler


@functools.partial(
    jax.jit,
    static_argnames=("n_edges", "n_leaves", "n_slots",
                     "states", "categories", "block_sites", "interpret",
                     "variant"))
def _plf_tree_dynamic_call(sched_arrs, codes, lcs, rcs, ec, ttab, rr, n, *,
                           n_edges, n_leaves, n_slots, states,
                           categories, block_sites, interpret,
                           variant="vpu"):
    """``sched_arrs`` is the 7-tuple (lsrc, lflag, rsrc, rflag, oslot,
    eidx, root_slot[1]) of int32 arrays — all runtime inputs, so one
    compilation serves every topology of the same (n_edges, n_slots)
    shape class (the tree-search requirement)."""
    S, C = states, categories
    rows = S * C
    n_pad = codes.shape[-1]
    W = rows if variant.startswith("mxu") else S

    # Dynamic per-edge / per-leaf indexing must land on a LEADING dim
    # (Mosaic rejects runtime lane offsets that are not 128-multiples):
    # operators (rows, E*W) -> (E, rows, W); codes (L, n) -> (L, 1, n).
    lcs3 = jnp.transpose(lcs.reshape(rows, n_edges, W), (1, 0, 2))
    rcs3 = jnp.transpose(rcs.reshape(rows, n_edges, W), (1, 0, 2))
    codes3 = codes.reshape(codes.shape[0], 1, n_pad)
    return _plf_tree_dynamic_call3(
        sched_arrs, codes3, lcs3, rcs3, ec, ttab, rr, n, n_edges=n_edges,
        n_leaves=n_leaves, n_slots=n_slots, states=states,
        categories=categories, block_sites=block_sites,
        interpret=interpret, variant=variant)


@functools.partial(
    jax.jit,
    static_argnames=("n_edges", "n_leaves", "n_slots",
                     "states", "categories", "block_sites", "interpret",
                     "variant"))
def _plf_tree_dynamic_call3(sched_arrs, codes3, lcs3, rcs3, ec, ttab, rr,
                            n, *, n_edges, n_leaves, n_slots, states,
                            categories, block_sites, interpret,
                            variant="vpu"):
    """Leading-dim-indexed form: operators pre-stacked ``(E, rows, W)``
    and codes ``(L, 1, n_pad)`` (what the kernel consumes directly).
    The differentiable tree path (ops/plf_tree_grad.py) builds these
    stacks inside the autodiff graph and calls this entry."""
    S, C = states, categories
    rows = S * C
    n_pad = codes3.shape[-1]
    grid = (n_pad // block_sites,)
    n_arr = jnp.asarray(n, dtype=jnp.int32).reshape((1,))
    W = rows if variant.startswith("mxu") else S

    # Unified arena addressing: slots [0, n_leaves) hold expanded tips,
    # [n_leaves, n_leaves + n_slots) the register-machine slots — so
    # operand fetches need no leaf/slot branch in the kernel.
    lsrc, lflag, rsrc, rflag, oslot, eidx, rslot = sched_arrs
    lsrc_u = lsrc + lflag * n_leaves
    rsrc_u = rsrc + rflag * n_leaves
    oslot_u = oslot + n_leaves
    rslot_u = rslot + n_leaves

    kernel = functools.partial(
        _tree_kernel_dynamic, n_edges=n_edges, n_leaves=n_leaves,
        states=S, categories=C,
        block_sites=block_sites, variant=variant)
    nm3 = lambda i, *_: (0, 0, i)
    c0 = lambda i, *_: (0, 0)
    c03 = lambda i, *_: (0, 0, 0)
    lik, sc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n_leaves, 1, block_sites), nm3,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_edges, rows, W), c03,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_edges, rows, W), c03,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, ec.shape[-1]), c0,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, ttab.shape[-1]), c0, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows), c0, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, block_sites), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_sites), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((n_leaves + n_slots, rows, block_sites),
                           jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=23 * rows * n_pad * n_edges,
            bytes_accessed=(n_leaves * 4 + 8) * n_pad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_arr, lsrc_u, rsrc_u, oslot_u, eidx, rslot_u,
      codes3, lcs3, rcs3, ec, ttab, rr)
    return lik, sc


def plf_tree_pallas_dynamic(codes, schedule, lcs, rcs, ec, tip_table,
                            root_rows, n, *, n_leaves: int, states: int = 4,
                            categories: int = 4, block_sites: int = 1024,
                            interpret: bool = False, variant: str = "vpu"):
    """Fused whole-tree likelihood for arbitrary tree sizes.

    Same contract as :func:`plf_tree_pallas` but the schedule executes as
    a fori_loop over prefetched register-machine arrays — compile time is
    independent of the node count.  ``schedule`` must be the
    taller-child-first reordering (reorder_schedule) so the VMEM arena
    stays small.
    """
    arrs, n_slots, root_slot = compile_register_schedule(schedule, n_leaves)
    # The unified arena preloads every tip, so it needs
    # (n_leaves + n_slots) slots — auto-shrink the site block (to a
    # 128-multiple divisor, keeping the grid exact) until it fits VMEM.
    fitted = fit_block_sites(n_leaves + n_slots,
                             states * categories, block_sites)
    if fitted is None:
        vmem = ((n_leaves + n_slots) * states * categories
                * block_sites * 4)
        raise ValueError(
            f"arena needs {vmem/2**20:.1f} MiB VMEM ({n_leaves} tip + "
            f"{n_slots} live slots) even at block 128; use the per-node "
            f"or segmented path for this tree")
    block_sites = fitted
    sched_arrs = tuple(jnp.asarray(a) for a in arrs) + (
        jnp.asarray([root_slot], jnp.int32),)
    return _plf_tree_dynamic_call(
        sched_arrs, codes, lcs, rcs, ec, tip_table, root_rows, n,
        n_edges=len(schedule), n_leaves=int(n_leaves), n_slots=n_slots,
        states=states, categories=categories,
        block_sites=block_sites, interpret=interpret, variant=variant)


@functools.partial(
    jax.jit,
    static_argnames=("n_edges", "n_leaves", "n_slots", "states",
                     "categories", "block_sites", "interpret", "variant",
                     "n_parts"))
def batched_tree_loglik_parts(sched_stack, lcs_st, rcs_st, codes, ec, ttab,
                              rr, wpad, n, *, n_edges, n_leaves, n_slots,
                              states, categories, block_sites, interpret,
                              variant="vpu", n_parts=64):
    """Score a batch of same-shape topologies in ONE dispatch.

    ``sched_stack``: 8-tuple of int32 arrays stacked over candidates —
    (lsrc, lflag, rsrc, rflag, oslot, eidx) of shape (B, E) plus the
    root-slot (B, 1); ``lcs_st``/``rcs_st``: (B, rows, E*S) packed branch
    constants.  Everything else is shared across candidates.  A
    ``lax.map`` walks the candidates inside one compiled program — the
    tree-search answer to the reference-era recompile-per-topology cost
    (each NNI/SPR round used to trigger one XLA compile per candidate).

    Returns (B, n_parts) fp32 partial sums of the wgt-weighted per-site
    log-likelihood (rescale counts folded in); host-sum them in float64
    for the final ll per candidate.
    """
    n_pad = codes.shape[-1]
    chunk = n_pad // n_parts

    def one(args):
        arrs, lcs, rcs = args
        lik, sc = _plf_tree_dynamic_call(
            arrs, codes, lcs, rcs, ec, ttab, rr, n, n_edges=n_edges,
            n_leaves=n_leaves, n_slots=n_slots, states=states,
            categories=categories, block_sites=block_sites,
            interpret=interpret, variant=variant)
        log_minlik = jnp.float32(np.log(np.float64(2.0) ** -32))
        site = (jnp.log(jnp.maximum(lik[0], jnp.float32(1.1754944e-38)))
                + sc[0].astype(jnp.float32) * log_minlik) * wpad
        return jnp.sum(site.reshape(n_parts, chunk), axis=-1)

    return jax.lax.map(one, (sched_stack, lcs_st, rcs_st))


def pack_branch_constants(branches, states: int = 4, categories: int = 4):
    """Stack per-edge branch constants lane-dense: (rows, E*S).

    ``branches``: iterable of (C, S, S) branch matrices in schedule-edge
    order.  Column e*S + a of the result is
    layout.branch_to_lane_constants(branch_e)[:, a].
    """
    cols = [L.branch_to_lane_constants(np.asarray(b), states, categories)
            for b in branches]
    return np.concatenate(cols, axis=1).astype(np.float32)
