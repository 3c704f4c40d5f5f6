"""Custom VJP for the fused whole-tree kernel: checkpointed backward.

Round 1/2 gradients ran node-by-node through the fused single-node PLF
kernel and its custom VJP (ops/plf_grad.py): every internal node writes
its CLV to HBM on the forward pass (VJP residual) and the backward pass
re-reads five site-sized arrays per node.  The whole-tree forward kernel
(ops/plf_tree_pallas.py) already proves the entire traversal fits in
VMEM per site block — this module gives that kernel a backward pass with
the same property:

* forward = the production register-machine tree kernel (one dispatch,
  no intermediate HBM CLVs).  The only residuals saved are the kernel's
  small operand arrays (tip codes, per-edge operators, EV) — O(E * S^2)
  floats, NOT O(E * sites).
* backward = ONE more Pallas kernel per site block:
    phase 1  recompute the forward traversal, storing every node CLV in
             a VMEM arena indexed by schedule position (the classic
             "checkpoint at zero memory, recompute inside the tile"
             trade — the PLF is bandwidth-bound, so the extra VPU work
             is free);
    phase 2  reverse sweep: for node i (root downward) the arena slot of
             node i holds the *adjoint* of node i (written by its
             parent's step; each node has exactly one parent), while the
             slots of its children still hold their CLVs — a slot flips
             from CLV to adjoint exactly when the CLV dies, so ONE
             (n_leaves + E)-slot arena (tips preloaded, see
             compile_backward_schedule) serves both phases branch-free.
  Per-edge operator gradients (g_lcs, g_rcs), the EV gradient and the
  root-vector gradient accumulate across the grid in VMEM and come out
  as small (E, rows, S)-shaped arrays; HBM site traffic is just the tip
  codes (again) and the incoming likelihood cotangent.

The adjoint identities are the same as ops/plf_grad.py: the adjoint of a
tile/concat stage is the same stage with transposed lane constants
(lcT[a*C+c, k] = lc[k*C+c, a]), and the rescale factor (2^32 or 1) is
locally constant so d x3 = f * d y.

Reference anchor: the reference wishes for on-device parameter updates
(/root/reference/README.md:201-205); its hardware cannot hold a tree in
tile memory (16 KiB/tile, aie graph windows) — a TPU core's ~16 MB VMEM
is what makes this whole-tree backward possible.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..reference import TWO_TO_THE_32
from .plf_grad import _stage, resolve_op_grad, transpose_lane_constants
from .plf_pallas import make_mxu_bwd_ops, make_mxu_dots
from .plf_tree_pallas import (_expand_tip, _plf_node, _plf_node_mxu,
                              _plf_tree_dynamic_call3,
                              compile_register_schedule)

__all__ = ["make_tree_diff", "compile_backward_schedule",
           "tree_bwd_vmem_bytes", "transpose_operator_stack"]


def transpose_operator_stack(ops3, variant: str, states: int,
                             categories: int):
    """Adjoint-stage operators for a stacked (E, rows, W) operator array:
    lane-constant relabeling for the VPU form, plain matrix transpose for
    the MXU block-matrix forms."""
    if variant.startswith("mxu"):
        return jnp.transpose(ops3, (0, 2, 1))
    tT = functools.partial(transpose_lane_constants,
                           states=states, categories=categories)
    return jax.vmap(tT)(ops3)


def compile_backward_schedule(schedule: Sequence[Tuple], n_leaves: int):
    """Unified-arena operand indices for the checkpointed backward.

    Unlike :func:`compile_register_schedule` (which allocates/frees a
    minimal slot arena), the backward kernel keeps EVERY node CLV live
    through phase 1.  The arena is unified with the expanded tips —
    slots [0, n_leaves) hold tip CLVs, slot ``n_leaves + i`` the CLV of
    schedule entry i — so operand fetches and adjoint writes need no
    leaf/internal branch in the kernel (adjoint writes to a tip slot are
    dead stores: every node is referenced exactly once as a child).
    Returns int32 arrays (E,): (lpos, rpos) in unified coordinates.
    """
    pos_of = {entry[0]: n_leaves + i for i, entry in enumerate(schedule)}
    lpos = [node if node < n_leaves else pos_of[node]
            for (_, node, _r, *_rest) in schedule]
    rpos = [node if node < n_leaves else pos_of[node]
            for (_, _l, node, *_rest) in schedule]
    return np.asarray(lpos, np.int32), np.asarray(rpos, np.int32)


def tree_bwd_vmem_bytes(n_edges: int, n_leaves: int, rows: int,
                        block_sites: int, op_width: int = 0) -> int:
    """Arena + factor scratch footprint of the backward kernel.

    ``op_width``: operator stack width (S for the VPU form, rows for the
    MXU block-matrix forms) — the 6 per-edge stacks (lcs/rcs/lcsT/rcsT
    in, gl/gr out) also ride VMEM and matter once W = rows (S>=20)."""
    return ((n_edges + n_leaves) * rows * block_sites * 4
            + n_edges * block_sites * 4
            + 6 * n_edges * rows * op_width * 4)


def _tree_bwd_kernel(n_ref, lpos_ref, rpos_ref,
                     codes_ref, lcs_ref, rcs_ref, lcsT_ref, rcsT_ref,
                     ec_ref, ecT_ref, ttab_ref, rrT_ref, glik_ref,
                     gl_ref, gr_ref, gec_ref, grrT_ref,
                     arena_ref, fac_ref, *, n_edges, n_leaves, states,
                     categories, block_sites, variant="vpu"):
    S, C = states, categories
    BS = block_sites
    site0 = pl.program_id(0) * BS
    idx = site0 + jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)
    valid = idx < n_ref[0]
    is_mxu = variant.startswith("mxu")
    if is_mxu:
        dot, _ = make_mxu_dots(variant)
        split, dot_s, dot_t_s = make_mxu_bwd_ops(variant)
        ecT_s = split(ecT_ref[...])    # loop-invariant: split once
    else:
        og = resolve_op_grad()

    @pl.when(pl.program_id(0) == 0)
    def _():
        gl_ref[...] = jnp.zeros_like(gl_ref)
        gr_ref[...] = jnp.zeros_like(gr_ref)
        gec_ref[...] = jnp.zeros_like(gec_ref)
        grrT_ref[...] = jnp.zeros_like(grrT_ref)

    # Unified arena (see compile_backward_schedule): tips preloaded into
    # slots [0, n_leaves), node CLVs at n_leaves + schedule position —
    # operand fetches are branch-free dynamic reads on the leading dim.
    # MXU variants expand via one ttab @ onehot matmul (plf_tree_pallas).
    def preload(l, _):
        arena_ref[l] = _expand_tip(codes_ref[l], ttab_ref,
                                   dot=dot if is_mxu else None)
        return 0

    jax.lax.fori_loop(0, n_leaves, preload, 0)

    # ---- phase 1: forward recompute, all node CLVs checkpointed ---------
    def fwd_body(i, _):
        lcv = lcs_ref[i]
        rcv = rcs_ref[i]
        x1 = arena_ref[lpos_ref[i]]
        x2 = arena_ref[rpos_ref[i]]
        if is_mxu:
            x3, mask = _plf_node_mxu(x1, x2, lcv, rcv, ec_ref[...],
                                     valid, variant=variant)
        else:
            x3, mask = _plf_node(x1, x2, lambda a: lcv[:, a:a + 1],
                                 lambda a: rcv[:, a:a + 1], ec_ref, valid,
                                 S, C)
        arena_ref[n_leaves + i] = x3
        fac_ref[i] = jnp.where(mask > 0, jnp.float32(TWO_TO_THE_32),
                               jnp.float32(1.0))
        return 0

    jax.lax.fori_loop(0, n_edges, fwd_body, 0)

    # ---- seed: root adjoint + root-vector gradient ----------------------
    g = glik_ref[...] * valid.astype(jnp.float32)          # (1, BS)
    x_root = arena_ref[n_leaves + n_edges - 1]
    grrT_ref[...] += jnp.sum(x_root * g, axis=1, keepdims=True)
    arena_ref[n_leaves + n_edges - 1] = rrT_ref[...] * g   # (rows, BS)

    # ---- phase 2: reverse sweep (slots flip CLV -> adjoint) -------------
    # Adjoint identities (both forms): with u1 = Op_l(x1), u2 = Op_r(x2),
    # p = u1*u2, y = Op_e(p), x3 = f*y (f locally constant):
    #   g_y = g_x3*f; g_p = Op_eᵀ(g_y); g_u1 = g_p*u2; g_u2 = g_p*u1;
    #   g_x = Opᵀ(g_u); g_Op = outer-product reduction over sites.
    # The MXU form runs all of it as (rows, rows) @ (rows, BS) matmuls
    # at the variant's pass count — the precision ladder reaches the
    # backward pass too.
    def bwd_body(j, _):
        i = n_edges - 1 - j
        g_x3 = arena_ref[n_leaves + i]                     # adjoint of x3
        g_y = g_x3 * fac_ref[i]
        lcv = lcs_ref[i]
        rcv = rcs_ref[i]
        x1 = arena_ref[lpos_ref[i]]
        x2 = arena_ref[rpos_ref[i]]
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
            gl_ref[i] += dot_t_s(gu1s, x1s)
            gr_ref[i] += dot_t_s(gu2s, x2s)
            gec_ref[...] += dot_t_s(gys, split(u1 * u2))
            gx1 = dot_s(split(lcsT_ref[i]), gu1s)
            gx2 = dot_s(split(rcsT_ref[i]), gu2s)
        else:
            u1 = _stage(x1, lcv, S, C)
            u2 = _stage(x2, rcv, S, C)
            g_p = _stage(g_y, ecT_ref, S, C)
            g_u1 = g_p * u2
            g_u2 = g_p * u1
            gl_ref[i] += og(x1, g_u1, S, C)
            gr_ref[i] += og(x2, g_u2, S, C)
            gec_ref[...] += og(u1 * u2, g_y, S, C)
            gx1 = _stage(g_u1, lcsT_ref[i], S, C)
            gx2 = _stage(g_u2, rcsT_ref[i], S, C)
        # child adjoint writes are unconditional: a leaf child's slot is
        # dead after this step (each node has exactly one parent), so
        # clobbering a tip slot is harmless
        arena_ref[lpos_ref[i]] = gx1
        arena_ref[rpos_ref[i]] = gx2
        return 0

    jax.lax.fori_loop(0, n_edges, bwd_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n_edges", "n_leaves", "states", "categories",
                     "block_sites", "interpret", "variant"))
def _tree_bwd_call(bwd_arrs, codes3, lcs3, rcs3, lcsT3, rcsT3, ec, ecT,
                   ttab, rrT, glik, n, *, n_edges, n_leaves, states,
                   categories, block_sites, interpret, variant="vpu"):
    S, C = states, categories
    rows = S * C
    n_pad = codes3.shape[-1]
    grid = (n_pad // block_sites,)
    n_arr = jnp.asarray(n, dtype=jnp.int32).reshape((1,))
    W = rows if variant.startswith("mxu") else S

    kernel = functools.partial(
        _tree_bwd_kernel, n_edges=n_edges, n_leaves=n_leaves, states=S,
        categories=C, block_sites=block_sites, variant=variant)
    nm3 = lambda i, *_: (0, 0, i)
    c0 = lambda i, *_: (0, 0)
    c03 = lambda i, *_: (0, 0, 0)
    op3 = pl.BlockSpec((n_edges, rows, W), c03, memory_space=pltpu.VMEM)
    const = pl.BlockSpec((rows, W), c0, memory_space=pltpu.VMEM)
    gl, gr, gec, grrT = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n_leaves, 1, block_sites), nm3,
                             memory_space=pltpu.VMEM),
                op3, op3, op3, op3,
                const, const,
                pl.BlockSpec((rows, ttab.shape[-1]), c0, memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, 1), c0, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_sites), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[op3, op3, const,
                       pl.BlockSpec((rows, 1), c0,
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[
                pltpu.VMEM((n_leaves + n_edges, rows, block_sites),
                           jnp.float32),
                pltpu.VMEM((n_edges, 1, block_sites), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_edges, rows, W), jnp.float32),
            jax.ShapeDtypeStruct((n_edges, rows, W), jnp.float32),
            jax.ShapeDtypeStruct((rows, W), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 23 * rows * n_pad * n_edges,
            bytes_accessed=(n_leaves * 4 + 4) * n_pad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_arr, *bwd_arrs, codes3, lcs3, rcs3, lcsT3, rcsT3, ec, ecT, ttab,
      rrT, glik)
    return gl, gr, gec, grrT


def make_tree_diff(schedule: Sequence[Tuple], n_leaves: int, *,
                   states: int = 4, categories: int = 4,
                   block_sites: int = 1024, interpret: bool = False,
                   vmem_budget: int = 10 * 2 ** 20, variant: str = "vpu"):
    """Differentiable fused whole-tree likelihood.

    Args:
      schedule: reordered schedule (reorder_schedule output) — entries
        (parent, left, right, *_); operators are indexed by schedule
        POSITION (pass lcs3[i] = operator of schedule entry i).
      block_sites: site block width; the backward arena needs
        ``(E + n_leaves) * rows * block_sites * 4`` bytes of VMEM —
        shrink the block for big trees (``tree_bwd_vmem_bytes`` is the
        check).
      variant: "vpu" (bit-exact lane-constant form; operators (E, rows,
        S)) or "mxu"/"mxu_3x"/"mxu_bf16" (block-matrix forms; operators
        (E, rows, rows) from layout.branch_to_block_matrix) — the MXU
        precision ladder applies to the forward AND the checkpointed
        backward, so S>=20 training runs at ladder speed.

    Returns ``f(codes3, lcs3, rcs3, ec, ttab, rr, n) -> (lik, sc)``:
      codes3 (n_leaves, 1, n_pad) int32, lcs3/rcs3 (E, rows, W) fp32
      operator stacks (W per ``variant``), ec (rows, W), ttab
      (rows, S+1), rr (1, rows), n valid sites.  ``lik``/``sc`` are
      (1, n_pad).  Differentiable in lcs3, rcs3, ec and rr; forward is
      the register-machine tree kernel, backward the checkpointed arena
      kernel above.
    """
    S, C = states, categories
    rows = S * C
    E = len(schedule)
    W = rows if variant.startswith("mxu") else S
    need = tree_bwd_vmem_bytes(E, n_leaves, rows, block_sites,
                               op_width=W)
    if need > vmem_budget:
        raise ValueError(
            f"tree backward arena needs {need/2**20:.1f} MiB VMEM "
            f"({E} edges x block {block_sites}); reduce block_sites")
    # Forward register machine with eidx = schedule position, so the
    # operator stacks are position-indexed on both passes.
    pos_sched = tuple((p, l, r, 0.0, 0.0, i)
                      for i, (p, l, r, *_) in enumerate(schedule))
    fwd_arrs_np, n_slots, root_slot = compile_register_schedule(
        pos_sched, n_leaves)
    fwd_arrs = tuple(jnp.asarray(a) for a in fwd_arrs_np) + (
        jnp.asarray([root_slot], jnp.int32),)
    bwd_arrs = tuple(jnp.asarray(a) for a in
                     compile_backward_schedule(pos_sched, n_leaves))

    def fwd_call(codes3, lcs3, rcs3, ec, ttab, rr, n):
        return _plf_tree_dynamic_call3(
            fwd_arrs, codes3, lcs3, rcs3, ec, ttab, rr, n, n_edges=E,
            n_leaves=n_leaves, n_slots=n_slots, states=S, categories=C,
            block_sites=block_sites, interpret=interpret, variant=variant)

    @jax.custom_vjp
    def f(codes3, lcs3, rcs3, ec, ttab, rr, n):
        return fwd_call(codes3, lcs3, rcs3, ec, ttab, rr, n)

    def fwd(codes3, lcs3, rcs3, ec, ttab, rr, n):
        out = fwd_call(codes3, lcs3, rcs3, ec, ttab, rr, n)
        return out, (codes3, lcs3, rcs3, ec, ttab, rr, n)

    def bwd(res, cts):
        glik, _ = cts   # int32 scaler stream has zero cotangent
        codes3, lcs3, rcs3, ec, ttab, rr, n = res
        lcsT3 = transpose_operator_stack(lcs3, variant, S, C)
        rcsT3 = transpose_operator_stack(rcs3, variant, S, C)
        if variant.startswith("mxu"):
            ecT = jnp.transpose(ec)
        else:
            ecT = transpose_lane_constants(ec, S, C)
        rrT = jnp.transpose(rr)
        gl, gr, gec, grrT = _tree_bwd_call(
            bwd_arrs, codes3, lcs3, rcs3, lcsT3, rcsT3, ec, ecT, ttab,
            rrT, glik, n, n_edges=E, n_leaves=n_leaves, states=S,
            categories=C, block_sites=block_sites, interpret=interpret,
            variant=variant)
        return (None, gl, gr, gec, jnp.zeros_like(ttab),
                jnp.transpose(grrT), None)

    f.defvjp(fwd, bwd)
    return f
