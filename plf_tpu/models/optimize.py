"""Differentiable tree likelihood + on-device branch-length optimisation.

The reference's roadmap wants "updating PLF parameters from the FPGA"
(README.md:201-205) — on TPU this is free: branch transition matrices are
jit inputs computed from branch lengths *inside* the compiled graph, so
``jax.value_and_grad`` gives exact dLL/dt for every branch in one
backward pass, and an optax loop maximises the likelihood entirely
on-device.  (RAxML does this with hand-coded Newton iterations on one
branch at a time; here all branches update simultaneously.)

Two differentiable paths exist (``tree_loglik_fn(backend=...)``):

* ``"pallas"`` (default on TPU): the production fused kernel with its
  custom VJP (ops/plf_grad.py) — forward AND backward run lane-major
  Pallas kernels; branch lengths/rates/weights chain through tiny jnp
  ops into the kernel's lane-constant operators.
* ``"xla"`` (default elsewhere): element-wise jnp PLF stages.

Underflow rescaling is kept in both: the 2^32 factors are constant
w.r.t. branch lengths almost everywhere, so gradients are exact wherever
the likelihood is differentiable.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Backend
from ..reference import MIN_LIKELIHOOD, TWO_TO_THE_32
from .phylo import LIK_FLOOR, LOG_MINLIK, PhyloModel

__all__ = ["tree_loglik_fn", "optimize_branch_lengths", "optimize_alpha",
           "optimize_pinv", "fit_model", "fit_codon"]


def _plf_stage(x1, x2, left, right, ev, S, C):
    """Element-wise PLF (plf_xla stages) on (n, C, S) eigen-coord CLVs."""
    ump1 = jnp.zeros_like(x1)
    ump2 = jnp.zeros_like(x2)
    for a in range(S):
        ump1 = ump1 + x1[:, :, a:a + 1] * left[None, :, :, a]
        ump2 = ump2 + x2[:, :, a:a + 1] * right[None, :, :, a]
    p = ump1 * ump2
    x3 = jnp.zeros_like(p)
    for k in range(S):
        x3 = x3 + p[:, :, k:k + 1] * ev[None, None, k, :]
    mask = jnp.all(jnp.abs(x3) < MIN_LIKELIHOOD, axis=(1, 2))
    x3 = jnp.where(mask[:, None, None], x3 * TWO_TO_THE_32, x3)
    return x3, mask.astype(jnp.int32)


def tree_loglik_fn(pm: PhyloModel, with_rates: bool = False,
                   with_weights: bool = False, backend: str = "auto",
                   mesh=None):
    """Build ``(branch_lengths) -> log_likelihood`` as a pure jittable fn.

    ``branch_lengths``: (n_nodes-1,) vector indexed by child node (every
    node except the root owns the branch to its parent).  Returns
    (fn, t0) with t0 the tree's current lengths.  With ``with_rates`` the
    fn signature is ``(t_vec, rates)`` — the (C,) gamma category rates
    become a traced input (one compilation serves every alpha during a
    gamma-shape line search).  ``with_weights`` additionally traces the
    (C,) category mixture weights — ``(t_vec, rates, weights)`` — for
    +I proportion searches (implies with_rates).

    ``backend``: "tree" runs the whole traversal (forward AND backward)
    as single fused tree kernels with a checkpointed in-VMEM backward
    (ops/plf_tree_grad.py — VJP residuals are O(E*S^2), not
    O(E*sites)); "segmented" is its big-tree generalisation
    (ops/plf_tree_seg.py — the traversal splits into subtree segments,
    residuals are the O(#segments) boundary CLVs, so it scales to trees
    whose single-segment arena cannot fit VMEM); "pallas" routes every
    PLF node through the fused single-node kernel + its custom VJP
    (ops/plf_grad.py); "xla" uses the element-wise jnp stages.  "auto"
    on TPU picks pallas — measured ~25% faster per evaluation (the S=4
    kernel is compute-bound, so the tree backward's recompute isn't
    free) — EXCEPT when the per-node VJP's O(E*sites) HBM residuals
    would not fit (_PERNODE_RESIDUAL_BUDGET), where it picks the tree
    backend, falling back to segmented when even that arena cannot fit
    (benchmarks/treegrad_bench.py, benchmarks/seg_bench.py).
    """
    if pm.config.resolved_kernel_variant == "mxu_bf16":
        # 1-pass bf16 rounds near-underflow site likelihoods negative
        # through deep trees (measured ll drift 1.16e-01 on hardware,
        # r04_protein.csv; its gradient comparison is meaningless) —
        # any optimisation through it silently fits noise.
        raise ValueError(
            "kernel_variant='mxu_bf16' is a bandwidth mode for forward "
            "streaming only; its likelihood drift makes optimisation "
            "unsound — use 'mxu_3x' (fp32-grade, ~half the MXU passes "
            "of 'mxu') for training/fitting")
    if backend == "auto":
        if mesh is not None:
            # sharded: whole-tree VJP when its arena fits, else the
            # segmented VJP (both are shard-local kernels under shard_map)
            backend = "tree" if _tree_backend_block(pm) else "segmented"
        elif jax.default_backend() == "tpu":
            resid = 3 * len(pm.schedule) * pm.config.rows * pm.n_pad * 4
            if pm.config.resolved_kernel_variant.startswith("mxu"):
                # per-node VJP is VPU-only; the whole-tree/segmented
                # backends carry the MXU precision ladder (S>=20
                # training runs at ladder speed, not VPU speed)
                backend = ("tree" if _tree_backend_block(pm)
                           else "segmented")
            elif resid <= _PERNODE_RESIDUAL_BUDGET:
                backend = "pallas"
            elif _tree_backend_block(pm):
                backend = "tree"
            else:
                # Neither the per-node VJP (HBM residuals too big) nor
                # the single-segment tree backward (VMEM arena too big)
                # fits: the segmented checkpointed VJP is the gradient
                # path that scales to big-taxa x big-sites.
                backend = "segmented"
        else:
            backend = "xla"
    if mesh is not None and backend not in ("tree", "segmented"):
        raise ValueError(
            "mesh-sharded gradients require backend='tree' or "
            "'segmented' (the checkpointed whole-tree VJP is the "
            "shard-local kernel)")
    if backend == "segmented":
        return _tree_loglik_fn_tree(pm, with_rates=with_rates,
                                    with_weights=with_weights, mesh=mesh,
                                    segmented=True)
    if backend == "tree":
        return _tree_loglik_fn_tree(pm, with_rates=with_rates,
                                    with_weights=with_weights, mesh=mesh)
    if backend == "pallas":
        return _tree_loglik_fn_pallas(pm, with_rates=with_rates,
                                      with_weights=with_weights)
    cfg = pm.config
    S, C = cfg.states, cfg.categories
    model = pm.model
    schedule = [(p, l, r) for (p, l, r, _, _) in pm.schedule]
    n_leaves = pm.tree.n_leaves
    n = pm.n_sites

    u = jnp.asarray(model.u, jnp.float32)            # (S, S) [state, eig]
    lam = jnp.asarray(model.eigenvalues, jnp.float32)
    rates = jnp.asarray(pm.rates, jnp.float32)       # (C,)
    ev_arr = jnp.asarray(model.plf_ev)               # (S, S) [k, a]
    pi_u = jnp.asarray(model.root_vector, jnp.float32)
    cw = jnp.asarray(pm.rate_weights, jnp.float32)   # (C,) mixture weights
    wgt = jnp.asarray(pm.wgt, jnp.float32)

    # Tip codes ship as a jit ARGUMENT and expand to eigen-coordinate
    # CLVs inside the compiled graph — closing over materialised tip
    # CLVs would embed O(n_leaves * n * C * S) literal constants in the
    # lowered module (observed: 16 leaves x 1M sites = a >1 GB HLO).
    from ..io.alignment import map_tip_codes, tip_expansion_table
    codes_dev = jnp.asarray(map_tip_codes(pm.tip_states, S))  # (n_leaves, n)
    wg_tbl = jnp.asarray(tip_expansion_table(model.w, S)
                         .astype(np.float32))        # (S, S+1+A)
    n_codes = wg_tbl.shape[1]

    def expand_tip(codes_row):
        onehot = (codes_row[None, :] ==
                  jnp.arange(n_codes, dtype=jnp.int32)[:, None]
                  ).astype(jnp.float32)              # (ncode, n)
        x = jnp.matmul(wg_tbl, onehot,
                       precision=jax.lax.Precision.HIGHEST)  # (S, n)
        return jnp.repeat(x.T[:, None, :], C, axis=1)        # (n, C, S)

    t0 = np.array([pm.tree.nodes[i].length
                   for i in range(pm.tree.n_nodes - 1)], np.float32)

    def branch_factor(t, r_vec):
        """(C, S, S) factor: u[k, a] * exp(lam_a * t * r_c)."""
        e = jnp.exp(lam[None, :] * t * r_vec[:, None])   # (C, S)
        return u[None, :, :] * e[:, None, :]

    asc = pm.ascertainment == "lewis"
    d0 = pm.n_sites_obs
    w_total = float(np.sum(pm.wgt))

    def loglik_rates(t_vec, r_vec, w_vec, codes):
        clvs = {}
        scaler_sites = jnp.zeros((n,), jnp.int32)
        for parent, l, r in schedule:
            for ch in (l, r):
                if ch < n_leaves and ch not in clvs:
                    clvs[ch] = expand_tip(codes[ch])
            left = branch_factor(t_vec[l], r_vec)
            right = branch_factor(t_vec[r], r_vec)
            x3, sv = _plf_stage(clvs[l], clvs[r], left, right, ev_arr,
                                S, C)
            clvs[parent] = x3
            scaler_sites = scaler_sites + sv
        root = clvs[schedule[-1][0]]
        # HIGHEST precision: TPU matmul default is bf16-rounded and
        # mixed-sign eigen coords cancel (see models/phylo.py).
        lik = jnp.matmul(root, pi_u,
                         precision=jax.lax.Precision.HIGHEST) @ w_vec
        site_ll = jnp.log(jnp.maximum(lik, jnp.float32(LIK_FLOOR)))
        scaler = jnp.sum(scaler_sites * wgt.astype(jnp.int32))
        ll = jnp.sum(site_ll * wgt) + scaler * jnp.float32(LOG_MINLIK)
        if asc:
            log_pc = (site_ll[d0:]
                      + scaler_sites[d0:] * jnp.float32(LOG_MINLIK))
            p_const = jnp.sum(jnp.exp(log_pc))
            ll = ll - w_total * jnp.log1p(-p_const)
        return ll

    jfn = jax.jit(loglik_rates)
    if with_weights:
        return (lambda t_vec, r_vec, w_vec:
                jfn(t_vec, r_vec, w_vec, codes_dev)), t0
    if with_rates:
        return (lambda t_vec, r_vec: jfn(t_vec, r_vec, cw, codes_dev)), t0
    return (lambda t_vec: jfn(t_vec, rates, cw, codes_dev)), t0


def _tree_loglik_fn_pallas(pm: PhyloModel, with_rates: bool = False,
                           with_weights: bool = False):
    """Pallas-path twin of :func:`tree_loglik_fn`: every PLF node runs
    the fused kernel forward + custom-VJP backward (ops/plf_grad.py);
    branch lengths / rates / mixture weights enter through the
    lane-constant operators, which are tiny differentiable jnp
    transforms of the eigensystem."""
    from ..ops import layout as L
    from ..ops.plf_grad import make_plf_diff

    cfg = pm.config
    S, C = cfg.states, cfg.categories
    model = pm.model
    schedule = [(p, l, r) for (p, l, r, _, _) in pm.schedule]
    n_leaves = pm.tree.n_leaves
    n, n_pad = pm.n_sites, pm.n_pad
    root = pm.tree.root
    interpret = cfg.interpret or (jax.default_backend() != "tpu")

    u = jnp.asarray(model.u, jnp.float32)            # (S, S) [state, eig]
    lam = jnp.asarray(model.eigenvalues, jnp.float32)
    rates = jnp.asarray(pm.rates, jnp.float32)
    pi_u = jnp.asarray(model.root_vector, jnp.float32)
    cw = jnp.asarray(pm.rate_weights, jnp.float32)
    ec = jnp.asarray(L.ev_to_lane_constants(model.plf_ev, S, C))
    wpad = jnp.asarray(np.concatenate(
        [pm.wgt.astype(np.float32), np.zeros(n_pad - n, np.float32)]))

    # Tip codes are a jit argument; lane-major tip CLVs (rows a*C + c)
    # expand inside the graph, one leaf at a time at its point of use —
    # no O(n_leaves * n_pad) fp32 constants in the module or in HBM
    # (each leaf of a binary tree is consumed exactly once).  The
    # C-fold row replication happens on the (S, S+1) TABLE, not on the
    # (rows, n_pad) array, so expansion is a single memory pass.
    from ..io.alignment import tip_expansion_table
    wg_tbl = tip_expansion_table(model.w, S).astype(np.float32)
    ttab_rep = jnp.asarray(np.repeat(wg_tbl, C, axis=0))  # (rows, ncode)
    codes_dev = pm._codes                            # (n_leaves, n_pad)

    def expand_tip(codes_row):
        onehot = (codes_row[None, :] ==
                  jnp.arange(wg_tbl.shape[1], dtype=jnp.int32)[:, None]
                  ).astype(jnp.float32)
        return jnp.matmul(ttab_rep, onehot,
                          precision=jax.lax.Precision.HIGHEST)

    pdiff = make_plf_diff(states=S, categories=C,
                          block_sites=cfg.block_sites, interpret=interpret)
    t0 = np.array([pm.tree.nodes[i].length
                   for i in range(pm.tree.n_nodes - 1)], np.float32)

    def lane_const(t, r_vec):
        """branch_factor -> (S*C, S) lane constants, lc[k*C+c, a]."""
        e = jnp.exp(lam[None, :] * t * r_vec[:, None])     # (C, S) [c, a]
        b = u[None, :, :] * e[:, None, :]                  # [c, k, a]
        return jnp.transpose(b, (1, 0, 2)).reshape(S * C, S)

    asc = pm.ascertainment == "lewis"
    d0 = pm.n_sites_obs
    w_total = float(np.sum(pm.wgt))
    n_dev = jnp.int32(n)

    def loglik_rates(t_vec, r_vec, w_vec, codes):
        clvs = {}
        scaler_sites = jnp.zeros((1, n_pad), jnp.int32)
        for parent, l, r in schedule:
            x1, x2 = [expand_tip(codes[ch]) if ch < n_leaves
                      else clvs.pop(ch) for ch in (l, r)]
            lc = lane_const(t_vec[l], r_vec)
            rc = lane_const(t_vec[r], r_vec)
            x3, sc = pdiff(x1, x2, lc, rc, ec, n_dev)
            clvs[parent] = x3
            scaler_sites = scaler_sites + sc
        x_root = clvs[root]
        rows_vec = jnp.repeat(pi_u, C) * jnp.tile(w_vec, S)
        lik = jnp.matmul(rows_vec[None, :], x_root,
                         precision=jax.lax.Precision.HIGHEST)[0]  # (n_pad,)
        site_ll = jnp.log(jnp.maximum(lik[:n], jnp.float32(LIK_FLOOR)))
        sc_row = scaler_sites[0].astype(jnp.float32)
        scaler = jnp.sum(sc_row * wpad)
        ll = (jnp.sum(site_ll * wpad[:n]) + scaler * jnp.float32(LOG_MINLIK))
        if asc:
            log_pc = (site_ll[d0:]
                      + sc_row[d0:n] * jnp.float32(LOG_MINLIK))
            p_const = jnp.sum(jnp.exp(log_pc))
            ll = ll - w_total * jnp.log1p(-p_const)
        return ll

    jfn = jax.jit(loglik_rates)
    if with_weights:
        return (lambda t_vec, r_vec, w_vec:
                jfn(t_vec, r_vec, w_vec, codes_dev)), t0
    if with_rates:
        return (lambda t_vec, r_vec: jfn(t_vec, r_vec, cw, codes_dev)), t0
    return (lambda t_vec: jfn(t_vec, rates, cw, codes_dev)), t0


#: HBM budget for the per-node custom-VJP residuals (x1/x2/x3 per node,
#: 3 * E * rows * n_pad * 4 bytes).  Above this, gradient evaluations
#: switch to the checkpointed whole-tree backend whose residuals are
#: site-independent (v5e has 16 GB HBM; leave room for inputs + XLA).
_PERNODE_RESIDUAL_BUDGET = 4 * 2 ** 30


def _tree_backend_block(pm: PhyloModel,
                        vmem_budget: int = 10 * 2 ** 20) -> Optional[int]:
    """Largest usable block for the checkpointed tree backward, or None.

    The backward arena holds every tip + node CLV for one site block:
    (E + n_leaves) * rows * block * 4 bytes
    (ops/plf_tree_grad.tree_bwd_vmem_bytes).  Halve the block until it
    fits (it must still divide n_pad, which is a multiple of
    config.block_sites)."""
    from ..ops.plf_tree_grad import tree_bwd_vmem_bytes

    cfg = pm.config
    E = len(pm.schedule)
    # must match make_tree_diff's own validation exactly (it counts the
    # operator stacks at width S for the VPU form too) — a mismatch
    # makes the selector approve blocks the factory rejects and auto
    # crash instead of falling back to the segmented backend
    W = (cfg.rows if cfg.resolved_kernel_variant.startswith("mxu")
         else cfg.states)
    # Only 128-multiple divisors of the configured block are valid: the
    # PLFConfig lane constraint must hold AND the block must divide
    # n_pad (which is a multiple of cfg.block_sites).
    for bs in range(cfg.block_sites, 127, -128):
        if cfg.block_sites % bs:
            continue
        if (tree_bwd_vmem_bytes(E, pm.tree.n_leaves, cfg.rows, bs,
                                op_width=W)
                <= vmem_budget and pm.n_pad % bs == 0):
            return bs
    return None


def _tree_loglik_fn_tree(pm: PhyloModel, with_rates: bool = False,
                         with_weights: bool = False, mesh=None,
                         segmented: bool = False):
    """Whole-tree fused backend of :func:`tree_loglik_fn`: ONE kernel
    dispatch forward and ONE backward per evaluation, with the backward
    recomputing CLVs in a VMEM arena (ops/plf_tree_grad.py).  Branch
    lengths / rates / mixture weights chain through the per-edge
    lane-constant stacks and the root-row vector.

    With ``mesh`` (a Mesh with a "sites" axis) the kernels run under
    shard_map with the site axis sharded: each device executes the
    forward AND checkpointed backward on its shard only, and shard_map's
    transpose psums the replicated operand cotangents (the per-edge
    operator-stack gradients) over ICI — a fully distributed training
    step whose only cross-device traffic is O(E*S^2) gradient stacks
    plus the scalar reduction."""
    from ..ops import layout as L
    from ..ops.plf_tree_grad import make_tree_diff, tree_bwd_vmem_bytes
    from ..ops.plf_tree_pallas import reorder_schedule

    cfg = pm.config
    S, C = cfg.states, cfg.categories
    model = pm.model
    n_leaves = pm.tree.n_leaves
    n, n_pad = pm.n_sites, pm.n_pad
    interpret = cfg.interpret or (jax.default_backend() != "tpu")
    if segmented:
        bs = cfg.block_sites     # plan_segments auto-shrinks internally
    else:
        bs = _tree_backend_block(pm)
        if bs is None:
            raise ValueError(
                f"tree too large for the single-segment checkpointed "
                f"backward ({len(pm.schedule)} edges); use "
                f"backend='segmented'")
    sched_r = reorder_schedule(pm.schedule, n_leaves)
    pairs = [(l, r) for (_, l, r, *_rest) in sched_r]

    # Tip codes stay wherever they live (device arrays are NOT fetched to
    # host — at 1e8 sites that round-trip is GBs through the host link);
    # any repad happens with jnp ops.
    codes_dev = jnp.asarray(pm._codes)
    if mesh is not None:
        # site axis sharded: repad so every shard is a block multiple
        ndev = mesh.shape["sites"]
        unit = ndev * bs
        n_pad = max(unit, -(-n // unit) * unit)
        shard = n_pad // ndev
    if codes_dev.shape[-1] < n_pad:
        codes_dev = jnp.concatenate(
            [codes_dev,
             jnp.full((n_leaves, n_pad - codes_dev.shape[-1]), S,
                      codes_dev.dtype)], axis=-1)
    codes_dev = codes_dev[:, :n_pad]

    u = jnp.asarray(model.u, jnp.float32)
    lam = jnp.asarray(model.eigenvalues, jnp.float32)
    rates = jnp.asarray(pm.rates, jnp.float32)
    pi_u = jnp.asarray(model.root_vector, jnp.float32)
    cw = jnp.asarray(pm.rate_weights, jnp.float32)
    variant = (cfg.resolved_kernel_variant
               if cfg.backend is not Backend.XLA else "vpu")
    # Training keeps the auto ladder's mxu_3x at S>=20: under the
    # order-bias-free interleaved protocol the 3-pass backward is 1.6x
    # FASTER than 6-pass HIGHEST (S=20 64x131k value_and_grad 63.8 vs
    # 103.0 ms; S=61 107.0 vs 155.7; r05_interleave.txt — earlier
    # single-shot orderings that showed the opposite were the
    # fresh-process warm-up transient).  Accuracy trade: mxu_3x grad
    # err ~1.9e-03 relative vs HIGHEST's 7e-06 (r04_protein.csv), with
    # ll drift pinned non-compounding to 256 taxa
    # (tests/test_tree_seg.py depth ladder); configure
    # kernel_variant="mxu" for fp32-grade final fits.
    if variant.startswith("mxu"):
        ec = jnp.asarray(L.ev_to_block_matrix(model.plf_ev, S, C))
    else:
        ec = jnp.asarray(L.ev_to_lane_constants(model.plf_ev, S, C))
    # Site weights ride as a jit ARGUMENT (O(sites) closure constants
    # embed in the HLO and blow the remote compiler's request limit);
    # the ubiquitous all-ones case is built on device.
    if np.all(pm.wgt == 1):
        wpad = (jnp.arange(n_pad, dtype=jnp.int32)
                < jnp.int32(n)).astype(jnp.float32)
    else:
        wpad = jnp.asarray(np.concatenate(
            [pm.wgt.astype(np.float32), np.zeros(n_pad - n, np.float32)]))
    from ..io.alignment import tip_expansion_table
    wg_tbl = tip_expansion_table(model.w, S).astype(np.float32)
    wg_tbl = wg_tbl[:, :pm._tip_ncols]    # observed-code trim (phylo)
    ttab_rep = jnp.asarray(np.repeat(wg_tbl, C, axis=0))   # (rows, ncode)
    codes3 = codes_dev.reshape(n_leaves, 1, n_pad)

    if segmented:
        from ..ops.plf_tree_seg import make_tree_diff_segmented
        if cfg.dtype == "bfloat16":
            import warnings
            warnings.warn(
                "optimising through bf16 boundary-CLV storage: "
                "likelihoods/gradients carry ~1e-3-class rounding from "
                "the bf16 streams; use dtype='float32' for final fits",
                stacklevel=2)
        tdiff_local = make_tree_diff_segmented(
            sched_r, n_leaves, states=S, categories=C, block_sites=bs,
            interpret=interpret, variant=variant, dtype=cfg.dtype)
    else:
        tdiff_local = make_tree_diff(sched_r, n_leaves, states=S,
                                     categories=C, block_sites=bs,
                                     interpret=interpret,
                                     variant=variant)
    if mesh is None:
        tdiff = tdiff_local
    else:
        from jax.sharding import PartitionSpec as P

        def tdiff(codes3, lcs3, rcs3, ec, ttab, rr, ns):
            def local(codes_s, lcs3, rcs3, ec, ttab, rr, ns):
                rank = jax.lax.axis_index("sites")
                n_local = jnp.clip(ns - rank * shard, 0, shard)
                return tdiff_local(codes_s, lcs3, rcs3, ec, ttab, rr,
                                   n_local)

            rep = P(None, None)
            return jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(None, None, "sites"), P(None, None, None),
                          P(None, None, None), rep, rep, rep, P()),
                out_specs=(P(None, "sites"), P(None, "sites")),
                check_vma=False,
            )(codes3, lcs3, rcs3, ec, ttab, rr, ns)
    t0 = np.array([pm.tree.nodes[i].length
                   for i in range(pm.tree.n_nodes - 1)], np.float32)

    if variant.startswith("mxu"):
        # block-matrix operator M[k*C+c, a*C+c] = b[c, k, a]
        # (layout.branch_to_block_matrix as a differentiable scatter —
        # its VJP is the gather back to the (C, S, S) parameter cube)
        _cc, _kk, _aa = np.meshgrid(np.arange(C), np.arange(S),
                                    np.arange(S), indexing="ij")
        blk_rows = jnp.asarray(_kk * C + _cc)
        blk_cols = jnp.asarray(_aa * C + _cc)

        def lane_const(t, r_vec):
            e = jnp.exp(lam[None, :] * t * r_vec[:, None])     # (C, S)
            b = u[None, :, :] * e[:, None, :]                  # [c, k, a]
            z = jnp.zeros((S * C, S * C), jnp.float32)
            return z.at[blk_rows, blk_cols].set(b)
    else:
        def lane_const(t, r_vec):
            e = jnp.exp(lam[None, :] * t * r_vec[:, None])   # (C, S) [c, a]
            b = u[None, :, :] * e[:, None, :]                # [c, k, a]
            return jnp.transpose(b, (1, 0, 2)).reshape(S * C, S)

    asc = pm.ascertainment == "lewis"
    d0 = pm.n_sites_obs
    w_total = float(np.sum(pm.wgt))
    n_dev = jnp.int32(n)

    def loglik_rates(t_vec, r_vec, w_vec, codes3, wpad):
        # per-edge operator stacks, position-indexed on the reordered
        # schedule (vmap over the gathered child branch lengths)
        t_l = jnp.stack([t_vec[l] for l, _ in pairs])
        t_r = jnp.stack([t_vec[r] for _, r in pairs])
        lcs3 = jax.vmap(lambda t: lane_const(t, r_vec))(t_l)
        rcs3 = jax.vmap(lambda t: lane_const(t, r_vec))(t_r)
        rr = (jnp.repeat(pi_u, C) * jnp.tile(w_vec, S))[None, :]
        lik, sc = tdiff(codes3, lcs3, rcs3, ec, ttab_rep, rr, n_dev)
        site_ll = jnp.log(jnp.maximum(lik[0, :n], jnp.float32(LIK_FLOOR)))
        sc_row = sc[0].astype(jnp.float32)
        scaler = jnp.sum(sc_row * wpad)
        ll = (jnp.sum(site_ll * wpad[:n])
              + scaler * jnp.float32(LOG_MINLIK))
        if asc:
            log_pc = (site_ll[d0:]
                      + sc_row[d0:n] * jnp.float32(LOG_MINLIK))
            p_const = jnp.sum(jnp.exp(log_pc))
            ll = ll - w_total * jnp.log1p(-p_const)
        return ll

    jfn = jax.jit(loglik_rates)
    if with_weights:
        fn = (lambda t_vec, r_vec, w_vec:
              jfn(t_vec, r_vec, w_vec, codes3, wpad))
    elif with_rates:
        fn = (lambda t_vec, r_vec:
              jfn(t_vec, r_vec, cw, codes3, wpad))
    else:
        fn = lambda t_vec: jfn(t_vec, rates, cw, codes3, wpad)
    # introspection for tests/tooling: which kernel variant and engine
    # this differentiable path actually runs (the auto ladder's choice)
    fn.variant = variant
    fn.engine = "segmented" if segmented else "tree"
    return fn, t0


def optimize_branch_lengths(pm: PhyloModel, steps: int = 100,
                            learning_rate: float = 0.02,
                            min_length: float = 1e-6,
                            backend: str = "auto", mesh=None
                            ) -> Tuple[np.ndarray, float, float]:
    """Maximise the tree likelihood over all branch lengths on device.

    Optimises in log-space (lengths stay positive) with optax adam.
    On TPU the likelihood and its gradient run the fused Pallas kernels
    (backend="auto" -> "pallas"; see tree_loglik_fn).  With ``mesh`` the
    forward/backward kernels run site-sharded over the device mesh
    (implies backend="tree").
    Returns (optimised_lengths, ll_before, ll_after).
    """
    import optax

    fn, t0 = tree_loglik_fn(pm, backend=backend, mesh=mesh)
    ll0 = float(fn(jnp.asarray(t0)))

    def loss(log_t):
        return -fn(jnp.exp(log_t) + min_length)

    opt = optax.adam(learning_rate)
    log_t = jnp.log(jnp.maximum(jnp.asarray(t0), min_length))
    state = opt.init(log_t)

    def step(log_t, state):
        val, g = jax.value_and_grad(loss)(log_t)
        updates, state = opt.update(g, state)
        return optax.apply_updates(log_t, updates), state, val

    # Re-jitting `fn` captures its device tip codes as a lowering
    # CONSTANT of the step program — fine at test sizes, but O(sites)
    # constants hang the remote compiler on big alignments (the inner
    # likelihood fn is already jitted with codes as an argument, so the
    # un-jitted step only adds eager optax math on ~E scalars per step).
    # Budget BOTH the CLV working set and the embedded codes matrix
    # (n_leaves x n_pad — the term that dominates at high taxon counts).
    embedded = (pm.n_pad * pm.config.rows * 4
                + pm.tree.n_leaves * pm.n_pad * 4)
    if embedded <= (1 << 28):
        step = jax.jit(step)

    for _ in range(steps):
        log_t, state, val = step(log_t, state)
    t_opt = np.asarray(jnp.exp(log_t) + min_length)
    ll1 = float(fn(jnp.asarray(t_opt)))
    return t_opt, ll0, ll1


def _golden_section(f, lo: float, hi: float, iters: int = 30):
    """Maximise a unimodal scalar function on [lo, hi]."""
    invphi = (np.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c = b - invphi * (b - a)
    d = a + invphi * (b - a)
    fc, fd = f(c), f(d)
    for _ in range(iters):
        if fc > fd:
            b, d, fd = d, c, fc
            c = b - invphi * (b - a)
            fc = f(c)
        else:
            a, c, fc = c, d, fd
            d = a + invphi * (b - a)
            fd = f(d)
    x = (a + b) / 2.0
    return x, f(x)


def optimize_alpha(pm: PhyloModel, alpha_bounds=(0.02, 100.0),
                   iters: int = 30, backend: str = "auto"
                   ) -> Tuple[float, float, float]:
    """Maximum-likelihood gamma shape (alpha) at fixed tree and lengths.

    Golden-section search in log-alpha (RAxML optimises alpha with Brent
    on the same 1-D profile).  The discrete-gamma quantile discretisation
    runs on host per candidate; the tree likelihood is ONE compiled
    function of the (C,) rate vector, so the line search costs ~``iters``
    device calls and a single compilation.

    Returns (alpha_hat, ll_before, ll_after); ``ll_before`` uses the
    PhyloModel's current rates.
    """
    from .substitution import discrete_gamma_rates, gamma_invariant_rates

    C = pm.config.categories
    fn, t0 = tree_loglik_fn(pm, with_rates=True, backend=backend)
    t_dev = jnp.asarray(t0)
    ll0 = float(fn(t_dev, jnp.asarray(pm.rates, jnp.float32)))

    def rates_of(alpha: float) -> np.ndarray:
        # +I models carry the rate-0 category at index 0 and C-1 gamma
        # categories (the mixture weights are fixed in the compiled fn).
        if pm.p_inv is not None:
            return gamma_invariant_rates(alpha, pm.p_inv, C - 1)[0]
        return discrete_gamma_rates(alpha, C)

    def ll_of_log_alpha(la: float) -> float:
        r = rates_of(float(np.exp(la)))
        return float(fn(t_dev, jnp.asarray(r, jnp.float32)))

    la, ll1 = _golden_section(ll_of_log_alpha, np.log(alpha_bounds[0]),
                              np.log(alpha_bounds[1]), iters)
    return float(np.exp(la)), ll0, ll1


def optimize_pinv(pm: PhyloModel, alpha: Optional[float] = None,
                  bounds=(1e-4, 0.99), iters: int = 30,
                  backend: str = "auto") -> Tuple[float, float, float]:
    """Maximum-likelihood invariant-site proportion (+I / +I+G profile).

    ``pm`` must have been built with ``p_inv`` (so the rate-0 category
    exists).  Golden-section search over p_inv at fixed tree, lengths
    and gamma shape ``alpha`` (default: the shape implied by pm.rates);
    both the rate rescaling 1/(1-p_inv) and the mixture weights vary per
    candidate through ONE compiled likelihood (weights are traced).

    Returns (p_inv_hat, ll_before, ll_after).
    """
    from .substitution import gamma_invariant_rates

    if pm.p_inv is None:
        raise ValueError("build the PhyloModel with p_inv to optimise it")
    C = pm.config.categories            # includes the invariant category
    fn, t0 = tree_loglik_fn(pm, with_weights=True, backend=backend)
    t_dev = jnp.asarray(t0)
    ll0 = float(fn(t_dev, jnp.asarray(pm.rates, jnp.float32),
                   jnp.asarray(pm.rate_weights, jnp.float32)))
    # Gamma rates at weight-free scale; candidate p rescales them.
    if alpha is None:
        base_g = np.asarray(pm.rates[1:]) * (1.0 - pm.p_inv)
    else:
        from .substitution import discrete_gamma_rates
        base_g = discrete_gamma_rates(alpha, C - 1)

    def ll_of(p: float) -> float:
        rates = np.concatenate([[0.0], base_g / (1.0 - p)])
        weights = np.concatenate([[p], np.full(C - 1, (1.0 - p) / (C - 1))])
        return float(fn(t_dev, jnp.asarray(rates, jnp.float32),
                        jnp.asarray(weights, jnp.float32)))

    p_hat, ll1 = _golden_section(ll_of, bounds[0], bounds[1], iters)
    return float(p_hat), ll0, ll1


# ---------------------------------------------------------------------------
# Full model fitting: GTR exchangeabilities + base frequencies + branch
# lengths, all by gradient ascent with the eigendecomposition INSIDE the
# compiled graph (jnp.linalg.eigh is differentiable for the symmetrised
# reversible form).  The gamma shape alpha stays an outer-loop scalar
# (its discretisation uses a quantile function with no stable jax grad).
# ---------------------------------------------------------------------------


def _gtr_eigen_jnp(log_rates, logits_pi, S):
    """Differentiable reversible-Q eigensystem (substitution._make in jnp).

    Returns (lam, u, w, pi).  Caution: exactly degenerate eigenvalues
    (e.g. literal JC69) make eigh gradients NaN — start from slightly
    perturbed rates.
    """
    rates = jnp.exp(log_rates)
    pi = jax.nn.softmax(logits_pi)
    iu = np.triu_indices(S, 1)
    qsym = jnp.zeros((S, S)).at[iu].set(rates)
    qsym = qsym + qsym.T
    q = qsym * pi[None, :]
    q = q - jnp.diag(jnp.sum(q, axis=1))
    rate = -jnp.sum(pi * jnp.diag(q))
    q = q / rate
    d = jnp.sqrt(pi)
    b = (q * d[:, None]) / d[None, :]
    b = 0.5 * (b + b.T)
    lam, v = jnp.linalg.eigh(b)
    u = v / d[:, None]
    w = v.T * d[None, :]
    return lam, u, w, pi


def fit_model(pm: PhyloModel, steps: int = 150, learning_rate: float = 0.02,
              min_length: float = 1e-6, fit_lengths: bool = True,
              fit_alpha: bool = False, alpha_rounds: int = 2,
              alpha_bounds=(0.02, 100.0), seed: int = 0):
    """Maximum-likelihood fit of GTR rates, frequencies and branch lengths.

    Starts from the PhyloModel's current model/lengths (rates jittered to
    avoid eigh degeneracies).  Returns
    ``(fitted SubstitutionModel, fitted lengths, ll_before, ll_after)``.

    With ``fit_alpha`` the gamma shape is fitted too, by coordinate
    descent: the adam steps split into ``alpha_rounds`` epochs with a
    golden-section alpha line search after each (the discretisation's
    quantile function has no stable jax gradient, so alpha stays an
    outer-loop scalar; every line-search step reuses the one compiled
    likelihood because the (C,) rate vector is a traced input).  With
    ``fit_alpha`` the return gains a fifth element: ``(..., alpha_hat)``.
    """
    import optax
    from .substitution import SubstitutionModel

    cfg = pm.config
    S, C = cfg.states, cfg.categories
    schedule = [(p, l, r) for (p, l, r, _, _) in pm.schedule]
    n_leaves = pm.tree.n_leaves
    rates_gamma = jnp.asarray(pm.rates, jnp.float32)
    wgt = jnp.asarray(pm.wgt, jnp.float32)
    from ..io.alignment import map_tip_codes, tip_expansion_table
    codes_dev = jnp.asarray(map_tip_codes(pm.tip_states, S))

    # Initial parameters from the current model: recover the
    # exchangeabilities from Q = U diag(lam) W via qsym[i,j] = q[i,j]/pi[j].
    m0 = pm.model
    q0 = (m0.u * m0.eigenvalues[None, :]) @ m0.w
    iu = np.triu_indices(S, 1)
    ex0 = np.clip(q0[iu] / m0.pi[iu[1]], 1e-3, None)
    rng = np.random.default_rng(seed)
    ex0 = ex0 * np.exp(rng.normal(0, 1e-3, ex0.shape))  # break degeneracy
    params0 = {
        "log_rates": jnp.asarray(np.log(ex0), jnp.float32),
        "logits_pi": jnp.asarray(np.log(m0.pi), jnp.float32),
        "log_t": jnp.log(jnp.maximum(jnp.asarray(
            [pm.tree.nodes[i].length for i in range(pm.tree.n_nodes - 1)],
            dtype=jnp.float32), min_length)),
    }

    def loglik(params, rates_gamma, codes):
        # codes is a jit ARGUMENT: closing over it embeds the whole tip
        # matrix as an HLO constant (bloats the module at large n).
        lam, u, w, pi = _gtr_eigen_jnp(params["log_rates"],
                                       params["logits_pi"], S)
        lam = lam.astype(jnp.float32)
        u = u.astype(jnp.float32)
        w = w.astype(jnp.float32)
        t_vec = jnp.exp(params["log_t"]) + min_length
        if not fit_lengths:
            t_vec = jax.lax.stop_gradient(t_vec)
        ev_arr = w.T                               # EVarr[k, a] = W[l? see
        # substitution.SubstitutionModel.plf_ev: EVarr = w.T
        wg = tip_expansion_table(w, S)             # tip table (S, S+1+A)

        def tip_clv(leaf):
            onehot = (codes[leaf][None, :] ==
                      jnp.arange(wg.shape[1])[:, None]).astype(jnp.float32)
            x = jnp.matmul(wg, onehot,
                           precision=jax.lax.Precision.HIGHEST)
            return jnp.repeat(x[None, :, :], C, axis=0).transpose(2, 0, 1)

        def branch_factor(t):
            e = jnp.exp(lam[None, :] * t * rates_gamma[:, None])
            return u[None, :, :] * e[:, None, :]

        clvs = {leaf: tip_clv(leaf) for leaf in range(n_leaves)}
        scaler_sites = jnp.zeros((pm.n_sites,), jnp.int32)
        for parent, l, r in schedule:
            x3, sv = _plf_stage(clvs[l], clvs[r], branch_factor(t_vec[l]),
                                branch_factor(t_vec[r]), ev_arr, S, C)
            clvs[parent] = x3
            scaler_sites = scaler_sites + sv
        root = clvs[schedule[-1][0]]
        lik = jnp.matmul(
            root, pi @ u,
            precision=jax.lax.Precision.HIGHEST) @ jnp.asarray(
                pm.rate_weights, jnp.float32)
        site_ll = jnp.log(jnp.maximum(lik, jnp.float32(LIK_FLOOR)))
        scaler = jnp.sum(scaler_sites * wgt.astype(jnp.int32))
        ll = jnp.sum(site_ll * wgt) + scaler * jnp.float32(LOG_MINLIK)
        if pm.ascertainment == "lewis":
            log_pc = (site_ll[pm.n_sites_obs:]
                      + scaler_sites[pm.n_sites_obs:]
                      * jnp.float32(LOG_MINLIK))
            ll = ll - float(np.sum(pm.wgt)) * jnp.log1p(
                -jnp.sum(jnp.exp(log_pc)))
        return ll

    _loglik_j = jax.jit(loglik)
    loglik_c = lambda params, rg: _loglik_j(params, rg, codes_dev)
    rg = rates_gamma
    ll0 = float(loglik_c(params0, rg))
    opt = optax.adam(learning_rate)
    state = opt.init(params0)

    @jax.jit
    def _step(params, state, rg, codes):
        val, g = jax.value_and_grad(
            lambda p: -loglik(p, rg, codes))(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, val

    step = lambda params, state, rg: _step(params, state, rg, codes_dev)

    params = params0
    alpha_hat = None
    if fit_alpha:
        from .substitution import discrete_gamma_rates, gamma_invariant_rates

        def rates_of(alpha: float) -> np.ndarray:
            if pm.p_inv is not None:
                return gamma_invariant_rates(alpha, pm.p_inv, C - 1)[0]
            return discrete_gamma_rates(alpha, C)

        epochs = max(1, alpha_rounds)
        per = max(1, steps // epochs)
        for _ in range(epochs):
            for _ in range(per):
                params, state, _ = step(params, state, rg)

            def ll_of_la(la, params=params):
                r = rates_of(float(np.exp(la)))
                return float(loglik_c(params, jnp.asarray(r, jnp.float32)))

            la, _ = _golden_section(ll_of_la, np.log(alpha_bounds[0]),
                                    np.log(alpha_bounds[1]), iters=25)
            alpha_hat = float(np.exp(la))
            rg = jnp.asarray(rates_of(alpha_hat), jnp.float32)
    else:
        for _ in range(steps):
            params, state, _ = step(params, state, rg)
    ll1 = float(loglik_c(params, rg))

    # materialise the fitted model on host
    from .substitution import gtr
    fitted = gtr(np.exp(np.asarray(params["log_rates"], np.float64)),
                 np.asarray(jax.nn.softmax(params["logits_pi"]),
                            np.float64))
    t_opt = np.asarray(jnp.exp(params["log_t"]) + min_length)
    if fit_alpha:
        return fitted, t_opt, ll0, ll1, alpha_hat
    return fitted, t_opt, ll0, ll1


# ---------------------------------------------------------------------------
# Codon-model fitting: ML estimation of the GY94 omega (dN/dS) and kappa
# on the 2-D profile likelihood.  dN/dS estimation is the reason codon
# models exist; this is the host-side model workflow around the S=61
# kernel path (the reference computes the PLF under caller-supplied
# operators, /root/reference/app/src/plf.cpp:8-68 — producing those
# operators from data is the production step above it).
# ---------------------------------------------------------------------------


def fit_codon(tree, tip_states, wgt=None, alpha: Optional[float] = None,
              config=None, pi: Optional[np.ndarray] = None,
              kappa0: float = 2.0, omega0: float = 0.5,
              kappa_bounds=(0.2, 40.0), omega_bounds=(1e-3, 10.0),
              rounds: int = 3, iters: int = 10,
              fit_lengths: bool = True, length_steps: int = 60,
              fit_alpha: bool = False, verbose: bool = False):
    """Maximum-likelihood GY94 fit: omega (dN/dS), kappa, F3x4
    frequencies, branch lengths (and optionally the gamma shape).

    ``tip_states``: (n_leaves, n_codons) codon state codes
    (substitution.encode_codon_alignment).  Frequencies default to the
    F3x4 estimate from the data (substitution.f3x4_from_codes).

    Strategy: coordinate golden-section on the (log kappa, log omega)
    profile — each candidate rebuilds the 61-state eigendecomposition
    on host (~ms) and evaluates ONE whole-tree likelihood on device;
    all evaluations share a single compiled kernel per tree shape, so
    a fit costs ~``2 * rounds * iters`` device calls.  Branch lengths
    are fitted under the initial model (device VJP through the MXU
    ladder — ``kernel_variant`` auto-resolves to mxu_3x at S=61) and
    re-fitted under the winner.  The 2-D profile is smooth and
    near-unimodal in practice (the standard codeml experience); use
    more ``rounds`` for flat likelihood surfaces.

    Returns ``(model, info)`` with ``info`` a dict holding kappa,
    omega, alpha, lengths (node-indexed vector) and ll.
    """
    from ..config import PLFConfig
    from .phylo import PhyloModel
    from .substitution import codon_gy94, f3x4_from_codes
    from .tree import Tree, TreeNode

    codes = np.asarray(tip_states)
    if pi is None:
        pi = f3x4_from_codes(codes, wgt)
    cfg = config or PLFConfig(states=61, kernel_variant="auto",
                              block_sites=1024)

    def with_lengths(t: Tree, t_vec) -> Tree:
        nodes = [TreeNode(n.index, n.name,
                          float(t_vec[n.index]) if n.index < len(t_vec)
                          else n.length, n.children)
                 for n in t.nodes]
        return Tree(nodes=nodes, root=t.root)

    kappa, omega = float(kappa0), float(omega0)
    alpha_hat = alpha

    def ll_of(k: float, w: float, t: Tree) -> float:
        m = codon_gy94(k, w, pi)
        pm = PhyloModel(t, m, codes, wgt=wgt, alpha=alpha_hat,
                        config=cfg)
        return pm.log_likelihood().log_likelihood

    # initial branch lengths under the starting model
    if fit_lengths:
        pm = PhyloModel(tree, codon_gy94(kappa, omega, pi), codes,
                        wgt=wgt, alpha=alpha_hat, config=cfg)
        t_opt, _, _ = optimize_branch_lengths(pm, steps=length_steps)
        tree = with_lengths(tree, np.asarray(t_opt))

    for r in range(rounds):
        lw, _ = _golden_section(
            lambda x: ll_of(kappa, float(np.exp(x)), tree),
            np.log(omega_bounds[0]), np.log(omega_bounds[1]), iters)
        omega = float(np.exp(lw))
        lk, _ = _golden_section(
            lambda x: ll_of(float(np.exp(x)), omega, tree),
            np.log(kappa_bounds[0]), np.log(kappa_bounds[1]), iters)
        kappa = float(np.exp(lk))
        if fit_alpha:
            pm = PhyloModel(tree, codon_gy94(kappa, omega, pi), codes,
                            wgt=wgt, alpha=alpha_hat or 0.5, config=cfg)
            alpha_hat, _, _ = optimize_alpha(pm)
        if verbose:
            print(f"fit_codon round {r}: kappa={kappa:.3f} "
                  f"omega={omega:.4f} alpha={alpha_hat}", flush=True)

    model = codon_gy94(kappa, omega, pi)
    if fit_lengths:
        pm = PhyloModel(tree, model, codes, wgt=wgt, alpha=alpha_hat,
                        config=cfg)
        t_opt, _, ll = optimize_branch_lengths(pm,
                                               steps=length_steps // 2)
        tree = with_lengths(tree, np.asarray(t_opt))
    else:
        t_opt = np.asarray([tree.nodes[i].length
                            for i in range(tree.n_nodes - 1)])
        ll = ll_of(kappa, omega, tree)
    info = dict(kappa=kappa, omega=omega, alpha=alpha_hat,
                lengths=np.asarray(t_opt), ll=float(ll), pi=pi,
                tree=tree)
    return model, info
