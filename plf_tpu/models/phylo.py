"""Whole-tree likelihood evaluation: the production driver around the PLF.

This is the flagship model of the framework: the entire post-order tree
traversal — every internal node's fused PLF, the underflow-scaler
accumulation, and the root likelihood reduction — compiles into ONE XLA
dispatch per (tree, site-count) shape.  It corresponds to the RAxML
context the reference accelerator plugs into (one ``newviewGAMMA`` per
internal node per evaluation; the reference benchmarks ``plf_calls``
repetitions of a single node, host_mem.cpp:283-394, and pays PCIe per
call — README.md:204 names that its main bottleneck; here CLVs never
leave HBM).

Tips are held as int8 state codes and expanded to eigen-coordinate CLVs
*on device* inside the traversal (a (S, S+1) matmul against the one-hot
of the code), so host->device traffic is 1 byte/site/leaf instead of 64.

Log-likelihood:  ll = sum_s wgt_s * log( (1/C) sum_c rv . x_root[s,c,:] )
                     + scaler_total * log(2^-32)

with ``rv = pi^T U`` (eigen->likelihood root vector) and ``scaler_total``
the wgt-weighted count of all rescales in the tree (each multiplied a
site CLV by 2^32; folded back exactly as RAxML does).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Backend, PLFConfig
from ..ops import layout as L
from ..ops.plf_pallas import plf_pallas_lane_major
from ..ops.plf_tree_pallas import (plf_tree_pallas, plf_tree_pallas_dynamic,
                                   reorder_schedule, schedule_depth)
from ..ops.plf_xla import plf_xla
from .substitution import SubstitutionModel, branch_matrices
from .tree import Tree

__all__ = ["PhyloModel", "TreeLikelihoodResult"]

LOG_MINLIK = float(np.log(np.float64(2.0) ** -32))

#: Site-likelihood floor before the log.  Must be a NORMAL fp32 value:
#: TPU (and XLA:CPU fastmath) flush subnormals, so a 1e-45-style floor
#: becomes max(lik, 0.0) and a reduced-precision negative-rounded site
#: yields log(0) = -inf through every device-side reduction (observed:
#: sharded codon mxu_3x).  FLT_MIN survives FTZ; the floor penalty is
#: log(FLT_MIN) = -87.3 for pathological sites only (exact variants
#: never produce sub-floor likelihoods after rescaling).
LIK_FLOOR = 1.1754944e-38



@dataclasses.dataclass
class TreeLikelihoodResult:
    log_likelihood: float
    site_log_likelihood: np.ndarray   # (n_sites,) float64, pre-weighting
    scaler_total: int                 # wgt-weighted rescale count
    root_clv: Optional[jax.Array] = None  # lane-major root CLV (if kept)
    scaler_sites: Optional[np.ndarray] = None  # (n_sites,) per-site counts

    def true_site_log_likelihood(self) -> np.ndarray:
        """Per-site log-likelihood with 2^-32 rescale factors folded in
        (what bootstrap/RELL resampling must weight)."""
        if self.scaler_sites is None:
            return self.site_log_likelihood
        return self.site_log_likelihood + self.scaler_sites * LOG_MINLIK


class PhyloModel:
    """Tree + substitution model + alignment -> log-likelihood on TPU.

    Example::

        model = PhyloModel(tree, hky85(2.0), tip_states, alpha=0.5)
        out = model.log_likelihood()
    """

    def __init__(self, tree: Tree, model: SubstitutionModel,
                 tip_states: np.ndarray, wgt: Optional[np.ndarray] = None,
                 alpha: Optional[float] = None,
                 config: Optional[PLFConfig] = None,
                 ascertainment: Optional[str] = None,
                 p_inv: Optional[float] = None,
                 rate_weights: Optional[np.ndarray] = None,
                 share_device_from: Optional["PhyloModel"] = None):
        """
        Args:
          tip_states: (n_leaves, n_sites) int array of observed states per
            leaf (leaf order = tree node indices 0..n_leaves-1);
            out-of-range/negative values = gap/ambiguous.
          wgt: (n_sites,) site pattern weights (RAxML wgt, plf.cpp:63).
          alpha: gamma shape; None = uniform rates.
          ascertainment: None or "lewis" — Lewis (2001) correction for
            variable-sites-only alignments: the likelihood conditions on
            the site being variable, ll_s -= log(1 - p_const) with
            p_const the summed probability of the S constant site
            patterns.  Implemented by appending S zero-weight constant
            dummy sites to the alignment; every evaluation path (fused,
            per-node, sharded, and the differentiable optimisers) applies
            the correction from their likelihoods.
          p_inv: proportion of invariant sites (+I / +I+G): adds a rate-0
            category with weight ``p_inv`` and rescales the gamma rates
            by 1/(1-p_inv) (substitution.gamma_invariant_rates).  The
            effective category count becomes ``config.categories + 1``.
          rate_weights: explicit per-category mixture weights (must sum
            to 1); default uniform 1/C.  Mutually exclusive with p_inv.
          share_device_from: another PhyloModel over the SAME alignment,
            substitution model and config (different topology/lengths):
            reuse its device-resident tip codes / weights / tip table /
            EV operator instead of re-uploading them.  Tree-search
            neighbourhoods build hundreds of same-alignment models per
            round — without sharing, every candidate re-uploads the
            (n_leaves, n_pad) codes matrix (hundreds of MB to GBs of
            HBM at production sizes; an observed OOM at 256 taxa x 508
            candidates).
        """
        self.tree = tree
        self.model = model
        # default config resolves the kernel variant by state count
        # (S=61 through the VPU unroll is unusable; auto -> mxu_3x)
        cfg = config or PLFConfig(states=model.states,
                                  kernel_variant="auto")
        if cfg.states != model.states:
            cfg = dataclasses.replace(cfg, states=model.states)
        self.config = cfg
        self.tip_states = np.asarray(tip_states)
        self.n_sites_obs = int(self.tip_states.shape[1])
        self.wgt = (np.ones(self.n_sites_obs, np.int32) if wgt is None
                    else np.asarray(wgt, np.int32))
        if ascertainment not in (None, "lewis"):
            raise ValueError(f"unknown ascertainment {ascertainment!r}")
        self.ascertainment = ascertainment
        if ascertainment == "lewis":
            S_ = model.states
            const = np.tile(np.arange(S_, dtype=self.tip_states.dtype),
                            (self.tip_states.shape[0], 1))
            self.tip_states = np.concatenate([self.tip_states, const],
                                             axis=1)
            self.wgt = np.concatenate([self.wgt, np.zeros(S_, np.int32)])
        self.n_sites = int(self.tip_states.shape[1])
        self.p_inv = p_inv
        if p_inv is not None:
            if rate_weights is not None:
                raise ValueError("pass either p_inv or rate_weights")
            from .substitution import gamma_invariant_rates
            self.rates, self.rate_weights = gamma_invariant_rates(
                alpha, p_inv, cfg.categories)
            cfg = dataclasses.replace(cfg,
                                      categories=cfg.categories + 1)
            self.config = cfg
        else:
            if alpha is None:
                self.rates = np.ones(cfg.categories)
            else:
                from .substitution import discrete_gamma_rates
                self.rates = discrete_gamma_rates(alpha, cfg.categories)
            if rate_weights is None:
                self.rate_weights = np.full(cfg.categories,
                                            1.0 / cfg.categories)
            else:
                self.rate_weights = np.asarray(rate_weights, np.float64)
                if self.rate_weights.shape != (cfg.categories,):
                    raise ValueError(
                        f"rate_weights must have shape ({cfg.categories},)")
                if abs(float(self.rate_weights.sum()) - 1.0) > 1e-6:
                    raise ValueError("rate_weights must sum to 1")

        S, C = cfg.states, cfg.categories
        self.n_pad = L.sites_padding(self.n_sites, cfg.block_sites)
        self.schedule = tree.schedule()

        # --- device constants, all shipped once -----------------------------
        # Variant-specific operator encodings (vpu: per-source-state lane
        # columns; mxu: (rows, rows) block matrices).  With a donor the
        # shared constants are not rebuilt/re-uploaded (hundreds of
        # candidates per search round).
        _donor0 = share_device_from
        if (cfg.resolved_kernel_variant.startswith("mxu")
                and cfg.backend is not Backend.XLA):
            enc_branch = lambda b: L.branch_to_block_matrix(b, S, C)
            if _donor0 is None:
                self._ec = jnp.asarray(
                    L.ev_to_block_matrix(model.plf_ev, S, C))
        else:
            enc_branch = lambda b: L.branch_to_lane_constants(b, S, C)
            if _donor0 is None:
                self._ec = jnp.asarray(
                    L.ev_to_lane_constants(model.plf_ev, S, C))
        # Encoded-operator cache, shared across same-model/rates
        # candidates via share_device_from: a tree-search round builds
        # hundreds of same-alignment models whose branch-length
        # MULTISET barely changes (NNI preserves it; SPR halves one),
        # and the per-edge eigen-expm + encoding dominates candidate
        # construction (~0.8 s/candidate measured at 256 taxa).
        donor = share_device_from
        if donor is not None and (
                donor.model is not model
                or not np.array_equal(donor.rates, self.rates)
                or donor.config != self.config):
            raise ValueError(
                "share_device_from needs an identical model/rates/"
                "config (only topology/branch lengths may differ)")
        self._branch_cache = ({} if donor is None
                              else donor._branch_cache)

        def enc_cached(t):
            key = float(t)
            v = self._branch_cache.get(key)
            if v is None:
                v = np.asarray(enc_branch(
                    branch_matrices(model, key, self.rates, C)))
                self._branch_cache[key] = v
            return v

        lcs, rcs = [], []
        for _, _, _, tl, tr in self.schedule:
            lcs.append(enc_cached(tl))
            rcs.append(enc_cached(tr))
        # Host-side stacks; the device upload is LAZY (the _lcs/_rcs
        # properties).  Batch scoring paths stack many candidates'
        # operators on host and upload ONCE — per-candidate device ops
        # were ~60% of search-round prep (each op costs a tunnel
        # round-trip at ~1.7 ms on the production link).
        self._lcs_np = np.stack(lcs)             # (E, rows, S|rows)
        self._rcs_np = np.stack(rcs)
        self._lcs_dev = None
        self._rcs_dev = None
        # Tip expansion table: column b (b < S) is the eigen-coordinate
        # CLV of observed state b (W.e_b = w[:, b]); column S the gap CLV
        # W.1 (all states equally likely); columns S+1.. the multi-hot
        # IUPAC partial-ambiguity CLVs (R -> W.(e_A + e_G) etc. — the
        # RAxML tip-vector semantics, /root/reference/app/src/plf.cpp:21-22
        # consumes arbitrary tip CLVs).
        from ..io.alignment import map_tip_codes, tip_expansion_table
        if _donor0 is None:
            # Trim the table to the observed code range: the in-kernel
            # expansion costs one VPU pass over (rows, BS) PER COLUMN,
            # and IUPAC ambiguity columns are dead weight for the
            # common no-ambiguity alignment (measured ~1/3 of the DNA
            # segmented forward at 160 taxa — r05 tip audit).  Gap code
            # S is always present (padding sites use it).
            codes_obs = map_tip_codes(self.tip_states, S)
            self._tip_ncols = max(S + 1, int(codes_obs.max()) + 1)
            tbl = tip_expansion_table(model.w, S)    # (S, S+1+A)
            tbl = tbl[:, :self._tip_ncols]
            self._tip_table = jnp.asarray(tbl.astype(np.float32))
            self._n_codes = tbl.shape[1]
        else:
            self._n_codes = _donor0._n_codes
            self._tip_ncols = _donor0._tip_ncols
        # Root reduction over lane-major rows (row = a*C + c): pi^T U
        # weighted by the category mixture (uniform 1/C unless +I or
        # explicit rate_weights).
        rows = np.repeat(model.root_vector, C) * np.tile(self.rate_weights, S)
        self._root_rows = jnp.asarray(rows.astype(np.float32)).reshape(1, -1)
        if donor is not None:
            same_aln = (donor.tip_states is self.tip_states
                        or (donor.tip_states.shape
                            == self.tip_states.shape
                            and np.array_equal(donor.tip_states,
                                               self.tip_states)))
            same_wgt = (donor.wgt is self.wgt
                        or np.array_equal(donor.wgt, self.wgt))
            if donor.n_pad != self.n_pad or not same_aln or not same_wgt:
                raise ValueError(
                    "share_device_from needs an identical alignment and"
                    " site weights (only topology/branch lengths may "
                    "differ)")
            self._codes = donor._codes
            self._wgt_dev = donor._wgt_dev
            self._ec = donor._ec
            self._tip_table = donor._tip_table
            self._ttab_cache = donor._kernel_tip_table()
            self._codes3_donor = donor
        else:
            # Tip codes, padded; padding sites get the gap code
            # (harmless).
            codes = map_tip_codes(self.tip_states, S)
            codes = L.pad_to_multiple(codes, self.n_pad, axis=-1)
            codes[:, self.n_sites:] = S
            if cfg.tip_dtype == "int8":
                codes = codes.astype(np.int8)
            self._codes = jnp.asarray(codes)      # (n_leaves, n_pad)
            wpad = L.pad_to_multiple(self.wgt.reshape(1, -1), self.n_pad,
                                     axis=-1)
            self._wgt_dev = jnp.asarray(wpad[0])  # (n_pad,) padding zeros
            self._codes3_donor = None
        self._traverse = None
        self._fused_cache = None
        self._seg_cache = None
        self._codes3_cache = None

    @property
    def _lcs(self):
        """Device-resident (E, rows, W) left-operator stack (lazy)."""
        if self._lcs_dev is None:
            self._lcs_dev = jnp.asarray(self._lcs_np)
        return self._lcs_dev

    @property
    def _rcs(self):
        if self._rcs_dev is None:
            self._rcs_dev = jnp.asarray(self._rcs_np)
        return self._rcs_dev

    def _ensure_codes3(self):
        """(n_leaves, 1, n_pad) reshape of the shared device codes —
        cached on the DONOR chain so a 500-candidate neighbourhood does
        one reshape, not 500 device ops."""
        root = self
        while getattr(root, "_codes3_donor", None) is not None:
            root = root._codes3_donor
        if root._codes3_cache is None:
            root._codes3_cache = root._codes.reshape(
                root._codes.shape[0], 1, -1)
        return root._codes3_cache

    # -- the single-dispatch traversal --------------------------------------

    def _build_traverse(self):
        cfg = self.config
        S, C = cfg.states, cfg.categories
        n, n_pad = self.n_sites, self.n_pad
        schedule = self.schedule
        n_leaves = self.tree.n_leaves
        root = self.tree.root
        use_pallas = cfg.backend is not Backend.XLA
        interpret = cfg.interpret or (jax.default_backend() != "tpu")

        n_codes = self._n_codes

        def expand_tip(codes_row, tip_table):
            onehot = (codes_row[None, :] ==
                      jnp.arange(n_codes, dtype=jnp.int32)[:, None]
                      ).astype(jnp.float32)                   # (ncode, n_pad)
            # HIGHEST precision: TPU default matmul rounds through
            # bf16; eigen-coordinate CLVs are mixed-sign, and the
            # cancellation error can push small site likelihoods
            # negative (observed as NaN logs on hardware at S=61).
            x = jnp.matmul(tip_table, onehot,
                           precision=jax.lax.Precision.HIGHEST)
            return jnp.repeat(x, C, axis=0)                     # rows a*C+c

        def traverse(codes, lcs, rcs, ec, tip_table, wgt):
            clvs: Dict[int, jax.Array] = {}
            scaler_sites = jnp.zeros((n_pad,), jnp.int32)
            for e, (parent, lc_i, rc_i, _, _) in enumerate(schedule):
                childs = []
                for ch in (lc_i, rc_i):
                    if ch < n_leaves and ch not in clvs:
                        clvs[ch] = expand_tip(codes[ch], tip_table)
                    childs.append(clvs[ch])
                x1, x2 = childs
                if use_pallas:
                    # Donate a dead internal-node child's HBM buffer to
                    # the parent CLV (leaf CLVs are cached and reused, so
                    # never donated).  Internal children of a binary tree
                    # are consumed exactly once; worth ~1.6x on v5e.
                    donate = (1 if lc_i >= n_leaves
                              else 2 if rc_i >= n_leaves else 0)
                    x3, sc = plf_pallas_lane_major(
                        x1, x2, lcs[e], rcs[e], ec, jnp.int32(n),
                        states=S, categories=C,
                        block_sites=cfg.block_sites, interpret=interpret,
                        variant=cfg.resolved_kernel_variant,
                        donate=donate)
                    scaler_sites = scaler_sites + sc[0]
                else:
                    x3s, scs, _ = plf_xla(
                        L.from_lane_major(x1, S, C),
                        L.from_lane_major(x2, S, C),
                        _unlane_branch(lcs[e], S, C),
                        _unlane_branch(rcs[e], S, C),
                        _unlane_ev(ec, S, C), wgt,
                        states=S, categories=C)
                    x3 = L.to_lane_major(x3s, S, C)
                    scaler_sites = scaler_sites + scs.astype(jnp.int32)
                clvs[parent] = x3
                for ch in (lc_i, rc_i):
                    if ch >= n_leaves:
                        del clvs[ch]
            x_root = clvs[root]
            lik = jnp.matmul(self._root_rows, x_root,
                             precision=jax.lax.Precision.HIGHEST)[0]
            scaler_total = jnp.sum(scaler_sites * wgt)
            return lik, scaler_sites, scaler_total, x_root

        return jax.jit(traverse)

    # -- ascertainment correction ------------------------------------------

    def _asc_log_one_minus_pconst(self, lik_pad: np.ndarray,
                                  sc_sites: np.ndarray) -> float:
        """log(1 - p_const) from the S dummy constant-site likelihoods.

        ``lik_pad``/``sc_sites``: padded per-site likelihood and rescale
        counts; dummy sites occupy [n_sites_obs, n_sites).  True site
        probability = lik * 2^(-32*count), assembled in log space.
        """
        d0, d1 = self.n_sites_obs, self.n_sites
        log_pc = (np.log(np.asarray(lik_pad[d0:d1], np.float64))
                  + np.asarray(sc_sites[d0:d1], np.float64) * LOG_MINLIK)
        p_const = float(np.exp(log_pc).sum())
        if p_const >= 1.0:
            raise FloatingPointError(
                f"ascertainment correction degenerate: p_const={p_const}")
        return float(np.log1p(-p_const))

    def _finalise_ll(self, lik_pad: np.ndarray, sc_sites, scaler_total: int
                     ) -> TreeLikelihoodResult:
        """Host-side fp64 log/sum + optional ascertainment correction."""
        n_obs = self.n_sites_obs
        lik_h = np.asarray(lik_pad, dtype=np.float64)
        # Floor before the log, matching the differentiable paths
        # (optimize.py clamps at LIK_FLOOR): exact variants always produce
        # positive likelihoods so this is a no-op there, but the 1-pass
        # bf16 fast mode (kernel_variant="mxu_bf16") can round
        # near-underflow site likelihoods NEGATIVE — those sites get the
        # deterministic floor penalty instead of log(<0)=NaN.
        site_ll = np.log(np.maximum(lik_h[:n_obs], LIK_FLOOR))
        corr = 0.0
        if self.ascertainment == "lewis":
            corr = self._asc_log_one_minus_pconst(lik_h, sc_sites)
            site_ll = site_ll - corr
        ll = float(np.sum(site_ll * self.wgt[:n_obs])
                   + scaler_total * LOG_MINLIK)
        return TreeLikelihoodResult(
            log_likelihood=ll, site_log_likelihood=site_ll,
            scaler_total=int(scaler_total), root_clv=None,
            scaler_sites=np.asarray(sc_sites)[:n_obs].astype(np.int64))

    # -- fused whole-tree kernel --------------------------------------------

    # Live-CLV VMEM budget for the fused kernel: depth * rows * block * 4B
    # must stay well under ~16 MB (see plf_tree_pallas module docstring).
    FUSED_MAX_LIVE = 48

    def can_fuse(self) -> bool:
        cfg = self.config
        if cfg.backend is Backend.XLA:
            return False
        sched = reorder_schedule(self.schedule, self.tree.n_leaves)
        if len(sched) <= self.FUSED_UNROLL_MAX_NODES:
            # static unrolled kernel: live stack = schedule depth
            depth = schedule_depth(sched, self.tree.n_leaves)
            vmem = (depth + 2) * cfg.rows * cfg.block_sites * 4
            return depth <= self.FUSED_MAX_LIVE and vmem < 8 * 2 ** 20
        # dynamic register-machine kernel: the unified arena preloads
        # every tip, (n_leaves + n_slots) slots — fusible iff some
        # 128-multiple block fits the VMEM budget (the kernel
        # auto-shrinks to it).
        from ..ops.plf_tree_pallas import (compile_register_schedule,
                                          fit_block_sites)
        _, n_slots, _ = compile_register_schedule(sched, self.tree.n_leaves)
        return fit_block_sites(self.tree.n_leaves + n_slots, cfg.rows,
                               cfg.block_sites) is not None

    def _kernel_tip_table(self):
        """Tip table per lane-major row: ttab[(a,c), col] = tbl[a, col]
        (state + gap + observed IUPAC partial-ambiguity columns; trimmed
        to the alignment's code range — see __init__)."""
        if getattr(self, "_ttab_cache", None) is None:
            from ..io.alignment import tip_expansion_table
            S, C = self.config.states, self.config.categories
            wg = tip_expansion_table(self.model.w, S)
            wg = wg[:, :self._tip_ncols]
            self._ttab_cache = jnp.asarray(
                np.repeat(wg, C, axis=0).astype(np.float32))
        return self._ttab_cache

    def _fused_inputs(self, device: bool = True):
        """(sched, lcs, rcs, ttab) for the fused tree kernels; the
        lane-dense (rows, E*W) packing happens on HOST (one numpy
        transpose+reshape) and uploads lazily — batch scorers keep it
        host-side (``device=False``) and upload whole neighbourhoods at
        once."""
        if self._fused_cache is None:
            cfg = self.config
            sched = reorder_schedule(self.schedule, self.tree.n_leaves)
            lcs = np.ascontiguousarray(
                np.transpose(self._lcs_np, (1, 0, 2))).reshape(
                    cfg.rows, -1)
            rcs = np.ascontiguousarray(
                np.transpose(self._rcs_np, (1, 0, 2))).reshape(
                    cfg.rows, -1)
            self._fused_cache = [sched, lcs, rcs,
                                 self._kernel_tip_table()]
        if device and isinstance(self._fused_cache[1], np.ndarray):
            self._fused_cache[1] = jnp.asarray(self._fused_cache[1])
            self._fused_cache[2] = jnp.asarray(self._fused_cache[2])
        return tuple(self._fused_cache)

    # Unrolled-kernel node budget: above this, the register-machine
    # (fori_loop) variant compiles in O(1) instead of O(nodes).
    FUSED_UNROLL_MAX_NODES = 96

    def log_likelihood_fused(self) -> TreeLikelihoodResult:
        """Whole-tree single-kernel evaluation (no intermediate HBM CLVs).

        Small trees use the unrolled static kernel; larger trees the
        dynamic register-machine kernel (plf_tree_pallas_dynamic).
        """
        cfg = self.config
        sched, lcs, rcs, ttab = self._fused_inputs()
        interpret = cfg.interpret or (jax.default_backend() != "tpu")
        if len(sched) <= self.FUSED_UNROLL_MAX_NODES:
            # static unrolled kernel: auto-shrink the site block so the
            # (depth+2)-slot live stack fits VMEM (mirrors the dynamic
            # kernel's arena fit; a forced method="fused" then degrades
            # to a smaller block instead of a Mosaic scoped-vmem OOM)
            from ..ops.plf_tree_pallas import fit_block_sites
            depth = schedule_depth(sched, self.tree.n_leaves)
            bs = fit_block_sites(depth + 2, cfg.rows, cfg.block_sites,
                                 8 * 2 ** 20)
            if bs is None:
                raise ValueError(
                    f"fused static kernel: {depth}-deep live stack x "
                    f"{cfg.rows} rows does not fit VMEM at any block; "
                    f"use method='segmented' or 'per-node'")
            lik, sc = plf_tree_pallas(
                self._codes, sched, lcs, rcs, self._ec, ttab,
                self._root_rows, self.n_sites,
                n_leaves=self.tree.n_leaves, states=cfg.states,
                categories=cfg.categories, block_sites=bs,
                interpret=interpret, max_live=self.FUSED_MAX_LIVE,
                variant=cfg.resolved_kernel_variant)
        else:
            lik, sc = plf_tree_pallas_dynamic(
                self._codes, sched, lcs, rcs, self._ec, ttab,
                self._root_rows, self.n_sites,
                n_leaves=self.tree.n_leaves, states=cfg.states,
                categories=cfg.categories, block_sites=cfg.block_sites,
                interpret=interpret, variant=cfg.resolved_kernel_variant)
        scaler_total = int(np.asarray(
            jnp.sum(sc[0] * self._wgt_dev)))
        return self._finalise_ll(np.asarray(lik)[0], np.asarray(sc)[0],
                                 scaler_total)

    # -- segmented whole-tree evaluation (big-taxa trees) --------------------

    def can_segment(self) -> bool:
        """Whether the segmented kernel path applies (any Pallas
        variant — the MXU precision ladder reaches the segmented engine
        too)."""
        return self.config.backend is not Backend.XLA

    def _segmented_inputs(self, device: bool = True):
        """(plan, codes3, lcs3, rcs3, ttab) for the segmented engine.

        With ``device=False`` the operator stacks stay host-side numpy
        (the batch scorers stack whole neighbourhoods on host and
        upload once); the default promotes them to device arrays and
        caches the promotion.
        """
        if self._seg_cache is None:
            from ..ops.plf_tree_seg import plan_segments

            cfg = self.config
            variant = cfg.resolved_kernel_variant
            n_leaves = self.tree.n_leaves
            sched_r = reorder_schedule(self.schedule, n_leaves)
            eidx = np.asarray([e for (*_x, e) in sched_r])
            lcs3 = self._lcs_np[eidx]            # (E, rows, S|rows)
            rcs3 = self._rcs_np[eidx]
            pos_sched = tuple((p, l, r, 0.0, 0.0, i)
                              for i, (p, l, r, *_x) in enumerate(sched_r))
            plan = plan_segments(
                pos_sched, n_leaves, rows=cfg.rows,
                block_sites=cfg.block_sites,
                op_width=cfg.rows if variant.startswith("mxu") else 0)
            ttab = self._kernel_tip_table()
            self._seg_cache = [plan, self._ensure_codes3(), lcs3, rcs3,
                               ttab]
        if device and isinstance(self._seg_cache[2], np.ndarray):
            self._seg_cache[2] = jnp.asarray(self._seg_cache[2])
            self._seg_cache[3] = jnp.asarray(self._seg_cache[3])
        return tuple(self._seg_cache)

    def log_likelihood_segmented(self) -> TreeLikelihoodResult:
        """Segmented whole-tree evaluation: O(#segments) dispatches for
        trees beyond the single-arena VMEM budget (ops/plf_tree_seg.py).
        Bit-exact vs the fused and per-node paths in the VPU form; MXU
        variants carry their documented precision ladder."""
        from ..ops.plf_tree_seg import plf_tree_segmented

        cfg = self.config
        if not self.can_segment():
            raise ValueError("segmented path needs a Pallas backend")
        interpret = cfg.interpret or (jax.default_backend() != "tpu")
        plan, codes3, lcs3, rcs3, ttab = self._segmented_inputs()
        lik, sc = plf_tree_segmented(
            plan, codes3, lcs3, rcs3, self._ec, ttab, self._root_rows,
            self.n_sites, states=cfg.states, categories=cfg.categories,
            interpret=interpret, variant=cfg.resolved_kernel_variant,
            dtype=cfg.dtype)
        scaler_total = int(np.asarray(jnp.sum(sc[0] * self._wgt_dev)))
        return self._finalise_ll(np.asarray(lik)[0], np.asarray(sc)[0],
                                 scaler_total)

    # -- evaluation ----------------------------------------------------------

    def log_likelihood(self, keep_root_clv: bool = False,
                       method: str = "auto") -> TreeLikelihoodResult:
        """Evaluate the tree log-likelihood.

        ``method``: "auto" uses the fused whole-tree kernel when the tree
        fits the VMEM arena budget, the segmented kernel for larger trees,
        and the per-node path otherwise; "fused"/"segmented"/"per-node"
        force a path ("per-node" is needed when the root CLV must be
        kept).
        """
        if method == "fused" or (method == "auto" and not keep_root_clv
                                 and self.can_fuse()):
            return self.log_likelihood_fused()
        if method == "segmented" or (method == "auto" and not keep_root_clv
                                     and self.can_segment()):
            return self.log_likelihood_segmented()
        if self._traverse is None:
            self._traverse = self._build_traverse()
        lik, scaler_sites, scaler_total, x_root = self._traverse(
            self._codes, self._lcs, self._rcs, self._ec, self._tip_table,
            self._wgt_dev)
        # Final log/sum on host in float64 (device x64 is disabled by
        # default; the n-term sum wants the precision anyway).
        res = self._finalise_ll(np.asarray(lik), np.asarray(scaler_sites),
                                int(scaler_total))
        if keep_root_clv:
            res.root_clv = x_root
        return res

    # -- multi-chip: site-sharded fused traversal ---------------------------

    def log_likelihood_sharded(self, mesh=None) -> TreeLikelihoodResult:
        """Whole-tree likelihood with the site axis sharded over a device
        mesh (ICI intra-slice / DCN multi-host): each device runs the fused
        tree kernel on its site shard; the weighted log-likelihood partials
        and scaler counts merge with a single psum (the only cross-device
        traffic — the site dimension is pointwise, SURVEY.md §2.5).
        """
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from ..parallel.sharding import make_mesh

        cfg = self.config
        mesh = mesh or make_mesh()
        ndev = mesh.shape["sites"]
        interpret = cfg.interpret or (jax.default_backend() != "tpu")
        sched, lcs, rcs, ttab = self._fused_inputs()
        n = self.n_sites
        unit = ndev * cfg.block_sites
        n_pad = max(unit, -(-n // unit) * unit)
        shard = n_pad // ndev
        S = cfg.states

        codes = np.asarray(self._codes)
        if codes.shape[-1] < n_pad:
            pad = np.full((codes.shape[0], n_pad - codes.shape[-1]), S,
                          codes.dtype)
            codes = np.concatenate([codes, pad], axis=-1)
        wgt = np.zeros((1, n_pad), np.int32)
        wgt[0, :n] = self.wgt

        dyn = len(sched) > self.FUSED_UNROLL_MAX_NODES
        n_leaves = self.tree.n_leaves

        def local(codes_s, lcs_s, rcs_s, ec_s, ttab_s, rr_s, wgt_s, ns):
            rank = jax.lax.axis_index("sites")
            n_local = jnp.clip(ns - rank * shard, 0, shard)
            kern = plf_tree_pallas_dynamic if dyn else plf_tree_pallas
            lik, sc = kern(
                codes_s, sched, lcs_s, rcs_s, ec_s, ttab_s, rr_s, n_local,
                n_leaves=n_leaves, states=S, categories=cfg.categories,
                block_sites=cfg.block_sites, interpret=interpret,
                variant=cfg.resolved_kernel_variant)
            valid = (jax.lax.broadcasted_iota(jnp.int32, (1, shard), 1)
                     < n_local)
            site_ll = jnp.where(valid,
                                jnp.log(jnp.maximum(lik, LIK_FLOOR)), 0.0)
            ll_part = jax.lax.psum(
                jnp.sum(site_ll * wgt_s.astype(jnp.float32)), "sites")
            sc_part = jax.lax.psum(jnp.sum(sc * wgt_s), "sites")
            return lik, sc, ll_part, sc_part

        spec_s = P(None, "sites")
        rep = P(None, None)
        fn = jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(spec_s, rep, rep, rep, rep, rep, spec_s, P()),
            out_specs=(spec_s, spec_s, P(), P()),
            check_vma=False))
        lik, sc_sites, ll_sum, scaler_total = fn(
            jnp.asarray(codes), lcs, rcs, self._ec, ttab, self._root_rows,
            jnp.asarray(wgt), jnp.int32(n))
        scaler_total = int(scaler_total)
        if self.ascertainment == "lewis":
            return self._finalise_ll(np.asarray(lik)[0],
                                     np.asarray(sc_sites)[0], scaler_total)
        ll = float(ll_sum) + scaler_total * LOG_MINLIK
        lik_h = np.asarray(lik, np.float64)[0, :n]
        # Same LIK_FLOOR floor as _finalise_ll / the in-kernel clamp: the
        # 1-pass bf16 variant can round near-underflow likelihoods
        # negative, and this per-site array feeds RELL/site outputs.
        return TreeLikelihoodResult(
            log_likelihood=ll,
            site_log_likelihood=np.log(np.maximum(lik_h, LIK_FLOOR)),
            scaler_total=scaler_total, root_clv=None)

    # -- brute-force oracle (tests) -----------------------------------------

    def log_likelihood_bruteforce(self) -> float:
        """Float64 state-space pruning with explicit P matrices (oracle)."""
        m, cfg = self.model, self.config
        S, C = m.states, cfg.categories
        n = self.n_sites
        partials: Dict[int, np.ndarray] = {}
        from ..io.alignment import AMBIGUITY
        amb = AMBIGUITY.get(S, ())
        for leaf in range(self.tree.n_leaves):
            si = self.tip_states[leaf]
            onehot = np.zeros((n, S))
            valid = (si >= 0) & (si < S)
            onehot[np.arange(n)[valid], si[valid]] = 1.0
            for k, members in enumerate(amb):
                hit = si == S + k
                for mem in members:
                    onehot[hit, mem] = 1.0
            gap = (si < 0) | (si >= S + len(amb))
            onehot[gap] = 1.0
            partials[leaf] = np.repeat(onehot[:, None, :], C, axis=1)
        for parent, lc, rc, tl, tr in self.schedule:
            out = np.empty((n, C, S))
            for c in range(C):
                P1 = m.p_matrix(tl, self.rates[c])
                P2 = m.p_matrix(tr, self.rates[c])
                out[:, c, :] = (partials[lc][:, c, :] @ P1.T) * (
                    partials[rc][:, c, :] @ P2.T)
            partials[parent] = out
        root = partials[self.tree.root]
        lik = (root @ m.pi) @ self.rate_weights
        return float(np.sum(np.log(lik) * self.wgt))


def _validate_batch_identity(pms) -> None:
    """Same-ALIGNMENT/model validation for the batch scorers.

    Shape equality alone is not enough: two models over different
    alignments (or substitution models / rates) of identical shape
    would pass a shape check and return silently wrong likelihoods.
    Sharing via ``share_device_from`` makes the arrays identical
    objects, so the common case costs `is` checks only.
    """
    pm0 = pms[0]
    for pm in pms[1:]:
        same_aln = (pm.tip_states is pm0.tip_states
                    or (pm.tip_states.shape == pm0.tip_states.shape
                        and np.array_equal(pm.tip_states, pm0.tip_states)))
        same_wgt = (pm.wgt is pm0.wgt or np.array_equal(pm.wgt, pm0.wgt))
        same_model = (pm.model is pm0.model
                      or (np.array_equal(pm.model.pi, pm0.model.pi)
                          and np.array_equal(pm.model.eigenvalues,
                                             pm0.model.eigenvalues)
                          and np.array_equal(pm.model.u, pm0.model.u)))
        if (not same_aln or not same_wgt or not same_model
                or not np.array_equal(pm.rates, pm0.rates)
                or not np.array_equal(pm.rate_weights, pm0.rate_weights)):
            raise ValueError(
                "batch scoring needs identical alignment/weights/model/"
                "rates across candidates (only topology and branch "
                "lengths may differ); build candidates with "
                "share_device_from")


def batch_log_likelihood(pms) -> np.ndarray:
    """Score many same-shape topologies in ONE device dispatch.

    ``pms``: PhyloModels sharing alignment, model, config and node count
    (the tree-search neighbourhood case — NNI/SPR preserve all of these).
    Uses the register-machine tree kernel with the schedule as runtime
    arrays, so the whole batch compiles ONCE per (n_edges, n_slots,
    n_pad) shape class and a ``lax.map`` walks candidates on device —
    no per-topology recompile, no per-candidate dispatch overhead.

    Returns (B,) float64 log-likelihoods (fp32 partial sums, host fp64
    final reduction — same precision policy as log_likelihood_fused).
    """
    from ..ops.plf_tree_pallas import (batched_tree_loglik_parts,
                                       compile_register_schedule,
                                       reorder_schedule)

    pm0 = pms[0]
    cfg = pm0.config
    S, C = cfg.states, cfg.categories
    n_leaves = pm0.tree.n_leaves
    E = len(pm0.schedule)
    for pm in pms[1:]:
        if (len(pm.schedule) != E or pm.tree.n_leaves != n_leaves
                or pm.n_pad != pm0.n_pad or pm.config != cfg):
            raise ValueError("batch_log_likelihood needs same-shape models")
    _validate_batch_identity(pms)
    if pm0.ascertainment is not None:
        raise ValueError("ascertainment not supported in the batch path")

    stacks = {k: [] for k in range(7)}
    lcs_l, rcs_l = [], []
    n_slots = 0
    for pm in pms:
        sched = reorder_schedule(pm.schedule, n_leaves)
        arrs, ns, root_slot = compile_register_schedule(sched, n_leaves)
        n_slots = max(n_slots, ns)
        for k, a in enumerate(arrs):
            stacks[k].append(a)
        stacks[6].append(np.asarray([root_slot], np.int32))
        _, lcs, rcs, _ = pm._fused_inputs(device=False)
        lcs_l.append(lcs)
        rcs_l.append(rcs)
    sched_stack = tuple(jnp.asarray(np.stack(stacks[k])) for k in range(7))
    # host-stack the whole neighbourhood's operators -> ONE upload
    # (np.asarray downloads at most the already-promoted incumbent)
    lcs_st = jnp.asarray(np.stack([np.asarray(x) for x in lcs_l]))
    rcs_st = jnp.asarray(np.stack([np.asarray(x) for x in rcs_l]))
    ttab = pm0._kernel_tip_table()
    interpret = cfg.interpret or (jax.default_backend() != "tpu")
    n_parts = pm0.n_pad // cfg.block_sites
    from ..ops.plf_tree_pallas import fit_block_sites
    bs = fit_block_sites(n_leaves + n_slots, cfg.rows, cfg.block_sites)
    if bs is None:
        raise ValueError(
            f"batch_log_likelihood: {n_leaves}-leaf arena does not fit "
            f"VMEM at any block size; score candidates individually")

    parts = batched_tree_loglik_parts(
        sched_stack, lcs_st, rcs_st, pm0._codes, pm0._ec, ttab,
        pm0._root_rows, pm0._wgt_dev.astype(jnp.float32),
        jnp.int32(pm0.n_sites), n_edges=E, n_leaves=n_leaves,
        n_slots=n_slots, states=S, categories=C,
        block_sites=bs, interpret=interpret,
        variant=cfg.resolved_kernel_variant, n_parts=n_parts)
    return np.asarray(parts, np.float64).sum(axis=1)


def batch_log_likelihood_segmented(pms) -> np.ndarray:
    """Score many same-shape topologies via the SEGMENTED engine in one
    compiled program — the big-taxa extension of
    :func:`batch_log_likelihood` for neighbourhoods whose single-arena
    register machine does not fit VMEM (where round-3 search fell back
    to one dispatch per candidate).  Candidate plans pad to one uniform
    shape (ops/plf_tree_seg.stack_plans) and a ``lax.map`` walks them;
    per-candidate cost is O(#segments) dispatches, compile cost is one
    kernel + one scan.

    Returns (B,) float64 log-likelihoods (fp32 partial sums, host fp64
    final reduction — the batch_log_likelihood precision policy).
    Reference anchor: 9-instance parallel scoring,
    /root/reference/app/src/include.h:181-195.
    """
    from ..ops.plf_tree_pallas import reorder_schedule
    from ..ops.plf_tree_seg import (batched_seg_loglik_parts,
                                    plan_segments, stack_plans)

    pm0 = pms[0]
    cfg = pm0.config
    if cfg.backend is Backend.XLA:
        raise ValueError("segmented batch scoring needs a Pallas backend")
    S, C = cfg.states, cfg.categories
    variant = cfg.resolved_kernel_variant
    n_leaves = pm0.tree.n_leaves
    E = len(pm0.schedule)
    for pm in pms[1:]:
        if (len(pm.schedule) != E or pm.tree.n_leaves != n_leaves
                or pm.n_pad != pm0.n_pad or pm.config != cfg):
            raise ValueError(
                "batch_log_likelihood_segmented needs same-shape models")
    _validate_batch_identity(pms)
    if pm0.ascertainment is not None:
        raise ValueError("ascertainment not supported in the batch path")

    plans, lcs_l, rcs_l = [], [], []
    for pm in pms:
        plan, codes3, lcs3, rcs3, ttab = pm._segmented_inputs(
            device=False)
        plans.append(plan)
        lcs_l.append(lcs3)
        rcs_l.append(rcs3)
    xs_b_np, dims = stack_plans(
        plans, cfg.rows,
        op_width=cfg.rows if variant.startswith("mxu") else 0)
    xs_b = {k: jnp.asarray(v) for k, v in xs_b_np.items()}
    _, codes3, _, _, ttab = pm0._segmented_inputs()
    # (codes3/ttab come from pm0; per-candidate models share them)
    interpret = cfg.interpret or (jax.default_backend() != "tpu")
    n_parts = pm0.n_pad // cfg.block_sites
    lcs_st = jnp.asarray(np.stack([np.asarray(x) for x in lcs_l]))
    rcs_st = jnp.asarray(np.stack([np.asarray(x) for x in rcs_l]))
    parts = batched_seg_loglik_parts(
        xs_b, codes3, lcs_st, rcs_st, pm0._ec, ttab,
        pm0._root_rows, pm0._wgt_dev.astype(jnp.float32),
        jnp.int32(pm0.n_sites), states=S, categories=C,
        interpret=interpret, variant=variant, n_parts=n_parts,
        dtype=cfg.dtype, **dims)
    return np.asarray(parts, np.float64).sum(axis=1)


def _unlane_branch(lc, S, C):
    """Invert layout.branch_to_lane_constants (XLA-backend path)."""
    b = lc.reshape(S, C, S)            # [k, c, a]
    return jnp.transpose(b, (1, 0, 2))  # [c, k, a]


def _unlane_ev(ec, S, C):
    """Invert layout.ev_to_lane_constants."""
    e = ec.reshape(S, C, S)[:, 0, :]   # [a, k] (rows replicated over c)
    return jnp.transpose(e, (1, 0))    # [k, a]
