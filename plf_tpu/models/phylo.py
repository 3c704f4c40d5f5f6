"""Whole-tree likelihood evaluation: the production driver around the PLF.

This is the flagship "model" of the framework: repeated fused-PLF calls
over a post-order tree schedule with device-resident lane-major CLVs,
ending in the root log-likelihood reduction.  It corresponds to the
RAxML context the reference accelerator plugs into (one `newviewGAMMA`
per internal node per tree evaluation; the reference benchmarks
``plf_calls`` repetitions of a single node, host_mem.cpp:283-394).

Log-likelihood:  ll = sum_s wgt_s * log( (1/C) sum_c rv . x_root[s,c,:] )
                     + scaler_total * log(2^-32)

where ``rv = pi^T U`` maps the eigen-coordinate root CLV to per-category
site likelihoods and ``scaler_total`` is the wgt-weighted count of all
underflow rescales anywhere in the tree (each rescale multiplied a site
CLV by 2^32; RAxML folds them back exactly this way).
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
from ..ops.plf_xla import plf_xla
from ..reference import MIN_LIKELIHOOD
from .substitution import SubstitutionModel, branch_matrices
from .tree import Tree

__all__ = ["PhyloModel", "TreeLikelihoodResult"]

LOG_MINLIK = float(np.log(np.float64(2.0) ** -32))


@dataclasses.dataclass
class TreeLikelihoodResult:
    log_likelihood: float
    site_log_likelihood: np.ndarray   # (n_sites,) float64, pre-weighting
    scaler_total: int                 # wgt-weighted rescale count
    clvs: Optional[Dict[int, jax.Array]] = None  # node -> lane-major CLV


class PhyloModel:
    """Tree + substitution model + alignment -> log-likelihood on TPU.

    Example::

        model = PhyloModel(tree, hky85(2.0), tip_states, alpha=0.5)
        out = model.log_likelihood()
    """

    def __init__(self, tree: Tree, model: SubstitutionModel,
                 tip_states: np.ndarray, wgt: Optional[np.ndarray] = None,
                 alpha: Optional[float] = None,
                 config: Optional[PLFConfig] = None):
        """
        Args:
          tip_states: (n_leaves, n_sites) int array of observed states per
            leaf (same leaf order as tree node indices 0..n_leaves-1);
            out-of-range values = gap/ambiguous.
          wgt: (n_sites,) site pattern weights (RAxML wgt, plf.cpp:63).
          alpha: gamma shape; None = uniform rates.
        """
        self.tree = tree
        self.model = model
        cfg = config or PLFConfig(states=model.states)
        if cfg.states != model.states:
            cfg = dataclasses.replace(cfg, states=model.states)
        self.config = cfg
        self.tip_states = np.asarray(tip_states)
        n_sites = self.tip_states.shape[1]
        self.n_sites = n_sites
        self.wgt = (np.ones(n_sites, np.int32) if wgt is None
                    else np.asarray(wgt, np.int32))
        if alpha is None:
            self.rates = np.ones(cfg.categories)
        else:
            from .substitution import discrete_gamma_rates
            self.rates = discrete_gamma_rates(alpha, cfg.categories)

        S, C = cfg.states, cfg.categories
        # EV constants are branch-independent: precompute once.
        self._ec = L.ev_to_lane_constants(
            jnp.asarray(model.plf_ev), S, C)
        self._ev = jnp.asarray(model.plf_ev)
        # Root reduction vector over lane-major rows (row = a*C + c):
        rv = model.root_vector  # (S,)
        rows = np.repeat(rv, C) / C
        self._root_rows = jnp.asarray(rows, jnp.float32).reshape(1, S * C)
        self._wgt_dev = jnp.asarray(self.wgt, jnp.int32)

    # -- CLV preparation -----------------------------------------------------

    def _tip_clv_lane_major(self, leaf: int, n_pad: int) -> jax.Array:
        cfg = self.config
        clv = self.model.tip_clv(self.tip_states[leaf], cfg.categories)
        x = L.to_lane_major(clv, cfg.states, cfg.categories)
        x = L.pad_to_multiple(x, n_pad, axis=-1)
        return jnp.asarray(x)

    # -- evaluation ----------------------------------------------------------

    def log_likelihood(self, keep_clvs: bool = False) -> TreeLikelihoodResult:
        cfg = self.config
        S, C = cfg.states, cfg.categories
        n = self.n_sites
        n_pad = L.sites_padding(n, cfg.block_sites)

        clvs: Dict[int, jax.Array] = {}
        for leaf in range(self.tree.n_leaves):
            clvs[leaf] = self._tip_clv_lane_major(leaf, n_pad)

        scaler_total = jnp.zeros((), jnp.int32)
        for parent, lchild, rchild, tl, tr in self.tree.schedule():
            left = branch_matrices(self.model, tl, self.rates, C)
            right = branch_matrices(self.model, tr, self.rates, C)
            if cfg.backend is Backend.XLA:
                x1 = L.from_lane_major(clvs[lchild], S, C)
                x2 = L.from_lane_major(clvs[rchild], S, C)
                wpad = jnp.zeros((n_pad,), jnp.int32).at[:n].set(self._wgt_dev)
                x3, _, inc = plf_xla(x1, x2, jnp.asarray(left),
                                     jnp.asarray(right), self._ev, wpad,
                                     states=S, categories=C)
                # XLA path has no padding-validity guard: zero-CLV padding
                # sites would rescale (|0| < 2^-32); wgt=0 keeps the count
                # right and the padded CLV values are trimmed at the end.
                clvs[parent] = L.to_lane_major(x3, S, C)
            else:
                lc = L.branch_to_lane_constants(jnp.asarray(left), S, C)
                rc = L.branch_to_lane_constants(jnp.asarray(right), S, C)
                x3l, scal = plf_pallas_lane_major(
                    clvs[lchild], clvs[rchild], lc, rc, self._ec, n,
                    states=S, categories=C, block_sites=cfg.block_sites,
                    interpret=cfg.interpret)
                clvs[parent] = x3l
                inc = jnp.sum(scal[0, :n] * self._wgt_dev)
            scaler_total = scaler_total + inc
            if not keep_clvs:
                for ch in (lchild, rchild):
                    if ch >= self.tree.n_leaves:
                        clvs.pop(ch, None)

        x_root = clvs[self.tree.root]
        lik = (self._root_rows @ x_root)[0, :n]    # (n,) fp32 site likelihood
        # Final log/sum on host in float64 (device x64 is disabled by
        # default in JAX; the n-term sum wants the extra precision anyway).
        site_ll = np.log(np.asarray(lik, dtype=np.float64))
        ll = float(np.sum(site_ll * self.wgt) +
                   int(scaler_total) * LOG_MINLIK)
        return TreeLikelihoodResult(
            log_likelihood=ll,
            site_log_likelihood=site_ll,
            scaler_total=int(scaler_total),
            clvs=clvs if keep_clvs else None)

    # -- brute-force oracle (tests) -----------------------------------------

    def log_likelihood_bruteforce(self) -> float:
        """Float64 state-space pruning with explicit P matrices (oracle)."""
        m, cfg = self.model, self.config
        S, C = m.states, cfg.categories
        n = self.n_sites
        partials: Dict[int, np.ndarray] = {}
        for leaf in range(self.tree.n_leaves):
            si = self.tip_states[leaf]
            onehot = np.zeros((n, S))
            valid = (si >= 0) & (si < S)
            onehot[np.arange(n)[valid], si[valid]] = 1.0
            onehot[~valid] = 1.0
            partials[leaf] = np.repeat(onehot[:, None, :], C, axis=1)
        for parent, lc, rc, tl, tr in self.tree.schedule():
            out = np.empty((n, C, S))
            for c in range(C):
                P1 = m.p_matrix(tl, self.rates[c])
                P2 = m.p_matrix(tr, self.rates[c])
                out[:, c, :] = (partials[lc][:, c, :] @ P1.T) * (
                    partials[rc][:, c, :] @ P2.T)
            partials[parent] = out
        root = partials[self.tree.root]
        lik = np.mean(root @ m.pi, axis=1)
        return float(np.sum(np.log(lik) * self.wgt))
