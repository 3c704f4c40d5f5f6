"""Differentiable tree likelihood + on-device branch-length optimisation.

The reference's roadmap wants "updating PLF parameters from the FPGA"
(README.md:201-205) — on TPU this is free: branch transition matrices are
jit inputs computed from branch lengths *inside* the compiled graph, so
``jax.value_and_grad`` gives exact dLL/dt for every branch in one
backward pass, and an optax loop maximises the likelihood entirely
on-device.  (RAxML does this with hand-coded Newton iterations on one
branch at a time; here all branches update simultaneously.)

The differentiable path uses the element-wise XLA PLF stages (autodiff
through the fused Pallas kernel would need a custom VJP — the XLA path
compiles to near-identical fused code and is the pragmatic choice for
gradients).  Underflow rescaling is kept: the 2^32 factors are constant
w.r.t. branch lengths almost everywhere, so gradients are exact wherever
the likelihood is differentiable.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..reference import MIN_LIKELIHOOD, TWO_TO_THE_32
from .phylo import LOG_MINLIK, PhyloModel

__all__ = ["tree_loglik_fn", "optimize_branch_lengths"]


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


def tree_loglik_fn(pm: PhyloModel):
    """Build ``(branch_lengths) -> log_likelihood`` as a pure jittable fn.

    ``branch_lengths``: (n_nodes-1,) vector indexed by child node (every
    node except the root owns the branch to its parent).  Returns
    (fn, t0) with t0 the tree's current lengths.
    """
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
    wgt = jnp.asarray(pm.wgt, jnp.float32)

    # Tip CLVs (n, C, S) in eigen coordinates, computed once.
    tips = {}
    for leaf in range(n_leaves):
        tips[leaf] = jnp.asarray(
            model.tip_clv(pm.tip_states[leaf], C), jnp.float32)

    t0 = np.array([pm.tree.nodes[i].length
                   for i in range(pm.tree.n_nodes - 1)], np.float32)

    def branch_factor(t):
        """(C, S, S) factor: u[k, a] * exp(lam_a * t * r_c)."""
        e = jnp.exp(lam[None, :] * t * rates[:, None])   # (C, S)
        return u[None, :, :] * e[:, None, :]

    def loglik(t_vec):
        clvs = dict(tips)
        scaler = jnp.float32(0.0)
        for parent, l, r in schedule:
            left = branch_factor(t_vec[l])
            right = branch_factor(t_vec[r])
            x3, sv = _plf_stage(clvs[l], clvs[r], left, right, ev_arr,
                                S, C)
            clvs[parent] = x3
            scaler = scaler + jnp.sum(sv * wgt.astype(jnp.int32))
        root = clvs[schedule[-1][0]]
        lik = jnp.mean(root @ pi_u, axis=1)              # (n,)
        site_ll = jnp.log(jnp.maximum(lik, jnp.float32(1e-45)))
        return jnp.sum(site_ll * wgt) + scaler * jnp.float32(LOG_MINLIK)

    return jax.jit(loglik), t0


def optimize_branch_lengths(pm: PhyloModel, steps: int = 100,
                            learning_rate: float = 0.02,
                            min_length: float = 1e-6
                            ) -> Tuple[np.ndarray, float, float]:
    """Maximise the tree likelihood over all branch lengths on device.

    Optimises in log-space (lengths stay positive) with optax adam.
    Returns (optimised_lengths, ll_before, ll_after).
    """
    import optax

    fn, t0 = tree_loglik_fn(pm)
    ll0 = float(fn(jnp.asarray(t0)))

    def loss(log_t):
        return -fn(jnp.exp(log_t) + min_length)

    opt = optax.adam(learning_rate)
    log_t = jnp.log(jnp.maximum(jnp.asarray(t0), min_length))
    state = opt.init(log_t)

    @jax.jit
    def step(log_t, state):
        val, g = jax.value_and_grad(loss)(log_t)
        updates, state = opt.update(g, state)
        return optax.apply_updates(log_t, updates), state, val

    for _ in range(steps):
        log_t, state, val = step(log_t, state)
    t_opt = np.asarray(jnp.exp(log_t) + min_length)
    ll1 = float(fn(jnp.asarray(t_opt)))
    return t_opt, ll0, ll1
