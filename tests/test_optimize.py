"""Differentiable likelihood + branch-length optimisation tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plf_tpu.config import Backend, PLFConfig
from plf_tpu.models import (PhyloModel, hky85, optimize_branch_lengths,
                            random_tree, tree_loglik_fn)


def _phylo(n_leaves=5, n_sites=200, seed=3):
    tree = random_tree(n_leaves, seed=seed)
    model = hky85(2.0, [0.3, 0.2, 0.3, 0.2])
    rng = np.random.default_rng(seed)
    tips = rng.integers(0, 4, size=(n_leaves, n_sites))
    cfg = PLFConfig(block_sites=128, interpret=True)
    return PhyloModel(tree, model, tips, alpha=0.6, config=cfg)


def test_loglik_fn_matches_phylo_model():
    pm = _phylo()
    fn, t0 = tree_loglik_fn(pm)
    ll = float(fn(jnp.asarray(t0)))
    ref = pm.log_likelihood().log_likelihood
    assert abs(ll - ref) < 1e-3 * abs(ref) + 0.5  # fp32 log/sum on device


def test_gradient_matches_finite_differences():
    pm = _phylo(n_leaves=4, n_sites=100)
    fn, t0 = tree_loglik_fn(pm)
    g = np.asarray(jax.grad(fn)(jnp.asarray(t0)))
    eps = 1e-3
    for i in range(len(t0)):
        tp = t0.copy(); tp[i] += eps
        tm = t0.copy(); tm[i] -= eps
        fd = (float(fn(jnp.asarray(tp))) - float(fn(jnp.asarray(tm)))) / (
            2 * eps)
        assert abs(g[i] - fd) < 5e-2 * max(1.0, abs(fd)), (i, g[i], fd)


def test_optimize_increases_likelihood():
    pm = _phylo(n_leaves=5, n_sites=150, seed=8)
    t_opt, ll0, ll1 = optimize_branch_lengths(pm, steps=60,
                                              learning_rate=0.05)
    assert ll1 > ll0
    assert (t_opt > 0).all()


def test_fit_model_improves_likelihood():
    """Gradient fit of GTR rates + frequencies + lengths on simulated
    data starting from a wrong model."""
    from plf_tpu.models import (fit_model, gtr, random_tree,
                                simulate_alignment)
    true_model = gtr([1.0, 3.0, 0.8, 1.2, 3.5, 1.0],
                     [0.35, 0.15, 0.25, 0.25])
    tree = random_tree(5, seed=4, mean_branch=0.25)
    tips = simulate_alignment(tree, true_model, 600, seed=5)
    wrong = gtr([1.0, 1.01, 0.99, 1.0, 1.02, 0.98],
                [0.25, 0.25, 0.25, 0.25])
    pm = _phylo()  # placeholder to reuse config; build proper below
    from plf_tpu.models import PhyloModel
    pm = PhyloModel(tree, wrong, tips,
                    config=PLFConfig(block_sites=128, interpret=True))
    fitted, t_opt, ll0, ll1 = fit_model(pm, steps=120, learning_rate=0.05)
    assert ll1 > ll0 + 1.0
    # fitted frequencies should move toward the truth
    err0 = np.abs(np.asarray(wrong.pi) - true_model.pi).sum()
    err1 = np.abs(np.asarray(fitted.pi) - true_model.pi).sum()
    assert err1 < err0
