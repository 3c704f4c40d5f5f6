"""Marginal ancestral state reconstruction tests."""

import itertools

import numpy as np
import pytest

from plf_tpu.config import PLFConfig
from plf_tpu.models import PhyloModel, hky85, jc69, parse_newick, random_tree
from plf_tpu.models.ancestral import ancestral_marginal


def _bruteforce_posterior(pm):
    """Enumerate all internal-state assignments (tiny trees only)."""
    S = pm.model.states
    C = pm.config.categories
    n = pm.n_sites
    schedule = [(p, l, r) for (p, l, r, _, _) in pm.schedule]
    internals = [p for p, _, _ in schedule]
    root = pm.tree.root
    n_leaves = pm.tree.n_leaves
    P = {nd.index: np.stack([pm.model.p_matrix(nd.length, r)
                             for r in pm.rates])
         for nd in pm.tree.nodes if nd.index != root}

    tipl = {}
    for leaf in range(n_leaves):
        si = pm.tip_states[leaf]
        oh = np.zeros((n, S))
        valid = (si >= 0) & (si < S)
        oh[np.arange(n)[valid], si[valid]] = 1.0
        oh[~valid] = 1.0
        tipl[leaf] = oh

    post = {v: np.zeros((n, S)) for v in internals}
    total = np.zeros(n)
    parent_of = {}
    for p, l, r in schedule:
        parent_of[l] = p
        parent_of[r] = p
    for assign in itertools.product(range(S), repeat=len(internals)):
        st = dict(zip(internals, assign))
        for c in range(C):
            w = np.full(n, pm.model.pi[st[root]] / C)
            for v, p in parent_of.items():
                if v < n_leaves:
                    # leaf edge: sum over observed leaf state
                    w = w * (P[v][c][st[p]] * tipl[v]).sum(axis=1)
                else:
                    w = w * P[v][c][st[p], st[v]]
            total += w
            for v in internals:
                post[v][:, st[v]] += w
    return {v: post[v] / total[:, None] for v in internals}


def test_ancestral_matches_bruteforce():
    tree = random_tree(4, seed=71, mean_branch=0.3)
    model = hky85(2.0, [0.3, 0.2, 0.3, 0.2])
    rng = np.random.default_rng(71)
    tips = rng.integers(0, 4, size=(4, 30))
    tips[0, 5] = -1  # a gap
    pm = PhyloModel(tree, model, tips, alpha=0.7,
                    config=PLFConfig(block_sites=128, interpret=True))
    got = ancestral_marginal(pm)
    want = _bruteforce_posterior(pm)
    assert set(got) == set(want)
    for v in got:
        assert np.allclose(got[v], want[v], atol=2e-5), v


def test_ancestral_rows_sum_to_one():
    tree = random_tree(7, seed=73, mean_branch=0.2)
    model = jc69()
    rng = np.random.default_rng(73)
    tips = rng.integers(0, 4, size=(7, 100))
    pm = PhyloModel(tree, model, tips,
                    config=PLFConfig(block_sites=128, interpret=True))
    got = ancestral_marginal(pm)
    assert len(got) == 6  # internal nodes of a 7-leaf rooted binary tree
    for v, p in got.items():
        assert p.shape == (100, 4)
        assert np.allclose(p.sum(axis=1), 1.0, atol=1e-5)


def test_ancestral_all_gaps_gives_prior():
    """With no data anywhere, the root posterior is the stationary
    distribution."""
    tree = parse_newick("((A:0.1,B:0.1):0.1,(C:0.1,D:0.1):0.1);")
    model = hky85(2.0, [0.4, 0.1, 0.3, 0.2])
    tips = -np.ones((4, 8), dtype=np.int64)
    pm = PhyloModel(tree, model, tips,
                    config=PLFConfig(block_sites=128, interpret=True))
    got = ancestral_marginal(pm)
    root_post = got[pm.tree.root]
    assert np.allclose(root_post, model.pi[None, :], atol=1e-5)


def test_ancestral_certain_at_zero_length():
    """An internal node at zero distance from a leaf matches that leaf's
    observed state with near-certainty."""
    tree = parse_newick("((A:0.0001,B:1.5):0.8,C:1.2);")
    model = jc69()
    tips = np.array([[2] * 20, [1] * 20, [3] * 20])
    pm = PhyloModel(tree, model, tips,
                    config=PLFConfig(block_sites=128, interpret=True))
    got = ancestral_marginal(pm)
    # the parent of A/B (first internal in the schedule)
    ab = pm.schedule[0][0]
    assert (got[ab][:, 2] > 0.99).all()


def test_site_rates_posterior():
    from plf_tpu.models import simulate_alignment, site_rates
    tree = random_tree(5, seed=31, mean_branch=0.1)
    model = jc69()
    # Mix of invariant-ish and fast sites via gamma simulation.
    tips = simulate_alignment(tree, model, n_sites=300, alpha=0.4, seed=32)
    pm = PhyloModel(tree, model, tips, alpha=0.4)
    mean_rate, post = site_rates(pm)
    n, C = tips.shape[1], pm.config.categories
    assert mean_rate.shape == (n,)
    assert post.shape == (n, C)
    np.testing.assert_allclose(post.sum(axis=1), 1.0, atol=1e-9)
    assert np.all(mean_rate > 0)
    # Constant columns should get below-average rate estimates.
    const = np.all(tips == tips[0], axis=0)
    if const.any() and (~const).any():
        assert mean_rate[const].mean() < mean_rate[~const].mean()
