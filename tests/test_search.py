"""NNI tree search tests."""

import numpy as np
import pytest

from plf_tpu.config import PLFConfig
from plf_tpu.models import (PhyloModel, hky85, nni_neighbors, nni_search,
                            parse_newick, random_tree, simulate_alignment)


def test_nni_neighbors_valid_trees():
    tree = random_tree(6, seed=1)
    neigh = nni_neighbors(tree)
    assert len(neigh) > 0
    for t in neigh:
        assert t.n_leaves == 6
        sched = t.schedule()
        assert len(sched) == 5
        # all leaves reachable exactly once
        seen = []
        for p, l, r, _, _ in sched:
            for c in (l, r):
                if c < 6:
                    seen.append(c)
        assert sorted(seen) == list(range(6))


def test_nni_neighbors_differ_from_original():
    tree = parse_newick("((A:0.1,B:0.1):0.1,(C:0.1,D:0.1):0.1);")
    neigh = nni_neighbors(tree)
    orig = {tuple(n.children) for n in tree.nodes if n.children}
    assert any({tuple(n.children) for n in t.nodes if n.children} != orig
               for t in neigh)


def test_nni_search_recovers_better_topology():
    """Start from a deliberately scrambled topology on simulated data;
    NNI search must improve the likelihood."""
    true_tree = random_tree(6, seed=7, mean_branch=0.2)
    model = hky85(2.0, [0.3, 0.2, 0.3, 0.2])
    tips = simulate_alignment(true_tree, model, 500, seed=2)
    cfg = PLFConfig(block_sites=128, interpret=True)
    # scrambled start: a caterpillar over the same leaves
    nwk = "t0:0.1"
    for i in range(1, 6):
        nwk = f"({nwk},t{i}:0.1):0.1"
    start = parse_newick(nwk + ";")
    ll_start = PhyloModel(start, model, tips,
                          config=cfg).log_likelihood().log_likelihood
    res = nni_search(start, model, tips, config=cfg, max_rounds=3)
    assert res.log_likelihood >= ll_start
    assert res.evaluations > 1
