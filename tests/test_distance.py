"""Distance matrices, Neighbor-Joining, consensus and bootstrap support.

Covers the inference front end (starting trees) and the bootstrap
summary back end around the PLF engine.
"""

import numpy as np
import pytest

from plf_tpu.models import (Tree, TreeNode, parse_newick, random_tree,
                            simulate_alignment, jc69)
from plf_tpu.models.distance import (pairwise_mismatch, jc_distance_matrix,
                                     neighbor_joining, nj_tree, MAX_DISTANCE)
from plf_tpu.models.consensus import (bipartitions, rf_distance,
                                      majority_rule_consensus, split_support,
                                      annotate_support, bootstrap_nj_trees)


def brute_counts(codes, wgt, S):
    L, n = codes.shape
    diff = np.zeros((L, L))
    tot = np.zeros((L, L))
    for i in range(L):
        for j in range(L):
            both = (codes[i] < S) & (codes[j] < S) & (codes[i] >= 0) & (
                codes[j] >= 0)
            tot[i, j] = wgt[both].sum()
            diff[i, j] = wgt[both & (codes[i] != codes[j])].sum()
    return diff, tot


def test_pairwise_mismatch_matches_bruteforce():
    rng = np.random.default_rng(0)
    L, n, S = 7, 93, 4
    codes = rng.integers(0, S + 1, size=(L, n)).astype(np.int32)  # incl gaps
    wgt = rng.integers(1, 5, size=(n,)).astype(np.float32)
    diff, tot = pairwise_mismatch(codes, wgt, states=S)
    bd, bt = brute_counts(codes, wgt, S)
    np.testing.assert_array_equal(np.asarray(diff), bd)
    np.testing.assert_array_equal(np.asarray(tot), bt)


def test_jc_distance_identical_and_saturated():
    codes = np.array([[0, 1, 2, 3] * 5,
                      [0, 1, 2, 3] * 5,          # identical -> d = 0
                      [1, 2, 3, 0] * 5],         # all-different -> saturated
                     dtype=np.int32)
    d = jc_distance_matrix(codes, states=4)
    assert d[0, 1] == 0.0
    assert d[0, 2] == MAX_DISTANCE
    assert np.allclose(d, d.T)
    assert np.all(np.diag(d) == 0.0)


def test_nj_recovers_additive_tree():
    # Known additive metric on 5 taxa (classic NJ textbook example shape):
    # ((a:2,b:3):1,(c:4,d:5):2,e:6) as an unrooted tree.
    newick = "((a:2,b:3):1,(c:4,d:5):2,e:6);"
    t = parse_newick(newick)
    # Build the exact path-length matrix from the tree.
    names = sorted(t.leaf_names())
    idx = {n.name: n.index for n in t.nodes if n.is_leaf}

    parent = {}
    for nd in t.nodes:
        for c in nd.children:
            parent[c] = nd.index

    def path_to_root(i):
        out = {}
        d = 0.0
        while i in parent:
            d += t.nodes[i].length
            i = parent[i]
            out[i] = d
        return out

    L = len(names)
    D = np.zeros((L, L))
    for i in range(L):
        pi = path_to_root(idx[names[i]])
        for j in range(L):
            if i == j:
                continue
            pj = path_to_root(idx[names[j]])
            best = min(pi[a] + pj[a] for a in pi if a in pj)
            D[i, j] = best
    nj = neighbor_joining(D, names)
    # NJ is consistent on additive distances: topology must match.
    assert rf_distance(nj, t) == 0
    # And path lengths must be reproduced (additivity).
    idx2 = {n.name: n.index for n in nj.nodes if n.is_leaf}
    parent2 = {}
    for nd in nj.nodes:
        for c in nd.children:
            parent2[c] = nd.index

    def p2(i):
        out = {}
        d = 0.0
        while i in parent2:
            d += nj.nodes[i].length
            i = parent2[i]
            out[i] = d
        return out

    for i in range(L):
        pi = p2(idx2[names[i]])
        for j in range(i + 1, L):
            pj = p2(idx2[names[j]])
            best = min(pi[a] + pj[a] for a in pi if a in pj)
            assert abs(best - D[i, j]) < 1e-9


def test_nj_tree_end_to_end_from_simulation():
    tree = random_tree(8, seed=3, mean_branch=0.08)
    model = jc69()
    codes = simulate_alignment(tree, model, n_sites=2000, seed=7)
    t = nj_tree(codes, names=tree.leaf_names(), states=4)
    assert sorted(t.leaf_names()) == sorted(tree.leaf_names())
    sched = t.schedule()          # rooted binary, engine-ready
    assert len(sched) == 7
    # Long simulation on a clock-ish tree: NJ should be close in RF.
    assert rf_distance(t, tree) <= 4


def test_bipartitions_and_rf():
    t1 = parse_newick("((a:1,b:1):1,(c:1,d:1):1,e:1);")
    t2 = parse_newick("((a:1,c:1):1,(b:1,d:1):1,e:1);")
    b1 = bipartitions(t1)
    assert frozenset(["c", "d"]) in b1 or frozenset(["a", "b", "e"]) in b1
    assert rf_distance(t1, t1) == 0
    assert rf_distance(t1, t2) == 4  # both non-trivial splits differ
    t3 = parse_newick("((a:1,b:1):1,(x:1,d:1):1,e:1);")
    with pytest.raises(ValueError):
        rf_distance(t1, t3)


def test_majority_rule_consensus():
    trees = [parse_newick(s) for s in [
        "((a:1,b:1):1,(c:1,d:1):1,e:1);",
        "((a:1,b:1):1,(c:1,e:1):1,d:1);",
        "((a:1,b:1):1,(c:1,d:1):1,e:1);",
    ]]
    cons = majority_rule_consensus(trees)
    splits = set(bipartitions(cons))
    assert frozenset(["a", "b"]) in splits or \
        frozenset(["c", "d", "e"]) in splits
    # {c,d} appears 2/3 > 0.5 -> kept; {c,e} 1/3 -> dropped.
    sup = split_support(trees)
    ab = frozenset(["c", "d", "e"])  # canonical side of the a|b split
    assert sup[ab] == 1.0
    # Support percentages appear as internal labels.
    labels = [n.name for n in cons.nodes if not n.is_leaf and n.name]
    assert "100" in labels
    # Consensus is engine-ready (binary).
    cons.schedule()


def test_annotate_support_and_bootstrap_nj():
    tree = random_tree(6, seed=1, mean_branch=0.15)
    model = jc69()
    codes = simulate_alignment(tree, model, n_sites=1500, seed=2)
    reps = bootstrap_nj_trees(codes, n_replicates=10,
                              names=tree.leaf_names(), seed=5)
    assert len(reps) == 10
    ann = annotate_support(tree, reps)
    assert ann.to_newick() != ""
    vals = [int(n.name) for n in ann.nodes
            if not n.is_leaf and n.name and n.name.isdigit()]
    assert vals and all(0 <= v <= 100 for v in vals)
