"""aLRT / SH-like branch support."""

import numpy as np

from plf_tpu.models import (alrt_support, annotate_alrt, jc69, random_tree,
                            simulate_alignment, parse_newick, nni_search)


def test_alrt_on_ml_tree_is_nonnegative_and_supported():
    true = random_tree(6, seed=21, mean_branch=0.15)
    model = jc69()
    tips = simulate_alignment(true, model, n_sites=1500, seed=22)
    # Put ourselves at (a local) ML topology first so alternatives lose.
    res = nni_search(true, model, tips)
    tree, tips_t = res.tree, tips
    # nni_search preserves leaf indexing (rebuilds keep node indices).
    sup = alrt_support(tree, model, tips_t, rell_replicates=200, seed=1)
    assert sup  # every internal non-root branch measured
    for d, (alrt, sh) in sup.items():
        assert alrt >= -1e-6   # at a local NNI optimum
        assert 0.0 <= sh <= 1.0
    # Strong simulated signal: most branches should be confidently
    # supported.
    shs = [sh for _, sh in sup.values()]
    assert np.mean(shs) > 0.6


def test_annotate_alrt_labels():
    tree = parse_newick("((a:0.1,b:0.1):0.1,(c:0.1,d:0.1):0.1);")
    model = jc69()
    tips = simulate_alignment(tree, model, n_sites=400, seed=3)
    sup = alrt_support(tree, model, tips, rell_replicates=50)
    ann = annotate_alrt(tree, sup, which="sh")
    labels = [n.name for n in ann.nodes
              if not n.is_leaf and n.name and n.name.isdigit()]
    assert labels
    ann2 = annotate_alrt(tree, sup, which="alrt")
    assert ann2.to_newick().endswith(";")
