"""Bootstrap / RELL support tests."""

import numpy as np
import pytest

from plf_tpu.config import PLFConfig
from plf_tpu.models import (PhyloModel, bootstrap_log_likelihoods,
                            bootstrap_weights, hky85, random_tree,
                            rell_support, simulate_alignment, nni_neighbors)


def test_bootstrap_weights_preserve_total():
    wgt = np.array([3, 1, 4, 1, 5], np.int32)
    w = bootstrap_weights(wgt, 50, seed=1)
    assert w.shape == (50, 5)
    assert (w.sum(axis=1) == wgt.sum()).all()
    # expectation matches the original weights
    assert np.allclose(w.mean(axis=0), wgt, atol=1.5)


def test_bootstrap_lls_bracket_point_estimate():
    tree = random_tree(5, seed=81, mean_branch=0.2)
    model = hky85(2.0)
    tips = simulate_alignment(tree, model, 400, seed=81)
    cfg = PLFConfig(block_sites=128, interpret=True)
    pm = PhyloModel(tree, model, tips, config=cfg)
    ll = pm.log_likelihood().log_likelihood
    # identity-weights dot of true per-site lls reproduces the total
    res = pm.log_likelihood()
    assert np.isclose(res.true_site_log_likelihood() @ pm.wgt, ll,
                      rtol=1e-9)
    lls = bootstrap_log_likelihoods(pm, n_replicates=60, seed=2)
    assert lls.shape == (60,)
    assert lls.min() < ll < lls.max() or np.isclose(lls.std(), 0)


def test_rell_prefers_true_topology():
    true_tree = random_tree(6, seed=83, mean_branch=0.25)
    model = hky85(2.0)
    tips = simulate_alignment(true_tree, model, 1500, seed=83)
    cfg = PLFConfig(block_sites=512, interpret=True)
    pm_true = PhyloModel(true_tree, model, tips, config=cfg)
    rivals = [PhyloModel(t, model, tips, config=cfg)
              for t in nni_neighbors(true_tree)[:3]]
    support = rell_support([pm_true] + rivals, n_replicates=300, seed=3)
    assert np.isclose(support.sum(), 1.0)
    assert support[0] == support.max()


def test_rell_rejects_mismatched_weights():
    tree = random_tree(4, seed=85)
    model = hky85(2.0)
    rng = np.random.default_rng(85)
    tips = rng.integers(0, 4, size=(4, 50))
    cfg = PLFConfig(block_sites=128, interpret=True)
    a = PhyloModel(tree, model, tips, config=cfg)
    b = PhyloModel(tree, model, tips, wgt=np.full(50, 2), config=cfg)
    with pytest.raises(ValueError):
        rell_support([a, b], n_replicates=5)
