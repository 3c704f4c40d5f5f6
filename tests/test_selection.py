"""Model selection (models/selection.py): criteria math + recovery.

Mirrors the ModelTest workflow the reference's users run before any PLF
call: simulate under a known model, check the selector ranks it ahead
of both under- and over-parameterised alternatives.
"""

import numpy as np
import pytest

from plf_tpu.config import PLFConfig
from plf_tpu.models import (PhyloModel, hky85, jc69, model_select,
                            random_tree, simulate_alignment)
from plf_tpu.models.selection import empirical_frequencies

CFG = PLFConfig(block_sites=128)


def test_empirical_frequencies_skip_ambiguity():
    codes = np.array([[0, 0, 1, 2, 3, 4, 10, -1]])  # 4/10/-1 not plain
    pi = empirical_frequencies(codes, 4)
    assert pi.shape == (4,)
    np.testing.assert_allclose(pi.sum(), 1.0)
    assert pi[0] > pi[1] == pi[2] == pi[3]


@pytest.mark.slow
def test_model_select_recovers_hky_over_jc():
    # strongly transition-biased HKY data: JC must lose even with the
    # parameter penalty; GTR must not beat HKY+G by more than its extra
    # parameters allow (criterion ordering, not raw lnL)
    tree = random_tree(8, seed=2)
    model = hky85(8.0, np.array([0.3, 0.2, 0.3, 0.2]))
    aln = simulate_alignment(tree, model, 2000, alpha=0.6, seed=5)
    res = model_select(tree, aln, candidates=("JC", "JC+G", "HKY+G"),
                       criterion="AICc", config=CFG, steps=40)
    assert res.best.name == "HKY+G"
    assert res.best.alpha is not None and 0.1 < res.best.alpha < 5.0
    # fitted kappa should be far from 1 (transition-heavy data)
    fits = {f.name: f for f in res.fits}
    assert fits["HKY+G"].log_likelihood > fits["JC+G"].log_likelihood
    # criteria consistency: AICc >= AIC, and both = f(k, lnL)
    for f in res.fits:
        assert f.aicc >= f.aic
        np.testing.assert_allclose(
            f.aic, 2 * f.k_params - 2 * f.log_likelihood)
    assert "HKY+G" in res.table()


def test_model_select_param_counts():
    tree = random_tree(6, seed=1)
    aln = simulate_alignment(tree, jc69(), 300, seed=3)
    res = model_select(tree, aln, candidates=("JC", "JC+G"),
                      criterion="BIC", config=CFG, steps=10)
    k_branch = 2 * 6 - 3
    fits = {f.name: f for f in res.fits}
    assert fits["JC"].k_params == k_branch
    assert fits["JC+G"].k_params == k_branch + 1
    # JC data: the simpler model should win under BIC
    assert res.best.name == "JC"
