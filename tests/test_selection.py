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


def test_candidate_ladders_and_defaults(monkeypatch):
    """Round 4: +I/+I+G in the DNA ladder; states==20 defaults to the
    empirical protein ladder (LG/WAG/JTT/Dayhoff)."""
    from plf_tpu.models import selection as sel_mod
    from plf_tpu.models.selection import (DNA_CANDIDATES,
                                          PROTEIN_CANDIDATES)

    assert "HKY+I" in DNA_CANDIDATES and "GTR+I+G" in DNA_CANDIDATES
    assert "LG+G" in PROTEIN_CANDIDATES

    ran = []

    def stub(tree, model, codes, wgt, alpha0, config, steps, fit_alpha,
             fit_pinv=False):
        ran.append((model.states, fit_alpha, fit_pinv))
        t = np.full(tree.n_nodes - 1, 0.1, np.float32)
        return tree, (0.5 if fit_alpha else None), -100.0, t, (
            0.2 if fit_pinv else None)

    monkeypatch.setattr(sel_mod, "_fit_lengths_alpha", stub)
    tree = random_tree(4, seed=3)
    codes = np.random.default_rng(0).integers(0, 20, size=(4, 50))
    res = model_select(tree, codes, config=PLFConfig(states=20),
                       candidates=None, steps=2)
    assert [f.name for f in sorted(res.fits, key=lambda f: f.name)] == \
        sorted(PROTEIN_CANDIDATES)
    assert all(s == 20 for (s, _, _) in ran)


@pytest.mark.slow
def test_model_select_pinv_recovers_plus_i():
    """Data with a large invariant-site fraction must select the +I
    candidate over the same model without it."""
    tree = random_tree(8, seed=7)
    model = hky85(4.0, np.array([0.25, 0.25, 0.25, 0.25]))
    rng = np.random.default_rng(13)
    aln = simulate_alignment(tree, model, 1500, seed=9)
    # force ~45% of columns invariant (constant random state)
    inv = rng.random(aln.shape[1]) < 0.45
    const = rng.integers(0, 4, size=aln.shape[1])
    aln[:, inv] = const[None, inv]
    res = model_select(tree, aln, candidates=("HKY", "HKY+I"),
                      criterion="AICc", config=CFG, steps=30)
    assert res.best.name == "HKY+I"
    assert res.best.p_inv is not None and res.best.p_inv > 0.2
    fits = {f.name: f for f in res.fits}
    assert fits["HKY+I"].log_likelihood > fits["HKY"].log_likelihood + 10


@pytest.mark.slow
def test_model_select_protein_ladder_runs():
    """The empirical protein ladder fits and ranks on a protein
    alignment (the --model auto protein path)."""
    from plf_tpu.models import empirical_protein
    tree = random_tree(5, seed=11)
    model = empirical_protein("lg")
    aln = simulate_alignment(tree, model, 300, seed=3)
    res = model_select(tree, aln, candidates=("LG", "WAG"),
                       config=PLFConfig(states=20, block_sites=128),
                       steps=15)
    assert {f.name for f in res.fits} == {"LG", "WAG"}
    assert all(np.isfinite(f.log_likelihood) for f in res.fits)
    assert all(f.k_params == 2 * 5 - 3 for f in res.fits)


@pytest.mark.slow
def test_model_select_picks_plus_f_on_biased_frequencies():
    """Data simulated under LG with strongly skewed frequencies (the
    +F case) must rank an +F candidate ahead of the published-pi
    variant."""
    from plf_tpu.models.substitution import empirical_protein

    rng = np.random.default_rng(11)
    pi = rng.dirichlet(np.full(20, 0.15))       # strongly skewed
    pi = 0.9 * pi + 0.1 / 20
    m_true = empirical_protein("lg", pi=pi)
    tree = random_tree(8, seed=4, mean_branch=0.3)
    aln = simulate_alignment(tree, m_true, 1500, seed=9)
    cfg = PLFConfig(states=20, block_sites=128)
    res = model_select(tree, aln, candidates=("LG", "LG+F"),
                       criterion="AICc", config=cfg, steps=30)
    assert res.best.name == "LG+F"
    fits = {f.name: f for f in res.fits}
    # +F adds 19 free parameters
    assert fits["LG+F"].k_params - fits["LG"].k_params == 19


@pytest.mark.slow
def test_model_select_codon_ladder():
    """GY94 selection on codon data: +G wins on gamma-rate data and
    the fitted omega is in the simulated regime."""
    from plf_tpu.models import codon_gy94

    tree = random_tree(6, seed=7, mean_branch=0.25)
    m_true = codon_gy94(3.0, 0.15)
    aln = simulate_alignment(tree, m_true, 500, alpha=0.5, seed=3)
    cfg = PLFConfig(states=61, block_sites=128, kernel_variant="mxu")
    res = model_select(tree, aln, candidates=("GY94", "GY94+G"),
                       criterion="AICc", config=cfg, steps=30)
    fits = {f.name: f for f in res.fits}
    assert set(fits) == {"GY94", "GY94+G"}
    assert fits["GY94+G"].k_params - fits["GY94"].k_params == 1
    assert res.best.name == "GY94+G"
