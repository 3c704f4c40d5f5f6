"""PAML .dat empirical protein matrix loading."""

import numpy as np
import pytest

from plf_tpu.models import (parse_paml_matrix, empirical_protein,
                            AMINO_ACIDS, PhyloModel, random_tree,
                            simulate_alignment)


def synth_dat(seed=0):
    """A synthetic PAML-format .dat text with known values."""
    rng = np.random.default_rng(seed)
    R = np.zeros((20, 20))
    iu = np.triu_indices(20, 1)
    R[iu] = rng.uniform(0.05, 5.0, size=190)
    R = R + R.T
    pi = rng.dirichlet(np.full(20, 5.0))
    lines = []
    for i in range(1, 20):
        lines.append(" ".join(f"{R[i, j]:.6f}" for j in range(i)))
    lines.append("")
    lines.append(" ".join(f"{p:.6f}" for p in pi))
    lines.append("")
    lines.append("Ala Arg Asn Asp Cys trailing comment text")
    return "\n".join(lines), R, pi


def test_parse_paml_roundtrip():
    text, R, pi = synth_dat()
    R2, pi2 = parse_paml_matrix(text)
    np.testing.assert_allclose(R2, R, atol=1e-6)
    np.testing.assert_allclose(pi2, pi / pi.sum(), atol=1e-6)
    assert len(AMINO_ACIDS) == 20


def test_parse_paml_too_short():
    with pytest.raises(ValueError):
        parse_paml_matrix("1.0 2.0 3.0")


def test_empirical_protein_model_runs(tmp_path):
    text, _, _ = synth_dat(seed=1)
    p = tmp_path / "synth.dat"
    p.write_text(text)
    model = empirical_protein(str(p))
    assert model.states == 20
    # Q is a proper reversible generator: rows sum to 0, pi stationary.
    q = (model.u * model.eigenvalues[None, :]) @ model.w
    np.testing.assert_allclose(q.sum(axis=1), 0.0, atol=1e-8)
    np.testing.assert_allclose(model.pi @ q, 0.0, atol=1e-8)
    # And it evaluates through the engine (20 states x 4 categories).
    tree = random_tree(4, seed=2)
    tips = simulate_alignment(tree, model, n_sites=60, seed=3)
    pm = PhyloModel(tree, model, tips)
    res = pm.log_likelihood()
    assert res.log_likelihood == pytest.approx(
        pm.log_likelihood_bruteforce(), abs=1e-2)
