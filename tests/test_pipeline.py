"""End-to-end inference pipeline: alignment -> annotated ML tree."""

import numpy as np
import pytest

from plf_tpu.models import (jc69, hky85, random_tree, simulate_alignment,
                            parse_newick, run_inference, rf_distance)


def test_pipeline_recovers_tree():
    true = random_tree(6, seed=11, mean_branch=0.12)
    model = hky85(2.0)
    codes = simulate_alignment(true, model, n_sites=1200, seed=12)
    msgs = []
    res = run_inference(codes, names=true.leaf_names(), model=model,
                        alpha=None, search="nni", fit="lengths",
                        bootstrap=5, progress=msgs.append)
    assert res.log_likelihood < 0
    assert sorted(res.tree.leaf_names()) == sorted(true.leaf_names())
    # NJ + NNI on clean simulated data should land close to the truth.
    assert rf_distance(res.tree, true) <= 2
    assert res.newick.endswith(";")
    # Round-trips through newick (support labels included).
    parse_newick(res.newick)
    assert any("NJ starting tree" in m for m in msgs)
    assert any("bootstrap" in m for m in msgs)
    assert res.elapsed_s > 0


def test_pipeline_fit_alpha_pinv():
    true = random_tree(5, seed=13, mean_branch=0.1)
    model = jc69()
    codes = simulate_alignment(true, model, n_sites=600, alpha=0.6,
                               p_inv=0.3, seed=14)
    res = run_inference(codes, names=true.leaf_names(), model=model,
                        alpha=0.5, p_inv=0.2, search="none",
                        fit="lengths+alpha+pinv")
    assert res.alpha is not None and res.alpha > 0
    assert res.p_inv is not None and 0 < res.p_inv < 1
    assert np.isfinite(res.log_likelihood)


def test_detect_protein_tolerates_stray_symbols():
    """A few stray non-ACGT characters must not flip a DNA alignment to
    the protein alphabet (round-4 review finding); a real protein
    alignment must be detected."""
    from plf_tpu.__main__ import _detect_protein

    dna = ">a\nACGTACGTXXACGTACGTACGT\n>b\nACGTACGTAC-TACGTACGTNN\n"
    assert not _detect_protein(dna)
    prot = ">a\nMKVLITEDSQFE\n>b\nMKLLVSEDWQFE\n"
    assert _detect_protein(prot)


@pytest.mark.slow
def test_cli_infer_codon_smoke(tmp_path, capsys):
    """--seq-type codon end-to-end: DNA triplets -> GY94 fit -> tree."""
    from plf_tpu.__main__ import main
    from plf_tpu.models import codon_gy94, random_tree, simulate_alignment
    from plf_tpu.models.substitution import SENSE_CODONS

    tree = random_tree(5, seed=3, mean_branch=0.3)
    aln = simulate_alignment(tree, codon_gy94(3.0, 0.3), 60, seed=1)
    # write as in-frame DNA fasta
    lines = []
    for i in range(5):
        seq = "".join(SENSE_CODONS[c] for c in aln[i])
        lines.append(f">t{i}\n{seq}")
    fa = tmp_path / "codon.fa"
    fa.write_text("\n".join(lines) + "\n")
    out = tmp_path / "out.nwk"
    rc = main(["infer", str(fa), "--seq-type", "codon", "--model",
               "gy94", "--search", "none", "--out", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "GY94 fit" in text and "omega=" in text
    assert out.read_text().strip().endswith(";")
