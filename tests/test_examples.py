"""Smoke-run the shipped examples (tiny sizes) so they cannot bit-rot.

The examples double as user documentation (README links them); each is
executed in-process with small arguments on the CPU backend.
"""

import runpy
import sys

import pytest

EXAMPLES = [
    ("examples/quickstart.py", ["--taxa", "6", "--sites", "300"]),
    ("examples/model_selection.py", ["--taxa", "5", "--sites", "300"]),
]


def _run(path, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [path] + argv)
    try:
        runpy.run_path(path, run_name="__main__")
    except SystemExit as e:   # examples end with sys.exit(0)
        assert e.code in (0, None)


@pytest.mark.parametrize("path,argv", EXAMPLES,
                         ids=[p.split("/")[-1] for p, _ in EXAMPLES])
def test_example_runs(path, argv, monkeypatch):
    _run(path, argv, monkeypatch)


@pytest.mark.slow
def test_full_inference_example_runs(monkeypatch):
    _run("examples/full_inference.py",
         ["--taxa", "6", "--sites", "400", "--bootstrap", "3"],
         monkeypatch)


@pytest.mark.slow
def test_codon_dnds_example_runs(monkeypatch):
    _run("examples/codon_dnds.py",
         ["--taxa", "5", "--codons", "200"], monkeypatch)
