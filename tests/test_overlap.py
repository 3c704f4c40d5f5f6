"""Executor-overlap proof (TPU hardware only; skipped on the CPU CI).

The real evidence lives in benchmarks/overlap.py (archived run:
benchmarks/results/r02_overlap.txt — 18% wall-time win from
inflight=2 refill-before-drain vs strictly serial, phase-sum > wall).
"""

import jax
import pytest


@pytest.mark.slow
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="overlap is only measurable on real hardware")
def test_streaming_executor_overlaps():
    import importlib
    import benchmarks.overlap as ov
    importlib.reload(ov)
    import sys
    argv = sys.argv
    sys.argv = ["overlap.py", "--calls", "4", "--sites", "131072"]
    try:
        overlap = ov.main()
    finally:
        sys.argv = argv
    assert overlap > 0.0, f"no overlap measured ({overlap:.2%})"
