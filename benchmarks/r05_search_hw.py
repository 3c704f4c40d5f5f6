"""Round-5 search-at-scale probe: 256 taxa x 16k sites NNI round.

Measures the three phases of a production search round on hardware —
model building, plan/schedule prep, batched scoring — after the
round-5 host-side rework (numpy operator stacks, one upload per
neighbourhood, donor-cached codes3/codes_st) and the refinement pass.

r04 anchors (r04_search.txt): building 1.4 s + prep 1.1 s + scoring
1.6 s steady / 6-8 s first-call compile.

Run: PYTHONPATH=/root/repo python benchmarks/r05_search_hw.py
"""
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402

from plf_tpu.config import PLFConfig  # noqa: E402
from plf_tpu.models import PhyloModel, hky85, random_tree  # noqa: E402
from plf_tpu.models.phylo import batch_log_likelihood_segmented  # noqa: E402
from plf_tpu.models.search import nni_neighbors  # noqa: E402

print("devices:", jax.devices(), flush=True)
OUT = os.path.join(os.path.dirname(__file__), "results",
                   "r05_search.txt")
lines = []


def log(s):
    print(s, flush=True)
    lines.append(s)


def main():
    n_taxa, n_sites = 256, 16384
    tree = random_tree(n_taxa, seed=1)
    tips = np.random.default_rng(2).integers(
        0, 4, size=(n_taxa, n_sites)).astype(np.int32)
    model = hky85(2.0)
    cfg = PLFConfig(block_sites=2048)

    t0 = time.perf_counter()
    pm0 = PhyloModel(tree, model, tips, alpha=0.6, config=cfg)
    cands, moves = nni_neighbors(tree, with_moves=True)
    log(f"neighbourhood: {len(cands)} candidates "
        f"({time.perf_counter()-t0:.2f}s incl pm0 + enumeration)")

    t0 = time.perf_counter()
    pms = [pm0] + [PhyloModel(c, model, tips, alpha=0.6,
                              config=pm0.config, share_device_from=pm0)
                   for c in cands]
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    for pm in pms:
        pm._segmented_inputs(device=False)
    t_prep = time.perf_counter() - t0
    log(f"model building {t_build:.2f}s, plan/schedule prep "
        f"{t_prep:.2f}s (r04: 1.4s + 1.1s)")

    t0 = time.perf_counter()
    lls = batch_log_likelihood_segmented(pms)
    t_first = time.perf_counter() - t0
    log(f"scoring first call (compile): {t_first:.1f}s")
    for trial in range(3):
        t0 = time.perf_counter()
        lls = batch_log_likelihood_segmented(pms)
        log(f"scoring steady trial {trial}: "
            f"{time.perf_counter()-t0:.2f}s for {len(pms)} candidates "
            f"({(time.perf_counter()-t0)/len(pms)*1e3:.1f} ms/cand)")
    assert np.all(np.isfinite(lls))
    best = int(np.argmax(lls[1:]))
    log(f"incumbent ll {lls[0]:.2f}; best candidate {best} "
        f"ll {lls[1+best]:.2f}")
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
