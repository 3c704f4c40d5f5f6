"""Tree-search round benchmark: batched vs per-candidate scoring.

Verdict-r1 item: an NNI round on a 50-taxon alignment used to trigger a
fresh XLA compile per candidate topology (the static unrolled kernel has
the schedule as a jit static arg).  Round 2 scores the whole
neighbourhood with ONE compiled program (phylo.batch_log_likelihood:
register-machine kernel + runtime schedule arrays + lax.map).  This
bench times one full NNI neighbourhood evaluation both ways.

Run on TPU:  python benchmarks/search_bench.py [--taxa 50] [--sites 16384]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--taxa", type=int, default=50)
    ap.add_argument("--sites", type=int, default=16384)
    ap.add_argument("--max-candidates", type=int, default=None)
    ap.add_argument("--skip-register", action="store_true",
                    help="skip the register-machine batch (its lax.map "
                         "COMPILE grows with taxa count — >23 min at "
                         "256 taxa x 508 candidates on the remote "
                         "compiler, where the segmented batch compiles "
                         "in ~1 min; the segmented engine is the "
                         "big-taxa path for compile time, not just "
                         "VMEM)")
    ap.add_argument("--segmented", action="store_true",
                    help="also time the batched SEGMENTED scorer "
                         "(the big-taxa engine)")
    ap.add_argument("--per-candidate", action="store_true",
                    help="also time the old per-candidate path (slow)")
    ap.add_argument("--per-candidate-count", type=int, default=6,
                    help="candidates to sample for the old-path estimate")
    args = ap.parse_args()

    import jax
    from plf_tpu.config import PLFConfig
    from plf_tpu.models import PhyloModel, hky85, random_tree
    from plf_tpu.models.phylo import batch_log_likelihood
    from plf_tpu.models.search import nni_neighbors

    print(f"backend={jax.default_backend()}", flush=True)
    on_tpu = jax.default_backend() == "tpu"
    n_sites = args.sites if on_tpu else 1024
    block = 2048 if on_tpu else 128
    tree = random_tree(args.taxa, seed=1)
    rng = np.random.default_rng(0)
    tips = rng.integers(0, 4, size=(args.taxa, n_sites))
    cfg = PLFConfig(block_sites=block)
    model = hky85(2.0)

    cands = nni_neighbors(tree)
    if args.max_candidates:
        cands = cands[:args.max_candidates]
    print(f"{args.taxa} taxa, {n_sites} sites, "
          f"{len(cands)} NNI candidates", flush=True)

    pm0 = PhyloModel(tree, model, tips, alpha=0.5, config=cfg)

    def build_pms(cs):
        return [PhyloModel(c, model, tips, alpha=0.5, config=cfg,
                           share_device_from=pm0)
                for c in cs]

    lls = None
    if not args.skip_register:
        # batched: one device dispatch for the whole neighbourhood
        pms = build_pms(cands)
        t0 = time.perf_counter()
        lls = batch_log_likelihood(pms)
        t_first = time.perf_counter() - t0      # includes the ONE compile
        t0 = time.perf_counter()
        pms = build_pms(cands)                  # host model-building cost
        lls2 = batch_log_likelihood(pms)
        t_steady = time.perf_counter() - t0
        assert np.allclose(lls, lls2)
        print(f"batched round : first {t_first:8.2f} s (incl. compile), "
              f"steady {t_steady:8.2f} s "
              f"({t_steady/len(cands)*1e3:.1f} ms/candidate)", flush=True)

    if args.segmented:
        # big-taxa engine (round 4): the same neighbourhood through the
        # batched SEGMENTED scorer (stack_plans + lax.map over the
        # boundary-buffer scan) — one compiled program, O(#segments)
        # dispatches per candidate.  This is the path search falls back
        # to when the register-machine arena cannot fit VMEM; comparing
        # both here shows the crossover.
        from plf_tpu.models.phylo import batch_log_likelihood_segmented
        pms = build_pms(cands)
        t0 = time.perf_counter()
        lls_s = batch_log_likelihood_segmented(pms)
        t_sfirst = time.perf_counter() - t0
        t0 = time.perf_counter()
        pms = build_pms(cands)
        lls_s2 = batch_log_likelihood_segmented(pms)
        t_ssteady = time.perf_counter() - t0
        assert np.allclose(lls_s, lls_s2)
        if lls is not None:
            # both engines must agree (fp32 partials; same op order)
            assert np.allclose(lls_s, lls, rtol=1e-6), (lls_s[:3], lls[:3])
        n_seg = len(pms[0]._segmented_inputs()[0].segments)
        print(f"batched segmented: first {t_sfirst:8.2f} s, steady "
              f"{t_ssteady:8.2f} s "
              f"({t_ssteady/len(cands)*1e3:.1f} ms/candidate; "
              f"{n_seg} segments/candidate)", flush=True)

    if args.per_candidate:
        # old path: per-candidate log_likelihood() — each distinct
        # topology compiles its own static unrolled kernel
        sample = cands[:args.per_candidate_count]
        t0 = time.perf_counter()
        for pm in build_pms(sample):
            pm.log_likelihood().log_likelihood
        t_old = time.perf_counter() - t0
        per = t_old / len(sample)
        print(f"per-candidate : {per*1e3:8.1f} ms/candidate "
              f"(x{len(cands)} = {per*len(cands):.2f} s/round estimate, "
              f"one XLA compile per topology)", flush=True)
        if not args.skip_register:
            print(f"speedup per round (steady): "
                  f"{per*len(cands)/t_steady:.1f}x", flush=True)


if __name__ == "__main__":
    main()
