"""Single-process TPU CI: exactness + headline bench + overlap, one lease.

The axon tunnel grants ONE client the TPU lease and a new process can
wait minutes for the previous lease to clear, so per-round hardware
validation must run as ONE process.  This script chains the round's
hardware gates in-process and prints a PASS/FAIL summary:

  1. hw_verify          — bit-exact kernel suite (engine, fuzz, fixtures,
                          tree kernel, codon mxu)
  2. tree-grad check    — whole-tree VJP vs per-node VJP on hardware
  3. bench.py headline  — the JSON line (plf_dna_sites_per_sec)
  4. executor overlap   — hm(k+1) overlaps msm(k) proof

Run:  python benchmarks/tpu_ci.py [--skip overlap] [--skip bench]
Exit code 0 only if every section passed.  Mirrors the reference's
run-per-build validation (host_mem.cpp golden verify + run_all.sh),
collapsed into a lease-friendly shape.
"""

import argparse
import contextlib
import io
import sys
import time
import traceback

sys.path.insert(0, ".")

SECTIONS = []


def section(name, fn):
    t0 = time.perf_counter()
    print(f"\n=== {name} ===", flush=True)
    try:
        fn()
        ok = True
    except SystemExit as e:
        ok = (e.code in (0, None))
    except Exception:
        traceback.print_exc()
        ok = False
    dt = time.perf_counter() - t0
    SECTIONS.append((name, ok, dt))
    print(f"=== {name}: {'PASS' if ok else 'FAIL'} ({dt:.1f}s) ===",
          flush=True)


def run_hw_verify():
    from benchmarks import hw_verify
    hw_verify.main()


def run_treegrad():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from plf_tpu.models.phylo import PhyloModel
    from plf_tpu.models.tree import random_tree
    from plf_tpu.models.substitution import gtr
    from plf_tpu.models.optimize import tree_loglik_fn

    rng = np.random.default_rng(7)
    n_taxa, n_sites = 16, 20000
    tree = random_tree(n_taxa, seed=3)
    aln = rng.integers(0, 4, size=(n_taxa, n_sites)).astype(np.int32)
    model = gtr(rates=rng.random(6) + 0.5, pi=np.array([.1, .2, .3, .4]))
    pm = PhyloModel(tree, model, aln, alpha=0.7)
    f_tree, t0 = tree_loglik_fn(pm, backend="tree")
    f_node, _ = tree_loglik_fn(pm, backend="pallas")
    t0j = jnp.asarray(t0)
    ll_t, g_t = jax.value_and_grad(f_tree)(t0j)
    ll_n, g_n = jax.value_and_grad(f_node)(t0j)
    rel = abs(float(ll_t) - float(ll_n)) / abs(float(ll_n))
    grel = float(np.max(np.abs(np.asarray(g_t) - np.asarray(g_n))
                        / (np.abs(np.asarray(g_n)) + 1e-3)))
    print(f"ll rel {rel:.2e}  grad max rel {grel:.2e}", flush=True)
    assert rel < 1e-6 and grel < 1e-3


def run_segmented():
    """Segmented tree engine on real Mosaic: forward parity at 96 taxa
    (multi-segment), IUPAC widened tip tables, and segmented-vs-tree
    gradient agreement."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from plf_tpu.config import PLFConfig
    from plf_tpu.models import PhyloModel, hky85, random_tree
    from plf_tpu.models.optimize import tree_loglik_fn

    rng = np.random.default_rng(11)
    n_taxa, n_sites = 96, 65536
    tree = random_tree(n_taxa, seed=4)
    aln = rng.integers(0, 4, size=(n_taxa, n_sites)).astype(np.int32)
    aln[3, ::5] = 4     # R — IUPAC multi-hot through the widened ttab
    aln[7, 1::9] = 10   # B
    pm = PhyloModel(tree, hky85(2.0), aln, alpha=0.7,
                    config=PLFConfig(block_sites=4096))
    res_s = pm.log_likelihood(method="segmented")
    res_p = pm.log_likelihood(method="per-node")
    assert res_s.scaler_total == res_p.scaler_total, (
        res_s.scaler_total, res_p.scaler_total)
    np.testing.assert_allclose(res_s.site_log_likelihood,
                               res_p.site_log_likelihood, rtol=1e-6)
    plan = pm._segmented_inputs()[0]
    print(f"segmented fwd ok: {len(plan.segments)} segments, "
          f"ll={res_s.log_likelihood:.3f}", flush=True)

    f_seg, t0 = tree_loglik_fn(pm, backend="segmented")
    t0j = jnp.asarray(t0)
    ll_s, g_s = jax.value_and_grad(f_seg)(t0j)
    f_xla, _ = tree_loglik_fn(pm, backend="xla")
    gx = jax.grad(f_xla)(t0j)
    grel = float(np.max(np.abs(np.asarray(g_s) - np.asarray(gx))
                        / (np.abs(np.asarray(gx)) + 1e-3)))
    rel = abs(float(ll_s) - res_p.log_likelihood) / abs(
        res_p.log_likelihood)
    print(f"segmented grad: ll rel {rel:.2e} grad max rel {grel:.2e}",
          flush=True)
    assert rel < 1e-5 and grel < 1e-3

    # int8 tip-code storage must be BIT-IDENTICAL to int32 on real
    # Mosaic (the codes only feed integer == compares in _expand_tip —
    # widened in-register, plf_tree_pallas.py — so dtype changes the
    # HBM stream, not the arithmetic).  Segmented path on the big tree;
    # fused static kernel on a small one (96 taxa exceed its VMEM arena).
    pm8 = PhyloModel(tree, hky85(2.0), aln, alpha=0.7,
                     config=PLFConfig(block_sites=4096, tip_dtype="int8"))
    r8 = pm8.log_likelihood(method="segmented")
    assert r8.scaler_total == res_s.scaler_total
    np.testing.assert_array_equal(np.asarray(r8.site_log_likelihood),
                                  np.asarray(res_s.site_log_likelihood))
    tree_s = random_tree(24, seed=5)
    aln_s = aln[:24]
    rf = {}
    for td in ("int32", "int8"):
        pm_s = PhyloModel(tree_s, hky85(2.0), aln_s, alpha=0.7,
                          config=PLFConfig(block_sites=4096, tip_dtype=td))
        rf[td] = pm_s.log_likelihood(method="fused")
    assert rf["int8"].scaler_total == rf["int32"].scaler_total
    np.testing.assert_array_equal(
        np.asarray(rf["int8"].site_log_likelihood),
        np.asarray(rf["int32"].site_log_likelihood))
    print("int8 tip codes: bit-identical (fused + segmented)", flush=True)


def run_mxu_ladder():
    """Round-4 MXU precision ladder through training: mxu/mxu_3x
    forward+backward tree and segmented kernels vs the XLA oracle on
    real Mosaic (benchmarks/variant_hw_check.py)."""
    from benchmarks import variant_hw_check
    variant_hw_check.main(fast=True)


def run_batch():
    """plf_batch (multi-instance mode) + batched segmented scoring on
    hardware: golden-exact instances; neighbourhood scoring equality."""
    import numpy as np
    from plf_tpu.config import PLFConfig
    from plf_tpu.engine import PLFEngine
    from plf_tpu.reference import plf_reference

    rng = np.random.default_rng(8)
    ni, nb = 4, 8192
    bx1 = rng.random((ni, nb, 16), dtype=np.float32)
    bx2 = rng.random((ni, nb, 16), dtype=np.float32)
    bl = rng.random((ni, 4, 4, 4), dtype=np.float32)
    br = rng.random((ni, 4, 4, 4), dtype=np.float32)
    bev = rng.random((ni, 4, 4), dtype=np.float32)
    out = PLFEngine(PLFConfig(block_sites=4096)).plf_batch(
        bx1, bx2, bl, br, bev)
    for i in range(ni):
        x3r, svr, _ = plf_reference(bx1[i], bx2[i], bl[i], br[i], bev[i],
                                    np.ones(nb, np.int32))
        np.testing.assert_array_equal(np.asarray(out.x3[i]), x3r)
        np.testing.assert_array_equal(np.asarray(out.scaler_vector[i]),
                                      svr)
    print(f"plf_batch: {ni} instances bit-exact vs golden", flush=True)

    # batched segmented neighbourhood scoring == per-candidate
    from plf_tpu.models import PhyloModel, hky85, random_tree
    from plf_tpu.models.phylo import batch_log_likelihood_segmented
    from plf_tpu.models.search import nni_neighbors

    n_leaves, n = 24, 16384
    tips = rng.integers(0, 4, size=(n_leaves, n))
    base = random_tree(n_leaves, seed=9)
    cands = [base] + nni_neighbors(base)[:3]
    pms = [PhyloModel(t, hky85(2.0), tips, alpha=0.5,
                      config=PLFConfig(block_sites=4096))
           for t in cands]
    lls = batch_log_likelihood_segmented(pms)
    for b, pm in enumerate(pms):
        ref = pm.log_likelihood(method="segmented").log_likelihood
        assert abs(lls[b] - ref) < 1e-6 * abs(ref), (b, lls[b], ref)
    assert len({round(float(v), 4) for v in lls}) > 1
    print(f"batched segmented scoring: {len(pms)} candidates match "
          f"per-candidate lls", flush=True)


def run_codon():
    """Round-5 codon workflow on hardware: GY94 omega/kappa profile fit
    at the mxu_3x ladder + bf16 boundary-storage segmented check."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from plf_tpu.config import PLFConfig
    from plf_tpu.models import PhyloModel, hky85, random_tree
    from plf_tpu.models.optimize import fit_codon, tree_loglik_fn
    from plf_tpu.models.simulate import simulate_alignment
    from plf_tpu.models.substitution import codon_gy94

    tree = random_tree(6, seed=5, mean_branch=0.2)
    tips = simulate_alignment(tree, codon_gy94(3.0, 0.25), 2048, seed=3)
    cfg = PLFConfig(states=61, block_sites=1024, kernel_variant="auto")
    model, info = fit_codon(tree, tips, config=cfg, rounds=1, iters=6,
                            length_steps=12)
    assert np.isfinite(info["ll"])
    assert 0.02 < info["omega"] < 2.0, info["omega"]
    print(f"codon GY94 fit on HW: kappa={info['kappa']:.2f} "
          f"omega={info['omega']:.3f} ll={info['ll']:.2f} "
          f"(simulated omega=0.25)", flush=True)

    # bf16 boundary storage: segmented fwd close to fp32, grads finite
    t2 = random_tree(48, seed=2)
    a2 = np.random.default_rng(3).integers(0, 4, size=(48, 65536))
    pm32 = PhyloModel(t2, hky85(2.0), a2, alpha=0.6,
                      config=PLFConfig(block_sites=4096))
    pm16 = PhyloModel(t2, hky85(2.0), a2, alpha=0.6,
                      config=PLFConfig(block_sites=4096,
                                       dtype="bfloat16"))
    ll32 = pm32.log_likelihood(method="segmented").log_likelihood
    ll16 = pm16.log_likelihood(method="segmented").log_likelihood
    rel = abs(ll16 - ll32) / abs(ll32)
    assert rel < 5e-3 and ll16 != ll32, (ll16, ll32)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fn16, t0 = tree_loglik_fn(pm16, backend="segmented")
    v, g = jax.value_and_grad(fn16)(jnp.asarray(t0))
    assert np.isfinite(float(v)) and np.all(np.isfinite(np.asarray(g)))
    print(f"bf16 boundary storage on HW: ll drift {rel:.2e}, "
          f"grads finite", flush=True)


def run_bench():
    import bench
    saved = sys.argv
    sys.argv = ["bench.py"]
    try:
        bench.main()
    finally:
        sys.argv = saved


def run_overlap():
    from benchmarks import overlap
    overlap.main()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", action="append", default=[],
                    choices=["hw_verify", "treegrad", "segmented",
                             "mxu_ladder", "batch", "codon", "bench",
                             "overlap"])
    args = ap.parse_args()

    import jax
    print("devices:", jax.devices(), flush=True)

    all_sections = [("hw_verify", run_hw_verify),
                    ("treegrad", run_treegrad),
                    ("segmented", run_segmented),
                    ("mxu_ladder", run_mxu_ladder),
                    ("batch", run_batch),
                    ("codon", run_codon),
                    ("bench", run_bench),
                    ("overlap", run_overlap)]
    for name, fn in all_sections:
        if name in args.skip:
            print(f"=== {name}: SKIPPED ===", flush=True)
            continue
        section(name, fn)

    print("\n===== TPU CI SUMMARY =====", flush=True)
    failed = False
    for name, ok, dt in SECTIONS:
        print(f"  {name:12s} {'PASS' if ok else 'FAIL'} ({dt:.1f}s)",
              flush=True)
        failed |= not ok
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
