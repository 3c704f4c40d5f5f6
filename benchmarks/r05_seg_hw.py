"""Round-5 segmented-engine hardware check: DMA-pipelined kernels.

Correctness first (segmented vs fused dynamic, segmented VJP vs XLA
oracle), then the two verdict shapes:

  * DNA 160 taxa x 1.05M sites  (r04: fwd 111 ms, grad 238 ms)
  * S=20 64 taxa x 131k, mxu_3x (r04: fwd 52.5 ms, grad 99.5 ms;
    round-5 bar: fwd <= ~26 ms)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r05_seg_hw.py
"""
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from plf_tpu.config import PLFConfig  # noqa: E402
from plf_tpu.models import PhyloModel, hky85, random_tree  # noqa: E402
from plf_tpu.models.substitution import empirical_protein  # noqa: E402
from plf_tpu.models.optimize import tree_loglik_fn  # noqa: E402

print("devices:", jax.devices(), flush=True)
OUT = os.path.join(os.path.dirname(__file__), "results", "r05_seg_hw.txt")
lines = []


def log(s):
    print(s, flush=True)
    lines.append(s)


def plan_info(pm):
    plan = pm._segmented_inputs()[0]
    return (f"block={plan.block_sites} n_seg={len(plan.segments)} "
            f"T/B/O={plan.seg_tips}/{plan.seg_bnd}/{plan.seg_ops}")


def correctness():
    # segmented vs fused dynamic, DNA vpu (bit-exact contract)
    tree = random_tree(48, seed=11)
    aln = np.random.default_rng(1).integers(0, 4, size=(48, 8192))
    cfg = PLFConfig(block_sites=1024)
    pm = PhyloModel(tree, hky85(2.0), aln, alpha=0.6, config=cfg)
    r_seg = pm.log_likelihood(method="segmented")
    r_fus = pm.log_likelihood(method="fused")
    dll = abs(r_seg.log_likelihood - r_fus.log_likelihood)
    assert r_seg.scaler_total == r_fus.scaler_total
    same = np.array_equal(r_seg.site_log_likelihood,
                          r_fus.site_log_likelihood)
    log(f"[{'PASS' if same and dll == 0 else 'FAIL'}] segmented vs "
        f"fused: dll={dll:.2e} site-bitexact={same} ({plan_info(pm)})")
    assert same and dll == 0.0

    # segmented VJP vs XLA oracle
    tree = random_tree(24, seed=3)
    aln = np.random.default_rng(2).integers(0, 4, size=(24, 4096))
    pm = PhyloModel(tree, hky85(2.0), aln, alpha=0.6,
                    config=PLFConfig(block_sites=1024))
    fn_s, t0 = tree_loglik_fn(pm, backend="segmented")
    fn_x, _ = tree_loglik_fn(pm, backend="xla")
    t0j = jnp.asarray(t0)
    vs, gs = jax.value_and_grad(fn_s)(t0j)
    vx, gx = jax.value_and_grad(fn_x)(t0j)
    rel = float(jnp.max(jnp.abs(gs - gx) / (jnp.abs(gx) + 1e-3)))
    dv = abs(float(vs) - float(vx)) / abs(float(vx))
    ok = rel < 1e-4 and dv < 1e-6
    log(f"[{'PASS' if ok else 'FAIL'}] segmented VJP vs XLA oracle: "
        f"ll rel {dv:.1e}, grad max rel {rel:.1e}")
    assert ok

    # protein mxu_3x segmented vs fused (ladder accuracy class)
    tree = random_tree(16, seed=5)
    aln = np.random.default_rng(3).integers(0, 20, size=(16, 2048))
    m = empirical_protein("lg")
    cp = PLFConfig(states=20, block_sites=1024, kernel_variant="mxu_3x")
    pm = PhyloModel(tree, m, aln, alpha=0.8, config=cp)
    r_seg = pm.log_likelihood(method="segmented")
    pmv = PhyloModel(tree, m, aln, alpha=0.8,
                     config=PLFConfig(states=20, block_sites=1024))
    r_vpu = pmv.log_likelihood(method="segmented")
    drel = abs(r_seg.log_likelihood - r_vpu.log_likelihood) / abs(
        r_vpu.log_likelihood)
    ok = drel < 1e-4
    log(f"[{'PASS' if ok else 'FAIL'}] protein mxu_3x segmented vs vpu: "
        f"ll rel drift {drel:.1e}")
    assert ok


def fwd_case(pm, label, reps=6):
    pm.log_likelihood(method="segmented")      # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        res = pm.log_likelihood(method="segmented")
    dt = (time.perf_counter() - t0) / reps
    e = len(pm.schedule)
    n = pm.n_sites
    log(f"fwd  {label}: {dt*1e3:.1f} ms/eval "
        f"({e * n / dt / 1e9:.2f} G node-sites/s; {plan_info(pm)})")
    return dt


def grad_case(pm, label, reps=4):
    fn, t0 = tree_loglik_fn(pm, backend="segmented")
    t0j = jnp.asarray(t0)
    ev = jax.value_and_grad(fn)
    v, g = ev(t0j)
    float(np.asarray(v))
    t_start = time.perf_counter()
    for _ in range(reps):
        v, g = ev(t0j)
        float(np.asarray(v)); float(np.asarray(jnp.sum(g)))
    dt = (time.perf_counter() - t_start) / reps
    e = len(pm.schedule)
    log(f"grad {label}: {dt*1e3:.1f} ms/eval "
        f"({e * pm.n_sites / dt / 1e9:.2f} G node-sites/s)")
    assert np.isfinite(float(v)) and np.all(np.isfinite(np.asarray(g)))
    return dt


def main():
    correctness()

    # DNA 160 x 1.05M (vpu)
    tree = random_tree(160, seed=3)
    aln = np.random.default_rng(7).integers(
        0, 4, size=(160, 1048576)).astype(np.int32)
    pm = PhyloModel(tree, hky85(2.0), aln, alpha=0.7,
                    config=PLFConfig(block_sites=4096))
    fwd_case(pm, "DNA 160x1.05M vpu")
    grad_case(pm, "DNA 160x1.05M vpu")
    del pm

    # protein 64 x 131k (mxu_3x / mxu / vpu forward comparison)
    tree = random_tree(64, seed=9)
    aln = np.random.default_rng(11).integers(
        0, 20, size=(64, 131072)).astype(np.int32)
    m = empirical_protein("lg")
    for variant in ("mxu_3x", "mxu", "vpu"):
        cfg = PLFConfig(states=20, block_sites=4096,
                        kernel_variant=variant)
        pm = PhyloModel(tree, m, aln, alpha=0.8, config=cfg)
        fwd_case(pm, f"S20 64x131k {variant}")
        if variant != "vpu":
            grad_case(pm, f"S20 64x131k {variant}")
        del pm

    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
