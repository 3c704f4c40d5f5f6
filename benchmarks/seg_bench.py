"""Segmented tree engine on hardware: big-taxa forward + gradients.

Round-2 state (VERDICT): at >=160 taxa neither gradient backend fit
(per-node VJP residuals > HBM budget at big sites; single-segment
arena > VMEM at any block), and the forward fell back to one dispatch
per node.  The segmented engine (ops/plf_tree_seg.py) closes both:

  1. 160-taxa x 1M sites: value_and_grad via backend='segmented'
     (slope protocol) — the case that previously raised.
  2. 512-taxa x 262144 sites: forward log-likelihood, segmented vs
     per-node traversal wall time (dispatch-count win).
  3. 256-taxa x 4M sites: segmented gradient (the VERDICT acceptance
     shape class; 1e7 needs ~10 GB of int32 codes alone — attempted
     last, recorded as OOM if it does not fit).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/seg_bench.py
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
from plf_tpu.models.optimize import tree_loglik_fn  # noqa: E402

print("devices:", jax.devices(), flush=True)
OUT = os.path.join(os.path.dirname(__file__), "results", "r04_seg.txt")
lines = []


def log(s):
    print(s, flush=True)
    lines.append(s)


def slope(make_chain, t0, k_lo=1, k_hi=4, reps=3):
    f_lo = jax.jit(lambda t: make_chain(t, k_lo))
    f_hi = jax.jit(lambda t: make_chain(t, k_hi))
    for f in (f_lo, f_hi):
        float(np.asarray(f(t0)))
    def run(f):
        t_start = time.perf_counter()
        for _ in range(reps):
            v = f(t0)
        float(np.asarray(v))
        return (time.perf_counter() - t_start) / reps
    return (run(f_hi) - run(f_lo)) / (k_hi - k_lo)


def grad_case(n_taxa, n_sites, block=4096, reps=4, tip_dtype="int32"):
    tree = random_tree(n_taxa, seed=3)
    aln = np.random.default_rng(7).integers(
        0, 4, size=(n_taxa, n_sites)).astype(np.int32)
    pm = PhyloModel(tree, hky85(2.0), aln, alpha=0.7,
                    config=PLFConfig(block_sites=block,
                                     tip_dtype=tip_dtype))
    fn, t0 = tree_loglik_fn(pm, backend="segmented")
    t0j = jnp.asarray(t0)

    # Single value_and_grad, timed directly.  NO outer jit: the inner
    # likelihood is already jitted with the (n_leaves, n_pad) tip codes
    # as an ARGUMENT; an outer jit would close over them and embed
    # 100s of MB as an HLO constant, which hangs the remote compiler
    # (the codes-as-argument rule, optimize.py:497-502).  A K-unrolled
    # chained-slope protocol has the same problem plus K-fold tracing;
    # at this size one eval is ~100s of ms, so the ~2 ms/dispatch
    # tunnel overhead is a few % and slope cancellation isn't worth it.
    # sanity reference FIRST (its boundary buffers free before the
    # timed gradient evaluations — at the largest shape the two
    # together sit at the HBM capacity edge)
    ref = pm.log_likelihood(method="segmented").log_likelihood
    ev = jax.value_and_grad(fn)
    v, g = ev(t0j)
    float(np.asarray(v))                      # compile + warm
    t_start = time.perf_counter()
    for _ in range(reps):
        v, g = ev(t0j)
        acc = float(np.asarray(v)) + float(np.asarray(jnp.sum(g)))
    dt = (time.perf_counter() - t_start) / reps
    e = len(pm.schedule)
    nsps = e * n_sites / dt
    log(f"segmented grad {n_taxa} taxa x {n_sites} sites: "
        f"{dt*1e3:.1f} ms/eval, {nsps/1e9:.2f} G node-sites/s "
        f"(E={e}; incl. per-dispatch tunnel overhead)")
    # sanity: gradient finite and ll matches forward evaluation
    assert np.isfinite(float(v)) and np.all(np.isfinite(np.asarray(g)))
    assert abs(float(v) - ref) < 1e-5 * abs(ref) + 1e-6, (float(v), ref)
    return dt


def forward_case(n_taxa, n_sites, block=4096):
    tree = random_tree(n_taxa, seed=5)
    aln = np.random.default_rng(9).integers(
        0, 4, size=(n_taxa, n_sites)).astype(np.int32)
    pm = PhyloModel(tree, hky85(2.0), aln, alpha=0.7,
                    config=PLFConfig(block_sites=block))

    def timeit(method, reps=5):
        pm.log_likelihood(method=method)          # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            res = pm.log_likelihood(method=method)
        return (time.perf_counter() - t0) / reps, res

    dt_seg, res_s = timeit("segmented")
    dt_per, res_p = timeit("per-node")
    assert res_s.scaler_total == res_p.scaler_total
    assert abs(res_s.log_likelihood - res_p.log_likelihood) < (
        1e-6 * abs(res_p.log_likelihood))
    from plf_tpu.models.phylo import PhyloModel as _PM  # noqa
    plan = pm._segmented_inputs()[0]
    log(f"forward {n_taxa} taxa x {n_sites}: segmented "
        f"{dt_seg*1e3:.0f} ms ({len(plan.segments)} dispatches, block "
        f"{plan.block_sites}) vs per-node {dt_per*1e3:.0f} ms "
        f"({len(pm.schedule)} dispatches) -> {dt_per/dt_seg:.1f}x")


grad_case(160, 1 << 20)
forward_case(512, 1 << 18)
try:
    # int8 tip codes (bit-identical, hardware-validated in tpu_ci):
    # 256 taxa x 4M sites carries 1 GB of codes instead of 4 GB.
    grad_case(256, 1 << 22, tip_dtype="int8")
except Exception as exc:
    log(f"256x4M grad: FAILED {type(exc).__name__}: {str(exc)[:160]}")

os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {OUT}")
