"""Round-5 backward-path probe: where does the segmented grad time go?

Three questions, one lease:
  1. DNA (rows=16): does the MXU backward (block matmuls at HIGHEST,
     ~1 ULP) beat the VPU backward's tile/concat stages?  The forward
     measured "comparable" in r02 -- but the backward runs ~9
     contractions per op where the VPU form pays 5 stages + 12
     cross-lane reductions, so the balance may differ.
  2. How much of the backward is the manual-DMA pipeline buying
     (PLF_SEG_PIPELINE=0 vs 1)?  The forward gained 1.71x; the
     backward's export staging is lag-1 unstaged (round-6 candidate).
  3. S=20 mxu_3x vs mxu backward anchors (r05_fenced: 161.8 / 110.9 ms)
     re-measured same-lease for the pre-split rework.

Run: PYTHONPATH=/root/repo python benchmarks/r05_bwd.py
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
from plf_tpu.models.substitution import empirical_protein  # noqa: E402

print("devices:", jax.devices(), flush=True)
OUT = os.path.join(os.path.dirname(__file__), "results", "r05_bwd.txt")
lines = []


def log(s):
    print(s, flush=True)
    lines.append(s)


def fenced_grad(pm, label, reps=4):
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fn, t0v = tree_loglik_fn(pm, backend="segmented")
        ev = jax.value_and_grad(fn)
        t0j = jnp.asarray(t0v)
        v, g = ev(t0j)
    v0 = float(np.asarray(v))
    t0 = time.perf_counter()
    for _ in range(reps):
        v, g = ev(t0j)
    float(np.asarray(v)); float(np.asarray(jnp.sum(g)))
    dt = (time.perf_counter() - t0) / reps
    log(f"grad {label}: {dt*1e3:.1f} ms "
        f"({len(pm.schedule)*pm.n_sites/dt/1e9:.2f} Gns/s)  ll={v0:.3f}")
    return dt, v0, np.asarray(g)


def fenced_fwd(pm, label, reps=8):
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fn, t0v = tree_loglik_fn(pm, backend="segmented")
        t0j = jnp.asarray(t0v)
        v = fn(t0j)
    float(np.asarray(v))
    t0 = time.perf_counter()
    for _ in range(reps):
        v = fn(t0j)
    float(np.asarray(v))
    dt = (time.perf_counter() - t0) / reps
    log(f"fwd  {label}: {dt*1e3:.1f} ms "
        f"({len(pm.schedule)*pm.n_sites/dt/1e9:.2f} Gns/s)")
    return dt


def main():
    t160 = random_tree(160, seed=3)
    a160 = np.random.default_rng(7).integers(
        0, 4, size=(160, 1048576)).astype(np.int32)

    # --- Q1: DNA backward across variants (fp32 storage) ---------------
    ref = None
    for variant in ("vpu", "mxu", "mxu_3x"):
        pm = PhyloModel(t160, hky85(2.0), a160, alpha=0.7,
                        config=PLFConfig(block_sites=4096,
                                         kernel_variant=variant))
        _, v0, g = fenced_grad(pm, f"DNA 160x1.05M {variant}")
        if ref is None:
            ref = (v0, g)
        else:
            dll = abs(v0 - ref[0]) / max(1.0, abs(ref[0]))
            gerr = float(np.max(np.abs(g - ref[1])
                                / np.maximum(1e-6, np.abs(ref[1]))))
            log(f"   vs vpu: rel ll drift {dll:.2e}, "
                f"max rel grad err {gerr:.2e}")
        del pm

    # --- Q2: pipeline contribution in the backward (vpu anchor) --------
    os.environ["PLF_SEG_PIPELINE"] = "0"
    pm = PhyloModel(t160, hky85(2.0), a160, alpha=0.7,
                    config=PLFConfig(block_sites=4096,
                                     kernel_variant="vpu"))
    fenced_fwd(pm, "DNA 160x1.05M vpu PIPELINE=0")
    fenced_grad(pm, "DNA 160x1.05M vpu PIPELINE=0")
    del pm
    os.environ["PLF_SEG_PIPELINE"] = "1"

    # --- Q3: S=20 backward anchors, same lease -------------------------
    tp = random_tree(64, seed=3)
    ap = np.random.default_rng(7).integers(
        0, 20, size=(64, 131072)).astype(np.int32)
    lg = empirical_protein("lg")
    for variant in ("mxu", "mxu_3x"):
        pm = PhyloModel(tp, lg, ap, alpha=0.7,
                        config=PLFConfig(states=20, block_sites=4096,
                                         kernel_variant=variant))
        fenced_fwd(pm, f"S20 64x131k {variant}")
        fenced_grad(pm, f"S20 64x131k {variant}")
        del pm

    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
