"""Post-rework backward measurements: pre-split mxu_3x backward +
serial (non-pipelined) backward DMA default.

Run: PYTHONPATH=/root/repo python benchmarks/r05_bwd2.py
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
OUT = os.path.join(os.path.dirname(__file__), "results", "r05_bwd2.txt")
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
    # --- S=20 training variants post pre-split -------------------------
    tp = random_tree(64, seed=3)
    ap = np.random.default_rng(7).integers(
        0, 20, size=(64, 131072)).astype(np.int32)
    lg = empirical_protein("lg")
    ref = None
    for variant in ("mxu", "mxu_3x"):
        pm = PhyloModel(tp, lg, ap, alpha=0.7,
                        config=PLFConfig(states=20, block_sites=4096,
                                         kernel_variant=variant))
        fenced_fwd(pm, f"S20 64x131k {variant}")
        _, v0, g = fenced_grad(pm, f"S20 64x131k {variant}")
        if ref is None:
            ref = (v0, g)
        else:
            dll = abs(v0 - ref[0]) / max(1.0, abs(ref[0]))
            gerr = float(np.max(np.abs(g - ref[1])
                                / np.maximum(1e-6, np.abs(ref[1]))))
            log(f"   vs mxu: rel ll drift {dll:.2e}, "
                f"max rel grad err {gerr:.2e}")
        del pm

    # --- DNA headline with serial backward -----------------------------
    t160 = random_tree(160, seed=3)
    a160 = np.random.default_rng(7).integers(
        0, 4, size=(160, 1048576)).astype(np.int32)
    for dtype in ("float32", "bfloat16"):
        pm = PhyloModel(t160, hky85(2.0), a160, alpha=0.7,
                        config=PLFConfig(block_sites=4096, dtype=dtype))
        fenced_fwd(pm, f"DNA 160x1.05M {dtype}")
        fenced_grad(pm, f"DNA 160x1.05M {dtype}")
        del pm

    # --- S=61 codon training variants ----------------------------------
    tc = random_tree(32, seed=3)
    ac = np.random.default_rng(7).integers(
        0, 61, size=(32, 65536)).astype(np.int32)
    from plf_tpu.models.substitution import codon_gy94
    gy = codon_gy94(omega=0.3, kappa=2.0)
    for variant in ("mxu", "mxu_3x"):
        pm = PhyloModel(tc, gy, ac, alpha=0.7,
                        config=PLFConfig(states=61, categories=4,
                                         block_sites=4096,
                                         kernel_variant=variant))
        fenced_fwd(pm, f"S61 32x65k {variant}")
        fenced_grad(pm, f"S61 32x65k {variant}")
        del pm

    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
