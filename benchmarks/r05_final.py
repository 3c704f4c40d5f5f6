"""Final round-5 device-true numbers: tighter slope protocol.

The earlier r05_slope S=20 runs spread 6.3-21.8 ms across windows;
this run uses a longer chain (K=1 vs 7) and more repetitions, and adds
the S=61 codon segmented forward (the ladder's hardest shape).

Run: PYTHONPATH=/root/repo python benchmarks/r05_final.py
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
from plf_tpu.models.substitution import (codon_gy94,  # noqa: E402
                                         empirical_protein)

print("devices:", jax.devices(), flush=True)
OUT = os.path.join(os.path.dirname(__file__), "results", "r05_final.txt")
lines = []


def log(s):
    print(s, flush=True)
    lines.append(s)


def slope_fwd(pm, label, k_pair=(1, 7), reps=5):
    from plf_tpu.ops import plf_tree_seg as seg

    cfg = pm.config
    S, C = cfg.states, cfg.categories
    variant = cfg.resolved_kernel_variant
    plan, codes3, lcs3, rcs3, ttab = pm._segmented_inputs()
    n = pm.n_sites

    def chain(K):
        @jax.jit
        def f(codes3, lcs3, rcs3, ec, ttab, rr):
            def body(c, _):
                lik, sc = seg.plf_tree_segmented(
                    plan, codes3, lcs3, rcs3, ec, ttab,
                    rr + jnp.float32(1e-40) * c, n, states=S,
                    categories=C, variant=variant, dtype=cfg.dtype)
                ll = (jnp.sum(jnp.log(jnp.maximum(lik, 1.2e-38)))
                      + jnp.sum(sc).astype(jnp.float32)
                      * jnp.float32(-22.18))
                return ll, ()
            ll, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return ll
        return f

    def timed(K):
        f = chain(K)
        float(np.asarray(f(codes3, lcs3, rcs3, pm._ec, ttab,
                           pm._root_rows)))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(codes3, lcs3, rcs3, pm._ec, ttab,
                               pm._root_rows)))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(k_pair[0]), timed(k_pair[1])
    per = max((t_hi - t_lo) / (k_pair[1] - k_pair[0]), 1e-9)
    e_, n_ = len(pm.schedule), pm.n_sites
    rows = S * C
    tf = e_ * n_ / per * 3 * 2 * rows * rows / 1e12
    log(f"fwd {label}: {per*1e3:.1f} ms/eval device "
        f"({e_*n_/per/1e9:.2f} Gns/s, {tf:.1f} dense TFLOP/s; "
        f"block={plan.block_sites} n_seg={len(plan.segments)})")
    return per


def main():
    tp = random_tree(64, seed=3)
    ap = np.random.default_rng(7).integers(
        0, 20, size=(64, 131072)).astype(np.int32)
    lg = empirical_protein("lg")
    for variant in ("mxu_3x", "mxu"):
        pm = PhyloModel(tp, lg, ap, alpha=0.7,
                        config=PLFConfig(states=20, block_sites=4096,
                                         kernel_variant=variant))
        slope_fwd(pm, f"S20 64x131k {variant}")
        del pm

    # codon: S=61, 16 taxa x 65536 codon sites, segmented mxu_3x
    tc = random_tree(16, seed=5)
    ac = np.random.default_rng(9).integers(
        0, 61, size=(16, 65536)).astype(np.int32)
    pm = PhyloModel(tc, codon_gy94(2.5, 0.3), ac, alpha=0.7,
                    config=PLFConfig(states=61, block_sites=1024,
                                     kernel_variant="auto"))
    slope_fwd(pm, "S61 16x65k mxu_3x", k_pair=(1, 4))
    del pm

    # DNA control (same protocol)
    t160 = random_tree(160, seed=3)
    a160 = np.random.default_rng(7).integers(
        0, 4, size=(160, 1048576)).astype(np.int32)
    pm = PhyloModel(t160, hky85(2.0), a160, alpha=0.7,
                    config=PLFConfig(block_sites=4096))
    slope_fwd(pm, "DNA 160x1.05M vpu", k_pair=(1, 5))

    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
