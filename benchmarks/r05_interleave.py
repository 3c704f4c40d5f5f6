"""Interleaved steady-state protocol: order-bias-free config comparison.

Round-5 discovery (r05_bwd*.txt + inline A/B): the FIRST config measured
in a fresh process reads 25-50% slower than its steady state even after
a warm-up call (DNA 160x1.05M value_and_grad: 240-286 ms when measured
first, 186.5 ms steady-state — same compiled executable; re-measuring
the same config later in the process reproduces the fast number).  The
transient spans several executions (allocator/clock warm-up through the
tunnel lease), so single-shot per-config ordering contaminates A/B
comparisons in favour of whatever ran later — the r05_fenced mxu vs
mxu_3x "flip" between rounds was exactly this artifact (each run's
first-measured variant looked ~2x worse).

Protocol here: build + compile + warm EVERY config (8 calls), then R
interleaved rounds timing each config in turn; report the per-config
MINIMUM of round means (min over rounds discards residual transient;
means within a round absorb dispatch jitter).

Run: PYTHONPATH=/root/repo python benchmarks/r05_interleave.py
"""
import os
import sys
import time
import warnings

sys.path.insert(0, ".")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from plf_tpu.config import PLFConfig  # noqa: E402
from plf_tpu.models import PhyloModel, hky85, random_tree  # noqa: E402
from plf_tpu.models.optimize import tree_loglik_fn  # noqa: E402
from plf_tpu.models.substitution import (codon_gy94,  # noqa: E402
                                         empirical_protein)

print("devices:", jax.devices(), flush=True)
OUT = os.path.join(os.path.dirname(__file__), "results",
                   "r05_interleave.txt")
lines = []


def log(s):
    print(s, flush=True)
    lines.append(s)


class Cfg:
    def __init__(self, label, pm, kind, node_sites):
        self.label = label
        self.kind = kind
        self.node_sites = node_sites
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            fn, t0v = tree_loglik_fn(pm, backend="segmented")
        self.t0j = jnp.asarray(t0v)
        if kind == "grad":
            self.ev = jax.value_and_grad(fn)
        else:
            self.ev = fn

    def run_once(self):
        out = self.ev(self.t0j)
        return out

    def fence(self, out):
        if self.kind == "grad":
            v, g = out
            float(np.asarray(v)); float(np.asarray(jnp.sum(g)))
        else:
            float(np.asarray(out))


def main():
    cfgs = []

    t160 = random_tree(160, seed=3)
    a160 = np.random.default_rng(7).integers(
        0, 4, size=(160, 1048576)).astype(np.int32)
    ns160 = 317 * 1048576
    for dtype in ("float32", "bfloat16"):
        pm = PhyloModel(t160, hky85(2.0), a160, alpha=0.7,
                        config=PLFConfig(block_sites=4096, dtype=dtype))
        cfgs.append(Cfg(f"DNA160x1.05M {dtype} fwd", pm, "fwd", ns160))
        cfgs.append(Cfg(f"DNA160x1.05M {dtype} grad", pm, "grad", ns160))

    tp = random_tree(64, seed=3)
    ap = np.random.default_rng(7).integers(
        0, 20, size=(64, 131072)).astype(np.int32)
    lg = empirical_protein("lg")
    nsp = 125 * 131072
    for variant in ("mxu", "mxu_3x"):
        pm = PhyloModel(tp, lg, ap, alpha=0.7,
                        config=PLFConfig(states=20, block_sites=4096,
                                         kernel_variant=variant))
        cfgs.append(Cfg(f"S20 64x131k {variant} fwd", pm, "fwd", nsp))
        cfgs.append(Cfg(f"S20 64x131k {variant} grad", pm, "grad", nsp))

    tc = random_tree(32, seed=3)
    ac = np.random.default_rng(7).integers(
        0, 61, size=(32, 65536)).astype(np.int32)
    gy = codon_gy94(omega=0.3, kappa=2.0)
    nsc = 61 * 65536
    for variant in ("mxu", "mxu_3x"):
        pm = PhyloModel(tc, gy, ac, alpha=0.7,
                        config=PLFConfig(states=61, categories=4,
                                         block_sites=4096,
                                         kernel_variant=variant))
        cfgs.append(Cfg(f"S61 32x65k {variant} fwd", pm, "fwd", nsc))
        cfgs.append(Cfg(f"S61 32x65k {variant} grad", pm, "grad", nsc))

    # compile + warm everything before ANY timing
    for c in cfgs:
        print("warming", c.label, flush=True)
        for _ in range(8):
            out = c.run_once()
        c.fence(out)

    ROUNDS, REPS = 3, 4
    means = {c.label: [] for c in cfgs}
    for r in range(ROUNDS):
        for c in cfgs:
            out = c.run_once()       # shed any config-switch transient
            c.fence(out)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = c.run_once()
            c.fence(out)
            means[c.label].append((time.perf_counter() - t0) / REPS)
    for c in cfgs:
        ms = means[c.label]
        best = min(ms)
        log(f"{c.label}: {best*1e3:.1f} ms "
            f"({c.node_sites/best/1e9:.2f} Gns/s)  "
            f"rounds=[{', '.join(f'{m*1e3:.1f}' for m in ms)}]")

    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
