"""Tree-grad backend profile: tree vs per-node, forward and VJP, by size.

Slope protocol (K_hi vs K_lo chained evaluations inside one jit) so the
tunnel's fixed dispatch overhead cancels.  One process = one TPU lease.
Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/treegrad_bench.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from plf_tpu.models.phylo import PhyloModel
from plf_tpu.models.tree import random_tree
from plf_tpu.models.substitution import gtr
from plf_tpu.models.optimize import tree_loglik_fn

print("devices:", jax.devices(), flush=True)


def slope(make_chain, t0, k_lo=2, k_hi=8):
    f_lo = jax.jit(lambda t: make_chain(t, k_lo))
    f_hi = jax.jit(lambda t: make_chain(t, k_hi))
    for f in (f_lo, f_hi):
        float(np.asarray(f(t0)))  # compile + warm
    def run(f):
        t_start = time.perf_counter()
        for _ in range(5):
            v = f(t0)
        float(np.asarray(v))
        return (time.perf_counter() - t_start) / 5
    return (run(f_hi) - run(f_lo)) / (k_hi - k_lo)


rng = np.random.default_rng(7)
n_taxa = 24
for n_sites in (20_000, 262_144, 1_048_576):
    tree = random_tree(n_taxa, seed=3)
    aln = rng.integers(0, 4, size=(n_taxa, n_sites)).astype(np.int32)
    model = gtr(rates=rng.random(6) + 0.5, pi=np.array([.1, .2, .3, .4]))
    pm = PhyloModel(tree, model, aln, alpha=0.7)

    for backend in ("tree", "pallas"):
        fn, t0 = tree_loglik_fn(pm, backend=backend)
        t0j = jnp.asarray(t0)

        def fwd_chain(t, k, fn=fn):
            acc = jnp.float32(0)
            for i in range(k):
                acc = acc + fn(t + acc * 1e-30)
            return acc

        def vjp_chain(t, k, fn=fn):
            acc = jnp.float32(0)
            for i in range(k):
                v, g = jax.value_and_grad(fn)(t + acc * 1e-30)
                acc = acc + v + jnp.sum(g) * 1e-30
            return acc

        dt_f = slope(fwd_chain, t0j)
        dt_vg = slope(vjp_chain, t0j)
        e = len(pm.schedule)
        print(f"n={n_sites:>8} {backend:>6}: fwd {dt_f*1e3:8.3f} ms "
              f"({e*n_sites/dt_f/1e9:6.2f} G node-sites/s)   "
              f"vjp {dt_vg*1e3:8.3f} ms "
              f"({e*n_sites/dt_vg/1e9:6.2f} G node-sites/s)", flush=True)

print("DONE", flush=True)
