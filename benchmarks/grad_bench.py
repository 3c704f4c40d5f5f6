"""Gradient-path benchmark: XLA elementwise vs Pallas custom-VJP.

Times jax.value_and_grad of the whole-tree log-likelihood over branch
lengths for both tree_loglik_fn backends (models/optimize.py).
Measured v5e (16 leaves x 1M sites): xla 79 ms -> pallas 59 ms.

Run on TPU:  python benchmarks/grad_bench.py
"""

import sys, time, functools
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from plf_tpu.config import PLFConfig
from plf_tpu.models import PhyloModel, hky85, random_tree, tree_loglik_fn

print("backend", jax.default_backend(), flush=True)
n_leaves, n_sites = 16, 1 << 20
tree = random_tree(n_leaves, seed=1)
rng = np.random.default_rng(0)
tips = rng.integers(0, 4, size=(n_leaves, n_sites))
pm = PhyloModel(tree, hky85(2.0), tips, alpha=0.5,
                config=PLFConfig(block_sites=16384))
for backend in ("xla", "pallas"):
    fn, t0 = tree_loglik_fn(pm, backend=backend)
    t = jnp.asarray(t0)
    vg = jax.jit(jax.value_and_grad(fn))
    v, g = vg(t); float(v); np.asarray(g)  # compile
    best = None
    for _ in range(5):
        tt0 = time.perf_counter()
        v, g = vg(t)
        s = float(v) + float(jnp.sum(g))
        dt = time.perf_counter() - tt0
        best = dt if best is None else min(best, dt)
    E = len(pm.schedule)
    print(f"{backend:7s}: value_and_grad {best*1e3:8.2f} ms  "
          f"({n_sites*E/best/1e9:.3f} Gnode-sites/s fwd-equiv, ll={float(v):.2f})",
          flush=True)
