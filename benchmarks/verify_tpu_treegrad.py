"""One-process TPU verify: engine exactness + whole-tree gradient backend.

Batched into a single process because the axon tunnel holds one lease.
Run: python benchmarks/verify_tpu_treegrad.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from plf_tpu import PLFEngine, PLFConfig

print("devices:", jax.devices(), flush=True)

# ---- 1. engine exactness (the standing verify recipe) -------------------
rng = np.random.default_rng(0)
n = 100_000
x1 = rng.random((n, 16), np.float32)
x2 = rng.random((n, 16), np.float32)
left = rng.random((4, 4, 4), np.float32)
right = rng.random((4, 4, 4), np.float32)
ev = rng.random((4, 4), np.float32)
eng = PLFEngine(PLFConfig())
out = eng.plf(x1, x2, left, right, ev)
ok, nerr, msgs = eng.verify(out, x1, x2, left, right, ev)
assert ok, msgs
print("engine verify: ok (bit-exact)", flush=True)

# ---- 2. whole-tree gradient backend vs per-node pallas on hardware ------
from plf_tpu.models.phylo import PhyloModel
from plf_tpu.models.tree import random_tree
from plf_tpu.models.substitution import gtr
from plf_tpu.models.optimize import tree_loglik_fn

rng = np.random.default_rng(7)
n_taxa, n_sites = 24, 20000
tree = random_tree(n_taxa, seed=3)
aln = rng.integers(0, 4, size=(n_taxa, n_sites)).astype(np.int32)
model = gtr(rates=rng.random(6) + 0.5, pi=np.array([.1, .2, .3, .4]))
pm = PhyloModel(tree, model, aln, alpha=0.7)

f_tree, t0 = tree_loglik_fn(pm, backend="tree")
f_node, _ = tree_loglik_fn(pm, backend="pallas")
t0j = jnp.asarray(t0)

vg_tree = jax.jit(jax.value_and_grad(f_tree))
vg_node = jax.jit(jax.value_and_grad(f_node))

ll_t, g_t = vg_tree(t0j)
ll_n, g_n = vg_node(t0j)
ll_t, ll_n = float(ll_t), float(ll_n)
g_t, g_n = np.asarray(g_t), np.asarray(g_n)
print(f"tree backend   ll={ll_t:.6f}")
print(f"pernode backend ll={ll_n:.6f}")
rel = abs(ll_t - ll_n) / abs(ll_n)
grel = float(np.max(np.abs(g_t - g_n) / (np.abs(g_n) + 1e-3)))
print(f"ll rel diff {rel:.3e}  grad max rel diff {grel:.3e}", flush=True)
assert rel < 1e-6, (ll_t, ll_n)
assert grel < 1e-3, grel

# ---- 3. timing: value_and_grad per evaluation ---------------------------
def bench(fn, t, iters=20):
    v, g = fn(t)
    float(np.asarray(v))          # fence through the relay
    t_start = time.perf_counter()
    for _ in range(iters):
        v, g = fn(t)
    float(np.asarray(v))
    float(np.asarray(jnp.sum(g)))
    return (time.perf_counter() - t_start) / iters

dt_tree = bench(vg_tree, t0j)
dt_node = bench(vg_node, t0j)
print(f"value_and_grad {n_taxa} taxa x {n_sites} sites: "
      f"tree {dt_tree*1e3:.2f} ms  pernode {dt_node*1e3:.2f} ms  "
      f"speedup {dt_node/dt_tree:.2f}x", flush=True)

print("VERIFY_TPU_TREEGRAD: PASS", flush=True)
