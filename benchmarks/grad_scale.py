"""Gradient scaling demo: value_and_grad at 1e8 sites via the tree VJP.

The per-node custom-VJP path saves x1/x2/x3 per node as residuals —
at 16 taxa x 1e8 sites that is 30 edges x 16 rows x 1e8 x 4 B x 3
arrays = 576 GB of HBM, impossible on any chip.  The checkpointed
whole-tree backward (ops/plf_tree_grad.py) keeps residuals at
O(E*S^2): the only site-sized HBM arrays are the tip codes and the
likelihood row.  This script proves a full branch-length gradient at
1e8 sites on ONE v5e (16 GB HBM) and records throughput.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/grad_scale.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from plf_tpu.config import PLFConfig
from plf_tpu.models.phylo import PhyloModel
from plf_tpu.models.tree import random_tree
from plf_tpu.models.substitution import hky85
from plf_tpu.models.optimize import tree_loglik_fn

print("devices:", jax.devices(), flush=True)

n_taxa = 16
n_sites = 100_000_000
block = 8192

# tips generated on device per leaf row (host->HBM through the tunnel
# would take ~an hour at 0.3 GB/s for 6.4 GB of codes)
tree = random_tree(n_taxa, seed=1)
tiny = np.zeros((n_taxa, 8), np.int32)
pm = PhyloModel(tree, hky85(2.0), tiny, alpha=0.5,
                config=PLFConfig(block_sites=block))
n_pad = -(-n_sites // block) * block


@jax.jit
def gen_codes(key):
    return jax.random.randint(key, (n_taxa, n_pad), 0, 4, dtype=jnp.int32)


codes = gen_codes(jax.random.PRNGKey(0))
codes.block_until_ready()
print(f"codes on device: {codes.shape} "
      f"({codes.size * 4 / 2**30:.2f} GiB)", flush=True)

# rebuild the PhyloModel plumbing for the big alignment without host
# data: patch the device codes + site counts into the model object
# (tree_loglik_fn keeps device codes on device and builds the all-ones
# weight vector on device — no O(sites) host traffic or HLO constants)
pm.n_sites = n_sites
pm.n_pad = n_pad
pm.n_sites_obs = n_sites
pm.wgt = np.ones(n_sites, np.int8)
pm._codes = codes

E = len(pm.schedule)

fn, t0 = tree_loglik_fn(pm, backend="tree")
t0j = jnp.asarray(t0)
# NO outer jax.jit: re-jitting the returned closure would capture the
# 6 GB codes array as a lowering constant (tree_loglik_fn's inner fn is
# already jitted with codes/weights as ARGUMENTS).
vg = jax.value_and_grad(fn)

t_start = time.perf_counter()
ll, g = vg(t0j)
ll_f = float(ll)
compile_and_first = time.perf_counter() - t_start
print(f"first call (compile+run): {compile_and_first:.1f}s "
      f"ll={ll_f:.1f}", flush=True)

times = []
for _ in range(3):
    t_start = time.perf_counter()
    ll, g = vg(t0j)
    float(np.asarray(ll)); float(np.asarray(jnp.sum(g)))
    times.append(time.perf_counter() - t_start)
best = min(times)
gns = E * n_sites / best / 1e9
print(f"value_and_grad {n_taxa} taxa x {n_sites:.0e} sites: "
      f"{best*1e3:.0f} ms = {gns:.2f} G node-sites/s "
      f"(grad over {len(t0)} branch lengths)", flush=True)
assert np.isfinite(ll_f) and np.all(np.isfinite(np.asarray(g)))
print("GRAD_SCALE: PASS", flush=True)
