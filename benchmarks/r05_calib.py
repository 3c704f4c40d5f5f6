"""Lease-calibrated segmented-engine measurement.

Runs a known-speed probe (single-node fused kernel, headline ~3.1
Gsites/s on a healthy lease) plus the fused dynamic kernel and the
segmented engine on the same shapes — the probe normalises out lease
drift so old-vs-new code comparisons are meaningful across processes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r05_calib.py
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

print("devices:", jax.devices(), flush=True)


def probe_single_node():
    """Single-node fused kernel at 4M sites, slope protocol-lite."""
    from plf_tpu.ops.plf_pallas import plf_pallas_lane_major
    from plf_tpu.ops import layout as L
    n = 1 << 22
    rng = np.random.default_rng(0)

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        return (jax.random.uniform(k1, (16, n), jnp.float32, .01, 1.),
                jax.random.uniform(k2, (16, n), jnp.float32, .01, 1.))

    x1, x2 = gen(jax.random.key(0))
    lc = jnp.asarray(L.branch_to_lane_constants(
        rng.random((4, 4, 4), dtype=np.float32), 4, 4))
    rc = jnp.asarray(L.branch_to_lane_constants(
        rng.random((4, 4, 4), dtype=np.float32), 4, 4))
    ec = jnp.asarray(L.ev_to_lane_constants(
        rng.random((4, 4), dtype=np.float32), 4, 4))

    def call():
        y, sc = plf_pallas_lane_major(x1, x2, lc, rc, ec, jnp.int32(n),
                                      states=4, categories=4,
                                      block_sites=16384)
        return float(np.asarray(jnp.sum(sc)))

    call()
    t0 = time.perf_counter()
    for _ in range(8):
        call()
    dt = (time.perf_counter() - t0) / 8
    print(f"probe single-node 4M: {dt*1e3:.2f} ms = "
          f"{n/dt/1e9:.2f} Gsites/s", flush=True)
    return n / dt


def tree_case(pm, method, label, reps=6):
    pm.log_likelihood(method=method)
    t0 = time.perf_counter()
    for _ in range(reps):
        pm.log_likelihood(method=method)
    dt = (time.perf_counter() - t0) / reps
    e, n = len(pm.schedule), pm.n_sites
    print(f"{label} [{method}]: {dt*1e3:.1f} ms "
          f"({e*n/dt/1e9:.2f} Gns/s)", flush=True)
    return dt


def main():
    probe_single_node()
    t64 = random_tree(64, seed=3)
    a64 = np.random.default_rng(7).integers(
        0, 4, size=(64, 262144)).astype(np.int32)
    pm = PhyloModel(t64, hky85(2.0), a64, alpha=0.7,
                    config=PLFConfig(block_sites=4096))
    tree_case(pm, "fused", "DNA 64x262k")
    tree_case(pm, "segmented", "DNA 64x262k")
    del pm
    t160 = random_tree(160, seed=3)
    a160 = np.random.default_rng(7).integers(
        0, 4, size=(160, 1048576)).astype(np.int32)
    pm = PhyloModel(t160, hky85(2.0), a160, alpha=0.7,
                    config=PLFConfig(block_sites=4096))
    tree_case(pm, "fused", "DNA 160x1.05M")
    tree_case(pm, "segmented", "DNA 160x1.05M")
    probe_single_node()


if __name__ == "__main__":
    main()
