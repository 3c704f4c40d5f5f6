"""Bisect the round-5 segmented-kernel slowdown: serial vs pipelined DMA.

One process, one lease.  Cases run smallest-first for fast signal.
Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r05_bisect.py
"""
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402

from plf_tpu.config import PLFConfig  # noqa: E402
from plf_tpu.models import PhyloModel, hky85, random_tree  # noqa: E402
from plf_tpu.models.substitution import empirical_protein  # noqa: E402

print("devices:", jax.devices(), flush=True)


def fwd_time(pm, reps=6):
    pm.log_likelihood(method="segmented")
    t0 = time.perf_counter()
    for _ in range(reps):
        pm.log_likelihood(method="segmented")
    return (time.perf_counter() - t0) / reps


def case(label, make_pm, modes=("1", "0")):
    for mode in modes:
        os.environ["PLF_SEG_PIPELINE"] = mode
        pm = make_pm()
        dt = fwd_time(pm)
        e, n = len(pm.schedule), pm.n_sites
        plan = pm._segmented_inputs()[0]
        print(f"{label} pipeline={mode}: {dt*1e3:.1f} ms "
              f"({e*n/dt/1e9:.2f} Gns/s; block={plan.block_sites} "
              f"n_seg={len(plan.segments)})", flush=True)
        del pm


def main():
    t64 = random_tree(64, seed=3)
    a64 = np.random.default_rng(7).integers(
        0, 4, size=(64, 262144)).astype(np.int32)
    case("DNA 64x262k  ", lambda: PhyloModel(
        t64, hky85(2.0), a64, alpha=0.7,
        config=PLFConfig(block_sites=4096)))

    tp = random_tree(64, seed=9)
    ap = np.random.default_rng(11).integers(
        0, 20, size=(64, 131072)).astype(np.int32)
    lg = empirical_protein("lg")
    case("S20 64x131k 3x", lambda: PhyloModel(
        tp, lg, ap, alpha=0.8,
        config=PLFConfig(states=20, block_sites=4096,
                         kernel_variant="mxu_3x")))

    t160 = random_tree(160, seed=3)
    a160 = np.random.default_rng(7).integers(
        0, 4, size=(160, 1048576)).astype(np.int32)
    case("DNA 160x1.05M", lambda: PhyloModel(
        t160, hky85(2.0), a160, alpha=0.7,
        config=PLFConfig(block_sites=4096)))

    # bf16 storage (pipelined only): speed + drift probe
    os.environ["PLF_SEG_PIPELINE"] = "1"
    pm32 = PhyloModel(t160, hky85(2.0), a160, alpha=0.7,
                      config=PLFConfig(block_sites=4096))
    ll32 = pm32.log_likelihood(method="segmented").log_likelihood
    del pm32
    pm16 = PhyloModel(t160, hky85(2.0), a160, alpha=0.7,
                      config=PLFConfig(block_sites=4096,
                                       dtype="bfloat16"))
    dt = fwd_time(pm16)
    ll16 = pm16.log_likelihood(method="segmented").log_likelihood
    print(f"DNA 160x1.05M bf16 pipeline=1: {dt*1e3:.1f} ms "
          f"({len(pm16.schedule)*pm16.n_sites/dt/1e9:.2f} Gns/s); "
          f"ll rel drift {abs(ll16-ll32)/abs(ll32):.2e}", flush=True)


if __name__ == "__main__":
    main()
