"""Scalar-fenced r05 segmented measurements + relay-speed probe.

The eager ``log_likelihood`` timings fetch (1, n_pad) fp32 lik + sc
arrays per eval; through the axon relay that fetch alone can dominate
(and drifts between leases).  This benchmark separates the two: a
relay-speed probe, then the r04-protocol scalar-fenced kernel timings
(device-side reduction, scalar fetch only — benchmarks/protein4.py).

Run: PYTHONPATH=/root/repo python benchmarks/r05_fenced.py
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
from plf_tpu.ops.plf_tree_seg import plf_tree_segmented  # noqa: E402

print("devices:", jax.devices(), flush=True)
OUT = os.path.join(os.path.dirname(__file__), "results",
                   "r05_fenced.txt")
lines = []


def log(s):
    print(s, flush=True)
    lines.append(s)


def probe_relay():
    x = jnp.ones((1, 1 << 20), jnp.float32)   # 4 MB
    np.asarray(x)
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(x)
    dt = (time.perf_counter() - t0) / 3
    log(f"relay fetch 4MB: {dt*1e3:.1f} ms = {4 / dt:.0f} MB/s")
    # dispatch overhead probe: trivial scalar op round-trip
    y = jnp.float32(1.0)
    f = jax.jit(lambda a: a + 1)
    float(np.asarray(f(y)))
    t0 = time.perf_counter()
    for _ in range(10):
        float(np.asarray(f(y)))
    log(f"scalar dispatch round-trip: "
        f"{(time.perf_counter()-t0)/10*1e3:.1f} ms")


def fenced_fwd(pm, label, reps=8):
    plan, codes3, lcs3, rcs3, ttab = pm._segmented_inputs()
    S, C = pm.config.states, pm.config.categories
    variant = pm.config.resolved_kernel_variant
    dtype = pm.config.dtype

    def once():
        lik, sc = plf_tree_segmented(
            plan, codes3, lcs3, rcs3, pm._ec, ttab, pm._root_rows,
            pm.n_sites, states=S, categories=C, variant=variant,
            dtype=dtype)
        return (jnp.sum(jnp.log(jnp.maximum(lik, 1.2e-38)))
                + jnp.sum(sc).astype(jnp.float32) * jnp.float32(-22.18))

    float(np.asarray(once()))
    # async-batch protocol: launch all reps, fence ONCE (dispatch is
    # async; per-rep scalar fetches would add a ~30 ms round trip each)
    t0 = time.perf_counter()
    for _ in range(reps):
        v = once()
    float(np.asarray(v))
    dt = (time.perf_counter() - t0) / reps
    e, n = len(pm.schedule), pm.n_sites
    log(f"fwd  {label}: {dt*1e3:.1f} ms ({e*n/dt/1e9:.2f} Gns/s; "
        f"block={plan.block_sites} n_seg={len(plan.segments)})")
    return dt


def fenced_grad(pm, label, reps=4):
    fn, t0v = tree_loglik_fn(pm, backend="segmented")
    ev = jax.value_and_grad(fn)
    t0j = jnp.asarray(t0v)
    v, g = ev(t0j)
    float(np.asarray(v))
    t0 = time.perf_counter()
    for _ in range(reps):
        v, g = ev(t0j)
    float(np.asarray(v)); float(np.asarray(jnp.sum(g)))
    dt = (time.perf_counter() - t0) / reps
    log(f"grad {label}: {dt*1e3:.1f} ms "
        f"({len(pm.schedule)*pm.n_sites/dt/1e9:.2f} Gns/s)")
    return dt


def main():
    probe_relay()

    # DNA 160 x 1.05M — r04 anchors: fwd 111 ms / grad 238 ms
    t160 = random_tree(160, seed=3)
    a160 = np.random.default_rng(7).integers(
        0, 4, size=(160, 1048576)).astype(np.int32)
    for dtype in ("float32", "bfloat16"):
        pm = PhyloModel(t160, hky85(2.0), a160, alpha=0.7,
                        config=PLFConfig(block_sites=4096, dtype=dtype))
        fenced_fwd(pm, f"DNA 160x1.05M {dtype}")
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            fenced_grad(pm, f"DNA 160x1.05M {dtype}")
        del pm

    # S=20 64 x 131k — r04 anchors: mxu_3x fwd 52.5 / grad 99.5;
    # vpu fwd 67.5 / grad 269 (those at planner block 1024; the
    # production config block 4096 auto-tunes the same)
    tp = random_tree(64, seed=3)
    ap = np.random.default_rng(7).integers(
        0, 20, size=(64, 131072)).astype(np.int32)
    lg = empirical_protein("lg")
    for variant in ("mxu_3x", "mxu", "vpu"):
        pm = PhyloModel(tp, lg, ap, alpha=0.7,
                        config=PLFConfig(states=20, block_sites=4096,
                                         kernel_variant=variant))
        fenced_fwd(pm, f"S20 64x131k {variant}")
        if variant != "vpu":
            fenced_grad(pm, f"S20 64x131k {variant}")
        del pm

    probe_relay()
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
