"""A/B: MXU op-grad site reduction in the VPU backward sweeps.

The VPU reverse sweep's _op_grad runs S cross-lane reductions over
(rows, BS) per call, 3 calls per op — the suspected dominant cost of
the DNA backward (steady state 177.8 ms vs 61.5 fwd).  _op_grad_mxu
replaces the site reduction with one (rows, rows) HIGHEST matmul on
the systolic array + a static row-phase selection.

Interleaved protocol (see r05_interleave.py): both forms warmed, then
timed in alternating rounds, min of round means.

Run: PYTHONPATH=/root/repo python benchmarks/r05_opgrad.py
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

print("devices:", jax.devices(), flush=True)
OUT = os.path.join(os.path.dirname(__file__), "results",
                   "r05_opgrad.txt")
lines = []


def log(s):
    print(s, flush=True)
    lines.append(s)


def build(flag, n_taxa=160, n_sites=1 << 20, backend="segmented"):
    """Build a fresh value_and_grad under PLF_VPU_BWD_MXU_REDUCE=flag.

    The env var is read at kernel TRACE time; jits key on static args
    only, so each flag needs its own trace — force it by distinct
    n (sites) values?  No: distinct env -> same statics -> cache HIT.
    Instead vary block_sites minimally?  That changes the measured
    config.  The clean approach: separate plan shapes are NOT needed —
    the inner _seg_bwd_call jit is keyed on statics that do not include
    the env flag, so we must trace each flag in its own process OR
    bypass the jit cache.  Here: perturb n_sites by one block (4096
    sites of 1.05M, <0.4%) per flag so each flag gets its own
    compilation; the work difference is negligible vs the effect size.
    """
    os.environ["PLF_VPU_BWD_MXU_REDUCE"] = flag
    t = random_tree(n_taxa, seed=3)
    a = np.random.default_rng(7).integers(
        0, 4, size=(n_taxa, n_sites)).astype(np.int32)
    pm = PhyloModel(t, hky85(2.0), a, alpha=0.7,
                    config=PLFConfig(block_sites=4096))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fn, t0v = tree_loglik_fn(pm, backend=backend)
    ev = jax.value_and_grad(fn)
    t0j = jnp.asarray(t0v)
    return ev, t0j, len(pm.schedule) * pm.n_sites


def main():
    cfgs = []
    for flag, dn in (("0", 0), ("1", 4096)):
        ev, t0j, ns = build(flag, n_sites=(1 << 20) + dn)
        cfgs.append((f"DNA160 grad mxu_reduce={flag}", ev, t0j, ns))

    res0 = None
    for label, ev, t0j, ns in cfgs:
        v, g = ev(t0j)
        float(np.asarray(v))
        if res0 is None:
            res0 = (float(np.asarray(v)), np.asarray(g))
        for _ in range(7):
            v, g = ev(t0j)
        float(np.asarray(v))

    ROUNDS, REPS = 3, 4
    means = {lbl: [] for lbl, *_ in cfgs}
    for r in range(ROUNDS):
        for label, ev, t0j, ns in cfgs:
            v, g = ev(t0j)
            float(np.asarray(v))
            t0 = time.perf_counter()
            for _ in range(REPS):
                v, g = ev(t0j)
            float(np.asarray(v)); float(np.asarray(jnp.sum(g)))
            means[label].append((time.perf_counter() - t0) / REPS)
    for label, ev, t0j, ns in cfgs:
        ms = means[label]
        best = min(ms)
        log(f"{label}: {best*1e3:.1f} ms ({ns/best/1e9:.2f} Gns/s)  "
            f"rounds=[{', '.join(f'{m*1e3:.1f}' for m in ms)}]")

    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
