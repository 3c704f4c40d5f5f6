"""Benchmark matrix sweep — the run_all.sh analogue.

The reference's thesis benchmark protocol (run_all.sh:1-118) sweeps
6 accelerator configs x instances {1,2,4,8,9} x sites {1e4..1e9} x two
timing modes and archives CSVs.  This sweep covers the TPU engine's
equivalent axes:

  * site counts        (default 1e4 .. 1e7; Makefile:16 goes to 1e9)
  * Pallas block size  (the WINDOW_SIZE axis, Makefile:33)
  * backend            (pallas fused / xla)
  * states             (DNA 4 / protein 20 — the STATES axis)
  * tree fusion        (single-node vs whole-tree fused kernel)

Writes one CSV row per point to benchmarks/results/<tag>.csv and prints a
reference-style table (timing.h:107-151).  Run on TPU for real numbers;
CPU runs use tiny sizes (functional smoke).

Usage: python benchmarks/sweep.py [--tag NAME] [--quick]
"""

from __future__ import annotations

import argparse
import csv
import functools
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_single_node(n_sites, block, states=4, categories=4, reps=3):
    import jax
    import jax.numpy as jnp
    from plf_tpu.ops.plf_pallas import plf_pallas_lane_major
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_inputs

    S, C = states, categories
    x1, x2, lc, rc, ec = make_inputs(n_sites, S, C)
    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(plf_pallas_lane_major, states=S,
                               categories=C, block_sites=block,
                               interpret=interpret)

    @jax.jit
    def onecall(x1, x2, lc, rc, ec):
        x3, sc = kernel(x1, x2, lc, rc, ec, jnp.int32(n_sites))
        return jnp.sum(x3[:, :8]), jnp.sum(sc)

    args = (x1, x2, jnp.asarray(lc), jnp.asarray(rc), jnp.asarray(ec))
    float(np.asarray(onecall(*args)[0]))
    best = min(_timed(lambda: float(np.asarray(onecall(*args)[0])))
               for _ in range(reps))
    return n_sites / best


def bench_xla_node(n_sites, states=4, categories=4, reps=3):
    import jax
    import jax.numpy as jnp
    from plf_tpu.ops.plf_xla import plf_xla
    S, C = states, categories
    key = jax.random.key(0)
    x1 = jax.random.uniform(key, (n_sites, C, S), jnp.float32, 0.01, 1.0)
    x2 = jax.random.uniform(key, (n_sites, C, S), jnp.float32, 0.01, 1.0)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.random((C, S, S), np.float32))
    right = jnp.asarray(rng.random((C, S, S), np.float32))
    ev = jnp.asarray(rng.random((S, S), np.float32))
    w = jnp.ones((n_sites,), jnp.int32)

    @jax.jit
    def onecall(x1, x2):
        x3, sv, si = plf_xla(x1, x2, left, right, ev, w, states=S,
                             categories=C)
        return jnp.sum(x3[:8]), si

    float(np.asarray(onecall(x1, x2)[0]))
    best = min(_timed(lambda: float(np.asarray(onecall(x1, x2)[0])))
               for _ in range(reps))
    return n_sites / best


def bench_tree(n_sites, n_leaves, block, reps=3):
    """Fused whole-tree kernel: returns (sites/s, node-sites/s)."""
    import jax
    from plf_tpu.config import PLFConfig
    from plf_tpu.models import PhyloModel, hky85, random_tree
    tree = random_tree(n_leaves, seed=1)
    rng = np.random.default_rng(0)
    tips = rng.integers(0, 4, size=(n_leaves, n_sites))
    pm = PhyloModel(tree, hky85(2.0), tips, alpha=0.5,
                    config=PLFConfig(block_sites=block))
    pm.log_likelihood(method="fused")  # compile
    best = min(_timed(lambda: pm.log_likelihood(method="fused"))
               for _ in range(reps))
    nodes = len(pm.schedule)
    return n_sites / best, n_sites * nodes / best


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="sweep")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    on_tpu = jax.default_backend() == "tpu"
    log(f"backend={jax.default_backend()}")

    if args.quick or not on_tpu:
        site_counts = [1 << 12]
        blocks = [128]
        leaves = [8]
    else:
        site_counts = [10**4, 10**5, 10**6, 10**7, 4 * 10**7]
        blocks = [1024, 4096, 8192, 16384]
        leaves = [8, 16, 32]

    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "results")
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, f"{args.tag}.csv")
    rows = []

    def record(kind, **kw):
        kw["kind"] = kind
        rows.append(kw)
        log(" ".join(f"{k}={v}" for k, v in kw.items()))

    # single-node fused kernel: block sweep at largest site count
    for block in blocks:
        n = site_counts[-1]
        if n % block:
            n = (n // block + 1) * block
        try:
            sps = bench_single_node(n, block)
            record("plf_node", sites=n, block=block, states=4,
                   sites_per_sec=round(sps))
        except Exception as e:
            log(f"plf_node block={block}: {type(e).__name__}: {e}")

    # site-count scaling at default block
    for n in site_counts:
        block = blocks[min(1, len(blocks) - 1)]
        npad = ((n + block - 1) // block) * block
        sps = bench_single_node(npad, block)
        record("plf_node_scaling", sites=npad, block=block, states=4,
               sites_per_sec=round(sps))

    # protein
    n = site_counts[-1] // 8
    block = 1024
    npad = ((n + block - 1) // block) * block
    sps = bench_single_node(npad, block, states=20)
    record("plf_node", sites=npad, block=block, states=20,
           sites_per_sec=round(sps))

    # XLA backend comparison
    sps = bench_xla_node(site_counts[-1] if on_tpu else site_counts[0])
    record("plf_xla", sites=site_counts[-1] if on_tpu else site_counts[0],
           block=0, states=4, sites_per_sec=round(sps))

    # fused whole-tree kernel
    for L in leaves:
        n = (site_counts[-1] // 4) if on_tpu else site_counts[0]
        block = 1024
        npad = ((n + block - 1) // block) * block
        try:
            sps, nsps = bench_tree(npad, L, block)
            record("tree_fused", sites=npad, block=block, states=4,
                   leaves=L, sites_per_sec=round(sps),
                   node_sites_per_sec=round(nsps))
        except Exception as e:
            log(f"tree_fused leaves={L}: {type(e).__name__}: {e}")

    keys = sorted({k for r in rows for k in r})
    with open(path, "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=keys)
        wr.writeheader()
        wr.writerows(rows)
    log(f"wrote {path} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
