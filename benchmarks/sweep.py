"""Benchmark matrix sweep — the run_all.sh analogue.

The reference's thesis benchmark protocol (run_all.sh:1-118) sweeps
6 accelerator configs x instances {1,2,4,8,9} x sites {1e4..1e9} x two
timing modes and archives CSVs.  This sweep covers the TPU engine's
equivalent axes:

  * site counts        (1e5 .. 4e7 device-resident; see scale_1e8.py
                        for the host-streaming 1e8+ path)
  * Pallas block size  (the WINDOW_SIZE axis, Makefile:33)
  * kernel variant     (vpu exact / mxu block-matmul)
  * backend            (pallas fused / xla elementwise)
  * states             (DNA 4 / protein 20 / codon 61 — the STATES axis)
  * tree fusion        (single-node vs whole-tree fused kernel)

All device timings use the slope protocol (time K=2 and K=10 chained
calls inside one jit, take the slope) so the axon tunnel's fixed ~30 ms
per-dispatch overhead cancels — single-call timings through the relay
are meaningless (see bench.py).

Rows append to benchmarks/results/<tag>.csv as they are produced (a
timeout keeps partial results).  Run on TPU for real numbers; CPU runs
use tiny sizes (functional smoke).

Usage: python benchmarks/sweep.py [--tag NAME] [--quick]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_xla_node(n_sites, states=4, categories=4, k_pair=(2, 10)):
    """XLA elementwise PLF, slope protocol (comparison row)."""
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
    if jax.default_backend() != "tpu":
        k_pair = (1, 2)

    def chained(K):
        @jax.jit
        def f(x1, x2):
            def body(carry, _):
                a, acc = carry
                x3, sv, si = plf_xla(a, x2, left, right, ev, w,
                                     states=S, categories=C)
                return (x3, acc + si), ()
            (o, acc), _ = jax.lax.scan(body, (x1, jnp.int32(0)), None,
                                       length=K)
            return jnp.sum(o[:8]) + acc.astype(jnp.float32)
        return f

    def timed(K, reps=3):
        f = chained(K)
        float(np.asarray(f(x1, x2)))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(x1, x2)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    per = max((timed(k_pair[1]) - timed(k_pair[0]))
              / (k_pair[1] - k_pair[0]), 1e-9)
    return n_sites / per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="sweep")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated row kinds to run")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (the JAX_PLATFORMS env var is "
                         "ignored in images whose TPU plugin re-registers)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from bench import bench_fused, bench_tree
    on_tpu = jax.default_backend() == "tpu"
    log(f"backend={jax.default_backend()}")
    quick = args.quick or not on_tpu

    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "results")
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, f"{args.tag}.csv")
    fields = ["kind", "sites", "block", "states", "variant", "leaves",
              "sites_per_sec", "node_sites_per_sec"]
    wrote_header = os.path.exists(path) and os.path.getsize(path) > 0

    def record(kind, **kw):
        nonlocal wrote_header
        kw["kind"] = kind
        log(" ".join(f"{k}={v}" for k, v in kw.items()))
        with open(path, "a", newline="") as f:
            wr = csv.DictWriter(f, fieldnames=fields)
            if not wrote_header:
                wr.writeheader()
                wrote_header = True
            wr.writerow(kw)

    def want(kind):
        return args.only is None or kind in args.only.split(",")

    def pad(n, block):
        return ((n + block - 1) // block) * block

    # single-node fused kernel: block sweep (the WINDOW_SIZE axis)
    if want("plf_node"):
        for block in ([128] if quick else [4096, 8192, 16384]):
            n = pad(1 << 12 if quick else 1 << 24, block)
            try:
                sps = bench_fused(n_sites=n, block=block)
                record("plf_node", sites=n, block=block, states=4,
                       variant="vpu", sites_per_sec=round(sps))
            except Exception as e:
                log(f"plf_node block={block}: {type(e).__name__}: {e}")

    # site-count scaling at the production block (the ALIGNMENT_SITES axis)
    if want("plf_node_scaling"):
        for n in ([1 << 12] if quick
                  else [10**5, 10**6, 10**7, 4 * 10**7]):
            block = 128 if quick else 16384
            # scale the chain length so the measured slope covers tens
            # of ms even for small site counts (the per-call time at 1e5
            # sites is ~35 us — a K=10 chain is inside timer noise)
            k_hi = max(10, min(2048, 10 * (1 << 24) // max(n, 1)))
            try:
                sps = bench_fused(n_sites=pad(n, block), block=block,
                                  k_pair=(2, k_hi))
                record("plf_node_scaling", sites=pad(n, block),
                       block=block, states=4, variant="vpu",
                       sites_per_sec=round(sps))
            except Exception as e:
                log(f"scaling n={n}: {type(e).__name__}: {e}")

    # protein (S=20) and codon (S=61): vpu vs mxu variants
    if want("plf_states"):
        for states, block, variants in (
                (20, 128 if quick else 2048,
                 ("vpu", "mxu", "mxu_3x", "mxu_bf16")),
                (61, 128 if quick else 1024,
                 ("mxu", "mxu_3x", "mxu_bf16"))):
            n = pad(1 << 12 if quick else 1 << 21, block)
            for v in variants:
                try:
                    sps = bench_fused(n_sites=n, block=block,
                                      states=states, variant=v,
                                      k_pair=(2, 34))
                    record("plf_node", sites=n, block=block,
                           states=states, variant=v,
                           sites_per_sec=round(sps))
                except Exception as e:
                    log(f"states={states} {v}: {type(e).__name__}: {e}")

    # bf16 fast mode: CLVs stored bf16 in HBM, fp32 arithmetic in VMEM
    # (halves the memory traffic of the HBM-bound kernel; non-exact)
    if want("plf_bf16"):
        block = 128 if quick else 16384
        n = pad(1 << 12 if quick else 1 << 24, block)
        try:
            sps = bench_fused(n_sites=n, block=block, dtype="bfloat16")
            record("plf_node", sites=n, block=block, states=4,
                   variant="vpu-bf16", sites_per_sec=round(sps))
        except Exception as e:
            log(f"bf16: {type(e).__name__}: {e}")

    # XLA elementwise backend comparison (smaller n: the autodiff-style
    # elementwise path materialises (n, C, S) intermediates and a K-chain
    # scan OOMs HBM beyond ~1M sites)
    if want("plf_xla"):
        n = 1 << 12 if quick else 1 << 20
        try:
            sps = bench_xla_node(n)
            record("plf_xla", sites=n, block=0, states=4, variant="xla",
                   sites_per_sec=round(sps))
        except Exception as e:
            log(f"plf_xla: {type(e).__name__}: {e}")

    # fused whole-tree kernel (beyond-reference configuration)
    if want("tree_fused"):
        for leaves in ([8] if quick else [8, 16, 32]):
            block = 128 if quick else 1024
            n = pad(1 << 12 if quick else 1 << 21, block)
            try:
                nsps = bench_tree(n_sites=n, n_leaves=leaves, block=block)
                record("tree_fused", sites=n, block=block, states=4,
                       variant="vpu", leaves=leaves,
                       node_sites_per_sec=round(nsps))
            except Exception as e:
                log(f"tree_fused leaves={leaves}: {type(e).__name__}: {e}")

    log(f"wrote {path}")


if __name__ == "__main__":
    main()
