"""Headline benchmark: fused-PLF throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "plf_dna_sites_per_sec", "value": N, "unit": "sites/s",
   "vs_baseline": N / 2.7e9}

Baseline: the reference accelerator's best theoretical full-card
throughput — 9 instances x 4 lanes x 128-bit PLIO @ 300 MHz = 1 site/
cycle/instance = 2.7e9 sites/s (BASELINE.md; Makefile:29,41; run_all.sh:8).
That is the ceiling the VCK5000 design was built toward; vs_baseline > 1
means one TPU chip beats the whole card's PLIO bound.

Protocol (mirrors the reference's hot loop, host_mem.cpp:283-394, but with
CLVs HBM-resident — the TPU-native fix for its PCIe bottleneck,
README.md:204): device-resident lane-major CLVs, K chained PLF calls
inside one jit (lax.scan), steady-state timing after warmup.  Extra
diagnostics (bandwidth, roofline fraction, block-size sweep) go to stderr.
"""

import argparse
import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_inputs(n_sites, states, categories, seed=0, variant="vpu",
                dtype="float32"):
    """CLVs generated ON DEVICE (host->HBM transfer of GBs through the
    tunnel would dominate setup); small matrices on host."""
    import jax
    import jax.numpy as jnp
    from plf_tpu.ops import layout as L
    rng = np.random.default_rng(seed)
    S, C = states, categories
    e = S * C
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        x1 = jax.random.uniform(k1, (e, n_sites), jnp.float32, 0.01, 1.0)
        x2 = jax.random.uniform(k2, (e, n_sites), jnp.float32, 0.01, 1.0)
        return x1.astype(dt), x2.astype(dt)

    x1, x2 = gen(jax.random.key(seed))
    left = rng.random((C, S, S), dtype=np.float32)
    right = rng.random((C, S, S), dtype=np.float32)
    ev = rng.random((S, S), dtype=np.float32)
    if variant.startswith("mxu"):
        lc = L.branch_to_block_matrix(left, S, C)
        rc = L.branch_to_block_matrix(right, S, C)
        ec = L.ev_to_block_matrix(ev, S, C)
    else:
        lc = L.branch_to_lane_constants(left, S, C)
        rc = L.branch_to_lane_constants(right, S, C)
        ec = L.ev_to_lane_constants(ev, S, C)
    return x1, x2, lc, rc, ec


def bench_fused(n_sites=1 << 24, iters=None, block=16384, states=4,
                categories=4, variant="vpu", k_pair=(2, 10),
                dtype="float32"):
    """Device sites/s of the fused kernel via the slope protocol.

    Through the axon tunnel every host->device call carries ~28 ms of
    fixed overhead that a real pod does not have, so single-call timing
    under-reports badly.  Protocol: time a jitted chain of K kernel
    invocations (lax.scan, output feeding the next input — the tree-
    traversal access pattern) for two values of K and take the slope;
    fixed overheads cancel exactly.  The fence fetches only scalars.
    """
    import jax
    import jax.numpy as jnp
    from plf_tpu.ops.plf_pallas import plf_pallas_lane_major

    S, C = states, categories
    x1, x2, lc, rc, ec = make_inputs(n_sites, S, C, variant=variant,
                                     dtype=dtype)
    x1d, x2d = jnp.asarray(x1), jnp.asarray(x2)
    lcd, rcd, ecd = jnp.asarray(lc), jnp.asarray(rc), jnp.asarray(ec)
    n = jnp.int32(n_sites)
    interpret = jax.default_backend() != "tpu"
    if interpret:
        k_pair = (1, 2)

    # donate=1: the chained carry is a dead internal-node CLV, exactly the
    # post-order traversal pattern — its HBM buffer is reused for x3
    # (worth ~1.6x on v5e; see ops/plf_pallas.py docstring).
    kernel = functools.partial(
        plf_pallas_lane_major, states=S, categories=C, block_sites=block,
        interpret=interpret, variant=variant, donate=1)

    def chained(K):
        @jax.jit
        def f(x1, x2, lc, rc, ec, n):
            def body(carry, _):
                a, acc = carry
                x3, sc = kernel(a, x2, lc, rc, ec, n)
                return (x3, acc + jnp.sum(sc)), ()
            (o, acc), _ = jax.lax.scan(body, (x1, jnp.int32(0)), None,
                                       length=K)
            return jnp.sum(o[:, :8]) + acc.astype(jnp.float32)
        return f

    def timed(K, reps=4):
        f = chained(K)
        float(np.asarray(f(x1d, x2d, lcd, rcd, ecd, n)))  # compile
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(x1d, x2d, lcd, rcd, ecd, n)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    t_lo = timed(k_pair[0])
    t_hi = timed(k_pair[1])
    per_iter = max((t_hi - t_lo) / (k_pair[1] - k_pair[0]), 1e-9)
    sites_per_sec = n_sites / per_iter
    clv_bytes = 2 if dtype == "bfloat16" else 4
    bytes_per_site = 3 * S * C * clv_bytes + 4
    gbs = sites_per_sec * bytes_per_site / 1e9
    log(f"fused kernel[{variant},{dtype}]: n={n_sites} block={block} "
        f"per-call={per_iter*1e3:.2f}ms (fixed ~{t_lo*1e3:.0f}ms excluded) "
        f"-> {sites_per_sec/1e9:.3f} Gsites/s, {gbs:.0f} GB/s effective")
    return sites_per_sec


BASELINE_SITES_PER_SEC = 2.7e9  # 9 instances x 300 Msites/s PLIO bound


def probe_ceiling(n_sites=1 << 24, rows=16, k_pair=(2, 10)):
    """Same-lease practical HBM ceiling: x3 = x1 + x2 chained scan — the
    identical 2R+1W stream pattern as the fused PLF (the reference
    reports per-phase bandwidth next to its timings, timing.h:101-151;
    this is the TPU analogue).  The chip's effective ceiling DRIFTS
    between leases (605-730 GB/s measured across rounds), so the
    roofline fraction is only meaningful against a probe from the SAME
    lease — which is why it ships inside bench.py.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        return (jax.random.uniform(k1, (rows, n_sites), jnp.float32),
                jax.random.uniform(k2, (rows, n_sites), jnp.float32))

    x1, x2 = gen(jax.random.key(0))
    gb = rows * n_sites * 4 / 1e9

    def chained(K):
        @jax.jit
        def f(a, b):
            def body(carry, _):
                return carry + b, ()
            o, _ = jax.lax.scan(body, a, None, length=K)
            return jnp.sum(o[:, :8])
        return f

    def timed(K, reps=4):
        f = chained(K)
        float(np.asarray(f(x1, x2)))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(x1, x2)))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(k_pair[0]), timed(k_pair[1])
    per = max((t_hi - t_lo) / (k_pair[1] - k_pair[0]), 1e-9)
    ceiling = 3 * gb / per
    log(f"same-lease 2R+1W HBM ceiling probe: {ceiling:.0f} GB/s")
    return ceiling


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sites", type=int, default=1 << 24)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--block", type=int, default=16384)
    ap.add_argument("--sweep", action="store_true",
                    help="block-size sweep + protein bench to stderr")
    args = ap.parse_args()

    import jax
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    if jax.default_backend() != "tpu":
        # CPU fallback (interpret mode) — tiny shapes so it finishes.
        args.sites = min(args.sites, 512)
        args.iters = 1
        args.block = 128

    if args.sweep and jax.default_backend() == "tpu":
        for blk in (4096, 8192, 16384):
            try:
                bench_fused(n_sites=args.sites, block=blk)
            except Exception as e:
                log(f"block={blk}: {type(e).__name__}: {e}")
        try:
            bench_fused(n_sites=args.sites, block=args.block,
                        variant="mxu")
        except Exception as e:
            log(f"mxu: {type(e).__name__}: {e}")
        try:
            sps = bench_fused(n_sites=args.sites // 8,
                              block=1024, states=20)
            log(f"protein 20-state: {sps/1e9:.3f} Gsites/s")
        except Exception as e:
            log(f"protein: {type(e).__name__}: {e}")
        try:
            bench_gen(block=args.block)
        except Exception as e:
            log(f"gen probe: {type(e).__name__}: {e}")
        try:
            bench_tree(n_sites=args.sites // 8, n_leaves=16, block=1024)
        except Exception as e:
            log(f"tree fused: {type(e).__name__}: {e}")

    sps = bench_fused(n_sites=args.sites, block=args.block)
    record = {
        "metric": "plf_dna_sites_per_sec",
        "value": round(sps, 1),
        "unit": "sites/s",
        "vs_baseline": round(sps / BASELINE_SITES_PER_SEC, 4),
    }
    if jax.default_backend() == "tpu":
        try:
            ceiling = probe_ceiling(n_sites=args.sites)
            eff_gbs = sps * (3 * 16 * 4 + 4) / 1e9
            record["roofline_pct_same_lease"] = round(
                100.0 * eff_gbs / ceiling, 1)
            record["hbm_ceiling_gbs_same_lease"] = round(ceiling, 1)
        except Exception as e:       # the headline number must survive
            log(f"ceiling probe failed: {type(e).__name__}: {e}")
        # The precision/state ladder as same-lease secondary metrics:
        # the single JSON line certifies the whole config matrix, not
        # just the DNA headline (per-config reporting parity with the
        # reference's sweep tables, run_all.sh:6-118, timing.h:101-151).
        secondary = []
        for name, kw in (
                ("plf_dna_bf16_sites_per_sec",
                 dict(n_sites=args.sites, block=args.block,
                      dtype="bfloat16")),
                ("plf_protein_mxu3x_sites_per_sec",
                 dict(n_sites=args.sites // 8, block=4096, states=20,
                      variant="mxu_3x")),
                ("plf_codon_mxu3x_sites_per_sec",
                 dict(n_sites=args.sites // 16, block=1024, states=61,
                      variant="mxu_3x")),
        ):
            try:
                s = bench_fused(**kw)
                secondary.append({"metric": name, "value": round(s, 1),
                                  "unit": "sites/s"})
            except Exception as e:   # secondary rows must not kill it
                log(f"{name} failed: {type(e).__name__}: {e}")
        if secondary:
            record["secondary"] = secondary
    print(json.dumps(record))


def bench_gen(block=8192, n_blocks=256, inner_iters=8, reps=3):
    """Compute-only kernel rate (no CLV HBM traffic) — host_gen parity."""
    import jax.numpy as jnp
    from plf_tpu.ops import layout as L
    from plf_tpu.ops.plf_pallas import plf_pallas_gen
    rng = np.random.default_rng(0)
    lc = jnp.asarray(L.branch_to_lane_constants(
        rng.random((4, 4, 4), np.float32)))
    rc = jnp.asarray(L.branch_to_lane_constants(
        rng.random((4, 4, 4), np.float32)))
    ec = jnp.asarray(L.ev_to_lane_constants(rng.random((4, 4), np.float32)))

    def run():
        out = plf_pallas_gen(lc, rc, ec, block_sites=block,
                             n_blocks=n_blocks, inner_iters=inner_iters)
        return float(np.asarray(out[0, :8]).sum())

    run()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    node_sites = block * n_blocks * inner_iters
    log(f"gen probe (compute-only): {node_sites/best/1e9:.3f} Gnode-sites/s "
        f"({node_sites/best*368/1e12:.2f} TFLOP/s fp32 equivalent)")
    return node_sites / best


def bench_tree(n_sites, n_leaves, block, k_pair=(2, 8)):
    """Fused whole-tree kernel device throughput (slope protocol)."""
    import jax
    import jax.numpy as jnp
    from plf_tpu.config import PLFConfig
    from plf_tpu.models import PhyloModel, hky85, random_tree
    from plf_tpu.ops.plf_tree_pallas import plf_tree_pallas
    tree = random_tree(n_leaves, seed=1)
    rng = np.random.default_rng(0)
    npad = ((n_sites + block - 1) // block) * block
    tips = rng.integers(0, 4, size=(n_leaves, npad))
    pm = PhyloModel(tree, hky85(2.0), tips, alpha=0.5,
                    config=PLFConfig(block_sites=block))
    sched, lcs, rcs, ttab = pm._fused_inputs()
    nodes = len(pm.schedule)
    nl = pm.tree.n_leaves
    interpret = jax.default_backend() != "tpu"

    def chained(K):
        @jax.jit
        def f(codes, lcs, rcs, ec, ttab, rr):
            def body(acc, _):
                # acc & 0x1 keeps the call loop-variant so XLA can't
                # hoist the (otherwise invariant) body out of the scan.
                lik, sc = plf_tree_pallas(
                    codes, sched, lcs, rcs, ec, ttab, rr,
                    jnp.int32(npad) - (acc & 1), n_leaves=nl,
                    block_sites=block, interpret=interpret)
                return acc + jnp.sum(sc) + jnp.sum(lik[:, :8]).astype(
                    jnp.int32), ()
            acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=K)
            return acc
        return f

    def timed(K, reps=3):
        f = chained(K)
        int(np.asarray(f(pm._codes, lcs, rcs, pm._ec, ttab,
                         pm._root_rows)))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            int(np.asarray(f(pm._codes, lcs, rcs, pm._ec, ttab,
                             pm._root_rows)))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (timed(k_pair[1]) - timed(k_pair[0])) / (k_pair[1] - k_pair[0])
    log(f"tree fused ({n_leaves} taxa, {nodes} nodes, {npad} sites): "
        f"per-eval {per*1e3:.2f}ms -> {npad/per/1e9:.3f} Gsites/s "
        f"tree-evals, {npad*nodes/per/1e9:.3f} Gnode-sites/s")
    return npad * nodes / per


if __name__ == "__main__":
    main()
