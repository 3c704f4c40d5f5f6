"""Slope-protocol segmented forward timings (true device ms/eval).

Chains K segmented evaluations inside ONE jit (the rr operand is
perturbed by 1e-40*carry so XLA cannot hoist loop-invariant calls);
K_hi vs K_lo slope cancels the ~27-40 ms per-call tunnel overhead that
single-shot protocols absorb.  All big arrays enter as jit ARGUMENTS
(the outer-jit closure-constant trap, ROADMAP notes).

Also sweeps the segmented VMEM budget for S=20 (the round-5 slot
accounting shrank the protein block 1024 -> 512; a bigger budget buys
the block back if Mosaic accepts it).

Run: PYTHONPATH=/root/repo python benchmarks/r05_slope.py
"""
import functools
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
from plf_tpu.models.substitution import empirical_protein  # noqa: E402
from plf_tpu.ops import plf_tree_seg as seg  # noqa: E402

print("devices:", jax.devices(), flush=True)
OUT = os.path.join(os.path.dirname(__file__), "results", "r05_slope.txt")
lines = []


def log(s):
    print(s, flush=True)
    lines.append(s)


def slope_fwd(pm, label, budget=None, k_pair=(1, 5), reps=3):
    cfg = pm.config
    S, C = cfg.states, cfg.categories
    variant = cfg.resolved_kernel_variant
    io_dtype = (jnp.bfloat16 if cfg.dtype == "bfloat16"
                else jnp.float32)
    # plan with an explicit budget (bypasses the PhyloModel cache)
    from plf_tpu.ops.plf_tree_pallas import reorder_schedule
    n_leaves = pm.tree.n_leaves
    sched_r = reorder_schedule(pm.schedule, n_leaves)
    eidx = np.asarray([e for (*_x, e) in sched_r])
    lcs3 = jnp.asarray(pm._lcs_np[eidx])
    rcs3 = jnp.asarray(pm._rcs_np[eidx])
    pos_sched = tuple((p, l, r, 0.0, 0.0, i)
                      for i, (p, l, r, *_x) in enumerate(sched_r))
    kw = dict(rows=cfg.rows, block_sites=cfg.block_sites,
              op_width=cfg.rows if variant.startswith("mxu") else 0)
    if budget is not None:
        kw["vmem_budget"] = budget
    plan = seg.plan_segments(pos_sched, n_leaves, **kw)
    codes3 = pm._ensure_codes3()
    ttab = pm._kernel_tip_table()
    n = pm.n_sites

    def chain(K):
        @jax.jit
        def f(codes3, lcs3, rcs3, ec, ttab, rr):
            def body(c, _):
                lik, sc = seg.plf_tree_segmented(
                    plan, codes3, lcs3, rcs3, ec, ttab,
                    rr + jnp.float32(1e-40) * c, n, states=S,
                    categories=C, variant=variant, dtype=cfg.dtype)
                ll = (jnp.sum(jnp.log(jnp.maximum(lik, 1e-45)))
                      + jnp.sum(sc).astype(jnp.float32)
                      * jnp.float32(-22.18))
                return ll, ()
            ll, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return ll
        return f

    def timed(K):
        f = chain(K)
        float(np.asarray(f(codes3, lcs3, rcs3, pm._ec, ttab,
                           pm._root_rows)))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(codes3, lcs3, rcs3, pm._ec, ttab,
                               pm._root_rows)))
            best = min(best, time.perf_counter() - t0)
        return best

    try:
        t_lo, t_hi = timed(k_pair[0]), timed(k_pair[1])
    except Exception as e:
        log(f"fwd {label}: FAILED {type(e).__name__}: "
            f"{str(e).splitlines()[0][:120]}")
        return None
    per = max((t_hi - t_lo) / (k_pair[1] - k_pair[0]), 1e-9)
    e_, n_ = len(pm.schedule), pm.n_sites
    log(f"fwd {label}: {per*1e3:.1f} ms/eval device "
        f"({e_*n_/per/1e9:.2f} Gns/s; block={plan.block_sites} "
        f"n_seg={len(plan.segments)} budget={kw.get('vmem_budget','dflt')})")
    return per


def main():
    # S=20 64 x 131k: budget sweep (r04 anchor: mxu_3x 52.5 ms
    # single-shot incl overhead; true device time is the target <=26)
    tp = random_tree(64, seed=3)
    ap = np.random.default_rng(7).integers(
        0, 20, size=(64, 131072)).astype(np.int32)
    lg = empirical_protein("lg")
    for variant in ("mxu_3x", "mxu"):
        pm = PhyloModel(tp, lg, ap, alpha=0.7,
                        config=PLFConfig(states=20, block_sites=4096,
                                         kernel_variant=variant))
        for budget in (None, 12 * 2 ** 20, 13 * 2 ** 20):
            slope_fwd(pm, f"S20 64x131k {variant}", budget=budget)
        del pm
    pm = PhyloModel(tp, lg, ap, alpha=0.7,
                    config=PLFConfig(states=20, block_sites=1024))
    slope_fwd(pm, "S20 64x131k vpu")
    del pm

    # DNA 160 x 1.05M
    t160 = random_tree(160, seed=3)
    a160 = np.random.default_rng(7).integers(
        0, 4, size=(160, 1048576)).astype(np.int32)
    for dtype in ("float32", "bfloat16"):
        pm = PhyloModel(t160, hky85(2.0), a160, alpha=0.7,
                        config=PLFConfig(block_sites=4096, dtype=dtype))
        for budget in (None, 12 * 2 ** 20):
            slope_fwd(pm, f"DNA 160x1.05M {dtype}", budget=budget)
        del pm

    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
