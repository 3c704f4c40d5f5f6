"""Round-3 calibration probes: today's HBM ceiling + bf16 headline +
int8 tip-code tree throughput.

The roofline acceptance bar (BASELINE.md) is relative to the CHIP'S
measured ceiling, which drifts between leases (r02 machine: 637 GB/s
for the 2R+1W fused-add pattern; r03 the fused kernel itself measured
705 GB/s effective, so the ceiling must be re-probed on the same
lease).  Sections:

  1. xla_add   — x3 = x1 + x2 chained scan, the same 2R+1W HBM pattern
                 as the PLF (lab_kernels3 protocol): practical ceiling.
  2. bf16      — fused kernel with bfloat16 CLV storage (headline fast
                 mode; r02: 4.79 Gsites/s).
  3. tree int8 — whole-tree register-machine kernel, tip codes stored
                 int32 vs int8 (the kernel's dominant HBM stream is the
                 tip-code reads; int8 quarters it).

Appends to benchmarks/results/r03_ceiling.txt.
Run: python benchmarks/ceiling3.py
"""
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "results", "r03_ceiling.txt")
lines = []


def log(s):
    print(s, flush=True)
    lines.append(s)


log(f"devices: {jax.devices()}")
N = 1 << 24
E = 16


def timed_best(f, args, reps=4):
    float(np.asarray(f(*args)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


# ---- 1. xla_add ceiling ---------------------------------------------------
rng = np.random.default_rng(0)
key = jax.random.key(0)


@jax.jit
def gen(key):
    k1, k2 = jax.random.split(key)
    return (jax.random.uniform(k1, (E, N), jnp.float32),
            jax.random.uniform(k2, (E, N), jnp.float32))


x1, x2 = gen(key)
GB = E * N * 4 / 1e9


def xla_add(K):
    @jax.jit
    def f(a, b):
        def body(carry, _):
            return carry + b, ()
        o, _ = jax.lax.scan(body, a, None, length=K)
        return jnp.sum(o[:, :8])
    return f


ts = [timed_best(xla_add(K), (x1, x2)) for K in (2, 10)]
per = max((ts[1] - ts[0]) / 8, 1e-9)
ceiling = 3 * GB / per
log(f"xla_add 2R+1W ceiling: {ceiling:7.1f} GB/s ({per*1e3:.2f} ms/call)"
    f" [today's practical HBM ceiling]")

# ---- 2. fp32 + bf16 headline ---------------------------------------------
for dt in ("float32", "bfloat16"):
    sps = bench.bench_fused(n_sites=N, block=16384, dtype=dt)
    bps = 3 * E * (2 if dt == "bfloat16" else 4) + 4
    log(f"fused[{dt}]: {sps/1e9:.3f} Gsites/s "
        f"({sps*bps/1e9:.0f} GB/s; {100*sps*bps/1e9/ceiling:.1f}% of "
        f"today's ceiling)")

# ---- 3. tree kernel int8 vs int32 tips -----------------------------------
from plf_tpu.config import PLFConfig  # noqa: E402
from plf_tpu.models import PhyloModel, hky85, random_tree  # noqa: E402
from plf_tpu.ops.plf_tree_pallas import plf_tree_pallas  # noqa: E402

n_leaves, block = 16, 4096
n_sites = 1 << 21
npad = ((n_sites + block - 1) // block) * block
tree = random_tree(n_leaves, seed=1)
tips = rng.integers(0, 4, size=(n_leaves, npad))
for td in ("int32", "int8"):
    pm = PhyloModel(tree, hky85(2.0), tips, alpha=0.5,
                    config=PLFConfig(block_sites=block, tip_dtype=td))
    sched, lcs, rcs, ttab = pm._fused_inputs()
    nl = pm.tree.n_leaves
    nodes = len(pm.schedule)

    def chained(K):
        @jax.jit
        def f(codes, lcs, rcs, ec, ttab, rr):
            def body(acc, _):
                lik, sc = plf_tree_pallas(
                    codes, sched, lcs, rcs, ec, ttab, rr,
                    jnp.int32(npad) - (acc & 1), n_leaves=nl,
                    block_sites=block)
                return acc + jnp.sum(sc) + jnp.sum(lik[:, :8]).astype(
                    jnp.int32), ()
            acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=K)
            return acc.astype(jnp.float32)
        return f

    args = (pm._codes, lcs, rcs, pm._ec, ttab, pm._root_rows)
    ts = [timed_best(chained(K), args) for K in (2, 8)]
    per = max((ts[1] - ts[0]) / 6, 1e-9)
    nsps = nodes * npad / per
    code_gbs = nl * npad * (1 if td == "int8" else 4) / per / 1e9
    log(f"tree[{td}]: {nsps/1e9:.2f} G node-sites/s "
        f"({npad/per/1e9:.3f} G tree-passes*sites/s; tip-code stream "
        f"{code_gbs:.0f} GB/s)")

with open(OUT, "a") as fh:
    fh.write("\n".join(lines) + "\n")
log(f"appended -> {OUT}")
