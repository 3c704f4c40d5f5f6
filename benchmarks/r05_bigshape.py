"""Round-5 big-shape validation: 256 taxa x 4.2M sites value_and_grad.

The verdict's capacity case — r04 ran it fp32 at 1649 ms/eval with
boundary+adjoint buffers ~4.3 GB each "near the HBM capacity edge".
bf16 boundary storage halves both; this run validates the fp32 and
bf16 paths execute and times them (async-batch protocol).

Run: PYTHONPATH=/root/repo python benchmarks/r05_bigshape.py
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
                   "r05_bigshape.txt")
lines = []


def log(s):
    print(s, flush=True)
    lines.append(s)


def main():
    n_taxa, n_sites = 256, 1 << 22
    tree = random_tree(n_taxa, seed=3)
    aln = np.random.default_rng(7).integers(
        0, 4, size=(n_taxa, n_sites)).astype(np.int32)
    for dtype in ("bfloat16", "float32"):
        pm = PhyloModel(tree, hky85(2.0), aln, alpha=0.7,
                        config=PLFConfig(block_sites=4096, dtype=dtype,
                                         tip_dtype="int8"))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            fn, t0v = tree_loglik_fn(pm, backend="segmented")
        ev = jax.value_and_grad(fn)
        t0j = jnp.asarray(t0v)
        v, g = ev(t0j)
        float(np.asarray(v))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            v, g = ev(t0j)
        ok = float(np.asarray(v))
        gs = float(np.asarray(jnp.sum(g)))
        dt = (time.perf_counter() - t0) / reps
        plan = pm._segmented_inputs()[0]
        bnd_gb = (plan.n_boundaries + 1) * pm.config.rows * pm.n_pad * (
            2 if dtype == "bfloat16" else 4) / 2 ** 30
        assert np.isfinite(ok) and np.isfinite(gs)
        log(f"256x4.2M int8-tips {dtype}: value_and_grad "
            f"{dt*1e3:.0f} ms/eval (r04 fp32: 1649 ms); boundary buffer "
            f"{bnd_gb:.2f} GB (+ same-size adjoint buffer)")
        del pm, fn, ev, v, g
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
