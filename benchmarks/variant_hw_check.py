"""Round-4 HW smoke: MXU-variant tree gradients lower on real Mosaic.

Small shapes (compile-speed bound through the tunnel): asserts the
mxu/mxu_3x forward+backward tree kernels and the segmented VJP compile
and match the XLA oracle on device.

Run: PYTHONPATH=/root/repo python benchmarks/variant_hw_check.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from plf_tpu.config import PLFConfig  # noqa: E402
from plf_tpu.models import PhyloModel, hky85, random_tree  # noqa: E402
from plf_tpu.models.optimize import tree_loglik_fn  # noqa: E402
from plf_tpu.models.substitution import random_gtr  # noqa: E402

print("devices:", jax.devices(), flush=True)


def check(states, variant, backend, n_leaves=8, n=4096, categories=4):
    tree = random_tree(n_leaves, seed=1)
    model = hky85(2.0) if states == 4 else random_gtr(states, 1)
    tips = np.random.default_rng(0).integers(0, states,
                                             size=(n_leaves, n))
    cfg = PLFConfig(states=states, categories=categories,
                    block_sites=512, kernel_variant=variant)
    pm = PhyloModel(tree, model, tips, alpha=0.5, config=cfg)
    t0c = time.perf_counter()
    fn, t0 = tree_loglik_fn(pm, backend=backend)
    v, g = jax.value_and_grad(fn)(jnp.asarray(t0))
    v = float(v)
    g = np.asarray(g)
    dt = time.perf_counter() - t0c
    fn_x, _ = tree_loglik_fn(pm, backend="xla")
    vx = float(fn_x(jnp.asarray(t0)))
    gx = np.asarray(jax.grad(fn_x)(jnp.asarray(t0)))
    rel = abs(v - vx) / abs(vx)
    gerr = np.max(np.abs(g - gx) / (np.abs(gx) + 1e-4))
    ok = rel < 1e-4 and gerr < 5e-3 and np.all(np.isfinite(g))
    print(f"[{'PASS' if ok else 'FAIL'}] S={states} {variant} {backend}: "
          f"ll={v:.4f} (xla {vx:.4f}, rel {rel:.2e}) "
          f"gmax-rel-err {gerr:.2e}  [{dt:.1f}s compile+run]", flush=True)
    return ok


def main(fast=False):
    ok = True
    if not fast:
        ok &= check(4, "mxu", "tree")
        ok &= check(4, "mxu", "segmented", n_leaves=16)
    ok &= check(4, "mxu_3x", "tree")
    ok &= check(20, "mxu_3x", "tree", n_leaves=6, n=2048, categories=4)
    ok &= check(20, "mxu_3x", "segmented", n_leaves=12, n=2048,
                categories=4)
    print("ALL OK" if ok else "FAILURES", flush=True)
    if not ok:
        raise AssertionError("MXU-ladder gradient checks failed")


if __name__ == "__main__":
    main()
