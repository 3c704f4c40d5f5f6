"""Hardware exactness verification — run on real TPU once per round.

The reference's correctness bar is exact float equality of every CLV
element and scaler count against the CPU golden model on every run
(app/src/host_mem.cpp:403-442).  The pytest suite enforces this in
interpret/CPU mode (a few ULP allowed — XLA:CPU contracts FMAs); THIS
script is the real bar: it drives the production kernels on the TPU and
requires bitwise equality.

    python benchmarks/hw_verify.py          # prints PASS/FAIL per check

Checks: engine round-trip at 1e5 sites (forced underflow pattern), a
seeded fuzz sweep (DNA + protein shapes), the AIE fixture vectors, the
fused whole-tree kernel vs a node-by-node golden traversal, and the
codon (61-state) mxu path vs the XLA backend.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

FAILURES = []


def check(name, ok, detail=""):
    status = "PASS" if ok else "FAIL"
    print(f"[{status}] {name} {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def main():
    import jax
    import jax.numpy as jnp

    from plf_tpu import PLFConfig, PLFEngine
    from plf_tpu.ops import layout as L
    from plf_tpu.ops.plf_pallas import plf_pallas
    from plf_tpu.reference import plf_reference

    print(f"backend={jax.default_backend()}", flush=True)
    on_tpu = jax.default_backend() == "tpu"

    # 1. engine round-trip with the reference's forced-underflow pattern
    rng = np.random.default_rng(0)
    n = 100_000
    x1 = rng.random((n, 16), np.float32)
    j = np.arange(n * 16).reshape(n, 16)
    x1 = np.where((j % 64) < 16, x1 * np.float32(1e-12), x1)
    x2 = rng.random((n, 16), np.float32)
    left = rng.random((4, 4, 4), np.float32)
    right = rng.random((4, 4, 4), np.float32)
    ev = rng.random((4, 4), np.float32)
    eng = PLFEngine(PLFConfig())
    out = eng.plf(x1, x2, left, right, ev)
    ok, nerr, _ = eng.verify(out, x1, x2, left, right, ev)
    check("engine 1e5-site underflow round-trip", ok, f"errors={nerr}")

    # 2. fuzz sweep on hardware (exact bar; inputs away from subnormals)
    for seed in range(6):
        r = np.random.default_rng(2000 + seed)
        S = int(r.choice([4, 4, 20]))
        C = int(r.choice([2, 4]))
        ns = int(r.integers(100, 3000))
        a1 = r.random((ns, C * S), dtype=np.float32)
        a2 = r.random((ns, C * S), dtype=np.float32)
        under = r.random(ns) < 0.3
        a1[under] *= np.float32(1e-12)
        a2[under] *= np.float32(1e-12)
        lf = r.random((C, S, S), dtype=np.float32)
        rt = r.random((C, S, S), dtype=np.float32)
        e = r.random((S, S), dtype=np.float32)
        w = r.integers(1, 5, size=ns).astype(np.int32)
        g3, gsv, ginc = plf_reference(a1, a2, lf, rt, e, w, states=S,
                                      categories=C)
        v3, vsv, vinc = plf_pallas(a1, a2, lf, rt, e, w, states=S,
                                   categories=C, block_sites=512,
                                   interpret=not on_tpu)
        v3 = np.asarray(v3)
        exact = (v3 == np.asarray(g3)).all() if on_tpu else \
            (np.abs(v3.view(np.int32).astype(np.int64)
                    - g3.view(np.int32).astype(np.int64)).max() <= 4)
        check(f"fuzz seed={seed} S={S} C={C} n={ns}",
              bool(exact
                   and (np.asarray(vsv).astype(np.uint8) == gsv).all()
                   and int(vinc) == ginc))

    # 3. AIE fixture vectors (BASELINE acceptance: exact CLV match on
    #    aie/data semantics)
    try:
        from plf_tpu.io import fixtures
        if fixtures.reference_fixtures_available():
            fx = fixtures.load_window_vectors()
            g3, gsv, ginc = plf_reference(fx.x1, fx.x2, fx.left, fx.right,
                                          fx.ev)
            v3, vsv, vinc = plf_pallas(
                fx.x1, fx.x2, fx.left, fx.right, fx.ev,
                np.ones(fx.n_sites, np.int32),
                block_sites=512, interpret=not on_tpu)
            check("aie/data fixture vectors",
                  bool((np.asarray(v3) == g3).all() if on_tpu
                       else np.allclose(np.asarray(v3), g3, rtol=1e-6)))
        else:
            print("[skip] aie/data fixtures not present", flush=True)
    except Exception as exc:  # fixture loader API drift
        check("aie/data fixture vectors", False, f"{type(exc).__name__}")

    # 4. fused whole-tree kernel vs node-by-node traversal (same device)
    from plf_tpu.config import PLFConfig as _Cfg
    from plf_tpu.models import PhyloModel, hky85, random_tree
    tree = random_tree(12, seed=5, mean_branch=0.2)
    tips = np.random.default_rng(5).integers(0, 4, size=(12, 5000))
    cfg = _Cfg(block_sites=1024)
    pm = PhyloModel(tree, hky85(2.0), tips, alpha=0.5, config=cfg)
    llf = pm.log_likelihood(method="fused")
    lln = pm.log_likelihood(method="per-node")
    check("fused tree == per-node traversal",
          bool(np.isclose(llf.log_likelihood, lln.log_likelihood,
                          rtol=1e-9)
               and llf.scaler_total == lln.scaler_total),
          f"ll={llf.log_likelihood:.6f}")

    # 5. codon mxu vs XLA backend
    from plf_tpu.config import Backend
    from plf_tpu.models import codon_gy94
    ctree = random_tree(4, seed=67, mean_branch=0.2)
    cm = codon_gy94(kappa=1.5, omega=0.5)
    ctips = np.random.default_rng(67).integers(0, 61, size=(4, 2048))
    ll_x = PhyloModel(ctree, cm, ctips, config=_Cfg(
        states=61, block_sites=512, backend=Backend.XLA)
        ).log_likelihood().log_likelihood
    ll_p = PhyloModel(ctree, cm, ctips, config=_Cfg(
        states=61, block_sites=512, kernel_variant="mxu")
        ).log_likelihood(method="fused").log_likelihood
    check("codon 61-state mxu vs xla",
          bool(abs(ll_x - ll_p) < 1e-5 * abs(ll_x)),
          f"xla={ll_x:.4f} mxu={ll_p:.4f}")

    if FAILURES:
        print(f"FAILED: {FAILURES}", flush=True)
        sys.exit(1)
    print("ALL HARDWARE CHECKS PASSED", flush=True)


if __name__ == "__main__":
    main()
