"""Round-3 protein/codon MXU-precision tuning — one process, one lease.

The S>=20 kernel is MXU-COMPUTE-bound (r02: S=61 ~30 TFLOP/s fp32 =
HIGHEST's 6 bf16 passes; S=20 at 79% of the HBM ceiling).  This run
measures the reduced-pass variants (mxu_3x = bf16x3, mxu_bf16 = 1 pass
with fp32 accumulation) for throughput AND accuracy drift vs the
bit-exact VPU form, mirroring the reference's own kernel-precision
ladder (aie/src/128x1PLFwindow2in/kernels/combine_and_mac_EV.cpp:8,45,78).

Appends to benchmarks/results/r03_protein.csv.
Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/protein_tune3.py
"""
import csv
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "results",
                   "r03_protein.csv")

print("devices:", jax.devices(), flush=True)

# (states, variant, block, dtype, n_sites)
MATRIX = [
    # S=20 protein: precision ladder at the r02-best block + block sweep
    (20, "mxu", 4096, "float32", 1 << 21),        # r02 control
    (20, "mxu_3x", 4096, "float32", 1 << 21),
    (20, "mxu_bf16", 4096, "float32", 1 << 21),
    (20, "mxu_bf16", 2048, "float32", 1 << 21),
    (20, "mxu_bf16", 8192, "float32", 1 << 21),
    (20, "mxu", 8192, "float32", 1 << 21),        # roofline push
    (20, "mxu_3x", 8192, "float32", 1 << 21),
    (20, "mxu_bf16", 4096, "bfloat16", 1 << 21),  # + bf16 CLV storage
    # codon S=61: compute-bound, precision ladder is the whole game
    (61, "mxu", 1024, "float32", 1 << 20),        # r02 control
    (61, "mxu_3x", 1024, "float32", 1 << 20),
    (61, "mxu_bf16", 1024, "float32", 1 << 20),
    (61, "mxu_bf16", 2048, "float32", 1 << 20),
    (61, "mxu_3x", 2048, "float32", 1 << 20),
    (61, "mxu_bf16", 1024, "bfloat16", 1 << 20),
]


def accuracy_vs_vpu(S, variant, block, n=1 << 16, C=4):
    """Max |rel err| of the variant vs the exact form on device, plus
    exact scaler-count agreement, on underflow-exercising inputs.

    Runs at a fixed small block (1024) regardless of the perf block —
    the probe measures arithmetic, not layout.  Reference: the
    bit-exact VPU form for S<=20; for S=61 the VPU unroll does not
    compile (Mosaic scoped-vmem), so the reference is the MXU HIGHEST
    form (<=1 ULP vs scalar, hardware-verified in hw_verify's codon
    check)."""
    block = 1024
    ref_variant = "vpu" if S <= 20 else "mxu"
    from plf_tpu.ops import layout as L
    from plf_tpu.ops.plf_pallas import plf_pallas_lane_major
    rng = np.random.default_rng(5)
    e = S * C
    x1 = rng.random((n, e), dtype=np.float32)
    j = np.arange(n * e).reshape(n, e)
    x1 = np.where((j % (4 * e)) < e, x1 * np.float32(1e-12), x1)
    x2 = rng.random((n, e), dtype=np.float32)
    left = rng.random((C, S, S), dtype=np.float32)
    right = rng.random((C, S, S), dtype=np.float32)
    ev = rng.random((S, S), dtype=np.float32)
    x1l = jnp.asarray(L.pad_to_multiple(L.to_lane_major(x1, S, C), block))
    x2l = jnp.asarray(L.pad_to_multiple(L.to_lane_major(x2, S, C), block))
    nn = jnp.int32(n)

    def run(var):
        if var.startswith("mxu"):
            lc = L.branch_to_block_matrix(left, S, C)
            rc = L.branch_to_block_matrix(right, S, C)
            ec = L.ev_to_block_matrix(ev, S, C)
        else:
            lc = L.branch_to_lane_constants(left, S, C)
            rc = L.branch_to_lane_constants(right, S, C)
            ec = L.ev_to_lane_constants(ev, S, C)
        x3, sc = plf_pallas_lane_major(
            x1l, x2l, jnp.asarray(lc), jnp.asarray(rc), jnp.asarray(ec),
            nn, states=S, categories=C, block_sites=block,
            interpret=jax.default_backend() != "tpu", variant=var)
        return np.asarray(x3[:, :n], np.float64), int(np.asarray(
            jnp.sum(sc[0, :n])))

    ref, sc_ref = run(ref_variant)
    got, sc_got = run(variant)
    denom = np.maximum(np.abs(ref), 1e-30)
    relerr = float(np.max(np.abs(got - ref) / denom))
    return relerr, sc_got == sc_ref


rows = []
for S, variant, block, dtype, n in MATRIX:
    try:
        sps = bench.bench_fused(n_sites=n, block=block, states=S,
                                categories=4, variant=variant,
                                dtype=dtype)
    except Exception as exc:
        print(f"S={S} {variant} b={block} {dtype}: FAILED "
              f"{type(exc).__name__}: {str(exc)[:120]}", flush=True)
        rows.append([S, variant, block, dtype, n, "", "", "", "", "fail"])
        continue
    clv_b = 2 if dtype == "bfloat16" else 4
    gbs = sps * (3 * S * 4 * clv_b + 4) / 1e9
    relerr, sc_ok = ("", "")
    if variant != "vpu" and dtype == "float32":
        try:
            relerr, sc_ok = accuracy_vs_vpu(S, variant, block)
            relerr = f"{relerr:.2e}"
        except Exception as exc:
            relerr, sc_ok = f"acc-fail:{type(exc).__name__}", ""
    rows.append([S, variant, block, dtype, n,
                 f"{sps/1e9:.4f}", f"{gbs:.1f}", relerr, sc_ok, "ok"])
    print(f"S={S} {variant} b={block} {dtype}: {sps/1e9:.4f} Gsites/s "
          f"({gbs:.1f} GB/s eff) relerr={relerr} scaler_ok={sc_ok}",
          flush=True)

os.makedirs(os.path.dirname(OUT), exist_ok=True)
new = not os.path.exists(OUT)
with open(OUT, "a", newline="") as f:
    w = csv.writer(f)
    if new:
        w.writerow(["states", "variant", "block", "dtype", "n_sites",
                    "gsites_per_s", "gbs_eff", "max_rel_err",
                    "scaler_exact", "status"])
    w.writerows(rows)
print(f"wrote {OUT}")
