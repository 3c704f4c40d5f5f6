"""Protein/codon/bf16 kernel tuning matrix — one process, one lease.

Covers the round-2 ROADMAP rows: S=20 and S=61 block/layout tuning with
the chunked+donated kernel, and the bf16 CLV-storage mode end-to-end
(halves HBM bytes/site; arithmetic stays fp32 inside the kernel).
Appends rows to benchmarks/results/r02_protein.csv.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/protein_tune.py
"""
import csv
import os
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402

import bench  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "results",
                   "r02_protein.csv")

print("devices:", jax.devices(), flush=True)

# (states, variant, block, dtype, n_sites)
MATRIX = [
    # bf16 CLV storage end-to-end at the DNA headline shape
    (4, "vpu", 16384, "bfloat16", 1 << 24),
    (4, "vpu", 16384, "float32", 1 << 24),   # control, same day
    # protein S=20: the mxu (block-matmul) form won round 2 at block 2048;
    # tune block x dtype
    (20, "mxu", 1024, "float32", 1 << 21),
    (20, "mxu", 2048, "float32", 1 << 21),
    (20, "mxu", 4096, "float32", 1 << 21),
    (20, "mxu", 2048, "bfloat16", 1 << 21),
    (20, "mxu", 4096, "bfloat16", 1 << 21),
    (20, "vpu", 2048, "float32", 1 << 21),   # layout control
    # codon S=61
    (61, "mxu", 512, "float32", 1 << 20),
    (61, "mxu", 1024, "float32", 1 << 20),
    (61, "mxu", 1024, "bfloat16", 1 << 20),
    (61, "mxu", 2048, "bfloat16", 1 << 20),
]

rows = []
for S, variant, block, dtype, n in MATRIX:
    try:
        sps = bench.bench_fused(n_sites=n, block=block, states=S,
                                categories=4, variant=variant,
                                dtype=dtype)
    except Exception as exc:  # OOM/VMEM: record and continue
        print(f"S={S} {variant} b={block} {dtype}: FAILED "
              f"{type(exc).__name__}: {str(exc)[:120]}", flush=True)
        rows.append([S, variant, block, dtype, n, "", "", "fail"])
        continue
    clv_b = 2 if dtype == "bfloat16" else 4
    gbs = sps * (3 * S * 4 * clv_b + 4) / 1e9
    rows.append([S, variant, block, dtype, n,
                 f"{sps/1e9:.4f}", f"{gbs:.1f}", "ok"])
    print(f"S={S} {variant} b={block} {dtype}: {sps/1e9:.3f} Gsites/s "
          f"({gbs:.0f} GB/s eff)", flush=True)

with open(OUT, "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["states", "variant", "block", "dtype", "n_sites",
                "gsites_per_s", "gbs_effective", "status"])
    w.writerows(rows)
print(f"wrote {OUT}", flush=True)
