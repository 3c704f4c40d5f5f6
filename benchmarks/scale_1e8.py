"""1e8-site scale test — the top of the reference's ALIGNMENT_SITES sweep.

The reference benchmarks up to 1e9 sites by streaming windows from host
RAM through PCIe (Makefile:16; its own README names PCIe the bottleneck,
README.md:204).  On TPU there are two regimes:

  A. device-resident: 1e8 sites of fp32 CLVs fit v5e HBM outright
     (2 x 6.4 GB children + donated output), so the production tree
     traversal shape runs at full kernel speed with NO host streaming —
     the structural fix for the reference's bottleneck.
  B. host-streaming (StreamingExecutor.run_chunked): for CLVs larger
     than HBM or originating on the host each call.  Through the axon
     tunnel this path is transfer-bound at ~0.3 GB/s (a real PCIe host
     does ~50 GB/s); the number recorded here demonstrates capability,
     not speed-of-light.

Run on TPU:  python benchmarks/scale_1e8.py [--sites 100007936]
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, flush=True)


def device_resident(n_sites, block=16384):
    import jax
    import jax.numpy as jnp
    from plf_tpu.ops import layout as L
    from plf_tpu.ops.plf_pallas import plf_pallas_lane_major

    n_pad = ((n_sites + block - 1) // block) * block
    rng = np.random.default_rng(0)

    lc = jnp.asarray(L.branch_to_lane_constants(
        rng.random((4, 4, 4), np.float32)))
    rc = jnp.asarray(L.branch_to_lane_constants(
        rng.random((4, 4, 4), np.float32)))
    ec = jnp.asarray(L.ev_to_lane_constants(rng.random((4, 4), np.float32)))
    nn = jnp.int32(n_sites)
    kernel = functools.partial(plf_pallas_lane_major, block_sites=block,
                               donate=1)

    # CLVs are generated INSIDE the timed jit: passing 6 GB arrays as jit
    # arguments defeats the in-place aliasing (XLA must copy a
    # non-donated argument before the kernel may overwrite it, which
    # doubles HBM and OOMs at 1e8 sites).  The gen cost is K-independent
    # and cancels in the slope.
    def chained(K):
        @jax.jit
        def f(key):
            k1, k2 = jax.random.split(key)
            x1 = jax.random.uniform(k1, (16, n_pad), jnp.float32, 0.01, 1.0)
            x2 = jax.random.uniform(k2, (16, n_pad), jnp.float32, 0.01, 1.0)
            def body(carry, _):
                a, acc = carry
                x3, sc = kernel(a, x2, lc, rc, ec, nn)
                return (x3, acc + jnp.sum(sc)), ()
            (o, acc), _ = jax.lax.scan(body, (x1, jnp.int32(0)), None,
                                       length=K)
            return jnp.sum(o[:, :8]) + acc.astype(jnp.float32)
        return f

    key = jax.random.key(0)

    def timed(K, reps=3):
        f = chained(K)
        float(np.asarray(f(key)))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(key)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    per = max((timed(4) - timed(2)) / 2, 1e-9)
    sps = n_sites / per
    log(f"A. device-resident {n_sites} sites: {per*1e3:.1f} ms/call "
        f"-> {sps/1e9:.3f} Gsites/s "
        f"({sps*196/1e9:.0f} GB/s effective)")
    return sps


def host_streaming(n_sites, chunk=1 << 20):
    from plf_tpu.config import PLFConfig
    from plf_tpu.runtime.executor import StreamingExecutor

    rng = np.random.default_rng(1)
    log(f"B. host-streaming run_chunked: generating {n_sites} sites "
        f"({n_sites*128/2**30:.1f} GiB host inputs)...")
    x1 = rng.random((n_sites, 16), dtype=np.float32)
    x2 = rng.random((n_sites, 16), dtype=np.float32)
    x1[::97] *= np.float32(1e-9)   # sprinkle rescale work
    x2[::97] *= np.float32(1e-9)
    left = rng.random((4, 4, 4), np.float32)
    right = rng.random((4, 4, 4), np.float32)
    ev = rng.random((4, 4), np.float32)

    ex = StreamingExecutor(PLFConfig(block_sites=16384), inflight=2)
    t0 = time.perf_counter()
    x3, inc = ex.run_chunked(x1, x2, left, right, ev, chunk_sites=chunk)
    wall = time.perf_counter() - t0
    sps = n_sites / wall
    log(f"B. host-streaming {n_sites} sites ({n_sites // chunk} chunks): "
        f"{wall:.1f} s -> {sps/1e6:.1f} Msites/s "
        f"(scaler_increment={inc}; tunnel-bound — see module docstring)")
    return sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sites", type=int, default=100_007_936)
    ap.add_argument("--stream-sites", type=int, default=1 << 22)
    args = ap.parse_args()
    import jax
    log(f"backend={jax.default_backend()}")
    if jax.default_backend() != "tpu":
        args.sites = 1 << 16
        args.stream_sites = 1 << 14
    device_resident(args.sites)
    host_streaming(args.stream_sites)


if __name__ == "__main__":
    main()
