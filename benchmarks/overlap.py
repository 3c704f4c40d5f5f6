"""Prove the StreamingExecutor's host<->device overlap.

The reference distinguishes "intermediate" vs "roundtrip" timing modes
precisely to show that call k+1's PCIe writes overlap call k's compute
(host_mem.cpp:287-378).  The TPU equivalent here: run the SAME call
stream through the executor with inflight=1 (strictly serial: upload ->
compute -> drain per call) and inflight>=2 (refill-before-drain), and
compare wall time.  Overlap is proven when pipelined wall time is
measurably below serial — through the axon tunnel the absolute times are
transfer-dominated, but the RATIO isolates the overlap.

Also prints the per-phase hm/msm/mh table (utils/timing.py) for both
modes, mirroring timing.h:107-151.

Run on TPU:  python benchmarks/overlap.py [--sites 1048576] [--calls 8]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run_mode(inflight, calls_data, cfg, timing_mode="pipelined"):
    from plf_tpu.runtime.executor import StreamingExecutor
    ex = StreamingExecutor(cfg, inflight=inflight,
                           timing_mode=timing_mode)
    # warm up the kernel compile outside the timed region
    next(iter(ex.run([calls_data[0]])))
    ex.timing = type(ex.timing)()
    t0 = time.perf_counter()
    inc = 0
    for _x3, i in ex.run(iter(calls_data)):
        inc += i
    wall = time.perf_counter() - t0
    return wall, inc, ex.timing


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sites", type=int, default=1 << 20)
    ap.add_argument("--calls", type=int, default=8)
    args = ap.parse_args()

    import jax
    from plf_tpu.config import PLFConfig
    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    cfg = PLFConfig(block_sites=4096 if jax.default_backend() == "tpu"
                    else 128)
    n = args.sites if jax.default_backend() == "tpu" else 1024
    rng = np.random.default_rng(0)
    calls_data = []
    for k in range(args.calls):
        x1 = rng.random((n, 16), np.float32)
        x2 = rng.random((n, 16), np.float32)
        left = rng.random((4, 4, 4), np.float32)
        right = rng.random((4, 4, 4), np.float32)
        ev = rng.random((4, 4), np.float32)
        calls_data.append((x1, x2, left, right, ev, None))

    from plf_tpu.utils.timing import format_timing_table
    serial, inc1, t1 = run_mode(1, calls_data, cfg)
    piped, inc2, t2 = run_mode(2, calls_data, cfg)
    assert inc1 == inc2, (inc1, inc2)
    print(f"serial (inflight=1): {serial*1e3:8.1f} ms")
    print(format_timing_table(t1, 3 * 64 * n, n), file=sys.stderr)
    print(f"piped  (inflight=2): {piped*1e3:8.1f} ms")
    print(format_timing_table(t2, 3 * 64 * n, n), file=sys.stderr)
    overlap = 1.0 - piped / serial
    print(f"overlap win: {overlap*100:.1f}% "
          f"({'OVERLAPPED' if overlap > 0.05 else 'no overlap'})")

    # Fenced mode: accurate per-phase attribution (each phase's device
    # work completes before its timestamp — executor.py timing_mode).
    # Validate msm against an independent slope-protocol kernel time.
    fwall, inc3, t3 = run_mode(1, calls_data, cfg, timing_mode="fenced")
    assert inc3 == inc1, (inc3, inc1)
    print(f"fenced (inflight=1): {fwall*1e3:8.1f} ms  [phase table below]")
    print(format_timing_table(t3, 3 * 64 * n, n), file=sys.stderr)
    if jax.default_backend() == "tpu":
        import time as _time
        import jax.numpy as jnp
        from plf_tpu.ops import layout as L
        from plf_tpu.ops.plf_pallas import plf_pallas_lane_major
        x1, x2, left, right, ev, _ = calls_data[0]
        x1l = jnp.asarray(L.pad_to_multiple(
            L.to_lane_major(np.asarray(x1, np.float32)), cfg.block_sites))
        x2l = jnp.asarray(L.pad_to_multiple(
            L.to_lane_major(np.asarray(x2, np.float32)), cfg.block_sites))
        lc = jnp.asarray(L.branch_to_lane_constants(left))
        rc = jnp.asarray(L.branch_to_lane_constants(right))
        ec = jnp.asarray(L.ev_to_lane_constants(ev))

        def once():
            x3, sc = plf_pallas_lane_major(
                x1l, x2l, lc, rc, ec, jnp.int32(n),
                block_sites=cfg.block_sites)
            return float(np.asarray(jnp.sum(sc)))
        once()
        reps = 6
        t0 = _time.perf_counter()
        for _ in range(reps):
            once()
        per = (_time.perf_counter() - t0) / reps * 1e3
        msm = t3.msm() / max(t3.num_calls, 1)
        print(f"fenced msm {msm:.2f} ms vs standalone kernel {per:.2f} ms "
              f"(ratio {msm/max(per,1e-9):.2f}; ~1 expected: the fenced "
              f"msm phase is the kernel + its scalar fence round-trip)")
    return overlap


if __name__ == "__main__":
    main()
