"""Kernel-variants lab: measure op-count reductions for the fused PLF.

Run on real TPU (one process — the axon tunnel holds a single lease):

    python benchmarks/lab_kernels.py [--sites 16777216]

Variants (all same semantics as ops/plf_pallas._plf_kernel):
  base     — current production VPU kernel (tile via concat, where-select)
  selfac   — rescale via selected FACTOR: x3 * where(mask, 2^32, 1).
             Exact (2^32 multiply is an exponent shift; *1.0 identity);
             replaces a (rows,BS) select+mul pair with a (1,BS) select
             and one (rows,BS) mul.
  repeat   — row tiling via pltpu.repeat instead of jnp.concatenate
  quarter  — per-k accumulation on (C,BS) quarter-rows, one concat at end
  mxu      — block-matmul form (reference point)

Also probes whether Mosaic contracts a*b+c into FMA (bitwise test): if it
does NOT, the kernel's mul/add pairs are separate-rounded ops and the
measured rate is the true VPU op floor.
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, flush=True)


def make_kernels():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from plf_tpu.reference import MIN_LIKELIHOOD, TWO_TO_THE_32

    S, C = 4, 4
    rows = S * C

    def tile_cat(x, copies):
        return jnp.concatenate([x] * copies, axis=0)

    def tile_rep(x, copies):
        return pltpu.repeat(x, copies, axis=0)

    def stages_tiled(x1, x2, lc, rc, ec, tile):
        ump1 = tile(x1[0:C, :], S) * lc[:, 0:1]
        ump2 = tile(x2[0:C, :], S) * rc[:, 0:1]
        for a in range(1, S):
            ump1 = ump1 + tile(x1[a*C:(a+1)*C, :], S) * lc[:, a:a+1]
            ump2 = ump2 + tile(x2[a*C:(a+1)*C, :], S) * rc[:, a:a+1]
        p = ump1 * ump2
        x3 = tile(p[0:C, :], S) * ec[:, 0:1]
        for k in range(1, S):
            x3 = x3 + tile(p[k*C:(k+1)*C, :], S) * ec[:, k:k+1]
        return x3

    def stages_quarter(x1, x2, lc, rc, ec):
        # per-k accumulation on (C, BS) slices; single concat at the end
        umps = []
        for k in range(S):
            u1 = x1[0:C, :] * lc[k*C:(k+1)*C, 0:1]
            u2 = x2[0:C, :] * rc[k*C:(k+1)*C, 0:1]
            for a in range(1, S):
                u1 = u1 + x1[a*C:(a+1)*C, :] * lc[k*C:(k+1)*C, a:a+1]
                u2 = u2 + x2[a*C:(a+1)*C, :] * rc[k*C:(k+1)*C, a:a+1]
            umps.append(u1 * u2)
        x3s = []
        for a in range(S):
            v = umps[0] * ec[a*C:(a+1)*C, 0:1]
            for k in range(1, S):
                v = v + umps[k] * ec[a*C:(a+1)*C, k:k+1]
            x3s.append(v)
        return jnp.concatenate(x3s, axis=0)

    def finish_where(x3, n_ref, BS, x3_ref, sc_ref):
        mask = (jnp.max(jnp.abs(x3), axis=0, keepdims=True)
                < MIN_LIKELIHOOD)
        site0 = pl.program_id(0) * BS
        idx = site0 + jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)
        mask = jnp.logical_and(mask, idx < n_ref[0])
        x3_ref[...] = jnp.where(mask, x3 * TWO_TO_THE_32, x3)
        sc_ref[...] = mask.astype(jnp.int32)

    def finish_selfac(x3, n_ref, BS, x3_ref, sc_ref):
        mask = (jnp.max(jnp.abs(x3), axis=0, keepdims=True)
                < MIN_LIKELIHOOD)
        site0 = pl.program_id(0) * BS
        idx = site0 + jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)
        mask = jnp.logical_and(mask, idx < n_ref[0])
        fac = jnp.where(mask, jnp.float32(TWO_TO_THE_32), jnp.float32(1.0))
        x3_ref[...] = x3 * fac
        sc_ref[...] = mask.astype(jnp.int32)

    def make(variant, BS):
        def kern(n_ref, x1_ref, x2_ref, lc_ref, rc_ref, ec_ref,
                 x3_ref, sc_ref):
            x1 = x1_ref[...]
            x2 = x2_ref[...]
            lc, rc, ec = lc_ref, rc_ref, ec_ref
            if variant == "base":
                x3 = stages_tiled(x1, x2, lc, rc, ec, tile_cat)
                finish_where(x3, n_ref, BS, x3_ref, sc_ref)
            elif variant == "selfac":
                x3 = stages_tiled(x1, x2, lc, rc, ec, tile_cat)
                finish_selfac(x3, n_ref, BS, x3_ref, sc_ref)
            elif variant == "repeat":
                x3 = stages_tiled(x1, x2, lc, rc, ec, tile_rep)
                finish_selfac(x3, n_ref, BS, x3_ref, sc_ref)
            elif variant == "quarter":
                x3 = stages_quarter(x1, x2, lc, rc, ec)
                finish_selfac(x3, n_ref, BS, x3_ref, sc_ref)
            else:
                raise ValueError(variant)
        return kern

    @functools.partial(jax.jit, static_argnames=("variant", "block"))
    def plf_var(x1, x2, lc, rc, ec, n, variant="base", block=16384):
        n_pad = x1.shape[-1]
        grid = (n_pad // block,)
        n_arr = jnp.asarray(n, jnp.int32).reshape((1,))
        blockspec = pl.BlockSpec((rows, block), lambda i, n: (0, i),
                                 memory_space=pltpu.VMEM)
        const = pl.BlockSpec((rows, S), lambda i, n: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            make(variant, block),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid,
                in_specs=[blockspec, blockspec, const, const, const],
                out_specs=[blockspec,
                           pl.BlockSpec((1, block), lambda i, n: (0, i),
                                        memory_space=pltpu.VMEM)],
            ),
            out_shape=[jax.ShapeDtypeStruct((rows, n_pad), jnp.float32),
                       jax.ShapeDtypeStruct((1, n_pad), jnp.int32)],
        )(n_arr, x1, x2, lc, rc, ec)

    return plf_var


def fma_probe():
    """Bitwise: does Mosaic contract a*b+c?  Prints verdict."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(a_ref, b_ref, c_ref, o_ref):
        o_ref[...] = a_ref[...] * b_ref[...] + c_ref[...]

    rng = np.random.default_rng(0)
    a = rng.random((8, 256), dtype=np.float32) * 3.0 + 1.0
    b = rng.random((8, 256), dtype=np.float32) * 3.0 + 1.0
    c = rng.random((8, 256), dtype=np.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
    )(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    sep = (a * b) + c                       # numpy separate rounding
    fma = np.float32(np.fma(a.astype(np.float64), b, c)) \
        if hasattr(np, "fma") else None
    got = np.asarray(out)
    exact_sep = (got == sep).all()
    log(f"FMA probe: matches separate-rounding = {exact_sep}"
        + ("" if fma is None else
           f", matches fma = {(got == fma).all()}"))
    return exact_sep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sites", type=int, default=1 << 24)
    ap.add_argument("--blocks", type=int, nargs="*",
                    default=[8192, 16384, 24576, 32768])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from plf_tpu.ops import layout as L
    from plf_tpu.reference import plf_reference

    log(f"backend={jax.default_backend()}")
    plf_var = make_kernels()

    n = args.sites
    rng = np.random.default_rng(0)

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        x1 = jax.random.uniform(k1, (16, n), jnp.float32, 0.01, 1.0)
        x2 = jax.random.uniform(k2, (16, n), jnp.float32, 0.01, 1.0)
        return x1, x2

    x1, x2 = gen(jax.random.key(0))
    left = rng.random((4, 4, 4), dtype=np.float32)
    right = rng.random((4, 4, 4), dtype=np.float32)
    ev = rng.random((4, 4), dtype=np.float32)
    lc = jnp.asarray(L.branch_to_lane_constants(left))
    rc = jnp.asarray(L.branch_to_lane_constants(right))
    ec = jnp.asarray(L.ev_to_lane_constants(ev))
    nn = jnp.int32(n)

    fma_probe()

    # correctness gate on a small prefix (vs golden, incl. underflow sites)
    ns = 4096
    x1s = np.asarray(x1[:, :ns]).copy()
    x1s[:, 1::7] *= np.float32(1e-22)
    x2s = np.asarray(x2[:, :ns]).copy()
    x2s[:, 1::7] *= np.float32(1e-22)
    g3, gsv, _ = plf_reference(
        L.from_lane_major(x1s, 4, 4), L.from_lane_major(x2s, 4, 4),
        left, right, ev)
    g3l = L.to_lane_major(g3, 4, 4)
    for v in ("base", "selfac", "repeat", "quarter"):
        try:
            o3, sc = plf_var(jnp.asarray(x1s), jnp.asarray(x2s),
                             lc, rc, ec, jnp.int32(ns),
                             variant=v, block=1024)
            o3 = np.asarray(o3)
            ok = (o3 == g3l).all() and (
                np.asarray(sc)[0] == gsv).all()
            log(f"variant {v:8s}: exact={ok}"
                + ("" if ok else
                   f"  maxdiff={np.abs(o3-g3l).max():.3e} "
                   f"nmismatch={(o3 != g3l).sum()}"))
        except Exception as e:
            log(f"variant {v:8s}: FAILED {type(e).__name__}: {e}")

    # slope-timing (fixed tunnel overhead cancels between K=2 and K=10)
    def timed(variant, block, K, reps=3):
        @jax.jit
        def f(x1, x2, lc, rc, ec, nn):
            def body(carry, _):
                a, acc = carry
                x3, sc = plf_var(a, x2, lc, rc, ec, nn,
                                 variant=variant, block=block)
                return (x3, acc + jnp.sum(sc)), ()
            (o, acc), _ = jax.lax.scan(body, (x1, jnp.int32(0)), None,
                                       length=K)
            return jnp.sum(o[:, :8]) + acc.astype(jnp.float32)
        float(np.asarray(f(x1, x2, lc, rc, ec, nn)))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(x1, x2, lc, rc, ec, nn)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    for v in ("base", "selfac", "repeat", "quarter"):
        for blk in args.blocks:
            try:
                t2, t10 = timed(v, blk, 2), timed(v, blk, 10)
                per = max((t10 - t2) / 8, 1e-9)
                log(f"{v:8s} block={blk:6d}: {n/per/1e9:7.3f} Gsites/s "
                    f"({per*1e3:.2f} ms/call)")
            except Exception as e:
                log(f"{v:8s} block={blk:6d}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
