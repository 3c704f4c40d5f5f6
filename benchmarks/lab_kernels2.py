"""Kernel lab, round 2: find the wall between 1.85 and ~3.0 Gsites/s.

Round-1 lab result (lab_kernels.py): base/selfac/repeat all time at
~1.85 Gsites/s — shaving whole-block VPU ops does NOT move the needle.
Hypothesis: with block-level (16, 16384) ops every intermediate is a
1 MB VMEM array, so the kernel is bound on VMEM read/write traffic of
intermediates (31 ops x 2 MB/step), not on ALU issue.  These probes
separate the bounds:

  copy2    — x3 = x1 + x2 (+ scaler write): the pure HBM/DMA ceiling for
             the kernel's exact I/O pattern (2 reads + 2 writes).
  chunk<N> — full PLF with an inner unrolled loop over N-lane chunks so
             the whole stage chain stays register-resident per chunk.
  chunkf<N>— same but fori_loop (dynamic) instead of unrolled.
  hybmix   — site-split inside the kernel: first half of the block via
             MXU block-matmuls, second half via the VPU form, to see if
             Mosaic overlaps the two units.
  mxu      — whole block via MXU block-matmuls (reference point).

Run on real TPU:  python benchmarks/lab_kernels2.py
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, flush=True)


def make_lab():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from plf_tpu.reference import MIN_LIKELIHOOD, TWO_TO_THE_32

    S, C = 4, 4
    rows = S * C

    def tile(x, copies):
        return jnp.concatenate([x] * copies, axis=0)

    def vpu_stages(x1, x2, lc, rc, ec):
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

    def mxu_stages(x1, x2, ml, mr, me):
        hi = jax.lax.Precision.HIGHEST
        ump1 = jax.lax.dot(ml, x1, precision=hi,
                           preferred_element_type=jnp.float32)
        ump2 = jax.lax.dot(mr, x2, precision=hi,
                           preferred_element_type=jnp.float32)
        p = ump1 * ump2
        return jax.lax.dot(me, p, precision=hi,
                           preferred_element_type=jnp.float32)

    def finish(x3, valid):
        mask = jnp.logical_and(
            jnp.max(jnp.abs(x3), axis=0, keepdims=True) < MIN_LIKELIHOOD,
            valid)
        fac = jnp.where(mask, jnp.float32(TWO_TO_THE_32), jnp.float32(1.0))
        return x3 * fac, mask.astype(jnp.int32)

    def make(variant, BS):
        def kern(n_ref, x1_ref, x2_ref, lc_ref, rc_ref, ec_ref,
                 ml_ref, mr_ref, me_ref, x3_ref, sc_ref):
            site0 = pl.program_id(0) * BS
            if variant == "copy2":
                x3_ref[...] = x1_ref[...] + x2_ref[...]
                idx = site0 + jax.lax.broadcasted_iota(
                    jnp.int32, (1, BS), 1)
                sc_ref[...] = (idx < n_ref[0]).astype(jnp.int32)
                return
            if variant in ("base", "mxu"):
                x1, x2 = x1_ref[...], x2_ref[...]
                idx = site0 + jax.lax.broadcasted_iota(
                    jnp.int32, (1, BS), 1)
                valid = idx < n_ref[0]
                if variant == "base":
                    x3 = vpu_stages(x1, x2, lc_ref, rc_ref, ec_ref)
                else:
                    x3 = mxu_stages(x1, x2, ml_ref[...], mr_ref[...],
                                    me_ref[...])
                x3, sc = finish(x3, valid)
                x3_ref[...] = x3
                sc_ref[...] = sc
                return
            if variant == "hybmix":
                H = BS // 2
                x1a, x2a = x1_ref[:, :H], x2_ref[:, :H]
                x1b, x2b = x1_ref[:, H:], x2_ref[:, H:]
                x3a = mxu_stages(x1a, x2a, ml_ref[...], mr_ref[...],
                                 me_ref[...])
                x3b = vpu_stages(x1b, x2b, lc_ref, rc_ref, ec_ref)
                idx = site0 + jax.lax.broadcasted_iota(
                    jnp.int32, (1, BS), 1)
                x3a, sca = finish(x3a, idx[:, :H] < n_ref[0])
                x3b, scb = finish(x3b, idx[:, H:] < n_ref[0])
                x3_ref[:, :H] = x3a
                x3_ref[:, H:] = x3b
                sc_ref[:, :H] = sca
                sc_ref[:, H:] = scb
                return
            # chunk variants: register-resident inner tiles
            dyn = variant.startswith("chunkf")
            ch = int(variant[6 if dyn else 5:])
            nch = BS // ch

            def one(j):
                o = j * ch
                x1 = x1_ref[:, pl.ds(o, ch)]
                x2 = x2_ref[:, pl.ds(o, ch)]
                x3 = vpu_stages(x1, x2, lc_ref, rc_ref, ec_ref)
                idx = (site0 + o + jax.lax.broadcasted_iota(
                    jnp.int32, (1, ch), 1))
                x3, sc = finish(x3, idx < n_ref[0])
                x3_ref[:, pl.ds(o, ch)] = x3
                sc_ref[:, pl.ds(o, ch)] = sc

            if dyn:
                def body(j, carry):
                    one(j)
                    return carry
                jax.lax.fori_loop(0, nch, body, 0)
            else:
                for j in range(nch):
                    one(j)
        return kern

    @functools.partial(jax.jit, static_argnames=("variant", "block"))
    def plf_var(x1, x2, lc, rc, ec, ml, mr, me, n, variant="base",
                block=16384):
        n_pad = x1.shape[-1]
        grid = (n_pad // block,)
        n_arr = jnp.asarray(n, jnp.int32).reshape((1,))
        blockspec = pl.BlockSpec((rows, block), lambda i, n: (0, i),
                                 memory_space=pltpu.VMEM)
        const = pl.BlockSpec((rows, S), lambda i, n: (0, 0),
                             memory_space=pltpu.VMEM)
        constm = pl.BlockSpec((rows, rows), lambda i, n: (0, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            make(variant, block),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid,
                in_specs=[blockspec, blockspec, const, const, const,
                          constm, constm, constm],
                out_specs=[blockspec,
                           pl.BlockSpec((1, block), lambda i, n: (0, i),
                                        memory_space=pltpu.VMEM)],
            ),
            out_shape=[jax.ShapeDtypeStruct((rows, n_pad), jnp.float32),
                       jax.ShapeDtypeStruct((1, n_pad), jnp.int32)],
        )(n_arr, x1, x2, lc, rc, ec, ml, mr, me)

    return plf_var


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sites", type=int, default=1 << 24)
    ap.add_argument("--blocks", type=int, nargs="*", default=[16384])
    ap.add_argument("--variants", type=str, nargs="*", default=[
        "copy2", "base", "chunk512", "chunk1024", "chunk2048",
        "chunkf512", "hybmix", "mxu"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from plf_tpu.ops import layout as L
    from plf_tpu.reference import plf_reference

    log(f"backend={jax.default_backend()}")
    plf_var = make_lab()

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
    ml = jnp.asarray(L.branch_to_block_matrix(left))
    mr = jnp.asarray(L.branch_to_block_matrix(right))
    me = jnp.asarray(L.ev_to_block_matrix(ev))
    nn = jnp.int32(n)

    # correctness gate: forced-underflow sites that stay NORMAL-range
    # (1e-8 scales: product ~1e-17 < 2^-32 but >> 1.2e-38, so no
    # subnormal flush-to-zero ambiguity — the round-1 gate's 1e-22
    # scales produced denormals that TPU FTZ flushes).
    ns = 4096
    x1s = np.asarray(x1[:, :ns]).copy()
    x1s[:, 1::7] *= np.float32(1e-8)
    x2s = np.asarray(x2[:, :ns]).copy()
    x2s[:, 1::7] *= np.float32(1e-8)
    g3, gsv, _ = plf_reference(
        L.from_lane_major(x1s, 4, 4), L.from_lane_major(x2s, 4, 4),
        left, right, ev)
    g3l = L.to_lane_major(g3, 4, 4)
    for v in args.variants:
        if v == "copy2":
            continue
        try:
            o3, sc = plf_var(jnp.asarray(x1s), jnp.asarray(x2s),
                             lc, rc, ec, ml, mr, me, jnp.int32(ns),
                             variant=v, block=1024)
            o3 = np.asarray(o3)
            nm = int((o3 != g3l).sum())
            scok = (np.asarray(sc)[0] == gsv).all()
            ulp = np.abs(o3.view(np.int32).astype(np.int64)
                         - g3l.view(np.int32).astype(np.int64)).max()
            log(f"variant {v:10s}: exact={nm == 0 and scok} "
                f"nmismatch={nm} max_ulp={ulp} scaler_ok={scok}")
        except Exception as e:
            log(f"variant {v:10s}: FAILED {type(e).__name__}: {e}")

    def timed(variant, block, K, reps=3):
        @jax.jit
        def f(x1, x2, nn):
            def body(carry, _):
                a, acc = carry
                x3, sc = plf_var(a, x2, lc, rc, ec, ml, mr, me, nn,
                                 variant=variant, block=block)
                return (x3, acc + jnp.sum(sc)), ()
            (o, acc), _ = jax.lax.scan(body, (x1, jnp.int32(0)), None,
                                       length=K)
            return jnp.sum(o[:, :8]) + acc.astype(jnp.float32)
        float(np.asarray(f(x1, x2, nn)))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(x1, x2, nn)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    bytes_per_site = (3 * 16 + 1) * 4
    for v in args.variants:
        for blk in args.blocks:
            try:
                t2, t10 = timed(v, blk, 2), timed(v, blk, 10)
                per = max((t10 - t2) / 8, 1e-9)
                log(f"{v:10s} block={blk:6d}: {n/per/1e9:7.3f} Gsites/s "
                    f"({per*1e3:.2f} ms/call, "
                    f"{n/per*bytes_per_site/1e9:.0f} GB/s)")
            except Exception as e:
                msg = str(e).split(chr(10))[0][:160]
                log(f"{v:10s} block={blk:6d}: {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
