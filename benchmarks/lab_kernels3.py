"""Kernel lab, round 3: memory-pipeline structure of the fused PLF.

lab2 found: pure-copy pallas probe = 380 GB/s but chunk2048 PLF = 489
GB/s — the grid pipeline's DMA pattern, not compute, is the wall.  These
probes map the machine's real ceilings:

  xla_add    — jnp a+b at 16M x 16 fp32: XLA's own fused-loop bandwidth
               (2 reads + 1 write), the practical HBM ceiling.
  xla_scan   — same inside the bench's lax.scan chain protocol.
  copy_nosc  — pallas copy WITHOUT the (1, BS) int32 scaler output.
  chunkN/BS  — PLF chunked kernels across block sizes (chunking keeps
               kernel temporaries small so bigger blocks fit VMEM).
  chunkN+i8  — scaler output as int8 instead of int32.
  chunkN+al  — x1 buffer donated to x3 (input_output_aliases).

Run on real TPU:  python benchmarks/lab_kernels3.py
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, flush=True)


def timed_call(f, reps=3):
    f()
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sites", type=int, default=1 << 24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from plf_tpu.ops import layout as L
    from plf_tpu.reference import MIN_LIKELIHOOD, TWO_TO_THE_32

    log(f"backend={jax.default_backend()}")
    S, C = 4, 4
    rows = 16
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
    GB = 16 * n * 4 / 1e9

    # ---- XLA ceiling probes -------------------------------------------
    def slope(make_f, k_pair=(2, 10)):
        ts = []
        for K in k_pair:
            f = make_f(K)
            ts.append(timed_call(lambda: float(np.asarray(f(x1, x2)))))
        return max((ts[1] - ts[0]) / (k_pair[1] - k_pair[0]), 1e-9)

    def xla_add(K):
        @jax.jit
        def f(a, b):
            def body(carry, _):
                return carry + b, ()
            o, _ = jax.lax.scan(body, a, None, length=K)
            return jnp.sum(o[:, :8])
        return f

    per = slope(xla_add)
    log(f"xla_add   : {3*GB/per:7.1f} GB/s ({per*1e3:.2f} ms/call) "
        f"[{n/per/1e9:.3f} Gsites/s equiv]")

    # ---- pallas variants ----------------------------------------------
    def tile(x, copies):
        return jnp.concatenate([x] * copies, axis=0)

    def vpu_stages(x1, x2, lcr, rcr, ecr):
        ump1 = tile(x1[0:C, :], S) * lcr[:, 0:1]
        ump2 = tile(x2[0:C, :], S) * rcr[:, 0:1]
        for a in range(1, S):
            ump1 = ump1 + tile(x1[a*C:(a+1)*C, :], S) * lcr[:, a:a+1]
            ump2 = ump2 + tile(x2[a*C:(a+1)*C, :], S) * rcr[:, a:a+1]
        p = ump1 * ump2
        x3 = tile(p[0:C, :], S) * ecr[:, 0:1]
        for k in range(1, S):
            x3 = x3 + tile(p[k*C:(k+1)*C, :], S) * ecr[:, k:k+1]
        return x3

    def make_kern(BS, ch, sc_dtype, with_sc):
        def kern(n_ref, x1_ref, x2_ref, lc_ref, rc_ref, ec_ref,
                 x3_ref, *rest):
            site0 = pl.program_id(0) * BS
            if ch == 0:   # plain copy
                x3_ref[...] = x1_ref[...] + x2_ref[...]
                if with_sc:
                    idx = site0 + jax.lax.broadcasted_iota(
                        jnp.int32, (1, BS), 1)
                    rest[0][...] = (idx < n_ref[0]).astype(sc_dtype)
                return
            for j in range(BS // ch):
                o = j * ch
                xx1 = x1_ref[:, pl.ds(o, ch)]
                xx2 = x2_ref[:, pl.ds(o, ch)]
                x3 = vpu_stages(xx1, xx2, lc_ref, rc_ref, ec_ref)
                idx = (site0 + o + jax.lax.broadcasted_iota(
                    jnp.int32, (1, ch), 1))
                mask = jnp.logical_and(
                    jnp.max(jnp.abs(x3), axis=0, keepdims=True)
                    < MIN_LIKELIHOOD, idx < n_ref[0])
                fac = jnp.where(mask, jnp.float32(TWO_TO_THE_32),
                                jnp.float32(1.0))
                x3_ref[:, pl.ds(o, ch)] = x3 * fac
                if with_sc:
                    rest[0][:, pl.ds(o, ch)] = mask.astype(sc_dtype)
        return kern

    @functools.partial(jax.jit, static_argnames=(
        "block", "ch", "sc", "alias"))
    def plf_v(x1, x2, nn, block=16384, ch=2048, sc="i32", alias=False):
        n_pad = x1.shape[-1]
        grid = (n_pad // block,)
        n_arr = jnp.asarray(nn, jnp.int32).reshape((1,))
        bs = pl.BlockSpec((rows, block), lambda i, n: (0, i),
                          memory_space=pltpu.VMEM)
        const = pl.BlockSpec((rows, S), lambda i, n: (0, 0),
                             memory_space=pltpu.VMEM)
        with_sc = sc != "none"
        sc_dtype = {"i32": jnp.int32, "i8": jnp.int8,
                    "f32": jnp.float32, "none": jnp.int32}[sc]
        out_specs = [bs]
        out_shape = [jax.ShapeDtypeStruct((rows, n_pad), jnp.float32)]
        if with_sc:
            out_specs.append(pl.BlockSpec((1, block), lambda i, n: (0, i),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((1, n_pad), sc_dtype))
        kw = {}
        if alias:
            kw["input_output_aliases"] = {1: 0}  # x1 -> x3 (after scalar)
        out = pl.pallas_call(
            make_kern(block, ch, sc_dtype, with_sc),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid,
                in_specs=[bs, bs, const, const, const],
                out_specs=out_specs),
            out_shape=out_shape,
            **kw,
        )(n_arr, x1, x2, lc, rc, ec)
        return out if with_sc else (out[0], None)

    def slope_v(block, ch, sc="i32", alias=False, k_pair=(2, 10)):
        def make_f(K):
            @jax.jit
            def f(a, b):
                def body(carry, _):
                    o = plf_v(carry, b, nn, block=block, ch=ch, sc=sc,
                              alias=alias)
                    return o[0], ()
                o, _ = jax.lax.scan(body, a, None, length=K)
                return jnp.sum(o[:, :8])
            return f
        return slope(make_f)

    cases = [
        ("copy_sc    ", 16384, 0, "i32", False),
        ("copy_nosc  ", 16384, 0, "none", False),
        ("chunk2048  ", 16384, 2048, "i32", False),
        ("chunk4096  ", 16384, 4096, "i32", False),
        ("chunk8192  ", 16384, 8192, "i32", False),
        ("chunk2048i8", 16384, 2048, "i8", False),
        ("chunk2048ns", 16384, 2048, "none", False),
        ("chunk2048al", 16384, 2048, "i32", True),
        ("c2048/b32k ", 32768, 2048, "i32", False),
        ("c4096/b32k ", 32768, 4096, "i32", False),
        ("c2048/b64k ", 65536, 2048, "i32", False),
        ("c2048/b8k  ", 8192, 2048, "i32", False),
    ]
    for name, blk, ch, sc, alias in cases:
        try:
            per = slope_v(blk, ch, sc=sc, alias=alias)
            log(f"{name}: {n/per/1e9:7.3f} Gsites/s ({per*1e3:.2f} ms, "
                f"{3*GB/per:5.0f} GB/s clv)")
        except Exception as e:
            msg = str(e).split(chr(10))[0][:140]
            log(f"{name}: {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
