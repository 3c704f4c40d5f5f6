"""Fused Pallas TPU kernel for the Phylogenetic Likelihood Function.

One kernel replaces the reference accelerator's whole per-lane dataflow
diamond — ``mmul_branch(L) || mmul_branch(R) -> combine -> ev`` on four AIE
tiles (aie/src/.../graph_window_PLF.h:26-34) *plus* the PL-side s2mm
scaling unit (hls/src/s2mm_memDNAwindowComb.cpp:71-97).  On TPU the win is
fusion: one HBM read of each child CLV block, all arithmetic in VMEM on the
VPU, one HBM write of the parent CLV and the per-site scaler flags.

Design notes (why this shape):

* The default variant runs on the 8x128 VPU with sites on the lane axis
  (the PLF is ~1.9 fp32 FLOP/byte; naive small matmuls would idle the
  MXU).  An alternative "mxu" variant expresses the stages as
  block-structured (rows, rows) matmuls — measured equal-speed on v5e
  and accurate to 1 ULP rather than bit-exact; "vpu" is the default and
  the exactness anchor (verified 0 mismatches vs the golden model on
  hardware).

* CLV blocks use the canonical lane-major layout ``(S*C, BS)`` with row
  ``r = state*C + cat`` (ops/layout.py).  Each of the three stages then only
  needs (a) a contiguous C-row sublane slice, (b) a sublane-tile (concat of
  S copies), and (c) a multiply by a lane-broadcast (rows,1) column of a
  precomputed constant matrix — no gathers, no transposes in the hot loop:

    stage1:  ump[k*C+c] = sum_a tile_S(x1[a*C : a*C+C]) * Lc[:, a]
    stage2:  p = ump_left * ump_right
    stage3:  x3[a*C+c] = sum_k tile_S(p[k*C : k*C+C]) * Ec[:, k]

  ``Lc``/``Ec`` are built once outside the kernel
  (layout.branch_to_lane_constants — the analogue of the reference PL's
  pre-stream branch transpose, hls/src/transpose.cpp:6-24).

* fp32 accumulation is strictly sequential over the unrolled a/k loops, so
  results are **bit-exact** vs the scalar C reference (the reference's
  correctness bar is exact float equality, app/src/host_mem.cpp:423).

* Underflow rescale is fused: mask = all-over-rows(|x3| < 2^-32), applied
  with a lane select; padding sites beyond ``n`` are excluded exactly like
  s2mm's ``site < alignment_sites`` guard (s2mm_memDNAwindowComb.cpp:79).

* The grid streams site blocks HBM->VMEM with double buffering (Pallas
  default pipelining) — the analogue of the reference's 8 KiB AIE windows,
  with ``block_sites`` playing the role of WINDOW_SIZE (Makefile:33).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..reference import MIN_LIKELIHOOD, TWO_TO_THE_32
from . import layout as L

__all__ = ["plf_pallas", "plf_pallas_lane_major"]


def _tile_rows(x, copies: int):
    """Repeat a (C, BS) block ``copies`` times along sublanes -> (C*copies, BS)."""
    if copies == 1:
        return x
    return jnp.concatenate([x] * copies, axis=0)


# Inner chunk width of the VPU kernel.  A (16, block) op materialises
# every intermediate as a block-sized VMEM array; chunking the block into
# CHUNK-lane tiles keeps the whole stage chain close to the register file
# and lets Mosaic overlap compute with the grid DMAs (measured on v5e:
# 1.85 -> 2.5 Gsites/s from chunking, 3.14 with output donation on top —
# 95% of the chip's measured 637 GB/s HBM ceiling for this 2R+1W pattern).
CHUNK_SITES = 2048


def _plf_kernel(n_ref, x1_ref, x2_ref, lc_ref, rc_ref, ec_ref,
                x3_ref, sc_ref, *, states: int, categories: int,
                block_sites: int):
    S, C = states, categories
    BS = block_sites
    CH = min(CHUNK_SITES, BS)
    site0 = pl.program_id(0) * BS

    for j in range(BS // CH):
        o = j * CH
        # bf16 fast mode: CLVs may be stored bf16 in HBM (half the
        # bandwidth of the exact fp32 mode); arithmetic is always fp32.
        x1 = x1_ref[:, o:o + CH].astype(jnp.float32)
        x2 = x2_ref[:, o:o + CH].astype(jnp.float32)

        # Stage 1: branch products, sequential fp32 accumulation over
        # source state a (matches plf.cpp:35-39 order; 0.0+x == x
        # exactly in IEEE).
        ump1 = _tile_rows(x1[0:C, :], S) * lc_ref[:, 0:1]
        ump2 = _tile_rows(x2[0:C, :], S) * rc_ref[:, 0:1]
        for a in range(1, S):
            ump1 = ump1 + _tile_rows(x1[a * C:(a + 1) * C, :], S) * lc_ref[:, a:a + 1]
            ump2 = ump2 + _tile_rows(x2[a * C:(a + 1) * C, :], S) * rc_ref[:, a:a + 1]

        # Stage 2: element-wise child product (combine.cpp:28-35 analogue).
        p = ump1 * ump2

        # Stage 3: eigenvector projection, sequential over k (plf.cpp:45-50).
        x3 = _tile_rows(p[0:C, :], S) * ec_ref[:, 0:1]
        for k in range(1, S):
            x3 = x3 + _tile_rows(p[k * C:(k + 1) * C, :], S) * ec_ref[:, k:k + 1]

        # Stage 4: fused underflow rescale (s2mm_memDNAwindowComb.cpp:71-85).
        # max-reduce form: max|x3| < 2^-32 <=> all(|x3| < 2^-32); the
        # rescale multiplies by a selected factor (2^32 or exactly 1.0 —
        # both exact: *2^32 is an exponent shift, *1.0 an identity).
        mask = (jnp.max(jnp.abs(x3), axis=0, keepdims=True)
                < MIN_LIKELIHOOD)                             # (1, CH)
        idx = site0 + o + jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)
        mask = jnp.logical_and(mask, idx < n_ref[0])
        fac = jnp.where(mask, jnp.float32(TWO_TO_THE_32), jnp.float32(1.0))
        x3_ref[:, o:o + CH] = (x3 * fac).astype(x3_ref.dtype)
        sc_ref[:, o:o + CH] = mask.astype(jnp.int32)


#: MXU variant -> matmul precision.  On TPU the levels map to MXU pass
#: counts over bf16-decomposed fp32 operands: HIGHEST = 6 passes (full
#: fp32, <=1 ULP vs the scalar reference), "mxu_3x" = 3 passes (manual
#: bf16x3 split below — Mosaic rejects Precision.HIGH inside kernels,
#: "Unsupported dot precision: HIGH" on v5e), DEFAULT = 1 pass (bf16
#: operands, fp32 accumulation).  The PLF at S>=20 is MXU-COMPUTE-bound
#: (measured ~30 TFLOP/s fp32 at S=61), so fewer passes buy
#: near-proportional throughput — the same optimisation ladder the
#: reference walked on its fused AIE kernel
#: (aie/src/128x1PLFwindow2in/kernels/combine_and_mac_EV.cpp:8,45,78).
MXU_PRECISION = {
    "mxu": jax.lax.Precision.HIGHEST,
    "mxu_3x": jax.lax.Precision.DEFAULT,   # passes live in _dot_bf16x3
    "mxu_bf16": jax.lax.Precision.DEFAULT,
}


def _bf16_split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_bf16x3(m, x):
    """3-pass bf16 matmul: hi*hi + hi*lo + lo*hi, fp32 accumulation.

    The classic bf16x3 fp32 emulation (what Precision.HIGH lowers to in
    XLA proper): each fp32 operand splits into a bf16 high part and a
    bf16 residual; the lo*lo term (~2^-32 relative) is dropped.  Mosaic
    cannot lower Precision.HIGH itself, so the split is explicit.
    ~1e-5 relative accuracy at 3 MXU passes instead of HIGHEST's 6.
    """
    d = functools.partial(jax.lax.dot,
                          precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=jnp.float32)
    m_hi, m_lo = _bf16_split(m)
    x_hi, x_lo = _bf16_split(x)
    return d(m_hi, x_hi) + (d(m_hi, x_lo) + d(m_lo, x_hi))


#: a @ b.T contraction (both operands (rows, sites); the operator-gradient
#: reduction of the MXU backward kernels).
_DNT = (((1,), (1,)), ((), ()))


def _dot_t_bf16x3(a, b):
    """3-pass bf16 ``a @ b.T`` (contract the trailing/site axis)."""
    d = functools.partial(jax.lax.dot_general, dimension_numbers=_DNT,
                          precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=jnp.float32)
    a_hi, a_lo = _bf16_split(a)
    b_hi, b_lo = _bf16_split(b)
    return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))


def make_mxu_dots(variant: str):
    """(dot, dot_t) for an MXU variant: ``dot(m, x) = m @ x`` and
    ``dot_t(a, b) = a @ b.T``, each at the variant's MXU pass count
    (see MXU_PRECISION) with fp32 accumulation.  Shared by the forward
    node kernels and the backward/gradient kernels so the whole precision
    ladder reaches training (the reference's optimisation ladder,
    aie/src/128x1PLFwindow2in/kernels/combine_and_mac_EV.cpp:8,45,78)."""
    if variant == "mxu_3x":
        return _dot_bf16x3, _dot_t_bf16x3
    prec = MXU_PRECISION[variant]
    dot = functools.partial(jax.lax.dot, precision=prec,
                            preferred_element_type=jnp.float32)
    dot_t = functools.partial(jax.lax.dot_general, dimension_numbers=_DNT,
                              precision=prec,
                              preferred_element_type=jnp.float32)
    return dot, dot_t


def make_mxu_bwd_ops(variant: str):
    """(split, dot_s, dot_t_s): operand-sharing forms of the variant's
    matmuls for the backward sweeps.

    The reverse-sweep adjoint step runs ~9 contractions per op over ~6
    distinct operands — several operands feed two contractions each
    (x1/x2/g_y/g_u1/g_u2).  For ``mxu_3x`` every ``_dot_bf16x3`` call
    re-derives the bf16 hi/lo decomposition of BOTH operands — a VPU
    pass over each (rows, BS) operand that the MXU dots then wait on,
    measured as the reason the 3-pass backward LOSES to the 6-pass
    HIGHEST one (110.9 vs 161.8 ms, r05_fenced.txt).  Here ``split``
    decomposes an operand ONCE and ``dot_s``/``dot_t_s`` consume the
    decomposed pairs, so shared operands split a single time (and
    loop-invariant operators like ecT can hoist their split out of the
    op loop entirely).  For mxu / mxu_bf16 ``split`` is the identity and
    the dots are unchanged — one code shape for the whole ladder, with
    results bit-identical to the make_mxu_dots forms (same passes, same
    accumulation order)."""
    if variant == "mxu_3x":
        d = functools.partial(jax.lax.dot,
                              precision=jax.lax.Precision.DEFAULT,
                              preferred_element_type=jnp.float32)
        dt = functools.partial(jax.lax.dot_general, dimension_numbers=_DNT,
                               precision=jax.lax.Precision.DEFAULT,
                               preferred_element_type=jnp.float32)

        def dot_s(m, x):
            return d(m[0], x[0]) + (d(m[0], x[1]) + d(m[1], x[0]))

        def dot_t_s(a, b):
            return dt(a[0], b[0]) + (dt(a[0], b[1]) + dt(a[1], b[0]))

        return _bf16_split, dot_s, dot_t_s
    dot, dot_t = make_mxu_dots(variant)
    return (lambda a: a), dot, dot_t


def _plf_kernel_mxu(n_ref, x1_ref, x2_ref, ml_ref, mr_ref, me_ref,
                    x3_ref, sc_ref, *, states: int, categories: int,
                    block_sites: int,
                    precision=jax.lax.Precision.HIGHEST,
                    three_pass: bool = False):
    """MXU variant: the three PLF stages as (rows, rows) @ (rows, BS)
    matmuls against block-structured operators
    (layout.branch_to_block_matrix) on the systolic array.  Measured on
    v5e: comparable throughput to the VPU form (both compute-bound), but
    results are within 1 ULP rather than bit-exact (the MXU's fp32
    HIGHEST path rounds differently); scaler counts still match exactly.
    The VPU variant is the default and the exactness anchor.  Lower
    ``precision`` levels (see MXU_PRECISION) trade accuracy for MXU
    passes on the compute-bound S>=20 shapes."""
    S, C = states, categories
    BS = block_sites
    x1 = x1_ref[...].astype(jnp.float32)
    x2 = x2_ref[...].astype(jnp.float32)
    if three_pass:
        dot = _dot_bf16x3
    else:
        dot = functools.partial(jax.lax.dot, precision=precision,
                                preferred_element_type=jnp.float32)
    ump1 = dot(ml_ref[...], x1)
    ump2 = dot(mr_ref[...], x2)
    p = ump1 * ump2
    x3 = dot(me_ref[...], p)
    mask = (jnp.max(jnp.abs(x3), axis=0, keepdims=True) < MIN_LIKELIHOOD)
    site0 = pl.program_id(0) * BS
    idx = site0 + jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)
    mask = jnp.logical_and(mask, idx < n_ref[0])
    x3_ref[...] = jnp.where(mask, x3 * TWO_TO_THE_32, x3).astype(
        x3_ref.dtype)
    sc_ref[...] = mask.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("states", "categories", "block_sites", "interpret",
                     "variant", "donate"))
def plf_pallas_lane_major(x1, x2, lc, rc, ec, n, *, states: int = 4,
                          categories: int = 4, block_sites: int = 4096,
                          interpret: bool = False, variant: str = "vpu",
                          donate: int = 0):
    """Fused PLF on lane-major operands.

    Args:
      x1, x2: ``(S*C, n_pad)`` fp32 lane-major CLVs, ``n_pad`` a multiple of
        ``block_sites``.
      lc, rc: branch constants — ``(S*C, S)`` lane columns for the "vpu"
        variant (layout.branch_to_lane_constants) or ``(S*C, S*C)`` block
        matrices for "mxu" (layout.branch_to_block_matrix).
      ec: eigenvector constants, shape matching the variant likewise.
      n: scalar int32 — number of *valid* sites (padding excluded from the
        scaler stream, mirroring include.h:181-195 padding semantics).
      variant: "vpu" (bit-exact tile/concat form) or "mxu" (block-matmul
        form on the systolic array — much faster, exactness verified on
        hardware separately).
      donate: 0 = none, 1 = write ``x3`` in place over ``x1``'s HBM
        buffer, 2 = over ``x2``'s.  The donated child must be dead after
        the call (true for every internal-node child of a post-order
        traversal, which is consumed exactly once).  Measured on v5e this
        is worth ~1.6x: it removes the fresh-output allocation from the
        HBM stream (1.98 -> 3.14 Gsites/s at block 16384).

    Returns:
      ``(x3, scaler)``: ``(S*C, n_pad)`` fp32 parent CLV and ``(1, n_pad)``
      int32 per-site rescale flags.
    """
    S, C = states, categories
    rows = S * C
    n_pad = x1.shape[-1]
    if n_pad % block_sites:
        raise ValueError(f"n_pad={n_pad} not a multiple of {block_sites}")
    grid = (n_pad // block_sites,)
    n_arr = jnp.asarray(n, dtype=jnp.int32).reshape((1,))
    io_dtype = x1.dtype  # fp32 (exact) or bf16 (fast mode)

    # Index maps receive (grid_idx, *scalar_prefetch_refs).
    block = pl.BlockSpec((rows, block_sites), lambda i, n: (0, i),
                         memory_space=pltpu.VMEM)
    is_mxu = variant.startswith("mxu")
    const_cols = rows if is_mxu else S
    const = pl.BlockSpec((rows, const_cols), lambda i, n: (0, 0),
                         memory_space=pltpu.VMEM)
    if is_mxu:
        kernel = functools.partial(_plf_kernel_mxu, states=S, categories=C,
                                   block_sites=block_sites,
                                   precision=MXU_PRECISION[variant],
                                   three_pass=(variant == "mxu_3x"))
    else:
        kernel = functools.partial(_plf_kernel, states=S, categories=C,
                                   block_sites=block_sites)
    bytes_per_block = rows * block_sites * 4
    extra = {}
    if donate:
        # operand index counts the scalar-prefetch arg (n_arr) at 0.
        extra["input_output_aliases"] = {int(donate): 0}
    x3, scaler = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[block, block, const, const, const],
            out_specs=[
                block,
                pl.BlockSpec((1, block_sites), lambda i, n: (0, i),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rows, n_pad), io_dtype),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            # ~23 fp32 VPU ops per CLV element (see BASELINE.md FLOP count)
            flops=23 * rows * n_pad,
            bytes_accessed=3 * bytes_per_block * grid[0] + 4 * n_pad,
            transcendentals=0,
        ),
        interpret=interpret,
        **extra,
    )(n_arr, x1, x2, lc, rc, ec)
    return x3, scaler


def plf_pallas(x1, x2, left, right, ev, wgt, *, states: int = 4,
               categories: int = 4, block_sites: int = 4096,
               interpret: bool = False, variant: str = "vpu",
               dtype: str = "float32"):
    """Site-major convenience wrapper: layout in, kernel, layout out.

    Same signature/returns as :func:`plf_tpu.ops.plf_xla.plf_xla`.
    For production tree traversals keep CLVs lane-major and call
    :func:`plf_pallas_lane_major` directly (no transpose cost).

    ``dtype="bfloat16"`` selects the fast CLV-storage mode: operands and
    the output CLV are bf16 in HBM (halving the stream the kernel is
    bound by — measured +50% at S=4), arithmetic stays fp32 inside the
    kernel.  The exactness contract applies to fp32 mode only.
    """
    S, C = states, categories
    n = x1.reshape(-1, C, S).shape[0]
    n2 = x2.reshape(-1, C, S).shape[0]
    if n != n2:
        raise ValueError(f"x1/x2 site count mismatch: {n} vs {n2}")
    x1l = L.pad_to_multiple(L.to_lane_major(x1, S, C), block_sites)
    x2l = L.pad_to_multiple(L.to_lane_major(x2, S, C), block_sites)
    if dtype == "bfloat16":
        x1l = x1l.astype(jnp.bfloat16)
        x2l = x2l.astype(jnp.bfloat16)
    if variant.startswith("mxu"):
        lc = L.branch_to_block_matrix(left, S, C)
        rc = L.branch_to_block_matrix(right, S, C)
        ec = L.ev_to_block_matrix(ev, S, C)
    else:
        lc = L.branch_to_lane_constants(left, S, C)
        rc = L.branch_to_lane_constants(right, S, C)
        ec = L.ev_to_lane_constants(ev, S, C)
    x3l, scaler = plf_pallas_lane_major(
        x1l, x2l, lc, rc, ec, n, states=S, categories=C,
        block_sites=block_sites, interpret=interpret, variant=variant)
    x3 = L.from_lane_major(x3l, S, C, n=n)
    scaler_vector = scaler[0, :n]
    scaler_increment = jnp.sum(scaler_vector * jnp.asarray(wgt, jnp.int32))
    return x3, scaler_vector, scaler_increment


def _gen_kernel(lc_ref, rc_ref, ec_ref, out_ref, *, states, categories,
                block_sites, inner_iters):
    """Compute-only probe: synthesize CLVs in VMEM, run the PLF stages,
    emit a per-site checksum.  No HBM CLV traffic — measures the pure
    kernel compute rate (the host_gen / gen-PL-kernel analogue,
    app/src/host_gen.cpp:72-160)."""
    S, C = states, categories
    rows = S * C
    BS = block_sites
    base = jax.lax.broadcasted_iota(jnp.int32, (rows, BS), 1).astype(
        jnp.float32) * 1e-4
    rowf = jax.lax.broadcasted_iota(jnp.int32, (rows, BS), 0).astype(
        jnp.float32) * 0.05
    x1 = 0.1 + base + rowf
    x2 = 1.0 - base * 0.5 + rowf * 0.25
    acc = jnp.zeros((1, BS), jnp.float32)
    for _ in range(inner_iters):
        ump1 = _tile_rows(x1[0:C, :], S) * lc_ref[:, 0:1]
        ump2 = _tile_rows(x2[0:C, :], S) * rc_ref[:, 0:1]
        for a in range(1, S):
            ump1 = ump1 + _tile_rows(x1[a * C:(a + 1) * C, :], S) * lc_ref[:, a:a + 1]
            ump2 = ump2 + _tile_rows(x2[a * C:(a + 1) * C, :], S) * rc_ref[:, a:a + 1]
        p = ump1 * ump2
        x3 = _tile_rows(p[0:C, :], S) * ec_ref[:, 0:1]
        for k in range(1, S):
            x3 = x3 + _tile_rows(p[k * C:(k + 1) * C, :], S) * ec_ref[:, k:k + 1]
        acc = acc + jnp.sum(x3, axis=0, keepdims=True)
        x1 = x3  # chain so iterations can't be elided
    out_ref[...] = acc


@functools.partial(
    jax.jit,
    static_argnames=("states", "categories", "block_sites", "n_blocks",
                     "inner_iters", "interpret"))
def plf_pallas_gen(lc, rc, ec, *, states: int = 4, categories: int = 4,
                   block_sites: int = 4096, n_blocks: int = 64,
                   inner_iters: int = 8, interpret: bool = False):
    """Compute-only PLF probe: `n_blocks * block_sites * inner_iters`
    node-site evaluations with zero CLV HBM traffic.  Returns the (1,
    n_blocks*block_sites) checksum array."""
    rows = states * categories
    kernel = functools.partial(
        _gen_kernel, states=states, categories=categories,
        block_sites=block_sites, inner_iters=inner_iters)
    const = pl.BlockSpec((rows, states), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[const, const, const],
        out_specs=pl.BlockSpec((1, block_sites), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_blocks * block_sites),
                                       jnp.float32),
        interpret=interpret,
    )(lc, rc, ec)
