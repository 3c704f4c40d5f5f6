"""Custom VJP for the fused PLF kernel: gradients on the Pallas path.

The reference's roadmap wants "updating PLF parameters from the FPGA"
(/root/reference/README.md:201-205); round 1 did parameter optimisation
through a separate element-wise XLA PLF because the Pallas kernel had no
backward rule (models/optimize.py round-1 note).  This module closes
that: :func:`make_plf_diff` returns a differentiable fused PLF whose
forward is the production kernel (ops/plf_pallas.py) and whose backward
is one more Pallas kernel with the same lane-major structure.

Math (per site, lane-major rows r = k*C + c):

  forward:  u1 = S1(x1; L)   u2 = S1(x2; R)     # stage-1 branch products
            p  = u1 * u2
            y  = S3(p; E)                       # EV projection
            x3 = y * f,  f = 2^32 if rescued else 1   (f depends on y
            only through the discrete mask -> treated as constant, so
            gradients are exact wherever the likelihood is differentiable)

  backward: g_y  = g * f
            g_p  = S3ᵀ(g_y; E)    = S3(g_y; Eᵀ')   # same op shape,
            g_u1 = g_p * u2        g_u2 = g_p * u1  # transposed constants
            g_x1 = S1ᵀ(g_u1; L)   g_x2 = S1ᵀ(g_u2; R)
            g_L[r, a] = Σ_s tile_a(x1)[r, s] * g_u1[r, s]   (per edge)
            g_R, g_E analogous.

The key identity: the adjoint of a stage is the SAME tile/concat stage
with relabeled constants (lcT[a*C+c, k] = lc[k*C+c, a]), so forward and
backward share one exactness-tested code shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..reference import TWO_TO_THE_32
from .plf_pallas import CHUNK_SITES, _tile_rows, plf_pallas_lane_major

__all__ = ["make_plf_diff", "transpose_lane_constants"]


def transpose_lane_constants(lc, states: int = 4, categories: int = 4):
    """Adjoint-stage constants: lcT[a*C + c, k] = lc[k*C + c, a]."""
    S, C = states, categories
    t = lc.reshape(S, C, S)          # [k, c, a]
    t = jnp.transpose(t, (2, 1, 0))  # [a, c, k]
    return t.reshape(S * C, S)


def _stage(x, const_ref_or_arr, S, C):
    """Forward-shaped stage: out = Σ_a tile_S(x[aC:(a+1)C]) * const[:, a]."""
    out = _tile_rows(x[0:C, :], S) * const_ref_or_arr[:, 0:1]
    for a in range(1, S):
        out = out + (_tile_rows(x[a * C:(a + 1) * C, :], S)
                     * const_ref_or_arr[:, a:a + 1])
    return out


def _op_grad(inp, gout, S, C):
    """(rows, S) operator gradient: col j = Σ_s tile_j(inp) ⊙ gout."""
    cols = [jnp.sum(_tile_rows(inp[j * C:(j + 1) * C, :], S) * gout,
                    axis=1, keepdims=True) for j in range(S)]
    return jnp.concatenate(cols, axis=1)


#: contract the trailing/site axis: (rows, BS) x (rows, BS) -> (rows, rows)
_DNT_SITES = (((1,), (1,)), ((), ()))


def _op_grad_mxu(inp, gout, S, C):
    """(rows, S) operator gradient via ONE MXU site contraction.

    Identity: gl[r, a] = Σ_s tile_a(inp)[r, s] * gout[r, s]
                       = M[r, a*C + r%C]   with M = gout @ inp.T.
    The site reduction — S cross-lane VPU reductions over (rows, BS)
    per call in :func:`_op_grad`, the dominant cost of the VPU reverse
    sweep (3 calls, 3*S lane reductions per op) — becomes one
    (rows, rows) matmul on the systolic array at HIGHEST (6-pass,
    ~1 ULP); what remains on the VPU is an O(rows*S) static row-phase
    selection of the needed diagonal entries.  Summation order over
    sites differs from _op_grad (MXU accumulation), so results agree to
    fp32 reduction-order tolerance, not bitwise — gradients carry no
    bit-exactness contract (the forward anchor does).
    """
    M = jax.lax.dot_general(gout, inp, dimension_numbers=_DNT_SITES,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    rows = S * C
    # phase[r, c] = 1 iff c == r % C  (static pattern)
    rmod = jax.lax.broadcasted_iota(jnp.int32, (rows, C), 0) % C
    cidx = jax.lax.broadcasted_iota(jnp.int32, (rows, C), 1)
    phase = (cidx == rmod).astype(jnp.float32)
    cols = [jnp.sum(M[:, a * C:(a + 1) * C] * phase, axis=1,
                    keepdims=True) for a in range(S)]
    return jnp.concatenate(cols, axis=1)


def resolve_op_grad():
    """Op-grad reduction form for the VPU backward sweeps.

    PLF_VPU_BWD_MXU_REDUCE=1 selects :func:`_op_grad_mxu`; the default
    is the pure-VPU :func:`_op_grad`.  Measured on v5e (interleaved
    protocol, DNA 160x1.05M segmented value_and_grad): the two are
    IDENTICAL at steady state (252.1 vs 251.7 ms same-lease,
    r05_opgrad.txt) — the cross-lane reductions are not the backward's
    bottleneck; the DNA backward already runs at its ~3.7x
    recompute+sweep flop ratio vs the forward.  The MXU form stays
    available as the A/B control and for shapes where lane-reduction
    cost might re-emerge.  Read at kernel trace time."""
    import os
    return (_op_grad_mxu if os.environ.get("PLF_VPU_BWD_MXU_REDUCE",
                                           "0") == "1" else _op_grad)


def _plf_bwd_kernel(n_ref, x1_ref, x2_ref, g_ref, sc_ref,
                    lc_ref, rc_ref, lcT_ref, rcT_ref, ecT_ref,
                    gx1_ref, gx2_ref, gl_ref, gr_ref, ge_ref, *,
                    states: int, categories: int, block_sites: int):
    S, C = states, categories
    BS = block_sites
    CH = min(CHUNK_SITES, BS)
    og = resolve_op_grad()
    site0 = pl.program_id(0) * BS

    @pl.when(pl.program_id(0) == 0)
    def _():
        gl_ref[...] = jnp.zeros_like(gl_ref)
        gr_ref[...] = jnp.zeros_like(gr_ref)
        ge_ref[...] = jnp.zeros_like(ge_ref)

    for j in range(BS // CH):
        o = j * CH
        x1 = x1_ref[:, o:o + CH].astype(jnp.float32)
        x2 = x2_ref[:, o:o + CH].astype(jnp.float32)
        g = g_ref[:, o:o + CH].astype(jnp.float32)
        sc = sc_ref[:, o:o + CH]
        idx = site0 + o + jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)
        fac = jnp.where(jnp.logical_and(sc > 0, idx < n_ref[0]),
                        jnp.float32(TWO_TO_THE_32), jnp.float32(1.0))
        # zero the padded-site cotangent defensively (upstream weights
        # are zero there, but the operator-grad reductions sum all lanes)
        g_y = g * fac * (idx < n_ref[0]).astype(jnp.float32)

        u1 = _stage(x1, lc_ref, S, C)
        u2 = _stage(x2, rc_ref, S, C)
        g_p = _stage(g_y, ecT_ref, S, C)
        g_u1 = g_p * u2
        g_u2 = g_p * u1
        gx1_ref[:, o:o + CH] = _stage(g_u1, lcT_ref, S, C).astype(
            gx1_ref.dtype)
        gx2_ref[:, o:o + CH] = _stage(g_u2, rcT_ref, S, C).astype(
            gx2_ref.dtype)
        gl_ref[...] += og(x1, g_u1, S, C)
        gr_ref[...] += og(x2, g_u2, S, C)
        ge_ref[...] += og(u1 * u2, g_y, S, C)


@functools.partial(
    jax.jit,
    static_argnames=("states", "categories", "block_sites", "interpret"))
def _plf_bwd_call(x1, x2, g, sc, lc, rc, lcT, rcT, ecT, n, *,
                  states: int, categories: int, block_sites: int,
                  interpret: bool):
    S, C = states, categories
    rows = S * C
    n_pad = x1.shape[-1]
    grid = (n_pad // block_sites,)
    n_arr = jnp.asarray(n, dtype=jnp.int32).reshape((1,))
    block = pl.BlockSpec((rows, block_sites), lambda i, n: (0, i),
                         memory_space=pltpu.VMEM)
    scb = pl.BlockSpec((1, block_sites), lambda i, n: (0, i),
                       memory_space=pltpu.VMEM)
    const = pl.BlockSpec((rows, S), lambda i, n: (0, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_plf_bwd_kernel, states=S, categories=C,
                               block_sites=block_sites)
    gx1, gx2, gl, gr, ge = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[block, block, block, scb,
                      const, const, const, const, const],
            out_specs=[block, block, const, const, const],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rows, n_pad), x1.dtype),
            jax.ShapeDtypeStruct((rows, n_pad), x2.dtype),
            jax.ShapeDtypeStruct((rows, S), jnp.float32),
            jax.ShapeDtypeStruct((rows, S), jnp.float32),
            jax.ShapeDtypeStruct((rows, S), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=60 * rows * n_pad,
            bytes_accessed=5 * rows * n_pad * 4 + 4 * n_pad,
            transcendentals=0,
        ),
        interpret=interpret,
        # the summed upstream cotangent g is dead after this call; reuse
        # its HBM buffer for gx1 (same win as the forward donate path)
        input_output_aliases={3: 0},
    )(n_arr, x1, x2, g, sc, lc, rc, lcT, rcT, ecT)
    return gx1, gx2, gl, gr, ge


def make_plf_diff(states: int = 4, categories: int = 4,
                  block_sites: int = 4096, interpret: bool = False):
    """Differentiable fused PLF: fn(x1, x2, lc, rc, ec, n) -> (x3, sc).

    Forward is the production Pallas kernel (bit-exact "vpu" variant,
    no donation — x1/x2 are VJP residuals and must survive to the
    backward pass); backward is :func:`_plf_bwd_call`.  Gradients flow
    to x1, x2 and the lane-constant operators lc/rc/ec (chain them to
    branch lengths / model parameters with ordinary jnp ops outside).
    """
    S, C = states, categories

    @jax.custom_vjp
    def f(x1, x2, lc, rc, ec, n):
        return plf_pallas_lane_major(
            x1, x2, lc, rc, ec, n, states=S, categories=C,
            block_sites=block_sites, interpret=interpret, variant="vpu",
            donate=0)

    def fwd(x1, x2, lc, rc, ec, n):
        x3, sc = f(x1, x2, lc, rc, ec, n)
        return (x3, sc), (x1, x2, lc, rc, ec, sc, n)

    def bwd(res, cts):
        g, _ = cts   # cotangent of the int32 scaler stream is zero
        x1, x2, lc, rc, ec, sc, n = res
        lcT = transpose_lane_constants(lc, S, C)
        rcT = transpose_lane_constants(rc, S, C)
        ecT = transpose_lane_constants(ec, S, C)
        gx1, gx2, gl, gr, ge = _plf_bwd_call(
            x1, x2, g, sc, lc, rc, lcT, rcT, ecT, n, states=S,
            categories=C, block_sites=block_sites, interpret=interpret)
        return gx1, gx2, gl, gr, ge, None

    f.defvjp(fwd, bwd)
    return f
