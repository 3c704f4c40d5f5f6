"""Pure-XLA (jnp) PLF compute path.

The generic fallback/testing path: the same stage structure as the golden
model (reference.py, mirroring app/src/plf.cpp:29-64) expressed as fused
element-wise jnp ops over ``(n, categories, states)`` site batches.  XLA
fuses the whole thing into one HBM-streaming loop; the small contraction
dims (4 or 20) are unrolled Python loops with *sequential* fp32
accumulation, so op order matches the scalar C reference.

The Pallas path (ops/plf_pallas.py) is the production kernel; this one is
kept for: arbitrary backends (CPU tests), odd shapes, and as an XLA-vs-Pallas
cross-check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..reference import MIN_LIKELIHOOD, TWO_TO_THE_32

__all__ = ["plf_xla"]


@functools.partial(jax.jit, static_argnames=("states", "categories"))
def plf_xla(x1, x2, left, right, ev, wgt, states: int = 4,
            categories: int = 4):
    """PLF over a site batch.  All inputs site-major.

    Args:
      x1, x2: ``(n, C*S)`` or ``(n, C, S)`` fp32 child CLVs.
      left, right: ``(C, S, S)`` branch transition matrices ``[c, k, a]``.
      ev: ``(S, S)`` eigenvector matrix ``[k, a]``.
      wgt: ``(n,)`` int32 site weights.

    Returns:
      ``(x3, scaler_vector, scaler_increment)`` with ``x3`` of shape
      ``(n, C, S)``, ``scaler_vector`` ``(n,)`` int32 in {0,1}, and the
      weighted scaler sum as an int32 scalar.
    """
    S, C = states, categories
    x1 = x1.reshape(-1, C, S).astype(jnp.float32)
    x2 = x2.reshape(-1, C, S).astype(jnp.float32)
    left = left.reshape(C, S, S).astype(jnp.float32)
    right = right.reshape(C, S, S).astype(jnp.float32)
    ev = ev.reshape(S, S).astype(jnp.float32)

    ump1 = jnp.zeros_like(x1)
    ump2 = jnp.zeros_like(x2)
    for a in range(S):
        ump1 = ump1 + x1[:, :, a:a + 1] * left[None, :, :, a]
        ump2 = ump2 + x2[:, :, a:a + 1] * right[None, :, :, a]
    p = ump1 * ump2
    x3 = jnp.zeros_like(p)
    for k in range(S):
        x3 = x3 + p[:, :, k:k + 1] * ev[None, None, k, :]

    scale_mask = jnp.all(jnp.abs(x3) < MIN_LIKELIHOOD, axis=(1, 2))
    x3 = jnp.where(scale_mask[:, None, None], x3 * TWO_TO_THE_32, x3)
    scaler_vector = scale_mask.astype(jnp.int32)
    scaler_increment = jnp.sum(scaler_vector * wgt.astype(jnp.int32))
    return x3, scaler_vector, scaler_increment
