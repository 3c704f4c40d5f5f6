"""Custom-VJP tests: Pallas-path gradients vs jnp autodiff oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plf_tpu.ops import layout as L
from plf_tpu.ops.plf_grad import make_plf_diff, transpose_lane_constants
from plf_tpu.reference import MIN_LIKELIHOOD, TWO_TO_THE_32

S, C = 4, 4
ROWS = S * C


def _tile(x, copies):
    return jnp.concatenate([x] * copies, axis=0)


def _stage_jnp(x, const):
    out = _tile(x[0:C, :], S) * const[:, 0:1]
    for a in range(1, S):
        out = out + _tile(x[a * C:(a + 1) * C, :], S) * const[:, a:a + 1]
    return out


def _plf_jnp(x1, x2, lc, rc, ec, n):
    """Differentiable lane-major jnp PLF (autodiff oracle)."""
    u1 = _stage_jnp(x1, lc)
    u2 = _stage_jnp(x2, rc)
    y = _stage_jnp(u1 * u2, ec)
    mask = jnp.max(jnp.abs(y), axis=0, keepdims=True) < MIN_LIKELIHOOD
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, y.shape[-1]), 1)
    mask = jnp.logical_and(mask, idx < n)
    fac = jnp.where(mask, jnp.float32(TWO_TO_THE_32), jnp.float32(1.0))
    return y * fac, mask.astype(jnp.int32)


def _case(seed, n_pad=512, underflow=True):
    rng = np.random.default_rng(seed)
    x1 = (rng.random((ROWS, n_pad)) * 0.99 + 0.01).astype(np.float32)
    x2 = (rng.random((ROWS, n_pad)) * 0.99 + 0.01).astype(np.float32)
    if underflow:
        x1[:, 1::7] *= np.float32(1e-8)
        x2[:, 1::7] *= np.float32(1e-8)
    left = rng.random((C, S, S)).astype(np.float32)
    right = rng.random((C, S, S)).astype(np.float32)
    ev = rng.random((S, S)).astype(np.float32)
    lc = jnp.asarray(L.branch_to_lane_constants(left))
    rc = jnp.asarray(L.branch_to_lane_constants(right))
    ec = jnp.asarray(L.ev_to_lane_constants(ev))
    r = jnp.asarray(rng.standard_normal((ROWS, n_pad)).astype(np.float32))
    return jnp.asarray(x1), jnp.asarray(x2), lc, rc, ec, r


def test_transpose_lane_constants_roundtrip():
    rng = np.random.default_rng(0)
    lc = jnp.asarray(rng.random((ROWS, S)).astype(np.float32))
    lcT = transpose_lane_constants(lc)
    # applying twice is the identity relabeling
    np.testing.assert_array_equal(
        np.asarray(transpose_lane_constants(lcT)), np.asarray(lc))


@pytest.mark.parametrize("underflow", [False, True])
def test_vjp_matches_autodiff(underflow):
    x1, x2, lc, rc, ec, r = _case(3, underflow=underflow)
    n = jnp.int32(x1.shape[-1] - 37)   # exercise the padding guard
    pdiff = make_plf_diff(block_sites=128, interpret=True)

    def loss_p(x1, x2, lc, rc, ec):
        x3, _ = pdiff(x1, x2, lc, rc, ec, n)
        return jnp.sum(x3 * r)

    def loss_j(x1, x2, lc, rc, ec):
        x3, _ = _plf_jnp(x1, x2, lc, rc, ec, n)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, x3.shape[-1]), 1)
        # the oracle computes garbage-free values on padding sites too;
        # the kernel masks padded cotangent, so compare on valid sites
        return jnp.sum(jnp.where(idx < n, x3 * r, 0.0))

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(x1, x2, lc, rc, ec)
    gj = jax.grad(loss_j, argnums=(0, 1, 2, 3, 4))(x1, x2, lc, rc, ec)
    names = ["x1", "x2", "lc", "rc", "ec"]
    for nm, a, b in zip(names, gp, gj):
        a, b = np.asarray(a), np.asarray(b)
        if nm in ("x1", "x2"):
            a, b = a[:, :int(n)], b[:, :int(n)]
        denom = np.maximum(np.abs(b).max(), 1e-30)
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-6 * denom,
                                   err_msg=f"grad {nm}")


def test_vjp_forward_matches_kernel():
    """The custom_vjp forward must be the production kernel verbatim."""
    from plf_tpu.ops.plf_pallas import plf_pallas_lane_major
    x1, x2, lc, rc, ec, _ = _case(5)
    n = jnp.int32(x1.shape[-1])
    pdiff = make_plf_diff(block_sites=128, interpret=True)
    x3a, sca = pdiff(x1, x2, lc, rc, ec, n)
    x3b, scb = plf_pallas_lane_major(x1, x2, lc, rc, ec, n,
                                     block_sites=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(x3a), np.asarray(x3b))
    np.testing.assert_array_equal(np.asarray(sca), np.asarray(scb))
