"""Test environment: force CPU jax with an 8-device virtual mesh.

This is the TPU analogue of the reference's emulation ladder
(sw_emu/hw_emu, README.md:137-146; app/src/include.h:103-117): all
correctness tests run on CPU (Pallas interpret mode where applicable) with
XLA's host-platform device-count flag providing 8 virtual devices so the
multi-chip sharding path is exercised without a pod.
"""

import os

# Must run before jax is imported anywhere.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon TPU plugin in this image re-registers itself over the env var;
# the config update below is authoritative (must precede device init).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Exactness policy: on real TPU hardware the fused kernel is bit-exact vs
# the golden model (the reference's acceptance bar, host_mem.cpp:423) and
# tests assert float equality.  XLA:CPU contracts mul+add into FMA inside
# fused loops, introducing <=2 ULP differences, so CPU runs (this suite's
# default, the sw_emu analogue) assert a tight ULP tolerance instead.
EXACT_BACKEND = jax.default_backend() == "tpu"


def assert_clv_match(got, ref, exact=None):
    got = np.asarray(got)
    ref = np.asarray(ref)
    assert got.shape == ref.shape
    if exact is None:
        exact = EXACT_BACKEND
    if exact:
        np.testing.assert_array_equal(got, ref)
    else:
        np.testing.assert_allclose(got, ref, rtol=5e-7, atol=1e-37)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def make_random_case(rng, n, states=4, categories=4, underflow=True):
    """Random PLF inputs mirroring the reference's generator, including the
    forced-underflow pattern scale=1e-12^(j%64<16) (host_mem.cpp:179-209)."""
    S, C = states, categories
    e = S * C
    ev = rng.random((S, S), dtype=np.float32)
    left = rng.random((C, S, S), dtype=np.float32)
    right = rng.random((C, S, S), dtype=np.float32)
    x1 = rng.random((n * e,), dtype=np.float32)
    x2 = rng.random((n * e,), dtype=np.float32)
    if underflow:
        j = np.arange(n * e)
        x1 = np.where(j % (4 * e) < e, x1 * np.float32(1e-12), x1)
    wgt = np.ones((n,), dtype=np.int32)
    return (x1.reshape(n, C, S), x2.reshape(n, C, S), left, right, ev, wgt)


@pytest.fixture
def random_case_factory(rng):
    return lambda n, **kw: make_random_case(rng, n, **kw)
