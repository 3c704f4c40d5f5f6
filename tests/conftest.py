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

# ---------------------------------------------------------------------------
# Fast/slow split: the default run (`pytest -q`) deselects tests marked slow
# (pyproject addopts `-m "not slow"`) and stays under ~a minute for kernel-
# iteration loops; the FULL suite runs with `pytest -m ""` (nightly-style /
# judge runs).  Marking is centralised here by nodeid prefix, measured from
# `--durations` (everything > ~3s lands in the slow set); every subsystem
# keeps at least one fast test.
# ---------------------------------------------------------------------------
SLOW_TESTS = (
    "test_ancestral.py::test_site_rates_posterior",
    "test_bootstrap.py::test_rell_prefers_true_topology",
    "test_codon.py::test_codon_mxu_kernel_variant_interpret",
    "test_distributed.py::test_two_process_sharded_plf",
    "test_empirical.py::test_empirical_protein_model_runs",
    "test_empirical.py::test_builtin_lg_likelihood_regression",
    "test_empirical.py::test_infer_cli_with_lg",
    "test_examples.py::test_example_runs[model_selection.py]",
    "test_fuzz.py::test_fuzz_backends_vs_golden",
    "test_grad.py::test_vjp_matches_autodiff[False]",
    "test_invariant.py::test_pinv_matches_oracle",
    "test_invariant.py::test_pinv_zero_weight_equals_plain_gamma",
    "test_models.py::test_deep_tree_underflow_rescaling",
    "test_models.py::test_protein_tree_likelihood",
    "test_models.py::test_lewis_correction_matches_manual",
    "test_models.py::test_lewis_correction_fused_vs_pernode",
    "test_models.py::test_lewis_correction_gradient_path",
    "test_optimize.py::test_pallas_backend_matches_xla_backend",
    "test_optimize.py::test_pallas_backend_with_rates_and_weights",
    "test_optimize.py::test_fit_model_with_alpha",
    "test_optimize.py::test_fit_model_improves_likelihood",
    "test_optimize.py::test_optimize_increases_likelihood",
    "test_partition.py::test_partitioned_mixed_state_spaces",
    "test_partition.py::test_partitioned_optimize_improves",
    "test_partition.py::test_partitioned_joint_fn_matches_ll",
    "test_partition.py::test_partitioned_ll_is_sum_of_parts",
    "test_pipeline.py::",
    "test_search.py::test_newick_roundtrip_likelihood",
    "test_search.py::test_tree_search_checkpoint_resume",
    "test_search.py::test_nni_search_recovers_better_topology",
    "test_search.py::test_spr_search_improves",
    "test_sharding.py::test_sharded_protein",
    "test_support.py::test_alrt_on_ml_tree_is_nonnegative_and_supported",
    "test_support.py::test_annotate_alrt_labels",
    "test_tree_grad.py::test_tree_grads_match_xla_underflow",
    "test_tree_grad.py::test_tree_grads_match_pallas_pernode",
    "test_tree_grad.py::test_tree_rates_and_weights_grads",
    "test_tree_grad.py::test_tree_backend_with_gaps_and_weights",
    "test_tree_grad.py::test_tree_backend_ascertainment",
    "test_tree_seg.py::test_segmented_forward_rescaling_case",
    "test_tree_seg.py::test_segmented_underflow_grads",
    "test_tree_seg.py::test_segmented_grads_match_xla",
    "test_tree_seg.py::test_segmented_grads_match_tree_backend",
    "test_tree_kernel.py::test_large_tree_uses_dynamic_kernel",
    "test_tree_kernel.py::test_fused_deep_tree_scalers",
    "test_tree_kernel.py::test_fused_protein",
    "test_tree_kernel.py::test_mxu_variant_tree_matches_vpu",
    "test_tree_kernel.py::test_sharded_tree_likelihood_matches_single_device",
    "test_tree_kernel.py::test_dynamic_tree_kernel_matches_static",
    "test_tree_kernel.py::test_fused_matches_per_node_traversal",
    "test_tree_kernel.py::test_auto_method_selects_fused_small_tree",
)


def pytest_collection_modifyitems(config, items):
    for it in items:
        nid = it.nodeid.split("tests/")[-1]
        if any(nid.startswith(p) for p in SLOW_TESTS):
            it.add_marker(pytest.mark.slow)

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
