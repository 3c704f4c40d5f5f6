"""Golden-model tests: vectorised oracle vs scalar oracle vs AIE fixtures.

Tier 1+2 of the reference's verification strategy (SURVEY.md §4): the
golden CPU model must (a) be internally consistent (vectorised == scalar
triple-loop, bit-exact) and (b) reproduce the checked-in AIE simulator
test vectors (aie/data/golden*.txt).
"""

import numpy as np
import pytest

from plf_tpu.io import fixtures
from plf_tpu.reference import (MIN_LIKELIHOOD, TWO_TO_THE_32, plf_reference,
                               plf_reference_scalar)
from tests.conftest import make_random_case


def test_vectorised_matches_scalar_bitexact():
    rng = np.random.default_rng(7)
    case = make_random_case(rng, 37)
    xv, sv, iv = plf_reference(*case)
    xs, ss, is_ = plf_reference_scalar(*case)
    np.testing.assert_array_equal(xv, xs)
    np.testing.assert_array_equal(sv, ss)
    assert iv == is_


def test_vectorised_matches_scalar_protein():
    rng = np.random.default_rng(8)
    case = make_random_case(rng, 5, states=20)
    xv, sv, iv = plf_reference(*case, states=20)
    xs, ss, is_ = plf_reference_scalar(*case, states=20)
    np.testing.assert_array_equal(xv, xs)
    assert iv == is_


def test_underflow_rescaling_triggers():
    rng = np.random.default_rng(9)
    x1, x2, left, right, ev, wgt = make_random_case(rng, 64, underflow=True)
    x3, sv, inc = plf_reference(x1, x2, left, right, ev, wgt)
    # The forced pattern makes every 4th site tiny on the left child
    # (host_mem.cpp:198-205: scale=1e-12 for j%64<16) -> those sites rescale.
    assert inc > 0
    assert sv.sum() == inc
    scaled = sv.astype(bool)
    assert np.all(np.abs(x3[scaled]) < TWO_TO_THE_32 * MIN_LIKELIHOOD * 2**32)
    # Rescaled values are the tiny values times exactly 2**32.
    assert np.all(x3[~scaled] == x3[~scaled])  # sanity: no NaNs


def test_weights_feed_scaler_increment():
    rng = np.random.default_rng(10)
    x1, x2, left, right, ev, _ = make_random_case(rng, 64, underflow=True)
    w = rng.integers(1, 10, size=64).astype(np.int32)
    _, sv, inc = plf_reference(x1, x2, left, right, ev, w)
    assert inc == int((sv.astype(np.int64) * w).sum())


needs_fixtures = pytest.mark.skipif(
    not fixtures.reference_fixtures_available(),
    reason="reference aie/data fixtures not mounted")


@needs_fixtures
def test_fixture_layouts_agree():
    """COMBINED, SEPARATE and stream fixture encodings carry the same case."""
    w = fixtures.load_window_vectors()
    s = fixtures.load_separate_vectors()
    st = fixtures.load_stream_vectors()
    np.testing.assert_array_equal(w.ev, s.ev)
    np.testing.assert_array_equal(w.left, s.left)
    np.testing.assert_array_equal(w.right, s.right)
    n = min(w.n_sites, s.n_sites)
    np.testing.assert_array_equal(w.x1[:n], s.x1[:n])
    np.testing.assert_array_equal(st.ev, w.ev)


@needs_fixtures
def test_golden_model_reproduces_aie_golden_vectors():
    """The golden model must reproduce aie/data/golden*.txt.

    The golden files hold the AIE graph output (pre-rescale, scaling is in
    s2mm downstream), printed with enough digits to round-trip fp32.
    """
    v = fixtures.load_window_vectors()
    # Golden files are pre-rescale (scaling lives in s2mm downstream of the
    # AIE graph), so rebuild the unscaled x3 from the vectorised stages.
    S = C = 4
    x1 = v.x1.astype(np.float32)
    x2 = v.x2.astype(np.float32)
    ump1 = np.zeros_like(x1)
    ump2 = np.zeros_like(x2)
    for a in range(S):
        ump1 += x1[:, :, a:a + 1] * v.left[None, :, :, a]
        ump2 += x2[:, :, a:a + 1] * v.right[None, :, :, a]
    p = ump1 * ump2
    raw = np.zeros_like(p)
    for k in range(S):
        raw += p[:, :, k:k + 1] * v.ev[None, None, k, :]
    np.testing.assert_allclose(raw, v.golden_x3, rtol=2e-6, atol=1e-30)


@needs_fixtures
def test_engine_reproduces_aie_golden_vectors():
    """BASELINE config 1: the accelerated engine on the reference's own
    aie/data vectors reproduces golden*.txt (no rescale triggers here, so
    engine output == the pre-rescale golden lane values)."""
    from plf_tpu import PLFConfig, PLFEngine
    v = fixtures.load_window_vectors()
    eng = PLFEngine(PLFConfig(block_sites=128, interpret=True))
    out = eng.plf(v.x1, v.x2, v.left, v.right, v.ev)
    assert int(out.scaler_increment) == 0
    # atol covers golden entries printed as exact zeros where fp32
    # evaluation of the 6-decimal text inputs yields ~1e-11 residues.
    np.testing.assert_allclose(np.asarray(out.x3), v.golden_x3,
                               rtol=2e-6, atol=1e-9)
