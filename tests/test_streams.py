"""PLIO stream codec tests: round trips + agreement with the reference's
checked-in fixture files."""

import numpy as np
import pytest

from plf_tpu.io import fixtures
from plf_tpu.io.streams import (decode_stream_lanes, decode_window_lanes,
                                encode_stream_lanes, encode_window_lanes)
from tests.conftest import make_random_case


def test_window_roundtrip_exact_multiple():
    rng = np.random.default_rng(50)
    x1, x2, left, right, ev, _ = make_random_case(rng, 128)
    lanes = encode_window_lanes(ev, left, right, x1, x2)
    ev2, l2, r2, x1b, x2b = decode_window_lanes(lanes, n_sites=128)
    np.testing.assert_array_equal(ev2, ev)
    np.testing.assert_array_equal(l2, left)
    np.testing.assert_array_equal(r2, right)
    np.testing.assert_array_equal(x1b, x1)
    np.testing.assert_array_equal(x2b, x2)


def test_window_roundtrip_partial_window_zero_fill():
    rng = np.random.default_rng(51)
    x1, x2, left, right, ev, _ = make_random_case(rng, 70)
    lanes = encode_window_lanes(ev, left, right, x1, x2)
    # 70 sites -> 2 windows of 64, zero-filled
    assert lanes["left"][0].shape[0] == 2 * (6 + 64)
    ev2, l2, r2, x1b, x2b = decode_window_lanes(lanes, n_sites=70)
    np.testing.assert_array_equal(x1b, x1)
    # padding sites are zero
    _, _, _, full1, _ = decode_window_lanes(lanes)
    assert np.all(full1[70:] == 0)


def test_stream_roundtrip_odd_padding():
    rng = np.random.default_rng(52)
    x1, x2, left, right, ev, _ = make_random_case(rng, 65)
    lanes = encode_stream_lanes(ev, left, right, x1, x2)
    # count beat declares n+padding = 66 as float
    assert lanes["left"][0][0, 0] == np.float32(66)
    ev2, l2, r2, x1b, x2b, n = decode_stream_lanes(lanes)
    assert n == 66
    np.testing.assert_array_equal(x1b[:65], x1)
    assert np.all(x1b[65] == 0)
    np.testing.assert_array_equal(l2, left)


def test_window_separate_roundtrip():
    rng = np.random.default_rng(53)
    x1, x2, left, right, ev, _ = make_random_case(rng, 70)
    lanes = encode_window_lanes(ev, left, right, x1, x2, layout="separate")
    # 70 sites -> 2 windows; data streams carry only zero-filled sites,
    # branch/EV streams re-send their block per window.
    assert lanes["left"][0].shape[0] == 128
    assert lanes["left_branch"][0].shape[0] == 2 * 4
    assert lanes["left_ev"][0].shape[0] == 2 * 4
    assert "right_ev" not in lanes  # the right Sep mover has no EV stream
    ev2, l2, r2, x1b, x2b = decode_window_lanes(lanes, n_sites=70,
                                                layout="separate")
    np.testing.assert_array_equal(ev2, ev)
    np.testing.assert_array_equal(l2, left)
    np.testing.assert_array_equal(r2, right)
    np.testing.assert_array_equal(x1b, x1)
    np.testing.assert_array_equal(x2b, x2)


def test_stream_separate_roundtrip_odd_padding():
    rng = np.random.default_rng(54)
    x1, x2, left, right, ev, _ = make_random_case(rng, 65)
    lanes = encode_stream_lanes(ev, left, right, x1, x2, layout="separate")
    # count packet rides beat 0 of every sBranch stream
    # (mm2sleft_memDNAstreamSep.cpp:49-61), NOT the data streams.
    for side in ("left_branch", "right_branch"):
        for lane in range(4):
            assert lanes[side][lane][0, 0] == np.float32(66)
    assert lanes["left"][0].shape[0] == 66     # 65 + odd zero pad
    ev2, l2, r2, x1b, x2b, n = decode_stream_lanes(lanes, layout="separate")
    assert n == 66
    np.testing.assert_array_equal(ev2, ev)
    np.testing.assert_array_equal(l2, left)
    np.testing.assert_array_equal(r2, right)
    np.testing.assert_array_equal(x1b[:65], x1)
    assert np.all(x1b[65] == 0)


needs_fixtures = pytest.mark.skipif(
    not fixtures.reference_fixtures_available(),
    reason="reference aie/data fixtures not mounted")


@needs_fixtures
def test_encoder_reproduces_reference_window_fixtures():
    """Re-encoding the decoded fixture case must reproduce the exact
    header beats of the checked-in aie/data files."""
    v = fixtures.load_window_vectors()
    lanes = encode_window_lanes(v.ev, v.left, v.right, v.x1, v.x2)
    for lane in range(4):
        ref_beats = fixtures.load_beats(
            f"{fixtures.REFERENCE_DATA_DIR}/inputcombinedevleft{lane}.txt")
        got = lanes["left"][lane]
        # header: EV half + transposed branch
        np.testing.assert_allclose(got[0:6], ref_beats[0:6], atol=5e-7)
        # first window of data beats
        np.testing.assert_allclose(got[6:6 + 64], ref_beats[6:6 + 64],
                                   atol=5e-7)


@needs_fixtures
def test_encoder_reproduces_reference_stream_fixtures():
    v = fixtures.load_stream_vectors()
    lanes = encode_stream_lanes(v.ev, v.left, v.right, v.x1, v.x2)
    sdir = f"{fixtures.REFERENCE_DATA_DIR}/stream"
    for lane in range(4):
        ref_beats = fixtures.load_beats(
            f"{sdir}/inputcombinedevright{lane}.txt")
        got = lanes["right"][lane]
        np.testing.assert_allclose(got[0:7], ref_beats[0:7], atol=5e-7)


@needs_fixtures
def test_separate_encoder_reproduces_reference_window_fixtures():
    """Window-Sep encoding must byte-match the dedicated-stream fixture
    files: inputEV0 (sEV), inputbranch{left,right}<c> (sBranch<c>) and
    inputdata{left,right}<c> (s<c>) for the first 64-site window."""
    v = fixtures.load_separate_vectors()
    lanes = encode_window_lanes(v.ev, v.left, v.right, v.x1, v.x2,
                                layout="separate")
    d = fixtures.REFERENCE_DATA_DIR
    np.testing.assert_allclose(lanes["left_ev"][0][0:4],
                               fixtures.load_beats(f"{d}/inputEV0.txt"),
                               atol=5e-7)
    for lane in range(4):
        np.testing.assert_allclose(
            lanes["left_branch"][lane][0:4],
            fixtures.load_beats(f"{d}/inputbranchleft{lane}.txt"),
            atol=5e-7)
        np.testing.assert_allclose(
            lanes["right_branch"][lane][0:4],
            fixtures.load_beats(f"{d}/inputbranchright{lane}.txt"),
            atol=5e-7)
        np.testing.assert_allclose(
            lanes["left"][lane][0:64],
            fixtures.load_beats(f"{d}/inputdataleft{lane}.txt")[0:64],
            atol=5e-7)
        np.testing.assert_allclose(
            lanes["right"][lane][0:64],
            fixtures.load_beats(f"{d}/inputdataright{lane}.txt")[0:64],
            atol=5e-7)


@needs_fixtures
def test_separate_encoder_reproduces_reference_stream_fixtures():
    """Stream-Sep: the count packet + transposed branch block must match
    aie/data/stream/inputbranch*<c> (count beat '64 0 0 0' first,
    mm2sleft_memDNAstreamSep.cpp:49-61)."""
    v = fixtures.load_separate_vectors()
    lanes = encode_stream_lanes(v.ev, v.left, v.right, v.x1[:64], v.x2[:64],
                                layout="separate")
    sdir = f"{fixtures.REFERENCE_DATA_DIR}/stream"
    for lane in range(4):
        np.testing.assert_allclose(
            lanes["left_branch"][lane],
            fixtures.load_beats(f"{sdir}/inputbranchleft{lane}.txt"),
            atol=5e-7)
        np.testing.assert_allclose(
            lanes["right_branch"][lane],
            fixtures.load_beats(f"{sdir}/inputbranchright{lane}.txt"),
            atol=5e-7)

def test_window1in_roundtrip_and_structure():
    from plf_tpu.io.streams import (decode_window1in_lanes,
                                    encode_window1in_lanes)

    rng = np.random.default_rng(53)
    x1, x2, left, right, ev, _ = make_random_case(rng, 70)
    lanes = encode_window1in_lanes(ev, left, right, x1, x2)
    # legacy hybrid: NO EV on the data streams (4 header beats, not 6)
    assert lanes["left"][0].shape[0] == 2 * (4 + 64)
    # full EV rides sEV, 4 beats per window, left mover only
    assert lanes["left_ev"][0].shape == (2 * 4, 4)
    assert "right_ev" not in lanes
    np.testing.assert_array_equal(lanes["left_ev"][0][:4], ev.reshape(4, 4))
    ev2, l2, r2, x1b, x2b = decode_window1in_lanes(lanes, n_sites=70)
    np.testing.assert_array_equal(ev2, ev.reshape(4, 4))
    np.testing.assert_array_equal(l2, np.asarray(left, np.float32).reshape(4, 4, 4))
    np.testing.assert_array_equal(r2, np.asarray(right, np.float32).reshape(4, 4, 4))
    np.testing.assert_array_equal(x1b, np.asarray(x1, np.float32).reshape(-1, 4, 4))
    # last-window zero fill (mm2sleft_uint128x4window1in.cpp:85-92)
    _, _, _, full1, _ = decode_window1in_lanes(lanes)
    assert np.all(full1[70:] == 0)


def test_window1in_data_beats_match_separate_layout():
    # the legacy movers split site records lane-per-category exactly like
    # the modern SEPARATE data streams -> byte-identical data sections
    from plf_tpu.io.streams import encode_window1in_lanes

    rng = np.random.default_rng(54)
    x1, x2, left, right, ev, _ = make_random_case(rng, 64)
    legacy = encode_window1in_lanes(ev, left, right, x1, x2)
    modern = encode_window_lanes(ev, left, right, x1, x2,
                                 layout="separate")
    for lane in range(4):
        np.testing.assert_array_equal(legacy["left"][lane][4:],
                                      modern["left"][lane])
        np.testing.assert_array_equal(legacy["right"][lane][4:],
                                      modern["right"][lane])


def test_output_lanes_s2mm_roundtrip():
    from plf_tpu.io.streams import decode_output_lanes, encode_output_lanes

    rng = np.random.default_rng(55)
    x3 = rng.random((70, 4, 4)).astype(np.float32)
    streams = encode_output_lanes(x3)
    # one beat per padded site on each of the 4 streams
    assert all(s.shape == (128, 4) for s in streams)
    back = decode_output_lanes(streams, n_sites=70)
    np.testing.assert_array_equal(back, x3)
    # padding beats exist on the wire but are dropped by the s2mm
    assert np.all(streams[0][70:] == 0)
