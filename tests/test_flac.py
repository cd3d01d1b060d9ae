"""FLAC-subset codec unit tests (operators/flac_codec.py) — the codec
testing convention of test_jpeg.py: hypothesis round trips over
arbitrary sample blocks, published CRC check values as independent
pins, tamper detection through every integrity layer, and explicit
coverage of the Rice escape + predictor-selection branches."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_clickhouse_implementation_spark.operators.flac_codec import (
    BLOCK,
    _best_subframe,
    _flac_samples,
    _residuals,
    crc8,
    crc16,
    encode_flac,
    parse_flac,
)


def test_crc_published_check_values():
    # CRC-8 poly 0x07 init 0 (SMBUS/FLAC) and CRC-16/BUYPASS poly
    # 0x8005 init 0 non-reflected — standard check values for the
    # ASCII string "123456789".
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=BLOCK,
        max_size=BLOCK * 3,
    ).filter(lambda xs: len(xs) % BLOCK == 0)
)
def test_roundtrip_arbitrary_blocks(samples):
    dec = parse_flac(encode_flac(samples))
    assert dec["samples"] == samples
    assert dec["rate"] == 44100


def test_prediction_compresses_smooth_signals():
    samples = _flac_samples(7)
    payload = encode_flac(samples)
    # real compression: under half the raw 16-bit size for ramp+noise
    assert len(payload) < len(samples) * 2 * 0.6
    # and the encoder picked a genuine predictor for the ramp
    kind, _ = _best_subframe(samples, 16)
    assert kind.startswith(("fixed", "lpc")) and kind not in ("fixed0",)


def test_rice_escape_roundtrip():
    # alternating extremes make every residual huge: the 0b1111 escape
    # to raw residual bits must engage and still round-trip
    samples = [(-30000 if i % 2 else 30000) for i in range(BLOCK)]
    assert parse_flac(encode_flac(samples))["samples"] == samples


def test_residual_definitions_match_fixed_predictors():
    s = [3, 7, 12, 20, 31, 45]
    assert _residuals(s, 1) == [4, 5, 8, 11, 14]
    assert _residuals(s, 2) == [1, 3, 3, 3]
    # order-2 residual of a quadratic is constant
    q = [i * i for i in range(10)]
    assert set(_residuals(q, 2)) == {2}


def test_tamper_detection_every_layer():
    samples = _flac_samples(3)
    payload = encode_flac(samples)
    # STREAMINFO md5 region, frame header, residual body: flipping any
    # of them must raise (CRC-8, CRC-16, or the stream MD5)
    for pos in (30, 46, len(payload) - 20, len(payload) - 3):
        bad = bytearray(payload)
        bad[pos] ^= 0x01
        with pytest.raises((ValueError, NotImplementedError, IndexError)):
            parse_flac(bytes(bad))


def test_invalid_inputs_raise():
    with pytest.raises(ValueError):
        encode_flac([0] * (BLOCK + 1))  # not a multiple of BLOCK
    with pytest.raises(ValueError):
        encode_flac([40000] * BLOCK)  # out of 16-bit range
    with pytest.raises(ValueError):
        parse_flac(b"OggS" + b"\x00" * 40)  # wrong container


def test_stereo_roundtrip_and_decorrelation_modes():
    from kafka_clickhouse_implementation_spark.operators.flac_codec import (
        _CH_INDEP,
        _CH_LEFT_SIDE,
        _CH_MID_SIDE,
        _CH_RIGHT_SIDE,
        _flac_stereo,
    )

    for doc_id in (0, 7, 23):
        left, right = _flac_stereo(doc_id)
        dec = parse_flac(encode_flac(left, right=right))
        assert dec["channels"] == 2
        assert dec["samples"] == left and dec["right"] == right
        # the correlated channels make a side mode win over independent
        modes = {m["mode"] for m in dec["frames_meta"]}
        assert modes <= {_CH_INDEP, _CH_LEFT_SIDE, _CH_RIGHT_SIDE, _CH_MID_SIDE}
        assert modes & {_CH_LEFT_SIDE, _CH_RIGHT_SIDE, _CH_MID_SIDE}


def test_mid_side_reconstruction_negative_odd():
    # mid = (l+r)>>1 floors and side parity carries the lost bit: the
    # reconstruction must be exact for negative and odd sums too
    left = [(-5 + 13 * i) % 700 - 350 for i in range(BLOCK)]
    right = [(-v if i % 3 else v + 1) for i, v in enumerate(left)]
    dec = parse_flac(encode_flac(left, right=right))
    assert dec["samples"] == left and dec["right"] == right


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=2 * BLOCK,
        max_size=2 * BLOCK,
    )
)
def test_stereo_roundtrip_arbitrary(both):
    left, right = both[:BLOCK], both[BLOCK:]
    dec = parse_flac(encode_flac(left, right=right))
    assert dec["samples"] == left and dec["right"] == right


def test_lpc_subframe_wins_on_resonant_signal():
    s = [0, 800]
    for _ in range(2, BLOCK):
        s.append(int(1.8 * s[-1] - 0.95 * s[-2]) % 2000 - 1000)
    kind, _ = _best_subframe(s, 16)
    assert kind.startswith("lpc"), kind
    # and the LPC stream round-trips losslessly
    assert parse_flac(encode_flac(s))["samples"] == s


def test_constant_subframe_on_silence():
    s = [0] * BLOCK + [-7] * BLOCK
    payload = encode_flac(s)
    assert parse_flac(payload)["samples"] == s
    # two constant subframes: the whole stream is near-minimal
    assert len(payload) < 120
