"""JPEG codec tests (operators/jpeg_codec.py): entropy-coding round
trips against the IDCT ground truth, every declared unsupported-feature
error path, and the oracle geometry invariants."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_clickhouse_implementation_spark.operators.jpeg_codec import (
    _PAT,
    ZIGZAG,
    _ab,
    _doc_blocks,
    _idct_block,
    encode_jpeg_gray,
    parse_jpeg,
)


def _expected_pixels(blocks: list[list[int]], bw: int) -> list[int]:
    """Raster pixels computed DIRECTLY from the coefficients with the
    decoder's own IDCT — so a round-trip mismatch isolates the entropy
    coding (Huffman/bitstream/zigzag/prediction), not the transform."""
    tiles = [_idct_block(np.array(b)) for b in blocks]
    rows = []
    for by in range(len(blocks) // bw):
        for y in range(8):
            for bx in range(bw):
                rows.extend(int(v) for v in tiles[by * bw + bx][y])
    return rows


def test_zigzag_is_the_standard_permutation():
    assert sorted(ZIGZAG) == list(range(64))
    # first eight entries of the T.81 zigzag in natural indices
    assert ZIGZAG[:8] == [0, 1, 8, 16, 9, 2, 3, 10]


coeff_blocks = st.lists(
    st.lists(st.integers(min_value=-200, max_value=200), min_size=64, max_size=64),
    min_size=1,
    max_size=4,
)


@settings(max_examples=25, deadline=None)
@given(coeff_blocks)
def test_entropy_coding_roundtrip_arbitrary_blocks(blocks):
    """encode -> parse must reproduce the IDCT of the exact input
    coefficients for ARBITRARY coefficient patterns (not just the
    oracle's constant/pattern blocks): DC prediction chains, all run
    lengths, ZRL, EOB, and byte stuffing all get exercised across the
    random draws."""
    # clamp DC to the baseline category-11 range (|diff| <= 2047 holds
    # because each DC is within [-1024, 1016])
    for b in blocks:
        b[0] = max(-1024, min(1016, b[0] * 8))
    bw = len(blocks)
    payload = encode_jpeg_gray(blocks, width=8 * bw, height=8)
    dec = parse_jpeg(payload)
    assert dec["width"] == 8 * bw and dec["height"] == 8
    assert dec["values"] == _expected_pixels(blocks, bw)


def test_quant_table_is_applied():
    blk = [0] * 64
    blk[0] = 64  # DC 64 with quant 2 -> dequantized 128 -> flat 144
    quant = [2] * 64
    dec = parse_jpeg(encode_jpeg_gray([blk], 8, 8, quant=quant))
    assert dec["values"] == [144] * 64


def test_odd_dimensions_crop():
    """Width/height not multiples of 8: the MCU grid rounds up and the
    decoder crops back to the declared frame size."""
    a = 57
    blk = [0] * 64
    blk[0] = 8 * (a - 128)
    dec = parse_jpeg(encode_jpeg_gray([blk], width=5, height=3))
    assert dec["width"] == 5 and dec["height"] == 3
    assert dec["values"] == [a] * 15


def test_progressive_sof2_raises():
    payload = bytearray(encode_jpeg_gray(_doc_blocks(0), 24, 8))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        parse_jpeg(bytes(payload))


def test_restart_interval_raises():
    payload = encode_jpeg_gray(_doc_blocks(0), 24, 8)
    # splice a DRI segment with a nonzero interval before SOS
    i = payload.find(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x04"
    with pytest.raises(NotImplementedError, match="restart"):
        parse_jpeg(payload[:i] + dri + payload[i:])


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        parse_jpeg(b"\x89PNG\r\n\x1a\n")


def test_oracle_geometry_matches_query_formulas():
    """The q_multimodal_jpeg oracle's symbolic raster (constants a, b
    and the _PAT literal) is exactly what the decoder produces."""
    for doc_id in (0, 7, 23):
        a, b = _ab(doc_id)
        dec = parse_jpeg(encode_jpeg_gray(_doc_blocks(doc_id), 24, 8))
        vals = dec["values"]
        expect = []
        for y in range(8):
            expect += [a] * 8 + [b] * 8 + _PAT[8 * y : 8 * y + 8]
        assert vals == expect
        assert sum(vals) == 64 * a + 64 * b + sum(_PAT)


# ------------------------- GIF / LZW --------------------------------


lzw_streams = st.lists(st.integers(min_value=0, max_value=15), min_size=1, max_size=500)


@settings(max_examples=40, deadline=None)
@given(lzw_streams)
def test_lzw_roundtrip_arbitrary_streams(indices):
    """encode->decode identity for arbitrary index streams: dictionary
    growth, width bumps, and the KwKwK case all occur across draws."""
    from kafka_clickhouse_implementation_spark.operators.gif_codec import (
        lzw_decode,
        lzw_encode,
    )

    assert lzw_decode(lzw_encode(indices, 4), 4) == indices


def test_lzw_kwkwk_and_dictionary_reset():
    from kafka_clickhouse_implementation_spark.operators.gif_codec import (
        lzw_decode,
        lzw_encode,
    )

    # long single-symbol runs hit KwKwK immediately
    for k in (1, 2, 3, 17, 200):
        assert lzw_decode(lzw_encode([5] * k, 4), 4) == [5] * k
    # a long low-entropy stream grows the dictionary through multiple
    # width bumps (and past 4096 -> clear/reset on big inputs)
    idx = ([0, 1] * 3000) + list(range(16)) * 100
    assert lzw_decode(lzw_encode(idx, 4), 4) == idx


def test_gif_roundtrip_and_error_paths():
    from kafka_clickhouse_implementation_spark.operators.gif_codec import (
        GIF_PALETTE,
        _gif_indices,
        encode_gif,
        parse_gif,
    )

    payload = encode_gif(10, 6, GIF_PALETTE, _gif_indices(3))
    dec = parse_gif(payload)
    expect = []
    for i in _gif_indices(3):
        expect += GIF_PALETTE[3 * i : 3 * i + 3]
    assert (dec["width"], dec["height"]) == (10, 6)
    assert dec["values"] == expect

    with pytest.raises(ValueError, match="signature"):
        parse_gif(b"NOTAGIF")
    # flip the interlace flag in the image descriptor
    mut = bytearray(payload)
    i = mut.index(0x2C, 6)
    mut[i + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        parse_gif(bytes(mut))


def test_decode_image_dispatches_gif():
    from kafka_clickhouse_implementation_spark.operators.gif_codec import (
        GIF_PALETTE,
        encode_gif,
    )
    from kafka_clickhouse_implementation_spark.operators.multimodal import (
        decode_image,
    )

    dec = decode_image(encode_gif(2, 2, GIF_PALETTE, [0, 1, 2, 3]))
    assert dec["width"] == 2 and len(dec["values"]) == 12


# ------------------------- G.711 mu-law -----------------------------


def test_mulaw_identity_and_error_bound():
    from kafka_clickhouse_implementation_spark.operators.multimodal import (
        mulaw_decode_byte,
        mulaw_encode_sample,
    )

    # byte-level identity (except 0x7F: negative zero re-encodes as
    # positive zero 0xFF — the classic G.711 quirk)
    for b in range(256):
        if b != 0x7F:
            assert mulaw_encode_sample(mulaw_decode_byte(b)) == b
    assert mulaw_encode_sample(mulaw_decode_byte(0x7F)) == 0xFF
    # compansion error is bounded by the top segment's step size
    for s in range(-32000, 32001, 97):
        d = mulaw_decode_byte(mulaw_encode_sample(s))
        assert abs(d - s) <= 512


def test_mulaw_wav_container_roundtrip():
    from kafka_clickhouse_implementation_spark.operators.multimodal import (
        MULAW_TABLE,
        encode_wav_mulaw,
        parse_wav,
    )

    raw = bytes(range(256))
    dec = parse_wav(encode_wav_mulaw(raw, rate=8000))
    assert dec["format"] == "wav-mulaw"
    assert dec["sample_rate"] == 8000
    assert dec["values"] == [MULAW_TABLE[b] for b in raw]


# ------------------------- IMA ADPCM --------------------------------


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=-20000, max_value=20000), min_size=1, max_size=300))
def test_adpcm_encode_decode_state_stays_in_sync(samples):
    """encode keeps its predictor in sync with decode: re-encoding the
    DECODED signal must reproduce the identical nibble stream (the
    fixed-point property of a predictive codec)."""
    from kafka_clickhouse_implementation_spark.operators.multimodal import (
        adpcm_decode,
        adpcm_encode,
    )

    nibs = adpcm_encode(samples)
    rec = adpcm_decode(nibs)
    assert adpcm_encode(rec) == nibs


def test_adpcm_tracks_smooth_signals():
    import math

    from kafka_clickhouse_implementation_spark.operators.multimodal import (
        adpcm_decode,
        adpcm_encode,
    )

    sm = [int(8000 * math.sin(i / 7)) for i in range(300)]
    rec = adpcm_decode(adpcm_encode(sm))
    assert max(abs(a - b) for a, b in zip(sm[50:], rec[50:])) < 1500


def test_adpcm_wav_container_roundtrip():
    from kafka_clickhouse_implementation_spark.operators.multimodal import (
        adpcm_decode,
        encode_wav_adpcm,
        parse_wav,
    )

    nibs = [(5 * i + 3) % 16 for i in range(64)]
    dec = parse_wav(encode_wav_adpcm(nibs, rate=8000))
    assert dec["format"] == "wav-adpcm"
    assert dec["values"] == [0] + adpcm_decode(nibs)
    assert dec["n_samples"] == 65


# ------------------------- color JPEG -------------------------------


def test_color_jpeg_roundtrip_matches_python_conversion():
    """3-component decode: DC-only planes are exact, so the RGB output
    must equal a plain-Python JFIF conversion of the encoded (Y,Cb,Cr)
    constants — per-MCU, exercising both predictor chains and both
    table slots."""
    import math as _math

    from kafka_clickhouse_implementation_spark.operators.jpeg_codec import (
        _dc_block,
        encode_jpeg_color,
        parse_jpeg,
    )

    def rgb(y, cb, cr):
        conv = (
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        )
        return [max(0, min(255, int(_math.floor(v + 0.5)))) for v in conv]

    mcus = [(80, 40, 200), (200, 220, 30)]
    payload = encode_jpeg_color(
        [_dc_block(y) for y, _, _ in mcus],
        [_dc_block(cb) for _, cb, _ in mcus],
        [_dc_block(cr) for _, _, cr in mcus],
        16,
        8,
    )
    dec = parse_jpeg(payload)
    assert (dec["width"], dec["height"]) == (16, 8)
    vals = dec["values"]
    expect_row = rgb(*mcus[0]) * 8 + rgb(*mcus[1]) * 8
    assert vals == expect_row * 8


def test_jpeg_420_roundtrip_quadrants():
    """4:2:0: four Y blocks per MCU with distinct constants must land
    in the right quadrants; replicated chroma applies everywhere."""
    import math as _math

    from kafka_clickhouse_implementation_spark.operators.jpeg_codec import (
        _dc_block,
        encode_jpeg_420,
        parse_jpeg,
    )

    def rgb(y, cb, cr):
        conv = (
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        )
        return [max(0, min(255, int(_math.floor(v + 0.5)))) for v in conv]

    ys, cb, cr = [60, 110, 160, 210], 100, 180
    payload = encode_jpeg_420(
        [_dc_block(v) for v in ys], [_dc_block(cb)], [_dc_block(cr)], 16, 16
    )
    dec = parse_jpeg(payload)
    assert (dec["width"], dec["height"]) == (16, 16)
    vals = dec["values"]
    top = (rgb(ys[0], cb, cr) * 8 + rgb(ys[1], cb, cr) * 8) * 8
    bot = (rgb(ys[2], cb, cr) * 8 + rgb(ys[3], cb, cr) * 8) * 8
    assert vals == top + bot


def test_jpeg_422_roundtrip():
    """4:2:2 (Y 2x1): two Y blocks per 16x8 MCU, chroma replicated
    horizontally — a REAL 4:2:2 entropy stream from encode_jpeg_422,
    decoded by the same generalized MCU grid as 4:2:0."""
    import math as _math

    from kafka_clickhouse_implementation_spark.operators.jpeg_codec import (
        _dc_block,
        encode_jpeg_422,
        parse_jpeg,
    )

    def rgb(y, cbv, crv):
        conv = (
            y + 1.402 * (crv - 128.0),
            y - 0.344136 * (cbv - 128.0) - 0.714136 * (crv - 128.0),
            y + 1.772 * (cbv - 128.0),
        )
        return [max(0, min(255, int(_math.floor(v + 0.5)))) for v in conv]

    dec = parse_jpeg(
        encode_jpeg_422(
            [_dc_block(70), _dc_block(180)], [_dc_block(90)], [_dc_block(160)], 16, 8
        )
    )
    assert (dec["width"], dec["height"]) == (16, 8)
    row = rgb(70, 90, 160) * 8 + rgb(180, 90, 160) * 8
    assert dec["values"] == row * 8


def test_gif89a_animation_roundtrip_and_extension_walk():
    """Multi-frame GIF89a: distinct per-frame delays, loop count, and
    a foreign comment extension that the parser must skip by its
    sub-block structure."""
    from kafka_clickhouse_implementation_spark.operators.gif_codec import (
        GIF_PALETTE,
        encode_gif89a,
        parse_gif89a,
    )

    w, h = 7, 4
    frames = [
        (3, [(i + f) % 16 for i in range(w * h)]) for f in range(3)
    ]
    frames[1] = (25, frames[1][1])  # one slow frame
    payload = encode_gif89a(w, h, GIF_PALETTE, frames, loops=7)
    dec = parse_gif89a(payload)
    assert dec["loops"] == 7
    assert [fr["delay_cs"] for fr in dec["frames"]] == [3, 25, 3]
    for f, fr in enumerate(dec["frames"]):
        exp = []
        for idx in frames[f][1]:
            exp.extend(GIF_PALETTE[3 * idx : 3 * idx + 3])
        assert fr["values"] == exp
    # splice a comment extension before the first GCE: still decodes
    at = payload.index(b"\x21\xf9")
    spliced = payload[:at] + b"\x21\xfe\x05hello\x00" + payload[at:]
    assert parse_gif89a(spliced)["frames"][0]["values"] == dec["frames"][0]["values"]
    # an 87a stream is not an animation
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_gif89a(b"GIF87a" + payload[6:])


# ----------------------------- C137: progressive -----------------------------


def _prog_seq_agree(blocks, w, h):
    from kafka_clickhouse_implementation_spark.operators.jpeg_codec import (
        encode_jpeg_gray,
        encode_jpeg_progressive,
        parse_jpeg,
        parse_jpeg_progressive,
    )

    seq = parse_jpeg(encode_jpeg_gray(blocks, w, h))
    pro = parse_jpeg_progressive(encode_jpeg_progressive(blocks, w, h))
    assert (seq["width"], seq["height"]) == (pro["width"], pro["height"])
    assert seq["values"] == pro["values"]
    return pro


def test_progressive_equals_sequential_across_layouts():
    """The defining progressive contract: the 4-scan SOF2 stream must
    reconstruct the EXACT pixels of the baseline stream for the same
    coefficient blocks — odd DCs (refinement 1-bits), empty-band runs
    (EOBRUN with appended bits), in-band ZRL gaps all included."""
    import random

    from kafka_clickhouse_implementation_spark.operators.jpeg_codec import (
        ZIGZAG,
    )

    rng = random.Random(20260814)
    for _ in range(25):
        nb = rng.randint(1, 9)
        blocks = []
        for _i in range(nb):
            blk = [0] * 64
            blk[0] = rng.randint(-1024, 1016)
            if rng.random() < 0.6:
                for _j in range(rng.randint(1, 5)):
                    blk[ZIGZAG[rng.randint(1, 63)]] = rng.randint(-255, 255)
            blocks.append(blk)
        pro = _prog_seq_agree(blocks, 8 * nb, 8)
        assert pro["n_scans"] == 4


def test_progressive_eobrun_and_zrl_actually_occur():
    """The query's block layout must really exercise EOBn (appended
    bit) and in-band ZRL: the optimized per-scan DHTs must contain the
    EOB1 symbol (0x10) in the 1..5 band scan and ZRL (0xF0) in the
    6..63 band scan."""
    import struct

    from kafka_clickhouse_implementation_spark.operators.jpeg_codec import (
        _JPEG_H,
        _JPEG_W,
        _prog_doc_blocks,
        encode_jpeg_progressive,
    )

    payload = encode_jpeg_progressive(_prog_doc_blocks(3), _JPEG_W, _JPEG_H)
    ac_tables = []
    pos = 2
    while pos < len(payload) - 1:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xC4:
            (seglen,) = struct.unpack_from(">H", payload, pos + 2)
            body = payload[pos + 4 : pos + 2 + seglen]
            if body[0] == 0x11:  # AC table 1 (per-scan optimized)
                n = sum(body[1:17])
                ac_tables.append(list(body[17 : 17 + n]))
            pos += 2 + seglen
        else:
            pos += 1
    assert len(ac_tables) == 2
    assert 0x10 in ac_tables[0]  # EOB1 in the 1..5 band scan
    assert 0xF0 in ac_tables[1]  # ZRL inside the 6..63 band scan
    assert 0x10 in ac_tables[1]


def test_progressive_dc_low_bit_decodes_to_same_pixel():
    """8*(v-128) + (v&1) must still decode to constant v (the +1/8 is
    under the half-up threshold) — for both parities and the extremes."""
    from kafka_clickhouse_implementation_spark.operators.jpeg_codec import (
        encode_jpeg_progressive,
        parse_jpeg_progressive,
    )

    for v in (0, 1, 2, 127, 128, 129, 254, 255):
        blk = [0] * 64
        blk[0] = 8 * (v - 128) + (v & 1)
        dec = parse_jpeg_progressive(encode_jpeg_progressive([blk], 8, 8))
        assert dec["values"] == [v] * 64


def test_progressive_subset_guards_and_tamper():
    import pytest

    from kafka_clickhouse_implementation_spark.operators.jpeg_codec import (
        _JPEG_H,
        _JPEG_W,
        _prog_doc_blocks,
        encode_jpeg_gray,
        encode_jpeg_progressive,
        parse_jpeg,
        parse_jpeg_progressive,
    )

    blocks = _prog_doc_blocks(5)
    prog = encode_jpeg_progressive(blocks, _JPEG_W, _JPEG_H)
    base = encode_jpeg_gray(blocks, _JPEG_W, _JPEG_H)
    # cross-parser rejection: each parser owns exactly its SOF type
    with pytest.raises(NotImplementedError):
        parse_jpeg(prog)
    with pytest.raises(NotImplementedError):
        parse_jpeg_progressive(base)
    # tampering with entropy data changes the output or fails loudly
    good = parse_jpeg_progressive(prog)["values"]
    sos2 = prog.index(b"\xff\xda", prog.index(b"\xff\xda") + 2)
    flip = bytearray(prog)
    tb = sos2 + 10
    flip[tb] ^= 0x40
    if flip[tb] in (0xFF, 0x00) or flip[tb - 1] == 0xFF:
        flip[tb] ^= 0x60
    try:
        assert parse_jpeg_progressive(bytes(flip))["values"] != good
    except (ValueError, KeyError, IndexError, NotImplementedError):
        pass


# ------------------------- C139: successive approximation -------------------


def test_successive_approximation_equals_sequential():
    """AC refinement round trip across three scan scripts — single
    refinement (Al 1->0), a two-level Al 2->1->0 chain, and mixed
    spectral-selection + approximation — against the baseline pixels,
    over layouts dense in ±1 coefficients (newly-significant-only),
    pure correction blocks, and EOB-run members."""
    import random

    from kafka_clickhouse_implementation_spark.operators.jpeg_codec import (
        _SA_SCANS,
        ZIGZAG,
        encode_jpeg_gray,
        encode_jpeg_progressive,
        parse_jpeg,
        parse_jpeg_progressive,
    )

    sa2 = [(0, 0, 0, 2), (1, 63, 0, 2), (0, 0, 1, 1), (1, 63, 1, 1),
           (0, 0, 1, 0), (1, 63, 1, 0)]
    mix = [(0, 0, 0, 1), (1, 5, 0, 1), (6, 63, 0, 0), (0, 0, 1, 0),
           (1, 5, 1, 0)]
    rng = random.Random(20260815)
    for _ in range(40):
        nb = rng.randint(1, 9)
        blocks = []
        for _i in range(nb):
            blk = [0] * 64
            blk[0] = rng.randint(-1024, 1016)
            style = rng.random()
            if style < 0.3:
                for _j in range(rng.randint(1, 4)):
                    blk[ZIGZAG[rng.randint(1, 63)]] = rng.choice([-1, 1])
            elif style < 0.8:
                for _j in range(rng.randint(1, 8)):
                    blk[ZIGZAG[rng.randint(1, 63)]] = rng.randint(-300, 300)
            blocks.append(blk)
        want = parse_jpeg(encode_jpeg_gray(blocks, 8 * nb, 8))["values"]
        for scans in (_SA_SCANS, sa2, mix):
            got = parse_jpeg_progressive(
                encode_jpeg_progressive(blocks, 8 * nb, 8, scans=scans)
            )
            assert got["values"] == want
            assert got["n_scans"] == len(scans)


def test_sa_pattern_pm1_exists_only_in_refinement():
    """Decoding only the first two scans (truncate before the DC/AC
    refinement SOS) must yield the pattern WITHOUT the ±1 pair — i.e.
    the refinement scan is genuinely load-bearing for them."""
    import numpy as np

    from kafka_clickhouse_implementation_spark.operators.jpeg_codec import (
        _JPEG_H,
        _JPEG_W,
        _SA_SCANS,
        _idct_block,
        _prog_pattern_block,
        _sa_doc_blocks,
        _sa_pattern_block,
        encode_jpeg_progressive,
        parse_jpeg_progressive,
    )

    payload = encode_jpeg_progressive(_sa_doc_blocks(7), _JPEG_W, _JPEG_H,
                                      scans=_SA_SCANS)
    # cut after the second entropy segment: find the 3rd SOS and
    # truncate there, closing with EOI
    sos_positions = []
    at = 0
    while True:
        at = payload.find(b"\xff\xda", at + 1)
        if at < 0:
            break
        sos_positions.append(at)
    assert len(sos_positions) == 4
    partial = payload[: sos_positions[2]] + b"\xff\xd9"
    dec = parse_jpeg_progressive(partial)
    assert dec["n_scans"] == 2
    full = parse_jpeg_progressive(payload)
    assert dec["values"] != full["values"]
    # the partial image is exactly (coeff >> 1) << 1 of the originals
    def halved(blk):
        return [((v >> 1) << 1) if i == 0 else (abs(v) >> 1 << 1) * (1 if v >= 0 else -1)
                for i, v in enumerate(blk)]
    want_pat = _idct_block(np.array(halved(_sa_pattern_block()))).ravel()
    got_pat = np.array(dec["values"]).reshape(8, 24)[:, 16:24].ravel()
    assert list(got_pat) == [int(v) for v in want_pat]
    # and the full decode restores the C137 pattern + the ±1 pair
    assert full["values"] != parse_jpeg_progressive(
        encode_jpeg_progressive(
            [_sa_doc_blocks(7)[0], _sa_doc_blocks(7)[1], _prog_pattern_block()],
            _JPEG_W, _JPEG_H, scans=_SA_SCANS)
    )["values"]
