"""Pixel-exact referee for the pure-Python PNG/PPM codec behind the
multimodal decode seam (VERDICT r5 #4): hand-assembled PNG byte
strings with manually computed filter bytes (independent of our own
encoder), full filter-matrix round trips vs numpy ground truth, and
header-triage rejection."""

import struct
import zlib

import numpy as np
import pytest

from graphsense_datafeed_spark.operators.imagecodec import (
    PngFormatError,
    png_decode,
    png_encode,
    png_parse_header,
    ppm_decode,
    ppm_encode,
)

SIG = b"\x89PNG\r\n\x1a\n"


def chunk(ctype, data):
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def hand_png(w, h, color, scanlines):
    """Assemble a PNG from already-filtered scanlines by hand."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(scanlines)
    return SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_hand_assembled_sub_filter():
    # 2x2 RGB, pixels row0 = (10,20,30),(13,25,37); row1 = (1,2,3),(1,2,3)
    # filter 1 (Sub): first pixel raw, second = delta from left pixel
    row0 = bytes([1, 10, 20, 30, 3, 5, 7])  # 13-10, 25-20, 37-30
    row1 = bytes([1, 1, 2, 3, 0, 0, 0])
    w, h, ch, px = png_decode(hand_png(2, 2, 2, [row0, row1]))
    assert (w, h, ch) == (2, 2, 3)
    assert px == bytes([10, 20, 30, 13, 25, 37, 1, 2, 3, 1, 2, 3])


def test_hand_assembled_up_filter():
    # 2x2 gray: row0 = (100, 200) raw; row1 = (110, 190) as Up deltas
    row0 = bytes([0, 100, 200])
    row1 = bytes([2, 10, (190 - 200) & 0xFF])
    w, h, ch, px = png_decode(hand_png(2, 2, 0, [row0, row1]))
    assert (w, h, ch) == (2, 2, 1)
    assert px == bytes([100, 200, 110, 190])


def test_hand_assembled_average_and_paeth():
    # 2x2 gray, target pixels: [[8, 12], [20, 26]]
    # row0 Average: recon(x) = filt + floor((left + 0)/2)
    #   filt0 = 8; filt1 = 12 - floor(8/2) = 8
    # row1 Paeth: a=left, b=above, c=above-left
    #   x0: pred = paeth(0, 8, 0) = 8  -> filt = 20 - 8 = 12
    #   x1: a=20 b=12 c=8; p=24; pa=4 pb=12 pc=16 -> pred=a=20; filt=6
    row0 = bytes([3, 8, 8])
    row1 = bytes([4, 12, 6])
    _, _, _, px = png_decode(hand_png(2, 2, 0, [row0, row1]))
    assert px == bytes([8, 12, 20, 26])


@pytest.mark.parametrize("channels,color", [(1, 0), (3, 2), (4, 6)])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_round_trip_filter_matrix(channels, color, filter_type):
    rng = np.random.RandomState(channels * 10 + filter_type)
    w, h = 9, 7
    px = rng.randint(0, 256, size=w * h * channels, dtype=np.uint8).tobytes()
    enc = png_encode(px, w, h, channels, filter_type)
    assert png_parse_header(enc) == (w, h, channels)
    dw, dh, dch, dec = png_decode(enc)
    assert (dw, dh, dch) == (w, h, channels)
    assert dec == px  # byte-exact


def test_ppm_round_trip_and_triage():
    px = bytes(range(192))
    assert ppm_decode(ppm_encode(px, 8, 8)) == (8, 8, 3, px)
    with pytest.raises(PngFormatError):
        ppm_decode(b"P3\n8 8\n255\n" + px)  # ascii PPM rejected


def test_header_triage_rejects_garbage():
    for bad in (b"", b"JUNK" * 32, SIG + b"\x00" * 40):
        with pytest.raises(PngFormatError):
            png_parse_header(bad)
    # 16-bit depth rejected
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    payload = SIG + chunk(b"IHDR", ihdr)
    with pytest.raises(PngFormatError):
        png_parse_header(payload)


def test_decode_codec_operator_covers_both_containers(spark, sf_dir):
    from graphsense_datafeed_spark.registry import QUERIES

    rows = QUERIES["multimodal_decode_codec"](spark, sf_dir).collect()
    assert rows
    by_container = {}
    filters = set()
    for r in rows:
        by_container.setdefault(r["container"], 0)
        by_container[r["container"]] += 1
        if r["container"] == "png":
            filters.add(r["filter_used"])
        assert (r["width"], r["height"], r["channels"]) == (8, 8, 3)
        assert len(r["pixel_sha256"]) == 64
    assert set(by_container) == {"png", "ppm"}
    assert filters == {0, 1, 2, 3, 4}  # every PNG filter exercised


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 17),
        h=st.integers(1, 13),
        ch=st.sampled_from([1, 3, 4]),
        ft=st.integers(0, 4),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_png_round_trip_property(w, h, ch, ft, seed):
        rng = np.random.RandomState(seed % (2**32 - 1))
        px = rng.randint(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
        enc = png_encode(px, w, h, ch, ft)
        assert png_parse_header(enc) == (w, h, ch)
        assert png_decode(enc) == (w, h, ch, px)


def test_wav_round_trip_and_triage():
    from graphsense_datafeed_spark.operators.imagecodec import (
        wav_decode,
        wav_encode,
        wav_parse_header,
    )

    pcm = bytes(range(256))  # 128 int16 frames mono
    enc = wav_encode(pcm, 16000, 1, 16)
    assert wav_parse_header(enc) == (16000, 1, 16, 128)
    assert wav_decode(enc) == (16000, 1, 16, pcm)
    # stereo 8-bit
    enc2 = wav_encode(pcm, 8000, 2, 8)
    assert wav_parse_header(enc2) == (8000, 2, 8, 128)
    # triage rejections: bad magic, truncated, float format
    import struct as _st

    with pytest.raises(PngFormatError):
        wav_parse_header(b"RIFF" + b"\x00" * 40)
    ieee = wav_encode(pcm, 8000, 1, 16)
    # corrupt the audio-format field to 3 (IEEE float)
    idx = ieee.index(b"fmt ") + 8
    bad = ieee[:idx] + _st.pack("<H", 3) + ieee[idx + 2 :]
    with pytest.raises(PngFormatError):
        wav_parse_header(bad)


def test_wav_operator_features_match_struct_parse(spark, sf_dir):
    import hashlib
    import struct as _st

    import duckdb

    from graphsense_datafeed_spark.registry import QUERIES

    rows = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_audio_wav"](spark, sf_dir).collect()
    }
    assert rows
    # independent referee for 5 docs: recompute features from md5 text
    docs = duckdb.sql(
        f"SELECT doc_id, md5(text) AS h FROM '{sf_dir}/documents.parquet' "
        "WHERE doc_id < 5 ORDER BY doc_id"
    ).fetchall()
    for doc_id, h in docs:
        pcm = bytes.fromhex(h * 8)
        samples = _st.unpack("<64h", pcm)
        r = rows[doc_id]
        assert r["n_frames"] == 64
        assert r["peak_abs"] == max(abs(s) for s in samples)
        assert r["sum_sq"] == sum(s * s for s in samples)
        assert (
            r["pcm_sha256"]
            == hashlib.sha256(pcm.hex().upper().encode()).hexdigest()
        )
        assert r["sample_rate"] == 8000 + (doc_id % 3) * 4000


def test_y4m_round_trip_and_triage():
    from graphsense_datafeed_spark.operators.imagecodec import (
        y4m_decode,
        y4m_encode,
        y4m_parse_header,
    )

    frames = [bytes(range(24)), bytes(range(100, 124))]
    enc = y4m_encode(frames, 4, 4, 25)
    assert y4m_parse_header(enc) == (4, 4, 25)
    assert y4m_decode(enc) == (4, 4, 25, frames)
    with pytest.raises(PngFormatError):
        y4m_parse_header(b"YUV4MPEG2 W3 H4 F25:1 C420\n")  # odd width
    with pytest.raises(PngFormatError):
        y4m_parse_header(b"NOTAVIDEO\n")
    with pytest.raises(PngFormatError):
        # C444 unsupported by this decoder
        y4m_parse_header(b"YUV4MPEG2 W4 H4 F25:1 C444\n")
    truncated = enc[:-3]
    with pytest.raises(PngFormatError):
        y4m_decode(truncated)
