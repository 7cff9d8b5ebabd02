"""Multimodal extension: typed metadata, frame sampling, Arrow-batched
decode plumbing (real codec stubbed — not in this image)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.operators.multimodal import (
    _fake_decode_features,
    decode_image,
    media_table,
    mm_decode_features,
)


def test_decode_stub_is_gated():
    with pytest.raises(NotImplementedError, match="image library"):
        decode_image(b"\x89PNG...")


def test_media_table_shape(spark, sf_dir):
    media = media_table(spark, sf_dir)
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_features_match_local(spark, sf_dir):
    """The Arrow-batched mapInPandas path must equal a driver-side
    recomputation on raw text bytes."""
    got = {r.media_id: r for r in mm_decode_features(spark, sf_dir).limit(50).collect()}
    docs = {
        r.doc_id: r.text
        for r in read_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id").isin([int(k) for k in got]))
        .collect()
    }
    assert got
    for mid, row in got.items():
        n, mean, hist = _fake_decode_features(docs[mid].encode("utf-8"))
        assert row.n_bytes == n
        assert row.mean_byte == pytest.approx(mean)
        # byte_hist is CSV-serialized so the oracle gate's pandas
        # canonicalizer never sees a list cell (scalar-only output rule)
        got_hist = [int(v) for v in row.byte_hist.split(",")]
        assert got_hist == hist
        assert sum(got_hist) == row.n_bytes


def test_decode_ppm_handcrafted_pixels():
    """P6 with distinct pixels + a header comment: exact byte passthrough."""
    from hopspark.operators.multimodal import decode_image

    pixels = bytes(range(2 * 2 * 3))  # 2x2, values 0..11
    payload = b"P6\n# synthetic\n2 2\n255\n" + pixels
    d = decode_image(payload)
    assert (d.width, d.height, d.channels) == (2, 2, 3)
    assert d.pixels == pixels


def test_decode_bmp_bottom_up_padding_and_bgr():
    """24-bit BMP, 2x2 bottom-up with 2-byte row padding: decoder must flip
    rows to top-down, strip padding, and swap BGR->RGB."""
    import struct

    from hopspark.operators.multimodal import decode_image

    w, h = 2, 2
    row_size = (w * 3 + 3) // 4 * 4  # 8 (2 pad bytes)
    # target top-down RGB rows: row0 = (1,2,3),(4,5,6); row1 = (7,8,9),(10,11,12)
    top_down = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]]
    pix = bytearray()
    for y in reversed(range(h)):  # file stores bottom-up
        for r, g, b in top_down[y]:
            pix += bytes((b, g, r))  # BGR on disk
        pix += b"\xee" * (row_size - w * 3)  # padding junk
    data_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(pix), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 0, 0, 0, 0)
    )
    d = decode_image(bytes(header + pix))
    assert (d.width, d.height, d.channels) == (2, 2, 3)
    assert d.pixels == bytes(range(1, 13))


def test_decode_unsupported_format_still_raises():
    import pytest as _pytest

    from hopspark.operators.multimodal import decode_image

    with _pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_ppm_encode_decode_roundtrip():
    from hopspark.operators.multimodal import decode_image, ppm_encode

    d = decode_image(ppm_encode(5, 3, 77))
    assert (d.width, d.height) == (5, 3)
    assert set(d.pixels) == {77} and len(d.pixels) == 45


# ------------------------------------------------------------- WAV codec


def test_wav_encode_decode_roundtrip():
    from hopspark.operators.multimodal import decode_audio, wav_encode

    samples = [0, 100, -100, 32767, -32768, 7]
    d = decode_audio(wav_encode(16000, samples))
    assert (d.sample_rate, d.channels, d.bits) == (16000, 1, 16)
    assert d.samples == samples


def test_wav_stereo_interleave():
    from hopspark.operators.multimodal import decode_audio, wav_encode

    # L/R interleaved frames survive as written
    d = decode_audio(wav_encode(8000, [1, -1, 2, -2], channels=2))
    assert d.channels == 2
    assert d.samples == [1, -1, 2, -2]


def test_wav_8bit_unsigned_centering():
    import struct

    from hopspark.operators.multimodal import decode_audio

    # hand-built 8-bit file: 0x80 is silence (0), 0xFF is +127, 0x00 is -128
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 3) + bytes([0x80, 0xFF, 0x00])
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_audio(payload).samples == [0, 127, -128]


def test_wav_skips_unknown_chunks_with_alignment():
    import struct

    from hopspark.operators.multimodal import decode_audio

    # LIST chunk with ODD size before fmt/data — walker must pad to even
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + struct.pack("<2h", 5, -5)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_audio(payload).samples == [5, -5]


def test_wav_non_pcm_and_non_wav_raise():
    import struct

    import pytest as _pytest

    from hopspark.operators.multimodal import decode_audio

    with _pytest.raises(NotImplementedError, match="audio library"):
        decode_audio(b"\xff\xfb\x90\x00 mp3 frame")
    fmt = struct.pack("<HHIIHH", 85, 1, 44100, 0, 0, 0)  # tag 85 = MP3
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 0)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with _pytest.raises(NotImplementedError, match="PCM"):
        decode_audio(payload)
