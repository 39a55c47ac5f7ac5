"""PNG modality gates (VERDICT r11 item 6): the compressed-format case —
round-trip through zlib DEFLATE + all five scanline filters, malformed-
payload quarantine, and the end-to-end query. The decoder must RECONSTRUCT
(the encoder cycles filter type r % 5 per scanline), so a wrong Sub/Up/
Average/Paeth implementation corrupts pixel_sum on any multi-row input."""

from __future__ import annotations

import struct
import zlib

import pytest

from dblp_to_csv_spark.operators.multimodal import (
    PNG_WIDTH,
    _paeth,
    png_decode,
    png_encode_gray,
)


def test_roundtrip_dims_and_sums():
    data = bytes(range(1, 100))  # 99 bytes -> 16 x 7 grid, filters 0..4 cycle
    w, h, px, tl = png_decode(png_encode_gray(data))
    assert (w, h) == (16, 7)
    assert px == sum(data)
    assert tl == 1


def test_all_five_filters_exercised():
    """A 6-row image uses filter types 0,1,2,3,4,0 — every filter's
    reconstruction contributes to the checksum."""
    data = bytes((i * 37 + 11) % 256 for i in range(PNG_WIDTH * 6))
    w, h, px, tl = png_decode(png_encode_gray(data))
    assert h == 6
    assert px == sum(data)


@pytest.mark.parametrize("n", [1, 15, 16, 17, 31, 32, 33, 256])
def test_roundtrip_heights(n):
    data = bytes((i * 7) % 256 for i in range(n))
    w, h, px, tl = png_decode(png_encode_gray(data))
    assert w == min(n, PNG_WIDTH)
    assert h == (n + w - 1) // w
    assert px == sum(data)
    assert tl == data[0]


def test_paeth_predictor_spec_cases():
    # spec tie-breaks: a before b before c
    assert _paeth(0, 0, 0) == 0
    assert _paeth(10, 20, 15) == 10 + 20 - 15 and _paeth(10, 20, 15) == 15
    assert _paeth(5, 5, 5) == 5
    assert _paeth(100, 2, 3) == 100  # p = 99; pa=1 < pb=97, pc=96 -> a
    assert _paeth(2, 100, 3) == 100  # p = 99; pb=1 smallest -> b
    # a=3,b=2,c=100: p=-95, pa=98, pb=97, pc=195 -> b wins
    assert _paeth(3, 2, 100) == 2


def _corrupt_crc(p: bytes) -> bytes:
    return p[:-1] + bytes([p[-1] ^ 0xFF])  # flip a bit in IEND's CRC


def _corrupt_idat(p: bytes) -> bytes:
    # flip a byte inside the IDAT payload (after sig+IHDR chunk = 8+25)
    i = 8 + 25 + 8 + 2
    out = bytearray(p)
    out[i] ^= 0xFF
    return bytes(out)


@pytest.mark.parametrize(
    "mutate,match",
    [
        (lambda p: p[1:], "not a PNG"),
        (lambda p: p[:20], "truncated"),
        (_corrupt_crc, "bad CRC"),
    ],
)
def test_malformed_rejected(mutate, match):
    p = png_encode_gray(b"hello world png")
    with pytest.raises(ValueError, match=match):
        png_decode(mutate(p))


def test_corrupt_deflate_stream_raises_zlib_error():
    """A bit-flip inside IDAT flips either the chunk CRC (ValueError) —
    which is what _corrupt_idat hits — while truly corrupt DEFLATE with a
    recomputed CRC raises zlib.error; the query path quarantines both."""
    p = bytearray(png_encode_gray(b"hello world png"))
    with pytest.raises(ValueError, match="bad CRC"):
        png_decode(_corrupt_idat(bytes(p)))
    # rebuild IDAT with garbage payload but a VALID CRC: inflate must fail
    garbage = b"\x00garbage-not-deflate"
    chunk = (
        struct.pack(">I", len(garbage))
        + b"IDAT"
        + garbage
        + struct.pack(">I", zlib.crc32(b"IDAT" + garbage) & 0xFFFFFFFF)
    )
    sig_ihdr = png_encode_gray(b"x")[: 8 + 25]
    iend = struct.pack(">I", 0) + b"IEND" + struct.pack(
        ">I", zlib.crc32(b"IEND") & 0xFFFFFFFF
    )
    with pytest.raises(zlib.error):
        png_decode(sig_ihdr + chunk + iend)


def test_empty_payload_not_encodable():
    with pytest.raises(ValueError):
        png_encode_gray(b"")


def test_query_quarantines_empty_docs(spark, tmp_path):
    import pandas as pd

    from dblp_to_csv_spark.registry import all_queries

    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["abc", ""],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [3, 0],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = (
        all_queries()["multimodal_decode_png"]
        .fn(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
    )
    assert bool(out.loc[1, "ok"]) is True
    assert out.loc[1, "pixel_sum"] == sum(b"abc")
    assert bool(out.loc[2, "ok"]) is False
    assert pd.isna(out.loc[2, "width"])


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        data=st.binary(min_size=1, max_size=400),
        width=st.integers(min_value=1, max_value=40),
    )
    def test_roundtrip_property(data, width):
        """Any non-empty payload and grid width round-trips through
        compress + filter + reconstruct: dims from the ceil-grid formula,
        pixel_sum = byte sum (pads are 0), top_left = first byte."""
        w, h, px, tl = png_decode(png_encode_gray(data, width))
        assert w == min(len(data), width)
        assert h == (len(data) + w - 1) // w
        assert px == sum(data)
        assert tl == data[0]

except ImportError:  # pragma: no cover - hypothesis is baked in, but gate anyway
    pass


def test_decode_streams_through_readstream(spark, tmp_path):
    """The decode stage is a narrow mapInPandas, so the SAME function body
    drives Structured Streaming unchanged — the multimodal ingest shape at
    scale is a stream of binary payloads, not a static table. availableNow
    over a parquet source → decode → memory sink; results must equal the
    batch decode of the same files."""
    import pandas as pd

    from dblp_to_csv_spark.operators.multimodal import (
        decode_png_payloads,
        png_encode_gray,
    )

    src = tmp_path / "src"
    src.mkdir()
    texts = {1: b"hello stream", 2: b"png bytes ride structured streaming", 3: b""}
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "payload": [png_encode_gray(t) if t else b"" for t in texts.values()],
        }
    ).to_parquet(src / "part-0.parquet")
    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .parquet(str(src))
    )
    q = (
        decode_png_payloads(stream)
        .writeStream.format("memory")
        .queryName("png_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM png_stream_test")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(got) == 3
    for doc_id, t in texts.items():
        if t:
            assert bool(got.loc[doc_id, "ok"]) is True
            assert got.loc[doc_id, "pixel_sum"] == sum(t)
        else:
            assert bool(got.loc[doc_id, "ok"]) is False


def test_dhash_identical_across_codecs():
    """The perceptual hash is a function of the PIXELS, not the container:
    the same seeding bytes encoded as BMP and as PNG (same 16-wide grid)
    must decode to the same matrix and therefore the same dHash bands —
    the cross-codec invariant that makes dedup_image_phash meaningful as
    'same image modulo re-encode'."""
    import numpy as np

    from dblp_to_csv_spark.operators.multimodal import (
        bmp_decode_pixels,
        bmp_encode_gray,
        dhash_bands,
        png_decode_pixels,
        png_encode_gray,
    )

    for data in (
        b"The quick brown fox jumps over the lazy dog 0123456789!",
        bytes(range(256)),
        b"x",
        b"ab" * 40,
    ):
        m_bmp = bmp_decode_pixels(bmp_encode_gray(data))
        m_png = png_decode_pixels(png_encode_gray(data))
        assert np.array_equal(m_bmp, m_png), f"pixel matrices differ for {data[:16]!r}"
        assert dhash_bands(m_bmp) == dhash_bands(m_png)
