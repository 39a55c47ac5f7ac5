"""The pure-Python BMP codec behind multimodal_decode_bmp (r9 verdict item
6): spec fidelity of the encoder, real-parse behavior of the decoder
(strides, row order, malformed rejection), and the quarantine path."""

from __future__ import annotations

import struct

import pytest

from dblp_to_csv_spark.operators.multimodal import (
    BMP_WIDTH,
    bmp_decode,
    bmp_encode_gray,
)


def test_roundtrip_dims_and_sums():
    data = bytes(range(1, 41))  # 40 bytes -> 16 x 3 grid, 8 pad zeros
    w, h, px, tl = bmp_decode(bmp_encode_gray(data))
    assert (w, h) == (16, 3)
    assert px == sum(data)  # pad pixels contribute 0
    assert tl == data[0]  # top-left survives the bottom-up storage flip


def test_narrow_image_stride_padding():
    # w=5 -> raw row 15 bytes, stride 16: decoder must skip the pad byte
    data = bytes([200] * 5)
    w, h, px, tl = bmp_decode(bmp_encode_gray(data))
    assert (w, h, px, tl) == (5, 1, 1000, 200)


@pytest.mark.parametrize("n", [1, 15, 16, 17, 33])
def test_roundtrip_heights(n):
    data = bytes([7] * n)
    w, h, px, _ = bmp_decode(bmp_encode_gray(data))
    assert w == min(n, BMP_WIDTH)
    assert h == (n + w - 1) // w
    assert px == 7 * n


def test_top_down_rows_supported():
    """Negative height = top-down storage: a real-world BMP variant the
    encoder never emits but the parser must honor."""
    data = bytes(range(10, 42))  # 32 bytes -> 16 x 2
    buf = bytearray(bmp_encode_gray(data))
    h = struct.unpack_from("<i", buf, 22)[0]
    stride = (16 * 3 + 3) & ~3
    # flip storage to top-down: negate height, reverse the row blocks
    struct.pack_into("<i", buf, 22, -h)
    rows = [bytes(buf[54 + r * stride : 54 + (r + 1) * stride]) for r in range(h)]
    buf[54:] = b"".join(reversed(rows))
    w2, h2, px, tl = bmp_decode(bytes(buf))
    assert (w2, h2) == (16, 2)
    assert px == sum(data)
    assert tl == data[0]


@pytest.mark.parametrize(
    "mutate,match",
    [
        (lambda b: b[:40], "not a BMP|truncated"),
        (lambda b: b"XX" + b[2:], "not a BMP"),
        (lambda b: b[:-4], "truncated"),
        (
            lambda b: b[:28] + struct.pack("<H", 8) + b[30:],
            "unsupported BMP profile",
        ),
        (lambda b: b"", "not a BMP"),
    ],
)
def test_malformed_rejected(mutate, match):
    good = bmp_encode_gray(b"hello world")
    with pytest.raises(ValueError, match=match):
        bmp_decode(mutate(good))


def test_empty_payload_not_encodable():
    with pytest.raises(ValueError, match="empty payload"):
        bmp_encode_gray(b"")


def test_query_quarantines_empty_docs(spark, tmp_path):
    """End-to-end: an empty document becomes an empty payload, which the
    decoder quarantines as ok=false with NULL fields — the job never fails."""
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
        all_queries()["multimodal_decode_bmp"]
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
        """Any non-empty payload and grid width round-trips: dims from the
        ceil-grid formula, pixel_sum = byte sum (pads are 0), top_left =
        first byte despite bottom-up storage."""
        w, h, px, tl = bmp_decode(bmp_encode_gray(data, width))
        assert w == min(len(data), width)
        assert h == (len(data) + w - 1) // w
        assert px == sum(data)
        assert tl == data[0]

except ImportError:  # pragma: no cover - hypothesis is baked in, but gate anyway
    pass
