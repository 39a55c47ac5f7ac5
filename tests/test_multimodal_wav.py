"""The pure-Python RIFF/PCM WAV codec behind multimodal_decode_wav (VERDICT
r10 item 7): spec fidelity of the encoder, real chunk-walking behavior of
the decoder (fmt/data ordering, unknown-chunk skip, word alignment, stereo
frame math, malformed rejection), and the quarantine path."""

from __future__ import annotations

import struct

import pytest

from dblp_to_csv_spark.operators.multimodal import (
    WAV_SAMPLE_RATE,
    wav_decode,
    wav_encode_pcm16,
)


def _expected(data: bytes, n_channels: int = 1) -> tuple:
    samples = [(b - 128) * 256 for b in data]
    per_frame = [s for s in samples for _ in range(n_channels)]
    return (
        WAV_SAMPLE_RATE,
        n_channels,
        len(data),
        len(data) * 1000 // WAV_SAMPLE_RATE,
        sum(s * s for s in per_frame),
        max(abs(s) for s in per_frame),
        per_frame[0],
    )


def test_roundtrip_mono():
    data = b"hello world, this is pcm"
    assert wav_decode(wav_encode_pcm16(data)) == _expected(data)


def test_roundtrip_stereo_frame_math():
    """block_align = 4 for stereo: n_frames halves relative to sample count,
    sum_sq doubles (the byte is replicated to both channels)."""
    data = bytes(range(1, 18))  # odd length exercises the frame/byte split
    assert wav_decode(wav_encode_pcm16(data, n_channels=2)) == _expected(data, 2)


@pytest.mark.parametrize("n", [1, 2, 7, 8000, 12345])
def test_duration_floor(n):
    data = bytes([200]) * n
    out = wav_decode(wav_encode_pcm16(data))
    assert out[2] == n
    assert out[3] == n * 1000 // WAV_SAMPLE_RATE


def test_signed_extremes():
    # byte 0 -> -32768 (int16 min), byte 255 -> 32512
    out = wav_decode(wav_encode_pcm16(bytes([0, 255, 128])))
    assert out[4] == 32768**2 + 32512**2 + 0
    assert out[5] == 32768
    assert out[6] == -32768


def test_odd_data_chunk_padded_to_word_boundary():
    """A 16-bit mono encoder never emits an odd data chunk, but the RIFF pad
    rule must hold structurally: splice an odd-size LIST chunk before data
    and require the walker to skip it via the pad byte."""
    good = bytearray(wav_encode_pcm16(b"abc"))
    # insert after fmt (12-byte RIFF header + 24-byte fmt chunk = offset 36)
    foreign = struct.pack("<4sI", b"LIST", 3) + b"odd" + b"\0"  # padded
    patched = bytes(good[:36]) + foreign + bytes(good[36:])
    riff_size = len(patched) - 8
    patched = patched[:4] + struct.pack("<I", riff_size) + patched[8:]
    assert wav_decode(patched) == _expected(b"abc")


def test_data_before_fmt_rejected():
    good = bytearray(wav_encode_pcm16(b"abcd"))
    fmt_chunk = bytes(good[12:36])
    data_chunk = bytes(good[36:])
    swapped = bytes(good[:12]) + data_chunk + fmt_chunk
    with pytest.raises(ValueError, match="data chunk before fmt"):
        wav_decode(swapped)


@pytest.mark.parametrize(
    "mutate,match",
    [
        (lambda b: b[:8], "not a RIFF"),
        (lambda b: b"XXXX" + b[4:], "not a RIFF"),
        (lambda b: b[:8] + b"AVI " + b[12:], "not a RIFF"),
        (lambda b: b[:-6], "truncated"),
        (lambda b: b[:20] + struct.pack("<H", 3) + b[22:], "unsupported WAV"),
        (lambda b: b[:34] + struct.pack("<H", 8) + b[36:], "unsupported WAV"),
        (lambda b: b"", "not a RIFF"),
        (lambda b: b[:36], "no data chunk"),
    ],
)
def test_malformed_rejected(mutate, match):
    good = wav_encode_pcm16(b"hello world")
    with pytest.raises(ValueError, match=match):
        wav_decode(mutate(good))


def test_empty_payload_not_encodable():
    with pytest.raises(ValueError, match="empty payload"):
        wav_encode_pcm16(b"")


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
        all_queries()["multimodal_decode_wav"]
        .fn(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
    )
    assert bool(out.loc[1, "ok"]) is True
    assert out.loc[1, "sum_sq"] == sum(((b - 128) * 256) ** 2 for b in b"abc")
    assert out.loc[1, "first_sample"] == (ord("a") - 128) * 256
    assert bool(out.loc[2, "ok"]) is False
    assert pd.isna(out.loc[2, "n_frames"])


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        data=st.binary(min_size=1, max_size=400),
        channels=st.integers(min_value=1, max_value=4),
    )
    def test_roundtrip_property(data, channels):
        """Any non-empty payload and channel count round-trips exactly."""
        assert wav_decode(wav_encode_pcm16(data, n_channels=channels)) == _expected(
            data, channels
        )

except ImportError:  # pragma: no cover - hypothesis is baked in, but gate anyway
    pass


def test_samples_match_decode_summary():
    """wav_decode_samples is the same parse as wav_decode: summaries derived
    from the returned waveform must equal wav_decode's own fields."""
    import numpy as np

    from dblp_to_csv_spark.operators.multimodal import (
        wav_decode,
        wav_decode_samples,
        wav_encode_pcm16,
    )

    for data in (b"hello world audio", bytes(range(1, 200)), b"x"):
        payload = wav_encode_pcm16(data)
        _, _, n_frames, _, sum_sq, peak_abs, first = wav_decode(payload)
        s = wav_decode_samples(payload)
        assert len(s) == n_frames
        assert int((s * s).sum()) == sum_sq
        assert int(np.abs(s).max()) == peak_abs
        assert int(s[0]) == first


def test_fingerprint_edit_robustness_is_local():
    """The fixed-width-window design contract: a SUFFIX edit flips only the
    gradient bits whose windows the edit touches (near-dups stay within the
    hamming radius), and an identical clip re-encoded hashes identically.
    Length-proportional windows would scramble all 64 bits here — the
    failure mode AUDIO_FP_FRAME documents."""
    from dblp_to_csv_spark.operators.multimodal import (
        AUDIO_FP_MAX_HAMMING,
        audio_fingerprint_bands,
        wav_decode_samples,
        wav_encode_pcm16,
    )

    # 250 bytes: the whole clip sits INSIDE the 260-sample fingerprinted
    # prefix, so a tail edit lands in the last couple of windows
    base = (b"The quick brown fox jumps over the lazy dog. " * 6)[:250]
    fp = lambda d: audio_fingerprint_bands(wav_decode_samples(wav_encode_pcm16(d)))
    assert fp(base) == fp(base)
    edited = base[:-8] + b"NEWTAIL!!"  # length +1, tail content changed
    ham = sum(
        bin(a ^ b).count("1") for a, b in zip(fp(base), fp(edited))
    )
    assert 0 < ham <= AUDIO_FP_MAX_HAMMING, ham
    # an edit PAST the fingerprinted prefix is invisible by design (the
    # fixed-duration-clip rule): hash equality, not merely small hamming
    long_base = base * 2  # 500 bytes > 260-sample prefix
    assert fp(long_base) == fp(long_base[:-5] + b"XXXXX")
    # a MID-clip insertion shifts everything after it: allowed to exceed
    # the radius (documented limitation — alignment robustness needs
    # overlap/constellation schemes, not a 64-bit sketch)
