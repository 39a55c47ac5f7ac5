"""Unicode-adversarial corpus sweep: every oracle-checked query that reads
the documents table runs against a corpus of unicode landmines — emoji/ZWJ
sequences, RTL scripts, combining accents, Turkish İ/ı, Kelvin sign,
full-width digits, zero-width spaces, NBSP, math alphanumerics, control
whitespace, a 10k-char token, NULL and empty texts — and must still match
its DuckDB oracle.

Why this can work at all: the shared tokenizer (functions/text.py) lowers
then splits on the ASCII class [^a-z0-9]+, so any cross-engine divergence
in FULL vs SIMPLE unicode case mapping (e.g. U+0130 → 'i'+U+0307 vs 'i')
is washed out by the split — combining marks and non-ASCII codepoints are
separators on both engines. This sweep pins that design property against
the whole text/dedup/LM family instead of trusting it."""

from __future__ import annotations

import pytest

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.sources.tables import TABLES
from tests.sweep_util import REAL_SF, assert_matches_oracle, duck_for

# the landmine texts; several share prefixes/shingles so dedup and LM
# queries produce non-trivial candidate sets
_LANDMINES = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",  # exact dup
    "the quick brown fox jumps over the lazy dog today",  # near dup
    "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG",  # case dup
    "café naïve résumé coöperate führer",
    "café naïve résumé",  # decomposed accents
    # NOTE: capital dotted İ (U+0130) is deliberately ABSENT here — it is
    # the one codepoint where the engines' lower() diverges (Spark applies
    # the FULL case mapping 'i'+U+0307, DuckDB the SIMPLE mapping 'i'), so
    # 'İstanbul' tokenizes to ['i','stanbul'] vs ['istanbul']. Pinned as a
    # documented divergence in test_dotted_capital_i_divergence below.
    "ısısı IJssel ǅungla ß STRASSE türkçe",
    "Kelvin sign and ﬁligature ﬂows",
    "数据 管道 需要 去重 和 质量 过滤",
    "البيانات تحتاج إلى إزالة التكرار",
    "נתונים צריכים דה־דופליקציה",
    "мама мыла раму data pipeline",
    "emoji soup 🤖🧪🔥 and 👩‍👩‍👧‍👦 family 🇺🇳 flag",
    "zero​width​space and zero‍width‍joiner",
    "non breaking space figure en",
    "full-width　ＡＢＣ　１２３　ｄａｔａ",
    "𝐦𝐚𝐭𝐡 𝒃𝒐𝒍𝒅 𝔣𝔯𝔞𝔨𝔱𝔲𝔯 letters",
    "arabic digits ٠١٢٣٤ devanagari १२३",
    "tab\tand\nnewline\r\nand\x0bvertical",
    "a" * 10_000,  # one enormous token
    ("tok " * 2_000).strip(),  # many tiny tokens
    "",  # empty text
    None,  # NULL text
    "!!! ??? ... --- ###",  # punctuation only
    "MiXeD CaSe DuP mIxEd cAsE dUp",
    "mixed case dup mixed case dup",
    "ʇxǝʇ pǝddılɟ and ɹǝʌo pǝuɹnʇ",
    # NOTE: uppercase Greek words ending in Σ are absent for the same
    # reason as İ — Java lower() applies the CONTEXTUAL final-sigma rule
    # (trailing Σ → ς) while DuckDB's simple mapping gives σ; pinned below.
    "σίσυφος sigma final ς forms",
    "ligature æsthetic œuvre",
    "currency € £ ¥ ₹ signs 100€",
]
_LANGS = ["en", "zh", "ar", "en", "de", "fr", "en", "zh"]
_SOURCES = ["crawl", "wiki", "books"]


@pytest.fixture(scope="module")
def unicode_sf(tmp_path_factory):
    """documents = the landmine corpus; every other table a 20-row slice of
    the real data (they must exist for the shared view helper; the swept
    queries only read documents)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("unicode_sf")
    for t in TABLES:
        if t == "documents":
            continue
        pq.write_table(pq.read_table(f"{REAL_SF}/{t}.parquet").slice(0, 20),
                       out / f"{t}.parquet")
    schema = pq.read_schema(f"{REAL_SF}/documents.parquet")
    rows = {
        "doc_id": list(range(len(_LANDMINES))),
        "text": _LANDMINES,
        "lang": [_LANGS[i % len(_LANGS)] for i in range(len(_LANDMINES))],
        "source": [_SOURCES[i % len(_SOURCES)] for i in range(len(_LANDMINES))],
        "n_chars": [len(t) if t is not None else None for t in _LANDMINES],
    }
    cols = [
        pa.array(rows[f.name]).cast(f.type) for f in schema
    ]
    pq.write_table(pa.table(cols, schema=schema), out / "documents.parquet")
    return str(out)


@pytest.fixture(scope="module")
def duck(unicode_sf):
    con = duck_for(unicode_sf)
    yield con
    con.close()


# The multimodal family's oracles predict codec outputs from the ASCII
# codepoints of documents.text (the documented seeding contract: payload =
# UTF-8 bytes, oracle arithmetic = ascii(substr(text, i, 1))); on
# non-ASCII text bytes ≠ codepoints BY DESIGN, so those oracles' validity
# domain is ASCII corpora. The codecs themselves are byte-exact on
# arbitrary payloads — pinned by the hypothesis round-trip properties in
# test_multimodal_bmp.py / test_multimodal_wav.py — so the sweep skips
# only the oracle comparison, not the correctness claim.
ASCII_DOMAIN_ORACLES = {
    "multimodal_decode_bmp",
    "multimodal_decode_png",  # round-trip pinned in test_multimodal_png.py
    "multimodal_decode_wav",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "multimodal_metadata",
    # r13 perceptual hashes: same seeding contract (payload = UTF-8 BYTES,
    # oracle arithmetic = codepoints — equal only on ASCII); the hash
    # machinery itself is byte-exact on arbitrary payloads (cross-codec +
    # losslessness pins in test_dedup_banding.py / test_multimodal_wav.py)
    "dedup_image_phash",
    "dedup_audio_fingerprint",
}

DOC_QUERIES = sorted(
    (n, e) for n, e in all_queries().items()
    if e.oracle is not None and "documents" in e.oracle
    and n not in ASCII_DOMAIN_ORACLES
)


@pytest.mark.parametrize("name,entry", DOC_QUERIES, ids=[n for n, _ in DOC_QUERIES])
def test_query_survives_unicode_corpus(spark, duck, unicode_sf, name, entry):
    got = entry.fn(spark, unicode_sf).toPandas()  # the crash gate
    want = duck.execute(entry.oracle).df()
    assert_matches_oracle(name, got, want, "the unicode landmine corpus")


def test_full_vs_simple_case_mapping_divergence(spark):
    """The two codepoints where the engines' lower() is KNOWN to diverge
    (Java full/contextual mapping vs DuckDB utf8proc simple mapping),
    pinned exactly so an engine upgrade that changes either side surfaces:
    - U+0130 İ → Spark 'i'+U+0307 (combining dot), DuckDB 'i'
    - trailing Σ → Spark contextual final sigma ς, DuckDB σ
    Downstream, the ASCII tokenizer WASHES the İ case (both sides yield an
    'i'-led token split) except for the token boundary; final sigma never
    produces ASCII tokens at all — which is why the landmine corpus above
    can avoid, rather than solve, these two."""
    import duckdb
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("İ",), ("ΣΊΣΥΦΟΣ",)], ["t"])
    got = [r[0] for r in df.select(F.lower("t")).collect()]
    assert got == ["i̇", "σίσυφος"]  # full/contextual mapping
    duck = [
        duckdb.connect().execute("SELECT lower(?)", [t]).fetchone()[0]
        for t in ("İ", "ΣΊΣΥΦΟΣ")
    ]
    assert duck == ["i", "σίσυφοσ"]  # simple mapping
