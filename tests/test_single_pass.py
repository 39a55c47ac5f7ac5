"""Single-pass XML extraction (sources/xml_single_pass.py): envelope parity
with the native per-type scans, the split-boundary ownership protocol, gzip
handling, and byte-identical end-to-end convert output between the modes.
"""

from __future__ import annotations

import glob
import gzip
import os
import shutil

import pytest
from pyspark.sql import functions as F

from dblp_to_csv_spark.plans.etl import convert, get_record_types
from dblp_to_csv_spark.sources.xml_single_pass import extract_record_envelope
from tests.conftest import SF_SMOKE

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
XML = os.path.join(FIX, "mini_dblp.xml")
DTD = os.path.join(FIX, "mini_dblp.dtd")


@pytest.fixture(scope="module")
def types():
    return get_record_types(DTD, "dblp")


@pytest.fixture(scope="module")
def envelope_rows(spark, types):
    return sorted(
        (r.record_type, r.offset, r.xml)
        for r in extract_record_envelope(spark, XML, types).collect()
    )


def test_envelope_matches_native_counts(spark, types, envelope_rows):
    """Per-type record counts must equal what the native rowTag scans see."""
    by_type: dict[str, int] = {}
    for t, _, _ in envelope_rows:
        by_type[t] = by_type.get(t, 0) + 1
    for t in sorted(types):
        native = (
            spark.read.format("xml")
            .option("rowTag", t)
            .option("inferSchema", "false")
            .load(XML)
            .count()
        )
        assert by_type.get(t, 0) == native, t


def test_envelope_snippets_are_wellformed(envelope_rows):
    import xml.etree.ElementTree as ET

    assert envelope_rows, "envelope must not be empty"
    for t, off, snippet in envelope_rows:
        elem = ET.fromstring(snippet)
        assert elem.tag == t
        assert off >= 0


@pytest.mark.parametrize("split_bytes", [64, 17])
def test_boundary_protocol_split_invariance(spark, types, envelope_rows, split_bytes):
    """Records straddling split boundaries are emitted exactly once by
    exactly one task: the envelope is invariant under the split size, down
    to splits far smaller than any record."""
    tiny = sorted(
        (r.record_type, r.offset, r.xml)
        for r in extract_record_envelope(
            spark, XML, types, target_split_bytes=split_bytes
        ).collect()
    )
    assert tiny == envelope_rows


def test_gzip_member_single_task(spark, types, envelope_rows, tmp_path):
    """A .gz input is one unsplittable range; offsets are decompressed-stream
    offsets, so the envelope matches the plain file's exactly."""
    gz = str(tmp_path / "mini.xml.gz")
    with open(XML, "rb") as src, gzip.open(gz, "wb") as dst:
        shutil.copyfileobj(src, dst)
    got = sorted(
        (r.record_type, r.offset, r.xml)
        for r in extract_record_envelope(spark, gz, types).collect()
    )
    assert got == envelope_rows


def test_convert_modes_byte_identical(spark, tmp_path):
    """Full --annotate --relations convert: every output file byte-identical
    between the per-type-scan mode and the single-pass mode."""
    outs = {}
    for mode, single_pass in (("per_type", False), ("single_pass", True)):
        d = tmp_path / mode
        d.mkdir()
        r = convert(
            spark,
            XML,
            DTD,
            str(d / "out.csv"),
            annotate=True,
            relations={"author": "authored_by"},
            single_pass=single_pass,
        )
        outs[mode] = (r.total_records, d, r)
    assert outs["per_type"][0] == outs["single_pass"][0]
    a_dir, b_dir = outs["per_type"][1], outs["single_pass"][1]
    a_files = sorted(os.path.basename(p) for p in glob.glob(str(a_dir / "out*")))
    b_files = sorted(os.path.basename(p) for p in glob.glob(str(b_dir / "out*")))
    assert a_files == b_files and a_files
    for name in a_files:
        with open(a_dir / name, "rb") as fa, open(b_dir / name, "rb") as fb:
            assert fa.read() == fb.read(), name
    # the envelope working dir now OUTLIVES the run (atexit-cleaned): the
    # returned frames read it lazily, so an immediate rmtree dangled them
    # (review r8). Pin the regression: a returned table frame must still
    # re-collect after convert() returned.
    sp_result = outs["single_pass"][2]
    some_table = next(iter(sp_result.tables.values()))
    assert some_table.df.count() == some_table.n_rows


def test_python_datasource_matches_function_frontend(spark, types, envelope_rows):
    """spark.read.format('dblp-xml') must produce the identical envelope the
    function front-end produces (same scanner, same boundary protocol), with
    byte ranges as real input partitions."""
    from dblp_to_csv_spark.sources.xml_datasource import DblpXmlDataSource

    spark.dataSource.register(DblpXmlDataSource)
    got = sorted(
        (r.record_type, r.offset, r.xml)
        for r in (
            spark.read.format("dblp-xml")
            .option("path", XML)
            .option("recordTypes", ",".join(sorted(types)))
            .option("splitBytes", "64")  # force many partitions
            .load()
            .collect()
        )
    )
    assert got == envelope_rows


def test_single_pass_empty_corpus(spark, tmp_path):
    """A document with a root but zero records: the envelope write produces
    no parquet files at all — both modes must still convert cleanly to zero
    tables."""
    xml = tmp_path / "empty.xml"
    xml.write_text('<?xml version="1.0"?>\n<dblp>\n</dblp>\n')
    for mode in (False, True):
        d = tmp_path / ("sp" if mode else "pt")
        d.mkdir()
        r = convert(spark, str(xml), DTD, str(d / "out.csv"), single_pass=mode)
        assert r.total_records == 0
        assert r.tables == {}


def test_streaming_ingest_exactly_once(spark, types, tmp_path):
    """Drop-directory streaming ingest: run 1 picks up file A; after file B
    lands, run 2 on the SAME checkpoint ingests only B — each record exactly
    once across restarts (offsets = processed-file set)."""
    import shutil

    from dblp_to_csv_spark.sources.xml_datasource import DblpXmlDataSource

    spark.dataSource.register(DblpXmlDataSource)
    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    shutil.copy(XML, drop / "dump_a.xml")

    def run_once():
        q = (
            spark.readStream.format("dblp-xml")
            .option("path", str(drop))
            .option("recordTypes", ",".join(sorted(types)))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n_single = spark.read.parquet(out).count()
    assert n_single == 7  # mini fixture record count

    shutil.copy(XML, drop / "dump_b.xml")
    run_once()
    result = spark.read.parquet(out)
    assert result.count() == 14  # file B added once, file A NOT re-emitted
    per_src = {
        os.path.basename(r["src"]): r["n"]
        for r in result.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert per_src == {"dump_a.xml": 7, "dump_b.xml": 7}


def test_convert_modes_identical_on_edge_cases(spark, tmp_path):
    """Entities, CDATA sections, and empty elements: both scan modes must
    produce byte-identical CSVs on the edge-case fixture too (the CDATA
    content here contains markup-looking text that is NOT a record tag —
    inside the scanner's documented assumption set)."""
    exml = os.path.join(FIX, "edge_cases.xml")
    edtd = os.path.join(FIX, "edge_cases.dtd")
    outs = {}
    for mode, single_pass in (("pt", False), ("sp", True)):
        d = tmp_path / mode
        d.mkdir()
        r = convert(spark, exml, edtd, str(d / "out.csv"), annotate=True,
                    single_pass=single_pass)
        outs[mode] = (r.total_records, d)
    assert outs["pt"][0] == outs["sp"][0] > 0
    a_dir, b_dir = outs["pt"][1], outs["sp"][1]
    a_files = sorted(os.path.basename(p) for p in glob.glob(str(a_dir / "out*")))
    assert a_files == sorted(os.path.basename(p) for p in glob.glob(str(b_dir / "out*")))
    for name in a_files:
        with open(a_dir / name, "rb") as fa, open(b_dir / name, "rb") as fb:
            assert fa.read() == fb.read(), name


def test_scanner_skips_comments_and_quoted_gt(spark, types, tmp_path):
    """Record-looking tags inside XML comments must be skipped, and '>'
    inside a quoted attribute value must not terminate the tag."""
    doc = (
        '<?xml version="1.0"?>\n<dblp>\n'
        '<!-- reviewer note: <article key="fake"> is not a record -->\n'
        '<article key="a&gt;b" mdate="2020-01-01"><year>2020</year></article>\n'
        "<!-- trailing <www key='nope'/> comment -->\n"
        '<www key="w1"><year>2021</year></www>\n'
        "</dblp>\n"
    )
    p = tmp_path / "c.xml"
    p.write_text(doc)
    # split sizes within the supported envelope: a byte range that STARTS
    # inside a comment cannot see the opener (the module's documented
    # residual caveat, shared with every splittable-XML input format), so
    # splits must be >= the comment span for comment-bearing regions
    for split in (None, 64):
        rows = sorted(
            (r.record_type, r.xml)
            for r in extract_record_envelope(
                spark, str(p), types, target_split_bytes=split
            ).collect()
        )
        assert [t for t, _ in rows] == ["article", "www"], rows
        assert 'key="a&gt;b"' in rows[0][1]


def test_export_empty_input_manifest(spark, tmp_path):
    """Zero-row input: the export must produce an all-zero manifest, not an
    UNABLE_TO_INFER_SCHEMA crash after a successful (empty) write."""
    from dblp_to_csv_spark.plans.export import write_training_shards
    from dblp_to_csv_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").filter("doc_id < 0")
    manifest = write_training_shards(docs, str(tmp_path / "none"), n_shards=3)
    assert manifest["total_rows"] == 0
    assert manifest["shards"] == {"0": 0, "1": 0, "2": 0}

def test_datasource_handles_gzip_and_missing_path(spark, types, envelope_rows, tmp_path):
    """The promoted default path (read_envelope via the Data Source) must
    cover the function front-end's whole input contract: .gz members as
    single unsplittable partitions with decompressed-stream offsets, and a
    planning-time FileNotFoundError for a typo'd path (not an empty result,
    not a task-time failure)."""
    from dblp_to_csv_spark.sources.xml_single_pass import read_envelope

    gz = str(tmp_path / "mini.xml.gz")
    with open(XML, "rb") as src, gzip.open(gz, "wb") as dst:
        shutil.copyfileobj(src, dst)
    got = sorted(
        (r.record_type, r.offset, r.xml)
        for r in read_envelope(spark, gz, types).collect()
    )
    assert got == envelope_rows
    with pytest.raises(FileNotFoundError):
        read_envelope(spark, str(tmp_path / "nope.xml"), types)


def test_hybrid_bulk_history_then_trickle(spark, types, tmp_path):
    """ROADMAP item 11, end-to-end: bulk history ingests through the BATCH
    envelope (parallel byte-range tasks — the scale path), then the stream
    takes over the SAME lake with the history declared via the
    ``initialProcessed`` option — its first microbatch starts from "history
    done", new files trickle in exactly once, and history is never
    re-emitted across restarts."""
    from dblp_to_csv_spark.sources.xml_datasource import DblpXmlDataSource
    from dblp_to_csv_spark.sources.xml_single_pass import read_envelope

    drop = tmp_path / "drop"
    drop.mkdir()
    shutil.copy(XML, drop / "dump_a.xml")
    # the lake is two sibling prefixes read as one: the streaming parquet
    # sink's _spark_metadata log OWNS its directory (batch files written
    # beside it become invisible to metadata-honoring readers), so history
    # and trickle land in separate prefixes — the standard layout
    hist = str(tmp_path / "lake" / "history")
    trickle = str(tmp_path / "lake" / "stream")

    # phase 1: bulk history via the batch envelope (full parallelism)
    read_envelope(spark, str(drop / "*.xml"), sorted(types)).write.mode(
        "overwrite"
    ).parquet(hist)
    assert spark.read.parquet(hist).count() == 7

    # phase 2: checkpoint handoff — the stream's initial offset IS the
    # history file set
    spark.dataSource.register(DblpXmlDataSource)
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("dblp-xml")
            .option("path", str(drop))
            .option("recordTypes", ",".join(sorted(types)))
            .option("initialProcessed", str(drop / "*.xml"))
            .load()
            .writeStream.format("parquet")
            .option("path", trickle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # no new files since the bulk load: nothing re-emitted
    assert spark.read.parquet(hist, trickle).count() == 7

    shutil.copy(XML, drop / "dump_b.xml")
    run_once()  # the trickle: exactly file B
    result = spark.read.parquet(hist, trickle)
    assert result.count() == 14
    per_src = {
        os.path.basename(r["src"]): r["n"]
        for r in result.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert per_src == {"dump_a.xml": 7, "dump_b.xml": 7}
