"""Single-pass multi-record-type XML extraction (ROADMAP item 6).

The native XML data source extracts ONE rowTag per scan, so a DTD with N
record types costs N passes over the corpus (the trade-off documented in
plans/etl.py). At 100 TB that multiplier IS the ETL bottleneck: 10 record
types = 10 reads + 10 tokenizations of 100 TB. This module removes it:

1. **One distributed pass** over the raw XML bytes splits the corpus into
   byte ranges (the same split planning a Hadoop input format does), and each
   task extracts every record of every type whose OPENING TAG starts inside
   its range — emitting an envelope row ``(record_type, xml, src, offset)``
   per record.
2. The envelope is **materialized once** to parquet partitioned by
   ``record_type`` — the ingest-once raw-record lake.
3. Per-type parsing then reads the pruned parquet partition and parses with
   ``F.from_xml`` using the DTD-derived schema — the same JVM StaxXmlParser
   the native source uses, now fed from columnar storage instead of a fresh
   XML scan. Total raw-XML cost: exactly one read, regardless of N.

Boundary protocol (the part that matters at scale): a record belongs to the
task whose byte range contains its opening tag's first byte. Each task scans
``[start, end)`` for record openings and keeps reading PAST ``end`` (in
bounded chunks) until the last record it owns closes — so records straddling
split boundaries are emitted exactly once, by exactly one task. A task whose
range begins mid-record skips bytes until the first opening tag at or after
``start`` (the enclosing record belongs to the previous task). A tag string
split by the boundary is owned by the task where it STARTS; the successor's
regex simply cannot match the torn prefix. tests/test_single_pass.py drives
ranges small enough that every record crosses a boundary.

Assumptions (shared with every splittable XML input format, and with the
reference's own state machine, XMLToCSV.py:120-121 — records are DIRECT
children of the root): record-type tags do not appear nested inside other
records, and record bodies do not contain CDATA sections spelling fake
record tags. True for DBLP; documented, not silently assumed. XML comments
ARE handled — record-looking tags inside ``<!-- ... -->`` are skipped, and
'>' inside quoted attribute values does not terminate a tag — with one
residual split-boundary caveat: a comment that OPENS before a task's byte
range and spells a record tag inside it is invisible to that task (same
class as the CDATA assumption; pathological for real corpora).

Python does the byte scanning (regex over bytes, no XML parse — the actual
parsing stays JVM-side in from_xml), batched through Arrow via mapInPandas.
Gzip inputs are non-splittable (same as every text format): one task
streams the whole member, offsets are decompressed-stream offsets.
"""

from __future__ import annotations

import glob as _glob
import gzip
import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Extension read granularity while finishing a boundary-straddling record.
_EXTEND_CHUNK = 1 << 20
# Arrow batch granularity for emitted envelope rows.
_EMIT_BATCH = 2048

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("record_type", T.StringType(), False),
        T.StructField("xml", T.StringType(), False),
        T.StructField("src", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
    ]
)


# stdlib-decompressible whole-stream codecs (unsplittable: one range each)
_CODEC_EXTS = (".gz", ".bz2", ".xz", ".lzma")
# known Hadoop-side codec extensions we CANNOT byte-scan: refuse loudly
# instead of regex-scanning compressed bytes into a silently empty envelope
_UNSUPPORTED_CODEC_EXTS = (".zst", ".zstd", ".sz", ".snappy", ".lz4",
                           ".deflate", ".br")


def _plan_ranges(
    xml_path: str, target_bytes: int
) -> list[tuple[str, int, int, bool]]:
    """Byte-range split plan: ``(path, start, end, is_compressed)`` per
    task. Compressed members (gz/bz2/xz — stdlib codecs) are one
    unsplittable range each (end = -1 → EOF); unsupported codec extensions
    raise rather than silently scanning compressed bytes; a directory
    input expands to its files (the native per-type scan's contract)."""
    hits = sorted(_glob.glob(xml_path)) or [xml_path]
    paths: list[str] = []
    for p in hits:
        if os.path.isdir(p):
            paths.extend(
                sorted(
                    os.path.join(p, f)
                    for f in os.listdir(p)
                    if os.path.isfile(os.path.join(p, f))
                )
            )
        else:
            paths.append(p)
    specs: list[tuple[str, int, int, bool]] = []
    found_file = False
    for p in paths:
        if not os.path.isfile(p):
            continue
        found_file = True
        if p.endswith(_UNSUPPORTED_CODEC_EXTS):
            raise ValueError(
                f"single-pass scan cannot byte-scan {p!r}: codec is not "
                "stdlib-decompressible (supported: "
                f"{', '.join(_CODEC_EXTS)}); decompress first or use the "
                "default per-type mode with a Hadoop codec"
            )
        if p.endswith(_CODEC_EXTS):
            specs.append((p, 0, -1, True))
            continue
        size = os.path.getsize(p)
        if size == 0:
            continue
        step = max(1, target_bytes)
        for start in range(0, size, step):
            specs.append((p, start, min(start + step, size), False))
    if not found_file:
        # match the native per-type scan, which raises PATH_NOT_FOUND instead
        # of silently yielding an empty result for a typo'd path
        raise FileNotFoundError(f"no XML input files match {xml_path!r}")
    return specs


def _codec_open(path: str):
    """Open a compressed whole-stream member with the stdlib codec its
    extension names."""
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    if path.endswith(".bz2"):
        import bz2

        return bz2.open(path, "rb")
    import lzma

    return lzma.open(path, "rb")


_ENC_DECL_RE = re.compile(rb"<\?xml[^>]*encoding=[\'\"]([A-Za-z0-9._-]+)")
_ASCII_SUPERSETS_PREFIXES = ("utf-8", "us-ascii", "ascii", "iso-8859",
                            "latin", "cp12", "windows-12", "koi8")


def sniff_encoding(path: str, is_compressed: bool = False) -> str:
    """The file's declared XML encoding (default utf-8). Byte-range
    scanning requires an ASCII-superset single-byte-compatible encoding —
    UTF-16/32 would make the tag regexes silently match nothing — so
    anything else raises at PLAN time instead of yielding an empty
    envelope."""
    opener = _codec_open(path) if is_compressed else open(path, "rb")
    with opener as fh:
        head = fh.read(256)
    if head[:2] in (b"\xff\xfe", b"\xfe\xff") or b"\x00" in head[:64]:
        raise ValueError(
            f"{path!r} looks UTF-16/32 encoded; the byte-range scanner "
            "requires an ASCII-compatible encoding — transcode to UTF-8 "
            "or use the default per-type mode"
        )
    m = _ENC_DECL_RE.search(head)
    if not m:
        return "utf-8"
    enc = m.group(1).decode("ascii").lower()
    if not enc.startswith(_ASCII_SUPERSETS_PREFIXES):
        raise ValueError(
            f"{path!r} declares encoding {enc!r}; the byte-range scanner "
            "supports ASCII-compatible encodings only — transcode to "
            "UTF-8 or use the default per-type mode"
        )
    return enc


class _RangeScanner:
    """Sequential scanner over one byte range: yields every record whose
    opening tag starts inside [range_start, range_end)."""

    def __init__(self, fh, range_start: int, range_end: int, types: list[str]):
        self.fh = fh
        self.base = range_start  # file offset of buf[0]
        self.range_end = range_end  # exclusive; -1 = EOF
        self.buf = b""
        self.eof = False
        # escape each name: XML element names may legally contain '.' etc.
        names = b"|".join(
            re.escape(t.encode()) for t in sorted(types, key=len, reverse=True)
        )
        # opening tag of any record type, at a tag boundary
        self.open_re = re.compile(rb"<(%s)(?=[\s/>])" % names)
        # torn-token tail width: a token can be truncated at a chunk edge
        # by up to its own length minus one, so the kept margin must cover
        # the longest record-type tag (plus '</', '>' and the 4-byte
        # comment opener) — 64 was a silent cap on element-name length
        self._margin = max(64, max((len(t) for t in types), default=0) + 8)
        # absolute offset of an XML comment the open-tag scan is inside of
        self._comment_open_at: int | None = None

    def _extend(self) -> bool:
        chunk = self.fh.read(_EXTEND_CHUNK)
        if not chunk:
            self.eof = True
            return False
        self.buf += chunk
        return True

    _TAG_DELIM = re.compile(rb"[>\"']")

    def _find_tag_end(self, pos: int) -> tuple[int, bool]:
        """Return (index just past the opening tag's '>', self_closing) —
        QUOTE-AWARE: a '>' inside a quoted attribute value does not end the
        tag (XML allows raw '>' in attribute values)."""
        quote: bytes | None = None
        while True:
            mm = self._TAG_DELIM.search(self.buf, pos)
            if mm is None:
                if not self._extend():
                    raise ValueError("unterminated tag at end of input")
                continue
            ch = mm.group(0)
            pos = mm.end()
            if quote is not None:
                if ch == quote:
                    quote = None
            elif ch in (b'"', b"'"):
                quote = ch
            else:  # '>' outside quotes
                return pos, self.buf[mm.start() - 1 : mm.start()] == b"/"

    def _search(self, pattern, pos: int, unclosed: str | None = None):
        """Next match of ``pattern`` at/after ``pos`` that is NOT inside an
        XML comment whose opener lies in the scanned region; extends the
        buffer as needed. Returns None at EOF (or raises if ``unclosed``
        names a construct that must close)."""
        while True:
            m = pattern.search(self.buf, pos)
            while m is None and not self.eof:
                # keep pos: a token may straddle the chunk edge, so re-search
                # from just before the PRE-extension end, never the new end
                resume = max(pos, len(self.buf) - self._margin)
                self._extend()
                m = pattern.search(self.buf, resume)
            if m is None:
                if unclosed:
                    raise ValueError(unclosed)
                return None
            cpos = self.buf.find(b"<!--", pos, m.start())
            if cpos == -1:
                return m
            # the match lies at/after a comment opener: skip the comment
            cend = self.buf.find(b"-->", cpos + 4)
            while cend == -1:
                resume = max(cpos + 4, len(self.buf) - 8)
                if not self._extend():
                    raise ValueError(f"unterminated comment at byte {self.base + cpos}")
                cend = self.buf.find(b"-->", resume)
            pos = cend + 3

    def _next_open(self, pos: int):
        """Next record-opening-tag match at/after ``pos``, skipping XML
        comments. Unlike ``_search`` this COMPACTS consumed bytes while
        scanning, so a record-free tail of any size (huge trailing comment,
        whitespace, unrelated markup) costs O(chunk) memory, not O(tail) —
        and a bounded range stops reading once every byte a future match
        could start at lies past ``range_end``. Returns a match against the
        (possibly compacted) current ``self.buf``, or None when this task
        owns no further record."""
        while True:
            if self._comment_open_at is not None:
                cend = self.buf.find(b"-->", pos)
                if cend == -1:
                    keep = max(pos, len(self.buf) - 2)  # torn '--' prefix
                    self.base += keep
                    self.buf = self.buf[keep:]
                    pos = 0
                    if self.range_end != -1 and self.base >= self.range_end:
                        return None  # comment runs past range: next task's
                    if not self._extend():
                        raise ValueError(
                            f"unterminated comment at byte {self._comment_open_at}"
                        )
                    continue
                pos = cend + 3
                self._comment_open_at = None
            m = self.open_re.search(self.buf, pos)
            limit = m.start() if m is not None else len(self.buf)
            copen = self.buf.find(b"<!--", pos, limit)
            if copen != -1:
                self._comment_open_at = self.base + copen
                pos = copen + 4
                continue
            if m is not None:
                return m
            # no match, no comment opener in [pos, len): keep only a
            # torn-token tail (see self._margin) and extend
            keep = max(pos, len(self.buf) - self._margin)
            if self.range_end != -1 and self.base + keep >= self.range_end:
                return None
            self.base += keep
            self.buf = self.buf[keep:]
            pos = 0
            if not self._extend():
                return None

    def records(self) -> Iterator[tuple[str, int, bytes]]:
        pos = 0  # scan cursor, relative to buf
        while True:
            # drop consumed bytes FIRST (any yield path lands here) so memory
            # stays O(record), not O(range)
            if pos > _EXTEND_CHUNK:
                self.base += pos
                self.buf = self.buf[pos:]
                pos = 0
            m = self._next_open(pos)
            if m is None:
                return
            abs_start = self.base + m.start()
            if self.range_end != -1 and abs_start >= self.range_end:
                return  # owned by the next task
            tag = m.group(1)
            body_at, self_closing = self._find_tag_end(m.end())
            if self_closing:
                yield tag.decode(), abs_start, self.buf[m.start() : body_at]
                pos = body_at
                continue
            # find the matching close, counting nested same-name opens
            open_pat = re.compile(rb"<%s(?=[\s/>])" % re.escape(tag))
            close_pat = re.compile(rb"</%s\s*>" % re.escape(tag))
            depth, cursor = 1, body_at
            while depth:
                c = self._search(
                    close_pat,
                    cursor,
                    unclosed=f"unclosed <{tag.decode()}> at byte {abs_start}",
                )
                # nested opens strictly before this close keep it unmatched
                # (window scan; comment-shadowed nested same-name opens are
                # out of scope — record-type tags never nest in the supported
                # corpora, see the module assumptions)
                o = open_pat.search(self.buf, cursor, c.start())
                while o is not None:
                    nest_end, nest_self = self._find_tag_end(o.end())
                    if not nest_self:
                        depth += 1
                    o = open_pat.search(self.buf, nest_end, c.start())
                depth -= 1
                cursor = c.end()
            yield tag.decode(), abs_start, self.buf[m.start() : cursor]
            pos = cursor


def _scan_spec(
    path: str, start: int, end: int, is_gz: bool, types: list[str]
) -> Iterator[tuple[str, int, bytes]]:
    # is_gz means "compressed whole-stream member" — the codec comes from
    # the extension (gz/bz2/xz, the stdlib-decompressible set)
    if is_gz:
        with _codec_open(path) as fh:
            yield from _RangeScanner(fh, 0, -1, types).records()
        return
    with open(path, "rb") as fh:
        fh.seek(start)
        yield from _RangeScanner(fh, start, end, types).records()


def extract_record_envelope(
    spark: SparkSession,
    xml_path: str,
    record_types: set[str] | list[str],
    target_split_bytes: int | None = None,
) -> DataFrame:
    """The single-pass scan: one DataFrame of ``(record_type, xml, src,
    offset)`` rows covering every record of every type, built from one
    distributed read of the raw XML.

    Executors must see ``xml_path`` (shared filesystem or local mode) — the
    same contract as every file-based source. ``target_split_bytes`` defaults
    to the session's ``spark.sql.files.maxPartitionBytes``."""
    types = sorted(set(record_types))
    if not types:
        raise ValueError("record_types must be non-empty")
    target_split_bytes = _resolve_split_bytes(spark, target_split_bytes)
    specs = _plan_ranges(xml_path, target_split_bytes)
    if not specs:
        return spark.createDataFrame([], ENVELOPE_SCHEMA)
    # repartitionByRange (not round-robin repartition): partition ORDER then
    # follows (path, start) order, so scan output rows are globally in
    # document order by (partition index, row position) — the property the
    # doc-order rank stamping (materialize_envelope with_rank=True) relies
    # on. Parallelism is the same: ~one range per partition.
    spec_df = spark.createDataFrame(
        specs, "path string, start long, end long, is_gz boolean"
    ).repartitionByRange(len(specs), "path", "start")

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # materialize this partition's specs (a handful of rows) and sort:
        # range partitioning orders partitions, not rows within one
        pdfs = [pdf for pdf in batches if not pdf.empty]
        if not pdfs:
            return
        allspecs = pd.concat(pdfs).sort_values(["path", "start"])
        rows: list[tuple[str, str, str, int]] = []
        encodings: dict[str, str] = {}
        for spec in allspecs.itertuples(index=False):
            # per-file declared encoding (ASCII-compatible by the plan-time
            # guard); a hard-coded utf-8 decode crashed on declared
            # ISO-8859-1 corpora with raw high bytes
            enc = encodings.get(spec.path)
            if enc is None:
                enc = sniff_encoding(spec.path, spec.is_gz)
                encodings[spec.path] = enc
            for tag, off, blob in _scan_spec(
                spec.path, spec.start, spec.end, spec.is_gz, types
            ):
                rows.append((tag, blob.decode(enc), spec.path, off))
                if len(rows) >= _EMIT_BATCH:
                    yield pd.DataFrame(
                        rows, columns=["record_type", "xml", "src", "offset"]
                    )
                    rows = []
        if rows:
            yield pd.DataFrame(rows, columns=["record_type", "xml", "src", "offset"])

    return spec_df.mapInPandas(scan, ENVELOPE_SCHEMA)


def _resolve_split_bytes(spark: SparkSession, target: int | None) -> int:
    if target is not None:
        return target
    from dblp_to_csv_spark.plans.etl import _parse_bytes

    return (
        _parse_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        or 128 * 1024 * 1024
    )


def read_envelope(
    spark: SparkSession,
    xml_path: str,
    record_types: set[str] | list[str],
    target_split_bytes: int | None = None,
    via: str = "datasource",
) -> DataFrame:
    """The single-pass envelope scan, via the PROMOTED default path: the
    Arrow Python Data Source (sources/xml_datasource.py), whose byte ranges
    are real InputPartitions emitting Arrow RecordBatches — measured ~20%
    faster than the mapInPandas front-end on the 1M×10-type corpus
    (BASELINE.md §9: 0.80M vs 0.64M records/sec) because rows skip the
    spec-DataFrame + pandas round-trip. ``via='mapinpandas'`` keeps the
    function front-end as the documented fallback (identical scanner and
    boundary protocol, byte-identical output — tests/test_single_pass.py::
    test_python_datasource_matches_function_frontend)."""
    types = sorted(set(record_types))
    if not types:
        raise ValueError("record_types must be non-empty")
    split = _resolve_split_bytes(spark, target_split_bytes)
    if via == "mapinpandas":
        return extract_record_envelope(spark, xml_path, types, split)
    from dblp_to_csv_spark.sources.xml_datasource import DblpXmlDataSource

    # fail on a typo'd path NOW (planning time), exactly like the function
    # front-end — the data source would otherwise defer to task time
    _plan_ranges(xml_path, split)
    spark.dataSource.register(DblpXmlDataSource)
    return (
        spark.read.format("dblp-xml")
        .option("path", xml_path)
        .option("recordTypes", ",".join(types))
        .option("splitBytes", str(split))
        .load()
    )


def materialize_envelope(
    spark: SparkSession,
    xml_path: str,
    record_types: set[str] | list[str],
    out_dir: str,
    target_split_bytes: int | None = None,
    via: str = "datasource",
    with_rank: bool = False,
) -> str:
    """Run the single pass and land the envelope as parquet partitioned by
    record_type — the raw-record lake every later per-type parse prunes
    into. Returns ``out_dir``.

    ``with_rank=True`` additionally stamps ``doc_mono`` =
    ``monotonically_increasing_id()`` into the parquet — the raw material
    for ZERO-SHUFFLE document-order ranks. Scan tasks emit records in
    (path, offset) order and partition indices follow the sorted split plan
    (real InputPartitions on the data-source path; repartitionByRange on the
    mapInPandas path), so (partition id, row position) — both encoded in
    doc_mono — IS the global document order. The parquet write freezes the
    values; `envelope_rank_prefix` later turns them into dense ranks with
    one tiny column-pruned aggregate, never re-reading the raw XML and
    never shuffling the envelope."""
    env = read_envelope(spark, xml_path, record_types, target_split_bytes, via=via)
    if with_rank:
        env = env.withColumn("doc_mono", F.monotonically_increasing_id())
    env.write.mode("overwrite").partitionBy("record_type").parquet(out_dir)
    return out_dir


def envelope_rank_prefix(spark: SparkSession, envelope_dir: str) -> DataFrame:
    """The tiny (``_pid``, ``_prefix``) frame that converts a ranked
    envelope's ``doc_mono`` into the global document-order rank:
    ``rank = _prefix + (doc_mono - (_pid << 33))``. One column-pruned
    aggregate over the materialized parquet (one row per scan partition),
    cumulated on the driver — the 100 TB cost is reading one BIGINT column."""
    from dblp_to_csv_spark.functions.ids import _PARTITION_SHIFT

    hist = (
        spark.read.parquet(envelope_dir)
        .groupBy(F.shiftright("doc_mono", _PARTITION_SHIFT).alias("_pid"))
        .count()
        .orderBy("_pid")
        .collect()
    )
    rows, acc = [], 0
    for r in hist:
        rows.append((int(r["_pid"]), acc))
        acc += r["count"]
    return spark.createDataFrame(rows, "_pid long, _prefix long")


def attach_doc_rank(env: DataFrame, rank_prefix: DataFrame) -> DataFrame:
    """Add ``#rank`` (global document-order position) to an envelope frame
    carrying ``doc_mono``: broadcast-join the per-partition prefix table and
    add the in-partition position — a narrow map over the scan, no shuffle."""
    from dblp_to_csv_spark.functions.ids import _PARTITION_SHIFT

    pid = F.shiftright(F.col("doc_mono"), _PARTITION_SHIFT)
    pos = F.col("doc_mono") - F.shiftleft(pid, _PARTITION_SHIFT)
    return (
        env.withColumn("_pid", pid.cast("long"))
        .join(F.broadcast(rank_prefix), "_pid")
        .withColumn("#rank", (F.col("_prefix") + pos).cast("long"))
        .drop("_pid", "_prefix")
    )


def read_envelope_type(
    spark: SparkSession,
    envelope_dir: str,
    element: str,
    schema: T.StructType,
    keep_meta: bool = False,
    rank_prefix: DataFrame | None = None,
) -> DataFrame:
    """Per-type parse from the materialized envelope: partition-pruned
    parquet read + JVM from_xml with the DTD-derived schema — byte-for-byte
    the layout ``spark.read.format('xml').option('rowTag', element)`` yields,
    without touching the raw XML again.

    ``keep_meta=True`` additionally carries document-order metadata outside
    the record namespace ('#' cannot start an XML name, so the names cannot
    collide with data): with ``rank_prefix`` (from `envelope_rank_prefix`,
    requires a ``with_rank=True`` envelope) a single ``#rank`` column — the
    record's global document-order position, computed join-free from the
    scan-time stamp — else the raw ``#src``/``#offset`` key pair. Both are
    the basis for reference-exact global document-order IDs
    (XMLToCSV.py:161-188), which only the single-pass envelope can provide."""
    try:
        env = spark.read.parquet(envelope_dir).filter(
            F.col("record_type") == element
        )
    except Exception as e:
        # a corpus with ZERO records of any type writes no parquet files at
        # all (partitionBy of an empty frame) — surface that as an empty,
        # correctly-typed frame, matching what the native scan yields for an
        # absent rowTag under a supplied schema. ONLY that case: any other
        # read failure (permissions, corrupt footer, transient FS) must
        # propagate — swallowing it would silently emit empty tables.
        if "UNABLE_TO_INFER_SCHEMA" in str(e) or "Unable to infer schema" in str(e):
            out_schema = schema
            if keep_meta:
                extra = (
                    [T.StructField("#rank", T.LongType())]
                    if rank_prefix is not None
                    else [
                        T.StructField("#src", T.StringType()),
                        T.StructField("#offset", T.LongType()),
                    ]
                )
                out_schema = T.StructType(schema.fields + extra)
            return spark.createDataFrame([], out_schema)
        raise
    if keep_meta and rank_prefix is not None:
        env = attach_doc_rank(env, rank_prefix)
        parsed = env.select(
            F.from_xml(F.col("xml"), schema, {"mode": "FAILFAST"}).alias("r"),
            F.col("#rank"),
        )
        return parsed.select("r.*", "#rank")
    parsed = env.select(
        F.from_xml(F.col("xml"), schema, {"mode": "FAILFAST"}).alias("r"),
        F.col("src").alias("#src"),
        F.col("offset").alias("#offset"),
    )
    if keep_meta:
        return parsed.select("r.*", "#src", "#offset")
    return parsed.select("r.*")
