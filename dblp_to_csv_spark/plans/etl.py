"""The end-to-end XML→CSV conversion plan — the reference's whole program
(XMLToCSV.py:365-411) as a Spark job graph.

Stage map (reference cite → here):

1. DTD catalog scan S1 (:79-86)        → sources/dtd.get_elements (driver-side)
2. schema-inference pass S2 (:108-146) → spark.read.format('xml') schema
                                          inference per rowTag
3. record extraction S3 (:149-203)     → one XML scan per record type
                                          (executor-parallel by input split)
4. flatten P1 + arrays A1 (:224-233)   → plans/flatten.flatten_record_frame
5. empty-record filter F1 (:176)       → drop all-null rows
6. empty-column pruning P2 (:94,142)   → one agg per table, drop never-seen
                                          columns; drop empty tables
7. global dense IDs (:161,180,188)     → functions/ids.with_dense_ids with
                                          cross-table offsets
8. type observation+unify A3/A4        → one agg per table over the detect
   (:236-243, 314-331)                    ladder, lattice fold on driver
9. array serialization A2 (:178-179)   → array_join(array_sort(col), '|')
10. CSV sink K1 (:89-105)              → per-table csv write, ';'-separated
11. annotated headers K2 (:284-305)    → driver-side sidecar (id:integer —
                                          fixes the reference's id:<class
                                          'int'> bug, SURVEY.md §1.7)
12. relations R1/R2/R3 (:347-362)      → explode → distinct → dense-id →
                                          broadcast join → edge CSVs
13. neo4j command K3 (:334-344)        → driver-side script template

Scale: each record type's scan/flatten/write is an independent embarrassingly
parallel job; the only shuffles are the per-table pruning/typing aggregates
(tiny results) and the relation distinct. Nothing is ever collected to the
driver except per-partition histograms and per-column type sets.

Scan strategy — two modes:

* default, one XML scan per record type: the native XML source extracts one
  rowTag per read, so a DTD with N record types costs N passes over the
  input. Each pass is an embarrassingly parallel splittable scan that
  discards non-matching regions during tokenization (no parse of other
  records), and the passes are independent jobs a scheduler can overlap.
  N is small and fixed by the DTD (10 for DBLP).
* ``single_pass=True`` (``--single-pass``): ONE distributed byte-range pass
  splits the corpus into per-record envelope rows, materialized to parquet
  partitioned by record_type (sources/xml_single_pass.py); per-type parsing
  is a partition-pruned parquet read + JVM from_xml with the DTD-derived
  schema. Raw-XML read cost drops from N× to 1× — the mode that matters at
  100 TB, where re-reading the corpus per type IS the ETL bottleneck.
  Requires DTD-derivable schemas (the default path); types whose content
  models are opaque (parameter-entity fallback) use the native scan.
  tests/test_single_pass.py pins output equivalence between the modes.
"""

from __future__ import annotations

import glob
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dblp_to_csv_spark.functions.ids import with_dense_ids_counted
from dblp_to_csv_spark.functions.type_inference import (
    TYPE_INTEGER,
    detect_type_column,
    unify_types,
)
from dblp_to_csv_spark.plans.flatten import flatten_record_frame
from dblp_to_csv_spark.sources.dtd import (
    InvalidElementName,
    build_record_schema,
    get_attribute_defaults,
    get_record_types,
)


_BYTE_SUFFIXES = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(value: str) -> int | None:
    """Parse Spark byte-size conf strings ('134217728b', '128m', '1g', plain
    ints). None for unparseable values (caller then leaves the conf alone)."""
    v = value.strip().lower()
    for suffix in ("kb", "mb", "gb", "tb"):
        if v.endswith(suffix):
            v = v[: -len(suffix)] + suffix[0]
            break
    mult = 1
    if v and v[-1] in _BYTE_SUFFIXES:
        mult = _BYTE_SUFFIXES[v[-1]]
        v = v[:-1]
    try:
        return int(v) * mult
    except ValueError:
        return None


def translate_type(type_name: str, neo4j_style: bool = False) -> str:
    """T2 (XMLToCSV.py:308-311): Neo4j header dialect renames integer→int."""
    if neo4j_style and type_name == TYPE_INTEGER:
        return "int"
    return type_name


@dataclass
class TableResult:
    element: str
    df: DataFrame  # serialized (strings only), with id column
    columns: list[str]  # data columns, sorted (id excluded)
    array_columns: set[str]
    column_types: dict[str, str]  # unified type per column (annotate mode)
    n_rows: int
    cached: list[DataFrame] = field(default_factory=list)
    csv_path: str | None = None
    # document-order mode: the F1-dropped records' #rank values (a tiny
    # frame when drops are rare — real DBLP), feeding rank compaction
    doc_drops: DataFrame | None = None


@dataclass
class ConvertResult:
    tables: dict[str, TableResult] = field(default_factory=dict)
    relation_nodes: dict[str, DataFrame] = field(default_factory=dict)
    relation_edges: dict[str, DataFrame] = field(default_factory=dict)
    total_records: int = 0
    neo4j_script: str | None = None


class XmlToCsvPlan:
    """Composable plan: parse args once, run stages lazily per table."""

    def __init__(
        self,
        spark: SparkSession,
        xml_path: str,
        dtd_path: str,
        output_path: str,
        annotate: bool = False,
        neo4j: bool = False,
        relations: dict[str, str] | None = None,
        root: str = "dblp",
        single_file: bool = True,
        output_format: str = "csv",
        schema_sampling_ratio: float = 1.0,
        partition_by: list[str] | None = None,
        single_pass: bool = False,
        id_order: str = "table",
        parallel_tables: int = 4,
    ):
        if output_format not in ("csv", "parquet", "orc"):
            raise ValueError(
                f"output_format must be csv, parquet or orc, got {output_format!r}"
            )
        if neo4j and output_format != "csv":
            # the generated neo4j-admin script references the per-table CSV
            # paths; with a columnar sink those files are never written and
            # the script would point at nonexistent inputs (review r8)
            raise ValueError(
                "neo4j=True requires output_format='csv': neo4j-admin "
                "imports the CSV files this run would not produce under "
                f"output_format={output_format!r}"
            )
        if id_order not in ("table", "document"):
            raise ValueError(f"id_order must be table or document, got {id_order!r}")
        if id_order == "document" and not single_pass:
            # document order is defined by raw-XML byte position, which only
            # the single-pass envelope records (src, offset per record); the
            # independent per-type scans have no cross-type order to offer
            raise ValueError("id_order='document' requires single_pass=True")
        self.output_format = output_format
        # 1.0 = full pass-1 scan (reference semantics: a column exists iff
        # observed ANYWHERE, XMLToCSV.py:108-146). <1.0 samples the schema
        # discovery scan — faster, but a field appearing only in unsampled
        # records would be dropped; only safe for dense schemas.
        self.schema_sampling_ratio = schema_sampling_ratio
        self.partition_by = list(partition_by or [])  # parquet sink only
        self._relation_caches: list[DataFrame] = []
        self._observed_relations: list[str] | None = None
        if neo4j:
            annotate = True  # reference: --neo4j implies --annotate (:61-64)
        if relations:
            # uniqueness of both attribute and relation names (:66-73)
            if len(set(relations.values())) != len(relations):
                raise ValueError("relation names must be unique")
        self.spark = spark
        self.xml_path = xml_path
        self.dtd_path = dtd_path
        self.output_path = output_path
        self.annotate = annotate
        self.neo4j = neo4j
        self.relations = dict(relations or {})
        self.root = root
        self.single_file = single_file
        self.single_pass = single_pass
        self.id_order = id_order
        # Driver-side thread pool width for per-record-type preparation and
        # table writes. A type's jobs (parse, fused stats agg, id histogram,
        # sink) rarely saturate the cluster alone — overlapping types keeps
        # executors busy between job boundaries; the Spark scheduler
        # multiplexes concurrent jobs from one session by design. 1 = the
        # sequential reference order.
        self.parallel_tables = max(1, int(parallel_tables))
        self._envelope_dir: str | None = None
        self._rank_prefix: DataFrame | None = None
        self.path, self.ext = os.path.splitext(output_path)
        self.attribute_defaults = get_attribute_defaults(dtd_path)

    def _size_xml_splits(self) -> None:
        """Size input splits so the XML scans use the whole cluster: XML
        tokenization is CPU-heavy (~10 MB/s/core), and the 128 MB default
        leaves a small corpus parsing on ONE core (measured: a 42 MB corpus
        ran every scan single-threaded). Target ≥2 tasks per core, floor
        4 MB so huge inputs keep the default-sized splits."""
        paths = glob.glob(self.xml_path) or [self.xml_path]
        try:
            total = sum(os.path.getsize(p) for p in paths if os.path.isfile(p))
        except OSError:
            return
        if not total:
            return
        cores = self.spark.sparkContext.defaultParallelism
        target = max(4 * 1024 * 1024, total // max(cores * 2, 1))
        current = _parse_bytes(self.spark.conf.get("spark.sql.files.maxPartitionBytes"))
        if current is not None and target < current:
            self.spark.conf.set("spark.sql.files.maxPartitionBytes", str(target))

    # ------------------------------------------------------------------
    # Stage 2+3: scan one record type (DTD-derived schema + extraction).
    # ------------------------------------------------------------------
    def read_record_type(self, element: str) -> DataFrame:
        # The schema comes from the DTD, not reader inference. Two reasons:
        # (1) CORRECTNESS — inference unifies a tag that is text-only in one
        #     record and structured in another to STRING with the raw inner
        #     XML embedded, silently losing nested values (plain <title> vs
        #     <title>Foo <i>x</i></title> — ubiquitous in DBLP); the DTD
        #     states the true structure up front.
        # (2) COST — inference is a full extra pass over the corpus per
        #     record type (the ETL's largest fixed cost); a supplied schema
        #     eliminates it entirely.
        # Fallback: DTDs whose content models use parameter entities are
        # opaque to the parser → reader inference (with its documented merge
        # limitation).
        schema, cut_paths = build_record_schema(self.dtd_path, element)
        if schema is not None and cut_paths:
            print(
                f"Warning: recursive content model(s) for {element!r} cut at "
                f"depth: {', '.join(sorted(set(cut_paths))[:5])} — deeper "
                "repeats degrade to text."
            )
        # Single-pass mode: parse from the materialized envelope (one raw-XML
        # read for ALL types) when this type's schema is DTD-derivable.
        if self._envelope_dir is not None and schema is not None:
            from dblp_to_csv_spark.sources.xml_single_pass import (
                read_envelope_type,
            )

            return read_envelope_type(
                self.spark,
                self._envelope_dir,
                element,
                schema,
                keep_meta=self.id_order == "document",
                rank_prefix=self._rank_prefix,
            )
        if self.id_order == "document":
            # reached only when the DTD cannot determine this type's schema
            # (external parameter entities): the native fallback scan has no
            # byte offsets, so document order is unprovable for it
            raise ValueError(
                f"id_order='document' requires a DTD-derivable schema for "
                f"every record type; {element!r} fell back to reader inference"
            )
        if schema is None:
            # COVERAGE.md deviation 6b: unlike the reference (libxml2 fetches
            # external PEs, XMLToCSV.py:79), this path cannot resolve them —
            # warn UNMISSABLY because the fallback silently changes merge
            # semantics (VERDICT r7 #8). Golden: test_dtd_schema.py.
            print(
                f"WARNING: DTD content model for {element!r} references "
                "external parameter entities, which cannot be fetched — "
                "falling back to reader schema inference. Merge hazard: a "
                "tag that is text-only in one record and structured in "
                "another collapses to a raw-XML string on this path, losing "
                "nested values (DTD-derived schemas avoid this). Inline the "
                "external entities into the DTD to restore the DTD-schema "
                "path."
            )
        # FAILFAST: the reference hard-fails on invalid XML (DTD validation
        # during both scans, XMLToCSV.py:109,152). Spark has no DTD support
        # (see sources.dtd.validate_xml_against_dtd for the lxml-gated
        # pre-flight), but malformed XML should abort, not silently null.
        reader = (
            self.spark.read.format("xml")
            .option("rowTag", element)
            .option("mode", "FAILFAST")
        )
        if schema is not None:
            return reader.schema(schema).load(self.xml_path)
        reader = reader.option("inferSchema", "false")  # strings only
        if self.schema_sampling_ratio < 1.0:
            reader = reader.option("samplingRatio", str(self.schema_sampling_ratio))
        return reader.load(self.xml_path)

    # ------------------------------------------------------------------
    # Stages 4-8 for one table (everything before serialization).
    # ------------------------------------------------------------------
    def prepare_table(self, element: str, id_start: int) -> TableResult | None:
        try:
            raw = self.read_record_type(element)
        except Exception as e:  # rowTag absent from the document entirely
            if "UNABLE_TO_INFER_SCHEMA" in str(e) or "Unable to infer schema" in str(e):
                return None
            raise
        if not raw.schema.fields:
            return None  # record type never occurs with content (P2 drop)

        flat, array_cols = flatten_record_frame(raw, element)
        # '#'-prefixed columns are document-order metadata (flatten passes
        # them through outside the record namespace); every data-driven rule
        # below (F1 filter, P2 pruning, A3 types) sees data columns only
        meta_cols = [c for c in flat.columns if c.startswith("#")]
        data_cols = [c for c in flat.columns if not c.startswith("#")]
        if not data_cols:
            return None

        # F1: records with no extracted data emit no row (XMLToCSV.py:176)
        non_null = [
            (F.size(c) > 0) if name in array_cols else F.col(name).isNotNull()
            for name, c in ((n, F.col(n)) for n in data_cols)
        ]
        cond = non_null[0]
        for c in non_null[1:]:
            cond = cond | c
        # size(NULL array) is NULL under ANSI/3-valued logic: coalesce so the
        # keep predicate and its negation (drop capture below) PARTITION the
        # rows — filter(cond) alone already drops NULLs, but filter(~cond)
        # would drop them too, losing dropped records from the rank
        # compaction set
        cond = F.coalesce(cond, F.lit(False))
        doc_drops: DataFrame | None = None
        if self.id_order == "document" and "#rank" in flat.columns:
            # cache the PRE-filter frame so both the kept side and the
            # (rare) dropped ranks read from one materialization
            flat.cache()
            cached: list[DataFrame] = [flat]
            doc_drops = flat.filter(~cond).select("#rank")
            flat = flat.filter(cond)
        else:
            flat = flat.filter(cond)
            flat.cache()  # reused by: prune agg, type agg, id histogram, write
            cached = [flat]

        # P2 + A3 fused: ONE aggregate job computes, for every column, both
        # the non-empty count (pruning) and — in annotate mode — the observed
        # type set. One pass over the (cached) table instead of two.
        # total kept rows rides the same aggregate ('#' cannot appear in an
        # XML name, so 'cnt_#rows' can never collide with a data column's
        # f"cnt_{c}") — document-order mode reads it instead of paying a
        # separate count job per table
        aggs = [F.count(F.lit(1)).alias("cnt_#rows")]
        for c in data_cols:
            aggs.append(
                (
                    F.count(F.when(F.size(F.col(c)) > 0, 1))
                    if c in array_cols
                    else F.count(F.col(c))
                ).alias(f"cnt_{c}")
            )
            if c in array_cols:
                # observed max multiplicity: the reference promotes scalar →
                # list only when a record actually repeats the tag
                # (XMLToCSV.py:224-233); the DTD-derived schema reads every
                # child as an array, so single-valued columns are demoted
                # back to scalars after this aggregate
                aggs.append(F.max(F.size(F.col(c))).alias(f"len_{c}"))
            if self.annotate:
                if c in array_cols:
                    per_row = F.array_distinct(
                        F.transform(F.col(c), lambda v: detect_type_column(v))
                    )
                    aggs.append(
                        F.array_distinct(F.flatten(F.collect_set(per_row))).alias(
                            f"typ_{c}"
                        )
                    )
                else:
                    aggs.append(
                        F.collect_set(detect_type_column(F.col(c))).alias(f"typ_{c}")
                    )
        stats_row = flat.agg(*aggs).collect()[0]
        keep = [c for c in data_cols if stats_row[f"cnt_{c}"] > 0]
        # DTD-defaulted attributes survive pruning even when never set in the
        # data: the reference's pass 1 observes them via attribute_defaults
        # while pass 2 leaves the cells empty (SURVEY.md §1.1; see
        # get_attribute_defaults for the header-bug deviation).
        defaulted = self.attribute_defaults.get(element, {})
        for attr in sorted(defaulted):
            if attr == "id":
                raise InvalidElementName("id", attr, element)
            if attr not in keep:
                keep.append(attr)
                if attr not in flat.columns:
                    flat = flat.withColumn(attr, F.lit(None).cast("string"))
        if not keep:
            # unpersist the REGISTERED frames: in document-order mode
            # ``flat`` is by now a filter() derivative of the cached
            # pre-filter frame, and unpersisting a derived plan is a no-op
            # (see the _run comment) — the sibling n_rows == 0 path below
            # got this right
            for c in cached:
                c.unpersist()
            return None
        flat = flat.select(*sorted(keep), *meta_cols)
        array_cols &= set(keep)

        # A1 faithfulness: demote never-repeated array columns to scalars
        # (the reference's cells are scalar until a record repeats the tag)
        demote = {c for c in array_cols if (stats_row[f"len_{c}"] or 0) <= 1}
        for c in sorted(demote):
            flat = flat.withColumn(c, F.element_at(F.col(c), 1))
        array_cols -= demote

        # A4: lattice fold on the tiny driver-side result of the fused agg.
        column_types: dict[str, str] = {}
        if self.annotate:
            stats = stats_row.asDict()
            for c in keep:
                # DTD-defaulted columns appended after the agg have no
                # observations → empty set → 'string' per the lattice
                observed = set(stats.get(f"typ_{c}") or [])
                column_types[c] = unify_types(observed or {"any"})

        # Stage 7: dense IDs continuing the global counter; the row count
        # falls out of the partition histogram — no extra count job.
        # Document-order mode defers ID assignment to _run's rank
        # compaction over every table's scan-stamped #rank column; the
        # count here is cheap (the frame is cached and already materialized
        # by the stats agg).
        if self.id_order == "document":
            with_ids, n_rows = flat, int(stats_row["cnt_#rows"])
        else:
            with_ids, n_rows = with_dense_ids_counted(
                flat, "id", start=id_start, cache_registry=cached
            )
        if n_rows == 0:
            # record type never occurs in the data (with the DTD-supplied
            # schema an absent rowTag reads as 0 rows, not a schema error) —
            # the reference emits no table for it (P2)
            for c in cached:
                c.unpersist()
            return None
        return TableResult(
            element=element,
            df=with_ids,
            columns=sorted(keep),
            array_columns=array_cols,
            column_types=column_types,
            n_rows=n_rows,
            cached=cached,
            doc_drops=doc_drops,
        )

    # ------------------------------------------------------------------
    # Stage 9+10: serialize arrays, write the per-table CSV (K1).
    # ------------------------------------------------------------------
    def serialize(self, t: TableResult) -> DataFrame:
        cols = [F.col("id").cast("string").alias("id")]
        for c in t.columns:
            if c in t.array_columns:
                cols.append(F.array_join(F.array_sort(F.col(c)), "|").alias(c))
            else:
                cols.append(F.col(c).alias(c))
        return t.df.select(*cols)

    def write_table_csv(self, t: TableResult) -> str:
        out = f"{self.path}_{t.element}{self.ext}"
        _write_csv(
            self.serialize(t),
            out,
            header=not self.annotate,  # inline header iff not annotated (:102-103)
            single_file=self.single_file,
        )
        return out

    def write_table_parquet(self, t: TableResult, fmt: str | None = None) -> str:
        """Scale sink: the PRE-serialized frame (arrays kept as
        array<string>, no '|' flattening) written as parquet or ORC — the
        formats a 100 TB deployment keeps; the CSV sink is reference parity.
        Columnar + dictionary encoding happens in the writer; downstream
        queries get pushdown/pruning against these files for free (both
        formats carry min/max indexes Spark's scans use). Columns listed in
        ``partition_by`` (when present in the table) become hive-style
        partition directories, so readers filtering on them prune whole
        partitions before any IO."""
        fmt = fmt or (
            self.output_format if self.output_format in ("parquet", "orc") else "parquet"
        )
        out = f"{self.path}_{t.element}.{fmt}"
        writer = t.df.select("id", *t.columns).write.mode("overwrite").format(fmt)
        part_cols = [c for c in self.partition_by if c in t.columns]
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.save(out)
        return out

    # ------------------------------------------------------------------
    # Stage 11: annotated sidecar headers (K2).
    # ------------------------------------------------------------------
    def write_annotated_header(self, t: TableResult) -> str:
        out = f"{self.path}_{t.element}_header{self.ext}"
        parts = []
        if self.neo4j:
            parts.append(f"{t.element}:ID")
        else:
            # deviation: the reference renders id:<class 'int'> here (bug,
            # XMLToCSV.py:294-295); we emit id:integer (SURVEY.md §1.7)
            parts.append("id:integer")
        for c in t.columns:
            tname = translate_type(t.column_types[c], self.neo4j)
            suffix = "[]" if c in t.array_columns else ""
            parts.append(f"{c}:{tname}{suffix}")
        with open(out, "w", encoding="utf-8") as f:
            f.write(";".join(parts))
        return out

    # ------------------------------------------------------------------
    # Stage 12: relations — nodes (R1), edges (R2), sinks (R3).
    # ------------------------------------------------------------------
    def build_relation_pairs(self, tables: dict[str, TableResult], column: str) -> DataFrame:
        """(record id, value) pairs for one relation column across ALL record
        types (the reference's relations map is keyed by column name only,
        XMLToCSV.py:206-221)."""
        pairs = None
        for t in tables.values():
            if column not in t.columns:
                continue
            if column in t.array_columns:
                p = t.df.select("id", F.explode(column).alias("value"))
            else:
                p = t.df.select("id", F.col(column).alias("value"))
            p = p.filter(F.col("value").isNotNull())
            pairs = p if pairs is None else pairs.unionByName(p)
        if pairs is None:
            return self.spark.createDataFrame([], "id long, value string")
        # reference semantics: value→set(ids), i.e. one edge per distinct pair
        return pairs.distinct()

    def build_relations(
        self, tables: dict[str, TableResult], next_id: int
    ) -> tuple[dict[str, DataFrame], dict[str, DataFrame]]:
        nodes_by_col: dict[str, DataFrame] = {}
        edges_by_col: dict[str, DataFrame] = {}
        for column in sorted(self.relations):
            pairs = self.build_relation_pairs(tables, column)
            pairs.cache()
            self._relation_caches.append(pairs)
            values = pairs.select("value").distinct()
            nodes, n_nodes = with_dense_ids_counted(
                values, "node_id", start=next_id, cache_registry=self._relation_caches
            )
            if n_nodes == 0:
                # reference writes files only for OBSERVED relations
                # (XMLToCSV.py:206-221 populates the map from data) — a
                # typo'd --relations attr must not yield empty CSVs that the
                # generated import command then references
                print(
                    f"Warning: relation attribute {column!r} never occurs in "
                    "the data; skipping its node/edge files."
                )
                continue
            nodes = nodes.select("node_id", "value")
            next_id += n_nodes
            edges = pairs.join(F.broadcast(nodes), "value").select(
                F.col("id").alias("start_id"), F.col("node_id").alias("end_id")
            )
            nodes_by_col[column] = nodes
            edges_by_col[column] = edges
        self._observed_relations = sorted(nodes_by_col)
        return nodes_by_col, edges_by_col

    def write_relation_files(
        self, nodes_by_col: dict[str, DataFrame], edges_by_col: dict[str, DataFrame]
    ) -> None:
        for column, nodes in nodes_by_col.items():
            node_path = f"{self.path}_{column}{self.ext}"
            edge_path = f"{self.path}_{column}_{self.relations[column]}{self.ext}"
            _write_csv(
                nodes.select(F.col("node_id").cast("string"), "value"),
                node_path,
                header=False,
                single_file=self.single_file,
                literal_header=f":ID;{column}:string",
            )
            _write_csv(
                edges_by_col[column].select(
                    F.col("start_id").cast("string"), F.col("end_id").cast("string")
                ),
                edge_path,
                header=False,
                single_file=self.single_file,
                literal_header=":START_ID;:END_ID",
            )

    # ------------------------------------------------------------------
    # Stage 13: neo4j-admin import command (K3, XMLToCSV.py:334-344).
    # ------------------------------------------------------------------
    def neo4j_import_command(self, elements: list[str]) -> str:
        path, ext = self.path, self.ext
        cmd = (
            'neo4j-admin import --mode=csv --database=dblp.db --delimiter ";" '
            '--array-delimiter "|" --id-type INTEGER'
        )
        for element in elements:
            cmd += f' --nodes:{element} "{path}_{element}_header{ext},{path}_{element}{ext}"'
        # only relations actually observed in the data get files — mirror that
        # here so the import command never references a nonexistent CSV
        observed = (
            self._observed_relations
            if self._observed_relations is not None
            else sorted(self.relations)
        )
        for relation in observed:
            cmd += f' --nodes:{relation} "{path}_{relation}{ext}"'
            predicate = self.relations[relation]
            cmd += f' --relationships:{predicate} "{path}_{relation}_{predicate}{ext}"'
        return cmd

    # ------------------------------------------------------------------
    # The whole program.
    # ------------------------------------------------------------------
    def run(self) -> ConvertResult:
        elements = get_record_types(self.dtd_path, self.root)
        # split sizing is a session conf: restore it afterward so a shared
        # session's later (e.g. parquet) reads keep their normal splits
        old_split = self.spark.conf.get("spark.sql.files.maxPartitionBytes")
        self._size_xml_splits()
        try:
            if self.single_pass and elements:
                import tempfile

                from dblp_to_csv_spark.sources.xml_single_pass import (
                    materialize_envelope,
                )

                # per-run unique dir: concurrent converts sharing an output
                # parent must not clobber each other's envelope
                self._envelope_dir = tempfile.mkdtemp(
                    prefix="_xml_envelope_",
                    dir=os.path.dirname(os.path.abspath(self.path)) or ".",
                )
                materialize_envelope(
                    self.spark,
                    self.xml_path,
                    elements,
                    self._envelope_dir,
                    with_rank=self.id_order == "document",
                )
                if self.id_order == "document":
                    from dblp_to_csv_spark.sources.xml_single_pass import (
                        envelope_rank_prefix,
                    )

                    try:
                        self._rank_prefix = envelope_rank_prefix(
                            self.spark, self._envelope_dir
                        )
                    except Exception as e:
                        # zero-record corpus: partitionBy wrote no files
                        if "UNABLE_TO_INFER_SCHEMA" not in str(e):
                            raise
                        self._rank_prefix = None
            return self._run(elements)
        finally:
            self.spark.conf.set("spark.sql.files.maxPartitionBytes", old_split)
            if self._envelope_dir is not None:
                # the returned TableResult/relation frames lazily read the
                # envelope parquet in single-pass mode — an immediate rmtree
                # would dangle them (review r8: the same lazily-read-frame
                # hazard as the operator checkpoints). Defer to interpreter
                # exit: the CLI exits right after convert; a long-lived
                # session keeps the frames usable for its lifetime.
                import atexit

                atexit.register(
                    shutil.rmtree, self._envelope_dir, ignore_errors=True
                )
                self._envelope_dir = None

    # drop sets up to this size compact in-row (a literal-array scan per
    # record); larger ones (pathological corpora: a whole record type
    # emitting nothing) fall back to the global rank-join
    DOC_DROP_COMPACT_MAX = 1024

    def _assign_document_order_ids(
        self, tables: dict[str, TableResult], extra_drops: list[DataFrame]
    ) -> int:
        """Reference-exact global IDs (XMLToCSV.py:161-188): one counter over
        ALL record types in document order, skipping records that emit no row.

        Zero-shuffle shape (ROADMAP item 10): every record already carries
        ``#rank`` — its global document-order position, stamped join-free at
        envelope-scan time (monotonically_increasing_id + a broadcast
        per-partition prefix). The reference's id is then ``#rank`` minus the
        number of DROPPED records (F1 empty records, record types that emit
        no table) preceding it. Drops are a vanishing fraction of any real
        corpus, so the drop-rank set collects to the driver (bounded by
        DOC_DROP_COMPACT_MAX) and the correction is an in-row scan of a tiny
        sorted literal array — no shuffle, no join, nothing touches the
        corpus beyond the narrow projection it already pays.

        Fallback for pathological drop counts: rank-compact the kept
        ``#rank`` keys (single 8-byte column) via repartitionByRange +
        partition-offset arithmetic — range partition k holds keys strictly
        below partition k+1, so offsets + within-partition positions ARE the
        dense id; each table equi-joins its ids back on ``#rank``. No global
        single-reducer sort in either path. Returns the total record count."""
        from functools import reduce

        drop_frames = [
            t.doc_drops for t in tables.values() if t.doc_drops is not None
        ] + extra_drops
        drops: list[int] = []
        compact = True
        if drop_frames:
            drop_df = reduce(DataFrame.unionByName, drop_frames)
            rows = drop_df.limit(self.DOC_DROP_COMPACT_MAX + 1).collect()
            if len(rows) > self.DOC_DROP_COMPACT_MAX:
                compact = False
            else:
                drops = sorted(r[0] for r in rows)
        if compact:
            total = 0
            if drops:
                d_lit = F.lit(drops)
                corr = lambda: F.size(  # noqa: E731
                    F.filter(d_lit, lambda d: d < F.col("#rank"))
                )
            else:
                corr = lambda: F.lit(0)  # noqa: E731
            for t in tables.values():
                t.df = t.df.withColumn(
                    "id", (F.col("#rank") - corr()).cast("long")
                ).drop("#rank")
                total += t.n_rows
            return total
        keys = reduce(
            DataFrame.unionByName, [t.df.select("#rank") for t in tables.values()]
        )
        ranked = keys.repartitionByRange("#rank").sortWithinPartitions("#rank")
        ids_df, total = with_dense_ids_counted(
            ranked, "id", start=0, cache_registry=self._relation_caches
        )
        for t in tables.values():
            t.df = t.df.join(ids_df, ["#rank"]).drop("#rank")
        return total

    def _envelope_drop_ranks(self, element: str) -> DataFrame | None:
        """All envelope records of a record type that produced NO table
        (never occurs with content, every column pruned, or zero kept rows):
        each consumed a rank but must consume no id — they join the drop set.
        Partition-pruned read of the rank columns only."""
        if self._rank_prefix is None:
            return None
        from dblp_to_csv_spark.sources.xml_single_pass import attach_doc_rank

        env = self.spark.read.parquet(self._envelope_dir).filter(
            F.col("record_type") == element
        )
        return attach_doc_rank(env, self._rank_prefix).select("#rank")

    def _run(self, elements: set[str]) -> ConvertResult:
        result = ConvertResult()
        next_id = 0
        # default ('table') ID mode: deterministic table order replaces the
        # reference's document-order interleaving (SURVEY.md §7.4 — out of
        # contract); id_order='document' (single-pass only) restores the
        # reference's exact interleaved numbering via _assign_document_order_ids
        skipped_drops: list[DataFrame] = []
        elements_sorted = sorted(elements)
        # Tables are prepared with LOCAL ids (id_start=0) — possibly in
        # parallel driver threads — and the reference's global counter is
        # restored afterwards by adding each table's cumulative base: a
        # constant-shift projection, so the sequential-id semantics cost
        # nothing while the heavy per-type jobs overlap.
        if self.parallel_tables > 1 and len(elements_sorted) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                min(self.parallel_tables, len(elements_sorted))
            ) as ex:
                prepared = list(
                    ex.map(lambda el: (el, self.prepare_table(el, id_start=0)),
                           elements_sorted)
                )
        else:
            prepared = [
                (el, self.prepare_table(el, id_start=0)) for el in elements_sorted
            ]
        for element, t in prepared:
            if t is None:
                if self.id_order == "document":
                    d = self._envelope_drop_ranks(element)
                    if d is not None:
                        skipped_drops.append(d)
                continue
            if self.id_order == "table" and next_id:
                t.df = t.df.withColumn(
                    "id", (F.col("id") + F.lit(next_id)).cast("long")
                )
            next_id += t.n_rows
            result.tables[element] = t
        if self.id_order == "document" and result.tables:
            next_id = self._assign_document_order_ids(result.tables, skipped_drops)
        result.total_records = next_id

        def _write_one(t: TableResult) -> None:
            if self.output_format in ("parquet", "orc"):
                t.csv_path = self.write_table_parquet(t)
            else:
                t.csv_path = self.write_table_csv(t)
            if self.annotate:
                self.write_annotated_header(t)

        if self.parallel_tables > 1 and len(result.tables) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                min(self.parallel_tables, len(result.tables))
            ) as ex:
                list(ex.map(_write_one, result.tables.values()))
        else:
            for t in result.tables.values():
                _write_one(t)

        if self.relations:
            nodes, edges = self.build_relations(result.tables, next_id)
            result.relation_nodes = nodes
            result.relation_edges = edges
            self.write_relation_files(nodes, edges)

        if self.neo4j:
            cmd = self.neo4j_import_command(sorted(result.tables))
            script = os.path.join(os.path.dirname(self.path) or ".", "neo4j_import.sh")
            with open(script, "w", encoding="utf-8") as f:
                f.write("#!/bin/bash\n")
                f.write(cmd)
            result.neo4j_script = script

        # release every frame we persisted (t.df/nodes are derived plans;
        # unpersisting those would be a no-op — unpersist the real handles)
        for t in result.tables.values():
            for c in t.cached:
                c.unpersist()
        for c in self._relation_caches:
            c.unpersist()
        return result


def convert(
    spark: SparkSession,
    xml_path: str,
    dtd_path: str,
    output_path: str,
    annotate: bool = False,
    neo4j: bool = False,
    relations: dict[str, str] | None = None,
    root: str = "dblp",
    single_file: bool = True,
    output_format: str = "csv",
    schema_sampling_ratio: float = 1.0,
    single_pass: bool = False,
    id_order: str = "table",
    parallel_tables: int = 4,
) -> ConvertResult:
    """One-call equivalent of the reference CLI (XMLToCSV.py:365-411)."""
    return XmlToCsvPlan(
        spark,
        xml_path,
        dtd_path,
        output_path,
        annotate,
        neo4j,
        relations,
        root,
        single_file,
        output_format,
        schema_sampling_ratio,
        single_pass=single_pass,
        id_order=id_order,
        parallel_tables=parallel_tables,
    ).run()


# --------------------------------------------------------------------------
# CSV sink helper (K1/R3): Spark writes a directory; single_file mode moves
# the lone part file to the exact reference filename (viable for dim-sized
# outputs; at 100 TB you keep directory mode and a manifest).
# --------------------------------------------------------------------------
def _write_csv(
    df: DataFrame,
    out_path: str,
    header: bool,
    single_file: bool,
    literal_header: str | None = None,
) -> None:
    tmp_dir = out_path + ".spark-tmp"
    writer = (
        (df.coalesce(1) if single_file else df)
        .write.mode("overwrite")
        .option("sep", ";")
        .option("quote", '"')
        .option("escape", '"')  # doubled quotes, python csv doublequote=True
        .option("nullValue", "")
        .option("emptyValue", "")
        .option("header", str(header).lower())
    )
    if single_file:
        writer.csv(tmp_dir)
        parts = sorted(glob.glob(os.path.join(tmp_dir, "part-*")))
        with open(out_path, "wb") as out:
            if literal_header is not None:
                out.write((literal_header + "\n").encode("utf-8"))
            for p in parts:
                with open(p, "rb") as f:
                    shutil.copyfileobj(f, out)
        shutil.rmtree(tmp_dir)
    else:
        writer.csv(out_path)
        if literal_header is not None:
            with open(os.path.join(out_path, "_header.csv"), "w", encoding="utf-8") as f:
                f.write(literal_header)


__all__ = [
    "XmlToCsvPlan",
    "ConvertResult",
    "TableResult",
    "convert",
    "translate_type",
    "InvalidElementName",
]
