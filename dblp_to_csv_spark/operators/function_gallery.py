"""Scalar/array/date function coverage plus remaining operator shapes:
pivot, argmax aggregates, range window frames, and a binned (scalable) range
join — rounding out SURVEY.md §2.3's function inventory with oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import load_table


@register(
    "string_functions_gallery",
    tags=("scalar", "string"),
    oracle="""
        SELECT c_custkey,
               lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
               translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
               reverse(c_mktsegment) AS reversed,
               repeat(substr(c_mktsegment, 1, 2), 2) AS repeated,
               levenshtein(c_mktsegment, 'BUILDING') AS lev_building,
               split_part(c_name, '#', 2) AS name_num,
               CAST(position('0' IN c_name) AS INT) AS zero_pos
        FROM customer
    """,
)
def string_functions_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions: pad/translate/reverse/repeat/levenshtein/
    split_part/position — all JVM built-ins in one codegen'd projection."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("translated"),
        F.reverse("c_mktsegment").alias("reversed"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 2).alias("repeated"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).alias("lev_building"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.instr(F.col("c_name"), "0").alias("zero_pos"),
    )


@register(
    "date_functions_gallery",
    tags=("scalar", "date"),
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
               date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since_epoch_start,
               strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
               CAST(quarter(o_orderdate) AS INT) AS qtr
        FROM orders
    """,
)
def date_functions_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar functions. Engine-dialect notes handled in the pair:
    DuckDB dayofweek is 0-based Sunday, Spark's is 1-based — the oracle adds
    1; due_date stays timestamp on both sides; pure DATE outputs are
    formatted to strings because the two engines' pandas bridges render
    dates differently (date objects vs datetime64)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp").alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.trunc(F.col("o_orderdate").cast("date"), "month"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.dayofweek("o_orderdate").alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
    )


@register(
    "array_functions_gallery",
    tags=("array", "agg"),
    oracle="""
        WITH per_order AS (
            SELECT l_orderkey, list_sort(list(l_linenumber)) AS lines
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT l_orderkey,
               CAST(len(lines) AS INT) AS n_lines,
               lines[1] AS first_line,
               list_contains(lines, 3) AS has_line3,
               array_to_string(list_sort(lines, 'DESC'), '|') AS lines_desc,
               array_to_string(lines[1:2], '|') AS first_two
        FROM per_order
    """,
)
def array_functions_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over per-group collected arrays: size/element_at/
    contains/sort-desc/slice. collect_list is made deterministic by sorting
    immediately (the reference's A2 discipline, XMLToCSV.py:179). Array-typed
    outputs are serialized with array_join — same '|' discipline as the A2
    sink — so the result is flat-schema friendly (and canonicalizer-safe)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_linenumber")).alias("lines")
    )
    return per_order.select(
        "l_orderkey",
        F.size("lines").alias("n_lines"),
        F.element_at("lines", 1).alias("first_line"),
        F.array_contains("lines", 3).alias("has_line3"),
        F.array_join(F.sort_array(F.col("lines"), asc=False), "|").alias("lines_desc"),
        F.array_join(F.slice("lines", 1, 2), "|").alias("first_two"),
    )


@register(
    "conditional_agg_orders",
    tags=("agg", "filter"),
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
               ROUND(SUM(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 2)
                   AS urgent_total,
               ROUND(SUM(CASE WHEN o_orderpriority = '5-LOW'
                              THEN o_totalprice ELSE 0 END), 2) AS low_total
        FROM orders
        GROUP BY o_orderstatus
    """,
)
def conditional_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER-clause / CASE-guard aggregates) — one
    hash aggregate regardless of how many conditions."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_big"),
        F.round(
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))),
            2,
        ).alias("urgent_total"),
        F.round(
            F.sum(
                F.when(F.col("o_orderpriority") == "5-LOW", F.col("o_totalprice")).otherwise(
                    0.0
                )
            ),
            2,
        ).alias("low_total"),
    )


@register(
    "pivot_status_by_priority",
    tags=("agg", "pivot"),
    oracle="""
        SELECT o_orderpriority,
               COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_f,
               COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_o,
               COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_p
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no discovery pass — the two-job
    'infer pivot values' variant is an anti-pattern at scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
    )


@register(
    "argmax_order_per_customer",
    tags=("agg", "argmax"),
    oracle="""
        SELECT o_custkey,
               -(m.k) AS best_orderkey,
               ROUND(m.p, 2) AS best_price
        FROM (
            SELECT o_custkey,
                   max({'p': o_totalprice, 'k': -o_orderkey}) AS m
            FROM orders GROUP BY o_custkey
        )
    """,
)
def argmax_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax aggregate (max_by ≡ arg_max): each customer's highest-value
    order in a single hash aggregate — no window, no self-join. The
    ordering key is the (price, -orderkey) struct, so price ties resolve
    to the LOWEST orderkey deterministically on both engines (the r10
    tied-values sweep caught bare max_by/arg_max picking different rows);
    the oracle spells the same total order as max-of-struct because
    DuckDB's arg_max does not take composite ordering keys."""
    o = load_table(spark, sf_dir, "orders")
    tie_total_order = F.struct(
        F.col("o_totalprice").alias("p"), (-F.col("o_orderkey")).alias("k")
    )
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", tie_total_order).alias("best_orderkey"),
        F.round(F.max("o_totalprice"), 2).alias("best_price"),
    )


@register(
    "window_range_frame",
    tags=("window", "range"),
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(COUNT(*) OVER (
                   PARTITION BY o_custkey
                   ORDER BY date_diff('day', DATE '1995-01-01', o_orderdate)
                   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS orders_last_30d
        FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, not row-based): per customer, how
    many orders fell in the 30 days up to each order — a rolling count that
    handles gaps/duplicates in the time axis correctly."""
    o = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days.alias("d"))
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w).alias("orders_last_30d"),
    )


@register(
    "range_join_events_binned",
    tags=("join", "range"),
    oracle="""
        SELECT e.event_id, e.user_id, o.o_orderkey
        FROM events e
        JOIN orders o
          ON o.o_custkey = e.user_id
         AND e.ts >= TIMESTAMP '2024-01-01'
         AND date_diff('day', TIMESTAMP '2024-01-01', e.ts) =
             date_diff('day', DATE '1995-01-01', o.o_orderdate) % 30
    """,
)
def range_join_events_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal bin join: events and orders mapped onto a shared 30-slot
    day-bin key and equi-joined on (user, bin).

    This is the scalable shape for time-range joins: instead of an
    interval predicate (which Spark would execute as a broadcast
    nested-loop join — quadratic in hot keys), both sides compute a bin
    column and hash-join on it; a residual filter then enforces the exact
    range. Here the residual IS the bin equality, keeping the oracle
    one-to-one."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") >= F.lit("2024-01-01").cast("timestamp")
    )
    o = load_table(spark, sf_dir, "orders")
    ev_binned = ev.select(
        "event_id",
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "bin"
        ),
    )
    o_binned = o.select(
        "o_orderkey",
        "o_custkey",
        (
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")) % 30
        ).alias("bin"),
    )
    return ev_binned.join(
        o_binned,
        (F.col("user_id") == F.col("o_custkey")) & (ev_binned.bin == o_binned.bin),
    ).select("event_id", "user_id", "o_orderkey")


@register(
    "advanced_agg_gallery",
    tags=("agg",),
    oracle="""
        SELECT l_returnflag,
               mode(l_linestatus) AS status_mode,
               CAST(bit_or(l_linenumber) AS BIGINT) AS line_bits_or,
               CAST(bit_and(l_linenumber) AS BIGINT) AS line_bits_and,
               bool_and(l_quantity > 0) AS all_positive_qty,
               bool_or(l_discount > 0.09) AS any_deep_discount
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def advanced_agg_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Less-common aggregate functions in one hash-agg: mode (most frequent
    value — tie-free on this data, so it is engine-deterministic), bitwise
    OR/AND folds, and boolean every/any folds. All are partial-aggregable
    built-ins — one shuffle carrying a few bytes per group at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.mode("l_linestatus").alias("status_mode"),
        F.bit_or("l_linenumber").cast("long").alias("line_bits_or"),
        F.bit_and("l_linenumber").cast("long").alias("line_bits_and"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
    )


@register(
    "regexp_functions_gallery",
    tags=("scalar", "regexp"),
    oracle="""
        SELECT o_orderkey,
               regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS priority_num,
               array_to_string(regexp_extract_all(o_orderpriority, '[AEIOU]'), '|')
                   AS priority_vowels,
               regexp_replace(o_orderpriority, '[^A-Z]', '', 'g') AS priority_letters,
               regexp_matches(o_orderpriority, 'URGENT|HIGH') AS is_expedited
        FROM orders
    """,
)
def regexp_functions_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar functions (extract / extract_all / replace / match) —
    JVM-side built-ins inside codegen; extract_all output is '|'-serialized
    (flat-schema discipline). DuckDB twin uses the 'g' flag to mirror
    Spark's replace-all semantics."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"^([0-9]+)", 1).alias("priority_num"),
        F.array_join(
            F.regexp_extract_all("o_orderpriority", F.lit("[AEIOU]"), 0), "|"
        ).alias("priority_vowels"),
        F.regexp_replace("o_orderpriority", r"[^A-Z]", "").alias("priority_letters"),
        F.col("o_orderpriority").rlike("URGENT|HIGH").alias("is_expedited"),
    )


@register(
    "unpivot_order_status_counts",
    tags=("agg", "unpivot"),
    oracle="""
        WITH wide AS (
            SELECT o_orderpriority,
                   COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_f,
                   COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_o,
                   COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_p
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, status, n FROM (
            UNPIVOT wide ON status_f, status_o, status_p INTO NAME status VALUE n
        )
    """,
)
def unpivot_order_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the inverse of `pivot_status_by_priority`: wide
    per-status count columns back to (key, status, n) long form via
    DataFrame.unpivot (SQL stack()). Pivot+unpivot round-trips are how wide
    feature tables move between storage layouts; both directions are now
    oracle-checked. Note DuckDB's UNPIVOT drops NULL cells by default —
    counts are never null here, so the pair is exact."""
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["status_f", "status_o", "status_p"],
        variableColumnName="status",
        valueColumnName="n",
    )


@register(
    "try_functions_gallery",
    tags=("scalar", "ansi", "null-safety"),
    oracle="""
        SELECT o_orderkey,
               ROUND(o_totalprice / NULLIF(o_orderkey % 2, 0), 4) AS half_price,
               o_orderkey % NULLIF(o_custkey % 3, 0) AS mod_or_null,
               TRY_CAST(split_part(o_orderpriority, '-', 1) AS INT) AS prio_num,
               TRY_CAST(o_orderstatus AS INT) AS status_num,
               string_split(o_orderpriority, '-')[2] AS prio_word,
               string_split(o_orderpriority, '-')[3] AS prio_missing
        FROM orders
    """,
)
def try_functions_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe function family (Spark 4 runs ANSI by default, so
    division by zero / bad casts THROW unless the try_* forms are used —
    the null-safety surface every production pipeline needs): try_divide and
    try_mod (NULL on zero divisor — half the rows here), try_cast (NULL on
    a malformed cast instead of aborting the job at task 40k of 50k), and
    try_element_at (NULL past the end of an array). DuckDB spells the same
    semantics as NULLIF-guarded arithmetic, TRY_CAST, and its
    NULL-out-of-range list indexing — the oracle proves the NULL patterns
    line up row-for-row. All expressions are scan-fused projections."""
    o = load_table(spark, sf_dir, "orders")
    parts = F.split(F.col("o_orderpriority"), "-")
    return o.select(
        "o_orderkey",
        F.round(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 2), 4
        ).alias("half_price"),
        F.try_mod(F.col("o_orderkey"), F.col("o_custkey") % 3).alias("mod_or_null"),
        F.expr(
            "try_cast(split_part(o_orderpriority, '-', 1) AS INT)"
        ).alias("prio_num"),
        F.expr("try_cast(o_orderstatus AS INT)").alias("status_num"),
        F.try_element_at(parts, F.lit(2)).alias("prio_word"),
        F.try_element_at(parts, F.lit(3)).alias("prio_missing"),
    )


@register(
    "higher_order_functions_gallery",
    tags=("scalar", "array", "lambda"),
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        )
        SELECT vec_id,
               ROUND(list_reduce(emb, (acc, x) -> acc + x), 6) AS arr_sum,
               len(list_filter(emb, x -> x > 0)) AS n_pos,
               len(list_filter(emb, x -> x > 2)) > 0 AS has_gt2,
               len(list_filter(emb, x -> NOT (abs(x) < 10))) = 0 AS all_lt10,
               ROUND(list_dot_product(emb, list_reverse(emb)), 6) AS dot_rev
        FROM e
    """,
)
def higher_order_functions_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda higher-order functions over array columns — the expression
    family custom array logic should reach for BEFORE any Python UDF
    (JVM-side, no serialization): aggregate (left fold), filter, exists,
    forall, zip_with, all reduced to scalars so cross-engine hashing is
    exact. Fold-order note: Spark's aggregate(0.0, acc+x) and DuckDB's
    list_reduce produce bit-identical doubles because 0+x1 is exactly x1 in
    IEEE 754 and both fold left; the zip_with dot product reuses the
    operand order the similarity oracles already pin. HOF staging caveat
    (SCALE.md §5): lambdas do not participate in whole-stage codegen and
    get no common-subexpression elimination — stage shared projections."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    e = F.col("emb")
    return emb.select(
        "vec_id",
        F.round(
            F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("arr_sum"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        F.exists(e, lambda x: x > 2).alias("has_gt2"),
        F.forall(e, lambda x: F.abs(x) < 10).alias("all_lt10"),
        F.round(
            F.aggregate(
                F.zip_with(e, F.reverse(e), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("dot_rev"),
    )


@register(
    "bitwise_functions_gallery",
    tags=("scalar", "bitwise"),
    oracle="""
        SELECT o_orderkey,
               CAST(bit_count(o_orderkey) AS INT) AS popcount,
               o_orderkey & o_custkey AS band,
               o_orderkey | o_custkey AS bor,
               xor(o_orderkey, o_custkey) AS bxor,
               CAST(o_custkey % 64 AS BIGINT) << 2 AS shifted,
               CAST((o_orderkey >> 3) & 1 AS TINYINT) AS bit3
        FROM orders
        WHERE o_orderkey <= 1000
    """,
)
def bitwise_functions_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar functions: bit_count (popcount), AND/OR/XOR, shifts,
    getbit — one codegen'd projection. These are the primitives under the
    engine's sketch family (SimHash hamming distance is bit_count(a^b); the
    z-order key is interleaved shifts; Bloom probes are shift+AND), shown
    here as first-class query surface with exact cross-engine semantics on
    64-bit signed integers."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        F.bit_count("o_orderkey").alias("popcount"),
        F.col("o_orderkey").bitwiseAND(F.col("o_custkey")).alias("band"),
        F.col("o_orderkey").bitwiseOR(F.col("o_custkey")).alias("bor"),
        F.col("o_orderkey").bitwiseXOR(F.col("o_custkey")).alias("bxor"),
        F.shiftleft(F.col("o_custkey") % 64, 2).cast("long").alias("shifted"),
        F.getbit(F.col("o_orderkey"), F.lit(3)).alias("bit3"),
    )


@register(
    "xml_functions_gallery",
    tags=("functions", "xml"),
    oracle="""
        SELECT doc_id,
               lang AS xml_lang,
               CAST(n_chars AS BIGINT) AS xml_chars,
               source AS xpath_source,
               'doc-' || CAST(doc_id AS VARCHAR) AS xpath_key
        FROM documents
    """,
)
def xml_functions_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML SCALAR functions outside the ETL plan: the engine's core ingest
    is XML (plans/etl.py), but Spark also exposes XML as row-level
    expressions — ``to_xml`` / ``from_xml`` / ``xpath_string`` /
    ``xpath_long``. The gallery round-trips each document's fields through
    a constructed XML fragment and extracts them back with BOTH APIs
    (schema'd from_xml and positional xpath), so the oracle is the
    original columns — any asymmetry in Spark's writer/parser pair or
    xpath evaluation breaks the hash. All JVM expressions; the fragment
    never leaves the row."""
    docs = load_table(spark, sf_dir, "documents")
    frag = F.to_xml(
        F.struct(
            F.col("lang").alias("lang"),
            F.col("n_chars").alias("chars"),
            F.struct(
                F.concat(F.lit("doc-"), F.col("doc_id")).alias("_key"),
                F.col("source").alias("_VALUE"),
            ).alias("src"),
        ),
        {"rowTag": "doc"},
    )
    staged = docs.select("doc_id", frag.alias("xml"))
    parsed = F.from_xml(
        F.col("xml"),
        "lang string, chars long, src struct<_key string, _VALUE string>",
    )
    return staged.select(
        "doc_id",
        parsed["lang"].alias("xml_lang"),
        parsed["chars"].alias("xml_chars"),
        F.xpath_string(F.col("xml"), F.lit("/doc/src/text()")).alias(
            "xpath_source"
        ),
        # to_xml strips the "_" attributePrefix on write: struct field
        # `_key` lands in the document as attribute `key`
        F.xpath_string(F.col("xml"), F.lit("/doc/src/@key")).alias("xpath_key"),
    )
