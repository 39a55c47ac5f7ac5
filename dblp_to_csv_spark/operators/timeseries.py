"""Time-series operators over the events table: tumbling-window aggregation
(the batch twin of the Structured Streaming job in streaming/), gap-based
sessionization, and an as-of join — operators the reference lacks entirely
(SURVEY.md §2.3) expressed with windows/aggregates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dblp_to_csv_spark.functions.rounding import FINITE_OR_NULL_SQL
from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import load_table

SESSION_GAP_MIN = 30


@register(
    "tumbling_window_events",
    bench=True,
    tags=("window", "time"),
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event type (F.window ≡ date_trunc for
    epoch-aligned hourly windows). Identical code runs under Structured
    Streaming with a watermark — see streaming/events_stream.py."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "sessionize_events",
    tags=("window", "time", "session"),
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL {SESSION_GAP_MIN} MINUTE
                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        numbered AS (
            SELECT user_id, event_id, ts,
                   CAST(SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_seq
            FROM flagged
        )
        SELECT user_id, session_seq, COUNT(*) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM numbered
        GROUP BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session flag →
    running sum = session number → per-session aggregate. One shuffle on
    user_id serves both windows and the final aggregate (same key).

    Gaps compare at MICROSECOND precision (unix_micros), matching the
    oracle's exact INTERVAL comparison — cast('long') truncates to whole
    seconds and misclassifies sub-second gaps at the 1800 s boundary."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    numbered = flagged.select(
        "user_id", "event_id", "ts", F.sum("new_session").over(run).alias("session_seq")
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "asof_join_purchase_last_view",
    tags=("join", "asof", "window"),
    oracle="""
        WITH tagged AS (
            SELECT user_id, event_id, ts, event_type,
                   MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS last_view_ts
            FROM events
            WHERE event_type IN ('view', 'purchase')
        )
        SELECT event_id, user_id, ts, last_view_ts
        FROM tagged
        WHERE event_type = 'purchase'
    """,
)
def asof_join_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): for every purchase, the same user's most recent
    strictly-earlier view.

    Implemented as union-then-window — the scalable as-of plan: one shuffle
    on user_id, a running MAX over the view timestamps, no range join and no
    per-key blowup (a naive t1⋈t2 ON ts<=ts range join is quadratic in hot
    keys). This is the standard distributed as-of idiom."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w).alias(
            "last_view_ts"
        ),
    )
    return tagged.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "last_view_ts"
    )


@register(
    "sliding_window_events",
    tags=("window", "time"),
    oracle="""
        WITH expanded AS (
            SELECT time_bucket(INTERVAL 15 MINUTE, ts)
                       - CAST(i AS INT) * INTERVAL 15 MINUTE AS window_start,
                   event_type, value, ts
            FROM events, unnest(range(0, 4)) AS t(i)
        )
        SELECT window_start, event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM expanded
        WHERE ts >= window_start AND ts < window_start + INTERVAL 1 HOUR
        GROUP BY 1, 2
    """,
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes (each event lands in 4
    overlapping windows) — F.window(slideDuration=...) expands rows to
    their windows BEFORE the partial aggregate, so the shuffle carries
    ≤ windows×groups rows, not ×4 events. The DuckDB twin reproduces the
    epoch-aligned window assignment with time_bucket arithmetic. Identical
    code runs under Structured Streaming with a watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "event_validity_intervals",
    tags=("window", "time", "scd"),
    oracle="""
        SELECT user_id, event_type,
               ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM events
    """,
)
def event_validity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validity-interval construction (the SCD2 / temporal-table shape):
    each event's state holds from its timestamp until the user's next event
    (open-ended for the latest) — one LEAD over the per-key window, one
    shuffle on the key. This is the transform that turns an event log into
    an as-of-joinable history table."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )


@register(
    "gapfill_hourly_events",
    tags=("time", "gapfill"),
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('hour', MIN(ts)) AS lo,
                   date_trunc('hour', MAX(ts)) AS hi
            FROM events
        ),
        grid AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
            FROM bounds
        ),
        actual AS (
            SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n
            FROM events GROUP BY 1
        )
        SELECT grid.hour, CAST(COALESCE(actual.n, 0) AS BIGINT) AS n_events
        FROM grid LEFT JOIN actual USING (hour)
    """,
)
def gapfill_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resampling: a dense hour grid (sequence + explode
    between the observed bounds) left-joined to the actual per-hour counts,
    zero-filling silent hours — the transform every monitoring/feature
    pipeline needs because absence of data IS data. The grid builds from a
    1-row bounds aggregate (broadcast), so the only real shuffle is the
    per-hour count."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    actual = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.count("*").alias("n")
    )
    return grid.join(actual, "hour", "left").select(
        "hour", F.coalesce("n", F.lit(0)).alias("n_events")
    )


@register(
    "funnel_view_cart_purchase",
    tags=("window", "time", "funnel"),
    oracle="""
        WITH steps AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
            FROM events
            GROUP BY user_id
        )
        SELECT
            CAST(COUNT(t_view) AS BIGINT) AS n_view,
            CAST(COUNT(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT)
                AS n_view_click,
            CAST(COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view
                            THEN 1 END) AS BIGINT) AS n_view_click_purchase
        FROM steps
    """,
)
def funnel_view_cart_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: per user, the first time each step occurred;
    a user converts a stage only if the steps happened IN ORDER
    (view < click < purchase) — the standard product-analytics funnel,
    expressed as one conditional-MIN aggregate per user plus a global count.
    One shuffle on user_id with map-side partials; the ordering logic is a
    row-local comparison of the per-user step times, so no self-joins and
    no window over the event stream."""
    ev = load_table(spark, sf_dir, "events")
    steps = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return steps.agg(
        F.count("t_view").alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("n_view_click"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("n_view_click_purchase"),
    )


@register(
    "retention_cohorts_weekly",
    tags=("time", "agg", "cohort"),
    oracle="""
        WITH firsts AS (
            SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week
            FROM events
        )
        SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
               CAST(date_diff('day', CAST(f.cohort_week AS DATE),
                              CAST(a.act_week AS DATE)) // 7 AS BIGINT)
                   AS week_offset,
               CAST(COUNT(*) AS BIGINT) AS n_active_users
        FROM firsts f JOIN activity a USING (user_id)
        GROUP BY 1, 2
    """,
)
def retention_cohorts_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week, counted
    in every later week they were active — the (cohort_week, week_offset)
    triangle every growth dashboard plots. Two aggregates over the event
    stream (first-seen per user; distinct user-weeks) joined on user_id —
    the join is keyed on the same column as both aggregates, so one shuffle
    partitioning serves all three operators."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            # DATE arithmetic, not epoch seconds: a DST transition inside the
            # span would make the epoch difference a non-multiple of 604800 s
            # under a DST-observing session timezone and shift the floor
            (
                F.floor(
                    F.datediff(F.to_date("act_week"), F.to_date("cohort_week")) / 7
                )
            ).cast("long").alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active_users"))
    )


@register(
    "session_window_events",
    tags=("window", "time", "session"),
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts, value, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w
                                >= INTERVAL {SESSION_GAP_MIN} MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
            -- ORDER BY (ts, event_id), matching the flag window: ordering
            -- by ts alone makes the ROWS-frame sum nondeterministic on
            -- duplicate (user_id, ts) rows — the flagged row could be
            -- summed after its tie-partner and split the session
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_seq
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM numbered GROUP BY user_id, session_seq
    """,
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE session windows (``F.session_window``) — the JVM-side
    gap-merging aggregate, completing the tumbling/sliding/session window
    trio. Unlike ``sessionize_events`` (a lag+flag window-function
    formulation that yields per-event session numbers), this is the
    groupBy-native operator: sessions merge inside the aggregation, the
    same code runs under Structured Streaming with a watermark, and no
    per-event row survives the shuffle — the exchange carries session
    partials only.

    Boundary contract: Spark merges an event into a session while
    ``ts < prev_end = prev_ts + gap`` — a gap of EXACTLY
    {SESSION_GAP_MIN} minutes starts a NEW session. The oracle's flag
    therefore splits on ``>=`` where sessionize_events splits on ``>`` —
    the two operators genuinely differ on exact-gap events, which is why
    both exist and each carries its own oracle. session_end here is
    Spark's definition: last event + gap."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "forward_fill_event_metric",
    tags=("window", "time", "pipeline"),
    oracle="""
        WITH t AS (
            SELECT event_id, user_id, ts,
                   TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)
                       AS k
            FROM events
        ),
        sparse AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN k % 3 = 0 THEN k END AS k_reported
            FROM t
        )
        SELECT event_id, user_id, k_reported,
               LAST_VALUE(k_reported IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS k_filled
        FROM sparse
    """,
)
def forward_fill_event_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last-observation-carried-forward) — the gap-repair
    move for sparse sensor/metric streams: a metric that only reports
    every third reading (k % 3 == 0, a deterministic sparsity stand-in)
    is carried forward per user via ``last(..., ignorenulls=True)`` over
    a running row frame. Rows before a user's first report stay null —
    the honest answer, not an invented zero. ``gapfill_hourly_events``
    repairs MISSING ROWS; this repairs missing VALUES on existing rows.

    Scale shape: one hash exchange on user_id feeding one running-frame
    window — per-user partitions, never a global sort; the JSON extract
    is a scan-fused projection (same plan class as json_extract_events)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT")["k"]
    sparse = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(k % 3 == 0, k).alias("k_reported"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sparse.select(
        "event_id",
        "user_id",
        "k_reported",
        F.last("k_reported", ignorenulls=True).over(w).alias("k_filled"),
    )


# EWMA decay 1/2: every weight (1-alpha)^i is a power of two, so the
# per-term products are exact exponent shifts and the 8-term sums are
# bit-identical across engines — what makes a smoothing query hash-checkable
# without a tolerance harness.
EWMA_ALPHA = 0.5
EWMA_LAGS = 8  # bounded frame: the truncated tail weight is 2^-8 ≈ 0.4%


def _ewma_oracle() -> str:
    lags = ", ".join(
        f"LAG(value, {i}) OVER w AS l{i}" for i in range(1, EWMA_LAGS)
    )
    num = " + ".join(
        f"COALESCE(l{i}, 0) * {(1.0 - EWMA_ALPHA) ** i!r}"
        for i in range(EWMA_LAGS)
    )
    den = " + ".join(
        f"(CASE WHEN l{i} IS NOT NULL THEN {(1.0 - EWMA_ALPHA) ** i!r} ELSE 0 END)"
        for i in range(EWMA_LAGS)
    )
    return f"""
        WITH lagged AS (
            SELECT user_id, event_id, value AS l0, {lags}
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, event_id, l0 AS value,
               ROUND(({num}) / NULLIF({den}, 0.0), 6) + 0.0 AS ewma
        FROM lagged
    """


@register(
    "ewma_event_values",
    tags=("window", "time", "stats"),
    oracle=_ewma_oracle(),
)
def ewma_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user over the last
    EWMA_LAGS events — the smoothing/monitoring primitive (metric
    dashboards, rate limiters, drift smoothing) as a BOUNDED window: K lag
    columns + a renormalized weighted sum, instead of the unbounded
    recursive EWMA that needs per-row sequential state. Truncation error is
    ≤ (1-alpha)^K of the weight mass (0.4% here) — the standard trade that
    keeps the operator a single hash exchange on user_id + one window pass,
    embarrassingly parallel across keys at any scale. Early rows renormalize
    over the weights actually present (no warm-up bias); all-null tails
    yield NULL via the zero-denominator guard, identical three-valued logic
    in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag = {0: F.col("value")}
    for i in range(1, EWMA_LAGS):
        lag[i] = F.lag("value", i).over(w)
    num = F.lit(0.0)
    den = F.lit(0.0)
    # left-assoc chains in declaration order: the same association the
    # oracle's `+` chain parses to, so the dyadic-exact sums stay bit-equal
    for i in range(EWMA_LAGS):
        wt = (1.0 - EWMA_ALPHA) ** i
        num = num + F.coalesce(lag[i], F.lit(0.0)) * F.lit(wt)
        den = den + F.when(lag[i].isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return ev.select(
        "user_id",
        "event_id",
        "value",
        (F.round(num / F.nullif(den, F.lit(0.0)), 6) + F.lit(0.0)).alias("ewma"),
    )


# Interval-overlap join: 1-hour activity intervals around error events.
IVL_LEN_S = 3600  # interval length = bucket width (each interval spans <= 2 buckets)
IVL_EPOCH = "2024-01-01"  # fixed origin: second offsets are tz-independent


@register(
    "interval_overlap_join_bucketed",
    tags=("join", "range", "time"),
    oracle=f"""
        WITH iv AS (
            SELECT event_id,
                   date_diff('second', TIMESTAMP '{IVL_EPOCH}', ts) AS s,
                   date_diff('second', TIMESTAMP '{IVL_EPOCH}', ts)
                       + {IVL_LEN_S} AS e
            FROM events WHERE event_type = 'error'
        )
        SELECT a.event_id AS event_a, b.event_id AS event_b,
               LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS overlap_s
        FROM iv a JOIN iv b
          ON a.event_id < b.event_id AND a.s < b.e AND b.s < a.e
    """,
)
def interval_overlap_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join (all pairs of overlapping 1-hour windows
    around error events) — the general time-range join, executed the way it
    scales: an interval predicate alone gives Spark a broadcast nested-loop
    join (all-pairs in time), so each interval instead EXPLODES onto the
    ≤ 2 hour-buckets it touches (bucket width = max interval length), pairs
    hash-join on the bucket, and a residual filter applies the exact
    overlap. Duplicate elimination is free — a pair is emitted only from
    its CANONICAL bucket (the one containing the later start), never
    distinct'd. Every quantity is integer seconds from a fixed origin,
    computed NAIVELY (timestampdiff over TIMESTAMP_NTZ, matching the
    oracle's naive date_diff) — epoch-second subtraction is NOT
    tz-independent across a DST transition inside the span (the offset
    changes mid-data, the retention_cohorts_weekly lesson; review r8
    session 3), while the naive difference matches DuckDB under any
    session timezone.

    Scale shape: the shuffle key is the hour bucket — fan-out per row ≤ 2,
    per-bucket work quadratic only in CONCURRENT intervals (the physical
    density of the data, the irreducible output size), never in corpus
    length. The oracle states the textbook inequality join; this plan is
    what it compiles to at scale."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    )
    naive_s = F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ'{IVL_EPOCH} 00:00:00',"
        " CAST(ts AS TIMESTAMP_NTZ))"
    )
    iv = ev.select("event_id", naive_s.alias("s")).withColumn(
        "e", F.col("s") + IVL_LEN_S
    )
    # end-exclusive: the last touched bucket is floor((e-1)/width)
    buck = iv.select(
        "event_id",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / IVL_LEN_S),
                F.floor((F.col("e") - 1) / IVL_LEN_S),
            )
        ).alias("bucket"),
    )
    a, b = buck.alias("a"), buck.alias("b")
    canonical = F.col("a.bucket") == F.floor(
        F.greatest(F.col("a.s"), F.col("b.s")) / IVL_LEN_S
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
        .filter(
            (F.col("a.s") < F.col("b.e"))
            & (F.col("b.s") < F.col("a.e"))
            & canonical
        )
        .select(
            F.col("a.event_id").alias("event_a"),
            F.col("b.event_id").alias("event_b"),
            (
                F.least(F.col("a.e"), F.col("b.e"))
                - F.greatest(F.col("a.s"), F.col("b.s"))
            ).alias("overlap_s"),
        )
    )


# --- Seasonal decomposition (trend / day-of-week effect / residual) --------


@register(
    "seasonal_decompose_events",
    tags=("timeseries", "agg"),
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   AVG(value) AS daily_mean,
                   date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                       AS dow
            FROM events GROUP BY 1, 3
        ),
        lvl AS (SELECT AVG(daily_mean) AS g FROM daily),
        dow_eff AS (
            SELECT dow, AVG(daily_mean) - g AS eff
            FROM daily, lvl GROUP BY dow, g
        )
        SELECT strftime(d.day, '%Y-%m-%d') AS day,
               CAST(d.dow AS BIGINT) AS dow,
               ROUND(d.daily_mean, 6) + 0.0 AS daily_mean,
               ROUND(e.eff, 6) + 0.0 AS dow_effect,
               ROUND(d.daily_mean - g.g - e.eff, 6) + 0.0 AS residual
        FROM daily d JOIN dow_eff e USING (dow), lvl g
    """,
)
def seasonal_decompose_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive SEASONAL DECOMPOSITION over the event stream:
    per-day mean = overall level + day-of-week effect + residual — the
    seasonal-naive baseline behind anomaly monitors and forecast sanity
    checks. The weekday index is computed as days-since-epoch mod 7 (NOT
    each engine's dayofweek(), whose Sunday origin differs between Spark
    and DuckDB — the label doesn't matter, cross-engine identity does).

    Scale shape: one map-side-combinable (day) aggregate over the corpus;
    everything after (global level, per-dow effects, the join back) runs
    on the ~days-sized reduced frame with 1-row/7-row broadcasts — the
    drift-family discipline: global structure only after reduction."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    daily = (
        ev.select(
            day.alias("day"),
            F.pmod(F.datediff(day, F.lit("1970-01-01").cast("date")), F.lit(7)).alias(
                "dow"
            ),
            "value",
        )
        .groupBy("day", "dow")
        .agg(F.avg("value").alias("daily_mean"))
    )
    glob = daily.agg(F.avg("daily_mean").alias("g"))
    dow_eff = (
        daily.crossJoin(F.broadcast(glob))
        .groupBy("dow", "g")
        .agg((F.avg("daily_mean") - F.first("g")).alias("eff"))
        .select("dow", "eff")
    )
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)
    return (
        daily.join(F.broadcast(dow_eff), "dow")
        .crossJoin(F.broadcast(glob))
        .select(
            # DATE round-trips differently through the two engines' pandas
            # paths (date vs midnight datetime) — serialize to yyyy-MM-dd
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dow").cast("long").alias("dow"),
            r6(F.col("daily_mean")).alias("daily_mean"),
            r6(F.col("eff")).alias("dow_effect"),
            r6(F.col("daily_mean") - F.col("g") - F.col("eff")).alias(
                "residual"
            ),
        )
    )


# --------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences.
# --------------------------------------------------------------------------
@register(
    "event_transition_matrix",
    tags=("window", "sequence"),
    oracle="""
        WITH seq AS (
            SELECT event_type AS prev_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        ),
        pairs AS (
            SELECT prev_type, next_type, COUNT(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY prev_type, next_type
        )
        SELECT prev_type, next_type, n,
               ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type), 6)
                   AS p_next_given_prev
        FROM pairs
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current event type), the behavioral-analytics
    primitive behind churn models and anomalous-flow detection.

    lead() over the user sequence pairs each event with its successor, then
    one hash aggregate counts (prev, next) pairs; the row-normalizing window
    runs on the tiny |types|² matrix. The event table is touched once and
    shuffles once (user_id for the sequence window); the pair aggregate's
    map-side combine collapses each partition to ≤|types|² rows, so the
    second exchange carries kilobytes at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    wn = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(wn), 6).alias(
            "p_next_given_prev"
        ),
    )


# --------------------------------------------------------------------------
# The per-type hourly mean series shared by the ACF, CUSUM-changepoint, and
# rolling-median diagnostics: the ONE corpus-sized reduction they all start
# from (reviewed r9 session 3 — previously triplicated).
# --------------------------------------------------------------------------
# The hourly mean is over FINITE measurements: NaN and ±Inf ≡ missing
# (NaN/Inf-sweep policy, functions/rounding.py note) — one non-finite
# event would otherwise poison its hour's mean and diverge through every
# downstream consumer (corr NaN arithmetic, median/rank ordering).
HOURLY_SERIES_SQL = (
    "SELECT event_type, date_trunc('hour', ts) AS h, "
    f"AVG({FINITE_OR_NULL_SQL.format(col='value')}) AS v "
    "FROM events GROUP BY 1, 2"
)


def hourly_series(ev: DataFrame) -> DataFrame:
    from dblp_to_csv_spark.functions.rounding import finite_or_null

    return ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.avg(finite_or_null(F.col("value"))).alias("v")
    )


# --------------------------------------------------------------------------
# Autocorrelation function of the hourly mean-value series.
# --------------------------------------------------------------------------
ACF_MAX_LAG = 6


@register(
    "acf_event_values",
    tags=("window", "time", "stats"),
    oracle=f"""
        WITH hourly AS ({HOURLY_SERIES_SQL}),
        lags AS (SELECT UNNEST(generate_series(1, {ACF_MAX_LAG})) AS lag),
        joined AS (
            SELECT a.event_type, l.lag, a.v AS x, b.v AS y
            FROM hourly a
            CROSS JOIN lags l
            JOIN hourly b
              ON b.event_type = a.event_type
             AND b.h = a.h + (l.lag * INTERVAL 1 HOUR)
        )
        SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(CORR(x, y), 6) AS acf
        FROM joined
        GROUP BY event_type, lag
    """,
)
def acf_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1..ACF_MAX_LAG) of each event type's
    hourly mean-value series — the stationarity/seasonality diagnostic that
    decides window sizes for the forecasting and drift operators.

    The hourly aggregate shrinks the corpus to |types| × |hours| rows FIRST;
    the lagged self-join then runs on that tiny series (equi-join on
    type + shifted hour — no window over a variable lag, which Spark cannot
    express). At 100 TB the only full-data pass is the first aggregate;
    everything after is metadata-sized, so both join sides broadcast."""
    ev = load_table(spark, sf_dir, "events")
    hourly = hourly_series(ev)
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    shifted = hourly.crossJoin(F.broadcast(lags)).select(
        "event_type",
        "lag",
        (F.col("h") + F.col("lag") * F.expr("INTERVAL 1 HOUR")).alias("h_next"),
        F.col("v").alias("x"),
    )
    joined = shifted.join(
        hourly.select(
            "event_type", F.col("h").alias("h_next"), F.col("v").alias("y")
        ),
        ["event_type", "h_next"],
    )
    return joined.groupBy("event_type", "lag").agg(
        F.count("*").alias("n_pairs"),
        F.round(F.corr("x", "y"), 6).alias("acf"),
    )


# --------------------------------------------------------------------------
# CUSUM change-point detection over the hourly series.
# --------------------------------------------------------------------------


@register(
    "changepoint_cusum_events",
    tags=("window", "time", "stats"),
    oracle=f"""
        WITH hourly AS ({HOURLY_SERIES_SQL}),
        centered AS (
            SELECT event_type, h, v,
                   v - AVG(v) OVER (PARTITION BY event_type) AS dev
            FROM hourly
        ),
        cusum AS (
            SELECT event_type, h,
                   ROUND(ABS(SUM(dev) OVER (
                       PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )), 6) AS abs_s
            FROM centered
        ),
        ranked AS (
            SELECT event_type, h, abs_s,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY abs_s DESC, h
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n_hours
            FROM cusum
        )
        SELECT event_type, h AS change_hour, abs_s AS max_abs_cusum,
               CAST(n_hours AS BIGINT) AS n_hours
        FROM ranked WHERE rn = 1
    """,
)
def changepoint_cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: the hour where the
    cumulative sum of deviations from the series mean peaks in magnitude —
    the classic single-change-point estimator behind pipeline drift alarms
    (a level shift at time τ makes |S_t| a tent peaking at τ).

    The corpus collapses to the |types|×|hours| hourly series FIRST; the
    mean-centering, running sum, and argmax windows all run on that reduced
    frame, partitioned by event_type (never a corpus-sized window). The
    cumulative sum is evaluated in the same h-order on both engines, and
    |S| is rounded BEFORE the argmax so a last-ulp aggregation difference
    can never flip which hour wins (ties break on the earlier hour)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = hourly_series(ev)
    wtype = Window.partitionBy("event_type")
    centered = hourly.select(
        "event_type", "h", (F.col("v") - F.avg("v").over(wtype)).alias("dev")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = centered.select(
        "event_type",
        "h",
        F.round(F.abs(F.sum("dev").over(wcum)), 6).alias("abs_s"),
    )
    wrank = Window.partitionBy("event_type").orderBy(F.desc("abs_s"), "h")
    return (
        cusum.select(
            "event_type",
            "h",
            "abs_s",
            F.row_number().over(wrank).alias("rn"),
            F.count("*").over(wtype).cast("long").alias("n_hours"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("h").alias("change_hour"),
            F.col("abs_s").alias("max_abs_cusum"),
            "n_hours",
        )
    )


# --------------------------------------------------------------------------
# Rolling exact median over the hourly series (order statistics as window
# aggregates — the robust smoother percentile frames enable).
# --------------------------------------------------------------------------
ROLL_MEDIAN_WINDOW = 5


@register(
    "rolling_median_hourly",
    tags=("window", "time", "stats"),
    oracle=f"""
        WITH hourly AS ({HOURLY_SERIES_SQL})
        SELECT event_type, h,
               ROUND(v, 6) AS v,
               ROUND(quantile_cont(v, 0.5) OVER (
                   PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN {ROLL_MEDIAN_WINDOW - 1} PRECEDING
                            AND CURRENT ROW
               ), 6) AS med{ROLL_MEDIAN_WINDOW}
        FROM hourly
    """,
)
def rolling_median_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median (trailing {ROLL_MEDIAN_WINDOW}-row frame) of each
    event type's hourly mean series — the robust smoother that shrugs off
    the spikes a rolling mean chases (the standard pre-filter for the
    outlier/changepoint monitors). Exercises order statistics as WINDOW
    aggregates (percentile over a row frame), a distinct capability from
    the grouped percentiles elsewhere in the registry.

    The corpus collapses to the hourly series first, so the percentile
    frame holds ≤{ROLL_MEDIAN_WINDOW} values over a |types|×|hours| frame —
    the sort inside each frame is constant-size. Both engines interpolate
    the even-count median identically (linear, same IEEE doubles)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = hourly_series(ev)
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-(ROLL_MEDIAN_WINDOW - 1), Window.currentRow)
    )
    return hourly.select(
        "event_type",
        "h",
        F.round("v", 6).alias("v"),
        F.round(F.percentile("v", 0.5).over(w), 6).alias(
            f"med{ROLL_MEDIAN_WINDOW}"
        ),
    )


# --------------------------------------------------------------------------
# Funnel conversion LAG: how long the view→purchase step takes.
# --------------------------------------------------------------------------


@register(
    "funnel_time_to_convert",
    tags=("time", "funnel", "stats"),
    oracle="""
        WITH steps AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS t_purchase
            FROM events GROUP BY user_id
        ),
        lagged AS (
            SELECT t_view,
                   CASE WHEN t_view IS NOT NULL AND t_purchase > t_view
                        THEN date_diff('microsecond', t_view, t_purchase)
                   END AS lag_us
            FROM steps
        ),
        agg AS (
            SELECT CAST(COUNT(t_view) AS BIGINT) AS n_entered,
                   CAST(COUNT(lag_us) AS BIGINT) AS n_converted,
                   quantile_cont(lag_us, 0.5) AS p50_us,
                   quantile_cont(lag_us, 0.9) AS p90_us,
                   AVG(lag_us) AS mean_us
            FROM lagged
        )
        SELECT n_entered, n_converted,
               ROUND(CAST(n_converted AS DOUBLE)
                     / CAST(n_entered AS DOUBLE), 6) AS conversion_rate,
               ROUND(p50_us / 1e6, 3) AS p50_sec,
               ROUND(p90_us / 1e6, 3) AS p90_sec,
               ROUND(mean_us / 1e6, 3) AS mean_sec
        FROM agg
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel TIMING: for users whose first purchase follows their first
    view, the view→purchase lag distribution (exact p50/p90/mean seconds)
    plus the conversion rate — the product-analytics readout that prices a
    funnel change ("conversions got faster" vs "more conversions").
    Complements `funnel_view_cart_purchase`, which counts stage reach.

    One user_id-keyed conditional-MIN aggregate reduces the corpus to a
    per-user step table; lags are exact MICROSECOND integers (identical
    epoch arithmetic both engines), so the interpolated percentiles match
    to the last bit before display rounding. No windows over the event
    stream, no self-joins — the funnel discipline."""
    ev = load_table(spark, sf_dir, "events")
    steps = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    lag_us = F.when(
        F.col("t_view").isNotNull() & (F.col("t_purchase") > F.col("t_view")),
        F.unix_micros("t_purchase") - F.unix_micros("t_view"),
    )
    # entered-count and lag statistics from ONE aggregate over the per-user
    # step table (aggregates skip the NULL lags of non-converters on both
    # engines) — a single corpus scan, no re-aggregation join
    agg = steps.select("t_view", lag_us.alias("lag_us")).agg(
        F.count("t_view").cast("long").alias("n_entered"),
        F.count("lag_us").cast("long").alias("n_converted"),
        F.percentile("lag_us", 0.5).alias("p50_us"),
        F.percentile("lag_us", 0.9).alias("p90_us"),
        F.avg("lag_us").alias("mean_us"),
    )
    return agg.select(
        "n_entered",
        "n_converted",
        F.round(
            F.try_divide(
                F.col("n_converted").cast("double"),
                F.col("n_entered").cast("double"),
            ),
            6,
        ).alias("conversion_rate"),
        F.round(F.col("p50_us") / 1e6, 3).alias("p50_sec"),
        F.round(F.col("p90_us") / 1e6, 3).alias("p90_sec"),
        F.round(F.col("mean_us") / 1e6, 3).alias("mean_sec"),
    )
