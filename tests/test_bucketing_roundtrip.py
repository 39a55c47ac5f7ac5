"""Scale-strategy tests: bucketed joins elide shuffles (plan-level proof)
and the typed-CSV round trip restores the ETL output as typed tables."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    import io
    import contextlib

    from dblp_to_csv_spark.plans.bucketing import bucketed_join, write_bucketed
    from dblp_to_csv_spark.sources.tables import load_table

    # warehouse.dir is static per-session; park the tables in a tmp database
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path / 'wh'}'")
    spark.sql("DROP TABLE IF EXISTS bdb.b_orders")
    spark.sql("DROP TABLE IF EXISTS bdb.b_lineitem")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    write_bucketed(orders, "bdb.b_orders", "o_orderkey", 4)
    write_bucketed(li, "bdb.b_lineitem", "l_orderkey", 4)

    # disable broadcast so the plan shows the bucketed SMJ path (at sf0.001
    # Catalyst would rightly broadcast the tiny side instead)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark, "bdb.b_lineitem", "bdb.b_orders", "l_orderkey", "o_orderkey"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        # co-located buckets: no exchange on either join input
        assert "Exchange" not in plan, plan
        # and it still returns the right rows
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_csv_inferred_roundtrip(spark, tmp_path):
    """Non-annotated output read back with lattice INFERENCE (no sidecar):
    the engine's own type system applied to its own sink."""
    from dblp_to_csv_spark.plans.etl import convert
    from dblp_to_csv_spark.sources.csv_source import read_inferred_csv

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    out = tmp_path / "inf.csv"
    convert(
        spark,
        os.path.join(fix, "mini_dblp.xml"),
        os.path.join(fix, "mini_dblp.dtd"),
        str(out),
    )
    df = read_inferred_csv(spark, str(tmp_path / "inf_book.csv"))
    dtypes = dict(df.dtypes)
    assert dtypes["id"] == "bigint"
    # book.year mixes '2001-05-05 10:30' and '2001' → string via the lattice
    assert dtypes["year"] == "string"
    assert dtypes["key"] == "string"


def test_csv_roundtrip_typed(spark, tmp_path):
    """Convert the fixture with --annotate, read the CSV back through the
    sidecar header: types restored per the lattice, arrays split."""
    from dblp_to_csv_spark.plans.etl import convert
    from dblp_to_csv_spark.sources.csv_source import read_annotated_csv

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    out = tmp_path / "rt.csv"
    convert(
        spark,
        os.path.join(fix, "mini_dblp.xml"),
        os.path.join(fix, "mini_dblp.dtd"),
        str(out),
        annotate=True,
    )
    path, ext = os.path.splitext(str(out))
    df = read_annotated_csv(spark, f"{path}_article{ext}")
    dtypes = dict(df.dtypes)
    assert dtypes["id"] == "bigint"
    assert dtypes["year"] == "bigint"  # integer lattice type
    assert dtypes["score"] == "double"
    assert dtypes["mdate"] == "date"
    assert dtypes["note"] == "boolean"
    assert dtypes["author"] == "array<string>"
    rows = {r["key"]: r for r in df.collect()}
    assert rows["a1"]["author"] == ["Alice", "Bob"]
    assert rows["a1"]["year"] == 2020
    assert rows["a3"]["year"] == 7  # '007' cast to integer
    assert rows["a2"]["note"] is True
    assert rows["a2"]["score"] == 3.14
    # empty cell → NULL array: the writer serializes the all-absent (null)
    # array as '' (flatten normalizes empty → null), so the round trip must
    # restore null — an empty array inverted isNotNull/size predicates vs
    # the engine-built frame (review r8)
    assert rows["a3"]["author"] is None


def test_csv_roundtrip_embedded_newline(spark, tmp_path):
    """A quoted embedded newline must survive the round trip: without
    multiLine on the readers, the quoted cell split one record across two
    physical lines (confirmed-broken pre-fix, review r8)."""
    from dblp_to_csv_spark.plans.etl import _write_csv
    from dblp_to_csv_spark.sources.csv_source import read_annotated_csv

    df = spark.createDataFrame(
        [(0, "line1\nline2", "a|b"), (1, "plain", "c")],
        "id long, title string, author string",
    )
    out = tmp_path / "t.csv"
    _write_csv(df.select("id", "title", "author"), str(out), header=False,
               single_file=True)
    (tmp_path / "t_header.csv").write_text("id:integer;title:string;author:string[]")
    back = read_annotated_csv(spark, str(out))
    rows = {r["id"]: r for r in back.collect()}
    assert rows[0]["title"] == "line1\nline2"
    assert rows[0]["author"] == ["a", "b"]
    assert rows[1]["title"] == "plain"
