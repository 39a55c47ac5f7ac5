"""Scale-behavior tests: the properties that must hold on a real cluster —
dense IDs across many partitions, multi-split XML reads, ETL throughput on a
generated corpus 4 orders of magnitude larger than the golden fixture.
"""

from __future__ import annotations

import os
import random

import pytest

from pyspark.sql import functions as F


def test_dense_ids_many_partitions(spark):
    """with_dense_ids must stay dense/unique over an arbitrarily partitioned
    frame (the partition-offset construction, SURVEY.md §7.4)."""
    from dblp_to_csv_spark.functions.ids import with_dense_ids

    df = spark.range(100_000).repartition(13).select(F.col("id").alias("x"))
    out = with_dense_ids(df, "rid", start=5)
    ids = [r["rid"] for r in out.select("rid").collect()]
    assert len(ids) == 100_000
    assert sorted(ids) == list(range(5, 100_005))
    out.unpersist()


def test_dense_ids_broadcast_join_path(spark):
    """Above map_literal_max partitions the offset lookup must switch to the
    broadcast-join path and still produce dense unique IDs."""
    from dblp_to_csv_spark.functions.ids import with_dense_ids_counted

    df = spark.range(10_000).repartition(37).select(F.col("id").alias("x"))
    out, n = with_dense_ids_counted(df, "rid", start=3, map_literal_max=8)
    assert n == 10_000
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    ids = sorted(r["rid"] for r in out.select("rid").collect())
    assert ids == list(range(3, 10_003))
    assert [c for c in out.columns] == ["x", "rid"]


def test_dense_ids_empty_frame(spark):
    from dblp_to_csv_spark.functions.ids import with_dense_ids

    df = spark.range(10).filter(F.col("id") < 0)
    assert with_dense_ids(df, "rid").count() == 0


@pytest.fixture(scope="module")
def big_xml(tmp_path_factory):
    """~20k-record DBLP-ish corpus (deterministic), several MB."""
    rng = random.Random(42)
    d = tmp_path_factory.mktemp("bigxml")
    xml = d / "big.xml"
    dtd = d / "big.dtd"
    dtd.write_text(
        "<!ELEMENT dblp (article|book)*>\n"
        "<!ELEMENT article (author|title|year)*>\n"
        "<!ELEMENT book (author|title|year)*>\n"
        "<!ELEMENT author (#PCDATA)>\n<!ELEMENT title (#PCDATA)>\n"
        "<!ELEMENT year (#PCDATA)>\n"
        '<!ATTLIST article key CDATA #REQUIRED>\n'
        '<!ATTLIST book key CDATA #REQUIRED>\n'
    )
    n = 20_000
    with open(xml, "w", encoding="utf-8") as f:
        f.write("<?xml version=\"1.0\"?>\n<dblp>\n")
        for i in range(n):
            tag = "article" if i % 4 else "book"
            authors = "".join(
                f"<author>Author {rng.randrange(2000)}</author>"
                for _ in range(rng.randrange(1, 4))
            )
            f.write(
                f'<{tag} key="k{i}">{authors}'
                f"<title>Title {i} on topic {rng.randrange(500)}</title>"
                f"<year>{1950 + i % 70}</year></{tag}>\n"
            )
        f.write("</dblp>\n")
    return str(xml), str(dtd), n


def test_quartile_cutpoint_plan_has_no_window(spark):
    """The scale-safe quartile labeler must contain no Window operator (the
    global-window funnel was the round-1 scale-killer) and must broadcast
    the cutpoints."""
    from dblp_to_csv_spark.operators.statistics import quartile_labels_by_cutpoint

    df = quartile_labels_by_cutpoint(spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001"
    ))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row cutpoint frame, broadcast
    assert df.count() > 0


def test_etl_large_corpus_multi_split(spark, big_xml, tmp_path):
    """End-to-end conversion of a 20k-record corpus with the input forced
    into many splits (small maxPartitionBytes): IDs stay globally dense,
    counts add up, array columns serialize."""
    from dblp_to_csv_spark.plans.etl import convert

    xml, dtd, n = big_xml
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))  # 256 KB splits
    try:
        out = tmp_path / "big_out.csv"
        result = convert(spark, xml, dtd, str(out), annotate=True, single_file=False)
        assert result.total_records == n
        assert set(result.tables) == {"article", "book"}
        # ids globally dense across both tables
        a = result.tables["article"]
        b = result.tables["book"]
        assert a.n_rows + b.n_rows == n
        ids = (
            a.df.select("id").union(b.df.select("id")).select("id").collect()
        )
        vals = sorted(r["id"] for r in ids)
        assert vals == list(range(n))
        assert a.column_types["year"] == "integer"
        assert "author" in a.array_columns
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """AQE runtime bloom-filter pruning — the 100 TB shuffle-join saver: a
    selective filter on the dimension side is turned into a bloom
    `might_contain` pre-filter on the FACT side's scan, so rows that cannot
    join are dropped before the shuffle instead of after it. Thresholds are
    lowered to fire at test scale (production defaults: 10 MB creation side,
    10 GB application side); broadcast is disabled so the join actually
    shuffles — with broadcast on, the hash join itself plays this role."""
    from contextlib import ExitStack

    from pyspark.sql import functions as F

    from dblp_to_csv_spark.sources.tables import load_table, temp_conf
    from tests.conftest import SF_CORRECTNESS

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    with ExitStack() as stack:
        for k, v in confs.items():
            stack.enter_context(temp_conf(spark, k, v))
        li = load_table(spark, SF_CORRECTNESS, "lineitem")
        o = load_table(spark, SF_CORRECTNESS, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
        # and the filtered result is still correct
        got = {(r["o_orderstatus"], r["n"]) for r in j.collect()}
    want = {
        (r["o_orderstatus"], r["n"])
        for r in (
            load_table(spark, SF_CORRECTNESS, "lineitem")
            .join(
                load_table(spark, SF_CORRECTNESS, "orders").filter(
                    F.col("o_totalprice") > 400000
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
            .collect()
        )
    }
    assert got == want and len(got) > 0
