"""SQL-language surface (SURVEY.md §2.3 'SQL / query language'): the engine's
operators are equally reachable through spark.sql — these queries register
the test tables as temp views and run ANSI SQL through Catalyst, proving the
SQL front-end produces the same plans/results as the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dblp_to_csv_spark.registry import register
from dblp_to_csv_spark.sources.tables import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register the parquet tables as temp views for spark.sql use."""
    for t in tables or TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@register(
    "sql_grouping_sets",
    tags=("sql", "agg", "rollup"),
    oracle="""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
    """,
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL front-end (one Expand + one
    aggregate in the physical plan — same as rollup/cube)."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
        """
    )


@register(
    "sql_exists_subquery",
    tags=("sql", "join", "subquery"),
    oracle="""
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        AND c.c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
    """,
)
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + uncorrelated IN subqueries via spark.sql —
    Catalyst rewrites both to semi joins (no per-row subquery execution)."""
    register_views(spark, sf_dir, ["customer", "orders", "nation"])
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        AND c.c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
        """
    )


@register(
    "sql_scalar_subquery",
    tags=("sql", "subquery", "agg"),
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) AS n_above_avg
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        GROUP BY o_orderstatus
    """,
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (computed once, broadcast as a literal
    into the filter)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_above_avg
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        GROUP BY o_orderstatus
        """
    )
