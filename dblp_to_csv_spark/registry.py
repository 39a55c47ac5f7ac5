"""Query registry: the single source of truth wiring operator implementations
to the driver harness (__spark_entry__.py) and to bench.py.

Every implemented operator from SURVEY.md §2 registers a named query here,
usually with a DuckDB-oracle ANSI SQL twin. Registration happens at import
time of the ``dblp_to_csv_spark.operators`` modules.

Hash-match contract (from the driver): the oracle comparison sorts columns by
name and hashes values order-insensitively, so

* every computed/aggregate column is aliased to the SAME name on both sides;
* float aggregates are rounded identically on both sides (sums of ~1e5 doubles
  agree to ~1e-9 relative between engines; rounding makes the hash stable);
* DuckDB integer sums are cast to BIGINT to match Spark's LongType.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryEntry:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    bench: bool = False  # include in bench.py's headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QueryEntry] = {}


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryEntry(
            name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", bench=bench, tags=tags
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import for side effects: operator modules register their queries.
    import dblp_to_csv_spark.operators  # noqa: F401


def all_queries() -> dict[str, QueryEntry]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in all_queries().items() if e.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in all_queries().items() if e.bench}
