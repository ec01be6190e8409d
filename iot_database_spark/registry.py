"""Central registry of driver-visible queries and their DuckDB oracles.

Every operator this engine claims from SURVEY.md §2 registers a named
query here: a callable (spark, sf_dir) -> DataFrame plus (where the
semantics are ANSI-SQL-expressible) an equivalent DuckDB SQL string.
The driver hash-compares both at sf0.01; `tests/test_oracle_parity.py`
runs the same comparison locally.

Column-name discipline: the driver sorts columns by name before hashing,
so the Spark DataFrame and the oracle SQL must produce identical column
names — alias everything on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a driver-visible query (and optional oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import importlib

    for mod in (
        "iot_database_spark.operators.relational",
        "iot_database_spark.operators.scalar_dialect",
        "iot_database_spark.operators.iotvalue_queries",
        "iot_database_spark.operators.timeseries_queries",
        "iot_database_spark.operators.blockchain_queries",
        "iot_database_spark.operators.vector_queries",
        "iot_database_spark.operators.dedup_queries",
        "iot_database_spark.operators.textstats_queries",
        "iot_database_spark.operators.nl_queries",
    ):
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet (incremental rounds)
    _LOADED = True


_VIEW_CACHE: dict[tuple[int, str], dict[str, Any]] = {}


def load_views(spark: SparkSession, sf_dir: str) -> dict[str, Any]:
    """Register the testdata tables as temp views (memoized per session+dir:
    repeated query calls must not pay parquet-footer/schema reads again)."""
    key = (id(spark), sf_dir)
    cached = _VIEW_CACHE.get(key)
    if cached is not None:
        return cached
    from iot_database_spark.session import load_tables

    out = load_tables(spark, sf_dir)
    _VIEW_CACHE[key] = out
    return out
