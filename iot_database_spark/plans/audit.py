"""Physical-plan audit helpers — the engine's EXPLAIN surface.

The reference exposes EXPLAIN as a plan document (QueryPlan.
GetExecutionPlan — LiteDB/Engine/Query/Structures/QueryPlan.cs:139-211)
showing index choice, filters, and sort mode. Spark's `explain` is the
equivalent; these helpers turn it into assertable facts so tests (and
humans) can verify that:

- filters/projections reached the parquet scan (PushedFilters/ReadSchema)
- small dimensions got broadcast (no shuffle join where a broadcast fits)
- operators stayed inside WholeStageCodegen (no row-at-a-time Python)
- top-k compiled to TakeOrderedAndProject (no full sort)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across parquet scans."""
    text = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", text)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — verifies column pruning."""
    text = explain_str(df)
    return re.findall(r"ReadSchema: (\S+)", text)


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def uses_shuffle_join(df: DataFrame) -> bool:
    text = explain_str(df)
    return "SortMergeJoin" in text or "ShuffledHashJoin" in text


def uses_whole_stage_codegen(df: DataFrame) -> bool:
    # 'codegen' mode reports generated subtrees even before AQE finalizes
    return "WholeStageCodegen subtrees" in explain_str(df, "codegen")


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df)


def uses_python_udf(df: DataFrame) -> bool:
    """Row-at-a-time OR Arrow-batched Python in the plan — the slow
    paths a query plan should avoid unless semantics require them."""
    text = explain_str(df, "simple")
    return bool(
        re.search(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", text)
    )


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (broadcast exchanges excluded) —
    the number to minimize. Uses 'simple' mode: formatted mode prints
    every node twice (tree + detail) and would double-count."""
    text = explain_str(df, "simple")
    return len(re.findall(r"\bExchange hashpartitioning", text)) + len(
        re.findall(r"\bExchange rangepartitioning", text)
    ) + len(re.findall(r"\bExchange RoundRobinPartitioning", text))


def plan_report(df: DataFrame) -> dict:
    """One-call summary used by tests and notebooks."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "broadcast_join": uses_broadcast_join(df),
        "shuffle_join": uses_shuffle_join(df),
        "whole_stage_codegen": uses_whole_stage_codegen(df),
        "take_ordered": uses_take_ordered(df),
        "shuffle_exchanges": count_exchanges(df),
    }
