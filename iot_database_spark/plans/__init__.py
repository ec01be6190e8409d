from iot_database_spark.plans.audit import (
    explain_str,
    plan_report,
    pushed_filters,
    read_schemas,
    uses_broadcast_join,
    uses_whole_stage_codegen,
)

__all__ = [
    "explain_str",
    "plan_report",
    "pushed_filters",
    "read_schemas",
    "uses_broadcast_join",
    "uses_whole_stage_codegen",
]
