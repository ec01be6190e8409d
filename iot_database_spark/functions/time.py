"""Epoch extraction that is safe for TIMESTAMP_NTZ columns.

PySpark 4.1 reads the testdata's parquet TIMESTAMP(NANOS, isAdjustedToUTC
=false) columns natively as TIMESTAMP_NTZ (truncated to micros), and
`F.unix_micros` rejects NTZ input outright (DATATYPE_MISMATCH). The
timezone-correct conversion is a timestamp difference against an NTZ
epoch literal — `timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01',
ts)` — which is independent of `spark.sql.session.timeZone` for NTZ
input (verified: identical under UTC and America/New_York), unlike
`unix_micros(cast(ts as timestamp))` which shifts with the session tz.

TIMESTAMP (LTZ) input is also accepted: the helper casts to NTZ first,
which renders the instant in the session timezone. The engine pins the
session timezone to UTC (`session._apply_runtime_confs`, applied on
every `load_tables`), under which both paths agree with the reference's
UTC-epoch semantics (Iot.Database/IotValue.cs ToStringValue).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: SQL literal for the NTZ epoch — splice into Spark SQL strings.
EPOCH_NTZ_SQL = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def epoch_us(col: Column | str) -> Column:
    """Microseconds since the epoch for TIMESTAMP or TIMESTAMP_NTZ input.

    NTZ-safe replacement for ``F.unix_micros`` (which throws on NTZ).
    Timezone-independent for NTZ input; LTZ input assumes the engine's
    pinned UTC session timezone.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        c.cast("timestamp_ntz"),
    )


def epoch_us_sql(expr: str) -> str:
    """SQL-string form of :func:`epoch_us`, for Spark SQL snippets and
    higher-order-function lambdas where a Column cannot be bound.

    Casts to timestamp_ntz exactly like the Column form so the two paths
    stay symmetric: without the cast, an LTZ input would be correct only
    because the session timezone is pinned UTC."""
    return (
        f"timestampdiff(MICROSECOND, {EPOCH_NTZ_SQL}, "
        f"cast({expr} as timestamp_ntz))"
    )
