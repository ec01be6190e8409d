"""Oracle-checked queries for the IotValue priority-array semantics
(SURVEY.md §1.4 — reference Iot.Database/IotValue.cs).

The driver's `events` table models a point-write log: guid = user_id,
write priority derived deterministically from event_id, value = value.
The Spark side goes through operators/iotvalue.py (replay_slots +
effective_* expressions); the oracle recomputes the same semantics in
portable SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iot_database_spark.functions.time import epoch_us
from iot_database_spark.operators import iotvalue as iv
from iot_database_spark.registry import load_views, register


def _writes(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_views(spark, sf_dir)
    ev = tables["events"]
    return ev.select(
        F.col("user_id").cast("bigint").alias("guid"),
        (F.col("event_id").cast("bigint") % 16 + 1).cast("int").alias("priority"),
        F.col("value").cast("double").alias("value"),
        F.col("ts").alias("ts"),
        F.col("event_id").cast("bigint").alias("event_id"),
    )


@register(
    "iot_effective_value",
    oracle="""
    WITH writes AS (
        SELECT CAST(user_id AS BIGINT) AS guid,
               CAST(CAST(event_id AS BIGINT) % 16 + 1 AS INT) AS priority,
               CAST(value AS DOUBLE) AS value,
               ts,
               CAST(event_id AS BIGINT) AS event_id
        FROM events
    ), latest AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY guid, priority
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM writes
    ), slots AS (
        SELECT * FROM latest WHERE rn = 1
    ), eff AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY guid ORDER BY priority) AS prn
        FROM slots
    )
    SELECT guid,
           value AS eff_value,
           priority AS eff_priority,
           CAST(epoch_us(ts) AS BIGINT) AS eff_ts_us,
           16 AS n_slots
    FROM eff WHERE prn = 1
    """,
)
def iot_effective_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the write log into slot state; effective value = first
    non-null slot 1..16 (IotValue.cs:299-343)."""
    state = iv.replay_slots(_writes(spark, sf_dir), tiebreak="event_id")
    return state.select(
        "guid",
        F.col("value").alias("eff_value"),
        F.col("priority").alias("eff_priority"),
        epoch_us(F.col("timestamp")).alias("eff_ts_us"),
        F.lit(16).alias("n_slots"),
    )


@register(
    "iot_write_gating",
    oracle="""
    WITH writes AS (
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(CAST(event_id AS BIGINT) % 17 + 1 AS INT) AS priority,
               CAST(CAST(user_id AS BIGINT) % 128 AS INT) AS flags
        FROM events
    )
    SELECT event_id, priority, flags,
           (priority BETWEEN 1 AND 17)
           AND (priority NOT IN (1, 8) OR (flags & 1) <> 0)
           AND ((flags & 64) = 0 OR priority IN (9, 16)) AS allowed
    FROM writes
    """,
)
def iot_write_gating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-permission matrix: Priority9Only + AllowManualOperator rules
    (IotValue.cs:1098-1110, :127-132) over synthetic flag combinations."""
    tables = load_views(spark, sf_dir)
    ev = tables["events"].select(
        F.col("event_id").cast("bigint").alias("event_id"),
        (F.col("event_id").cast("bigint") % 17 + 1).cast("int").alias("priority"),
        (F.col("user_id").cast("bigint") % 128).cast("int").alias("flags"),
    )
    return ev.select(
        "event_id",
        "priority",
        "flags",
        iv.write_allowed(F.col("priority"), F.col("flags")).alias("allowed"),
    )


@register(
    "iot_password_hash",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           sha256(CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR)) AS pw_hash
    FROM events
    WHERE event_type = 'login'
    """,
)
def iot_password_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PasswordValue storage form: SHA-256 hex of the value string
    (IotValue.ToPasswordHash :1117-1145). Value is canonicalized to a
    DECIMAL(12,2) string so both engines hash identical bytes."""
    tables = load_views(spark, sf_dir)
    ev = tables["events"].filter(F.col("event_type") == "login")
    return ev.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        iv.password_hash(F.col("value").cast("decimal(12,2)")).alias("pw_hash"),
    )


@register(
    "unit_convert_bulk",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(value AS DOUBLE) AS celsius,
           (CAST(value AS DOUBLE) * 9 / 5) + 32 AS fahrenheit,
           CAST(value AS DOUBLE) + 273.15 AS kelvin,
           (CAST(value AS DOUBLE) * 9 / 5) + 491.67 AS rankine,
           CAST(value AS DOUBLE) * (pi() / 180) AS radians
    FROM events
    WHERE CAST(event_id AS BIGINT) % 10 = 0
    """,
)
def unit_convert_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk unit conversion through the generated 435-unit catalog
    (IotValueUnits/Units.cs via units_catalog.py): every readings row
    converted degrees_celsius -> fahrenheit / kelvin / rankine and
    degrees_angular -> radians (a Math.PI rule — DuckDB pi() parity).
    The rule strings compile to JVM Column arithmetic (no UDF), so the
    conversions are whole-stage-codegen'd and the oracle replicates the
    exact published rule expressions text-for-text."""
    from iot_database_spark.functions import units

    tables = load_views(spark, sf_dir)
    ev = tables["events"].filter(F.col("event_id").cast("bigint") % 10 == 0)
    v = F.col("value").cast("double")
    return ev.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        v.alias("celsius"),
        units.convert(v, "degrees_celsius", "degrees_fahrenheit").alias("fahrenheit"),
        units.convert(v, "degrees_celsius", "degrees_kelvin").alias("kelvin"),
        units.convert(v, "degrees_celsius", "degrees_rankine").alias("rankine"),
        units.convert(v, "degrees_angular", "radians").alias("radians"),
    )
