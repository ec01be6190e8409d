"""Unit tests for the BsonExpression dialect registry
(reference semantics: LiteDB/Document/Expression/Methods/*.cs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_database_spark.functions import call


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("Hello World", "a,b,c,a", 3, "2024-06-15 12:34:56")],
        ["s", "csv", "n", "ts_str"],
    ).withColumn("ts", F.col("ts_str").cast("timestamp"))


def _one(df, col):
    return df.select(col.alias("v")).collect()[0]["v"]


def test_string_functions(df):
    assert _one(df, call("UPPER", F.col("s"))) == "HELLO WORLD"
    assert _one(df, call("LOWER", F.col("s"))) == "hello world"
    # reference INDEXOF is 0-based, -1 when absent (String.cs:83-106)
    assert _one(df, call("INDEXOF", F.col("s"), "World")) == 6
    assert _one(df, call("INDEXOF", F.col("s"), "zzz")) == -1
    # reference SUBSTRING is 0-based (String.cs:109-133)
    assert _one(df, call("SUBSTRING", F.col("s"), 6, 5)) == "World"
    assert _one(df, call("REPLACE", F.col("s"), "World", "Spark")) == "Hello Spark"
    assert _one(df, call("LPAD", F.col("s"), 13, "*")) == "**Hello World"
    assert _one(df, call("SPLIT", F.col("csv"), ",")) == ["a", "b", "c", "a"]


def test_array_functions(df):
    arr = call("SPLIT", F.col("csv"), ",")
    assert _one(df, call("DISTINCT", arr)) == ["a", "b", "c"]
    assert _one(df, call("TOP", arr, 2)) == ["a", "b"]
    assert _one(df, call("JOIN", arr, "-")) == "a-b-c-a"
    assert _one(df, call("UNION", arr, F.array(F.lit("d")))) == ["a", "b", "c", "d"]
    assert _one(df, call("EXCEPT", arr, F.array(F.lit("a")))) == ["b", "c"]
    assert _one(df, call("MAP", arr, lambda w: F.upper(w))) == ["A", "B", "C", "A"]
    assert _one(df, call("FILTER", arr, lambda w: w != "a")) == ["b", "c"]
    assert _one(df, call("SORT", F.array(F.lit("z"), F.lit("a")))) == ["a", "z"]


def test_date_functions(df):
    assert _one(df, call("YEAR", F.col("ts"))) == 2024
    assert _one(df, call("MONTH", F.col("ts"))) == 6
    assert _one(df, call("DAY", F.col("ts"))) == 15
    assert _one(df, call("HOUR", F.col("ts"))) == 12
    assert _one(df, call("DATEADD", "d", 10, F.col("ts"))).day == 25
    assert (
        _one(df, call("DATEDIFF", "h", F.col("ts"), call("DATEADD", "d", 1, F.col("ts"))))
        == 24
    )


def test_conditional_and_casts(df):
    assert _one(df, call("IIF", F.col("n") > 2, "big", "small")) == "big"
    assert _one(df, call("COALESCE", F.lit(None), F.lit("x"))) == "x"
    assert _one(df, call("INT32", F.lit("42"))) == 42
    assert _one(df, call("STRING", F.col("n"))) == "3"
    assert _one(df, call("IS_NUMBER", F.lit("3.14"))) is True
    assert _one(df, call("IS_NUMBER", F.lit("abc"))) is False
    assert _one(df, call("IS_DATETIME", F.lit("2024-01-01"))) is True


def test_unknown_function_raises():
    with pytest.raises(KeyError):
        call("NOPE")


def test_aggregate_family_over_arrays(spark):
    """Aggregate.cs:12-100 — enumerable aggregates as array functions;
    SUM/AVG skip non-numeric members, AVG of none = 0."""
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], ["1", "x", "3"]), ([], ["y"])],
        "nums array<double>, mixed array<string>",
    )
    row = df.select(
        call("COUNT", F.col("nums")).alias("cnt"),
        call("MIN", F.col("nums")).alias("mn"),
        call("MAX", F.col("nums")).alias("mx"),
        call("FIRST", F.col("nums")).alias("fst"),
        call("LAST", F.col("nums")).alias("lst"),
        call("ANY", F.col("nums")).alias("any"),
        call("SUM", F.col("nums")).alias("sm"),
        call("AVG", F.col("nums")).alias("av"),
        call("SUM", F.col("mixed")).alias("sm_mixed"),
        call("AVG", F.col("mixed")).alias("av_mixed"),
    ).collect()
    r0, r1 = row
    assert (r0["cnt"], r0["mn"], r0["mx"], r0["fst"], r0["lst"]) == (3, 1.0, 3.0, 1.0, 3.0)
    assert r0["any"] is True and r0["sm"] == 6.0 and r0["av"] == 2.0
    assert r0["sm_mixed"] == 4.0 and r0["av_mixed"] == 2.0  # 'x' skipped
    assert (r1["cnt"], r1["any"], r1["sm"], r1["av"]) == (0, False, 0.0, 0.0)


def test_runtime_type_predicates(spark):
    df = spark.createDataFrame(
        [(["a"], b"\x01", "0f8fad5b-d9cb-469f-a165-70867728950e",
          "507f1f77bcf86cd799439011", 1)],
        "arr array<string>, bin binary, guid string, oid string, num int",
    )
    row = df.select(
        call("IS_ARRAY", F.col("arr")).alias("a1"),
        call("IS_ARRAY", F.col("num")).alias("a2"),
        call("IS_BINARY", F.col("bin")).alias("b1"),
        call("IS_GUID", F.col("guid")).alias("g1"),
        call("IS_GUID", F.col("oid")).alias("g2"),
        call("IS_OBJECTID", F.col("oid")).alias("o1"),
        call("IS_MAXVALUE", F.col("num")).alias("mx"),
        call("IS_DOCUMENT", F.struct(F.col("num")).alias("s")).alias("d1"),
    ).collect()[0]
    assert row["a1"] is True and row["a2"] is False
    assert row["b1"] is True
    assert row["g1"] is True and row["g2"] is False
    assert row["o1"] is True and row["mx"] is False
    assert row["d1"] is True


def test_oid_creationtime(spark):
    # ObjectId '65a00000...' -> 0x65a00000 = 1704984576 epoch seconds
    df = spark.createDataFrame([("65a00000bcf86cd799439011",)], "oid string")
    ts = df.select(call("OID_CREATIONTIME", F.col("oid")).alias("t")).collect()[0]["t"]
    import datetime
    assert ts.replace(tzinfo=datetime.timezone.utc).timestamp() == 0x65A00000
