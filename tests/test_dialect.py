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
