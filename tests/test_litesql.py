"""Tests for the LiteDB SQL dialect translation (query/litesql.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_database_spark.query.litesql import lite_sql, translate


def test_path_translation():
    assert translate("SELECT $.Name FROM c WHERE $.Age > 25") == (
        "SELECT Name FROM c WHERE Age > 25"
    )
    assert translate("SELECT $.a.b.c FROM t") == "SELECT a.b.c FROM t"
    assert translate("SELECT $.arr[2] FROM t") == "SELECT element_at(arr, 3) FROM t"
    assert translate("SELECT $.arr[*] FROM t") == "SELECT arr FROM t"
    assert (
        translate("SELECT $.items[@.x > 1] FROM t")
        == "SELECT filter(items, _it -> _it.x > 1) FROM t"
    )
    assert translate("SELECT IIF($.a = 1, 'y', 'n') FROM t") == (
        "SELECT IF(a = 1, 'y', 'n') FROM t"
    )


def test_param_substitution_quotes_safely():
    out = translate(
        "SELECT * FROM t WHERE name = @n AND age > @a",
        {"n": "O'Brien", "a": 30},
    )
    assert out == "SELECT * FROM t WHERE name = 'O''Brien' AND age > 30"
    with pytest.raises(KeyError, match="missing SQL parameter"):
        translate("SELECT @nope", {})


def test_execute_against_views(spark):
    df = spark.createDataFrame(
        [
            (1, "John", 30, [{"x": 1}, {"x": 5}]),
            (2, "Jane", 22, [{"x": 9}]),
        ],
        "id int, Name string, Age int, items array<struct<x:int>>",
    )
    df.createOrReplaceTempView("People")

    rows = lite_sql(
        spark,
        "SELECT $.Name, UPPER($.Name) AS U FROM People "
        "WHERE $.Age > @min ORDER BY $.Name LIMIT 5",
        {"min": 25},
    ).collect()
    assert [(r["Name"], r["U"]) for r in rows] == [("John", "JOHN")]

    filt = lite_sql(
        spark, "SELECT $.id, $.items[@.x > 2] AS big FROM People ORDER BY $.id"
    ).collect()
    assert [[x["x"] for x in r["big"]] for r in filt] == [[5], [9]]

    idx = lite_sql(spark, "SELECT $.items[0].x AS first_x FROM People WHERE $.id = 1")
    assert idx.collect()[0]["first_x"] == 1


def test_bare_expression_select(spark):
    # SELECT-without-FROM evaluates the expression (Select.cs:44-53)
    row = lite_sql(spark, "SELECT 1 + 2 AS v, UPPER('ab') AS u").collect()[0]
    assert row["v"] == 3 and row["u"] == "AB"


def test_select_into_temp_view(spark):
    spark.createDataFrame(
        [(1, "a", 5), (2, "b", 9)], "id bigint, k string, v int"
    ).createOrReplaceTempView("src_lsql")
    out = lite_sql(spark, "SELECT $.k, $.v INTO picked FROM src_lsql WHERE $.v > 6")
    assert out.count() == 1
    assert spark.table("picked").collect()[0]["k"] == "b"


def test_select_into_database_table(spark, tmp_path):
    from iot_database_spark.database import IotDatabase

    db = IotDatabase("litesqldb", str(tmp_path), spark)
    spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0)], "id bigint, name string, score double"
    ).createOrReplaceTempView("src_lsql2")
    lite_sql(spark, "SELECT $.name, $.score INTO results FROM src_lsql2", db=db)
    t = db.table("results")
    assert t.count() == 2
    assert "id" in t.df.columns  # auto-id added
    # second INTO appends (engine insert-into-collection behavior)
    lite_sql(spark, "SELECT $.name, $.score INTO results FROM src_lsql2", db=db)
    assert t.count() == 4


def test_execute_full_command_surface(spark, tmp_path):
    """db.Execute over INSERT/UPDATE/DELETE/SELECT/RENAME/DROP
    (SqlParser.cs:24-49)."""
    from iot_database_spark.database import IotDatabase
    from iot_database_spark.query.litesql import execute

    db = IotDatabase("cmds", str(tmp_path), spark)
    db.tables("people", "id bigint, name string, age int")

    n = execute(
        db,
        'INSERT INTO people VALUES {"id": 1, "name": "Ann", "age": 30}, '
        '{"id": 2, "name": "Bob", "age": @bobage}',
        params={"bobage": 22},
    )
    assert n == 2

    n = execute(db, "UPDATE people SET $.name = UPPER($.name) WHERE $.age > 25")
    assert n == 1
    out = execute(db, "SELECT $.name FROM people ORDER BY $.name")
    assert [r["name"] for r in out.collect()] == ["ANN", "Bob"]

    n = execute(db, "DELETE people WHERE $.age < 25")
    assert n == 1 and db.table("people").count() == 1

    execute(db, "RENAME COLLECTION people TO folks")
    assert "folks" in db.list_tables() and "people" not in db.list_tables()
    execute(db, "DROP COLLECTION folks")
    assert db.list_tables() == []


def test_select_into_append_ids_stay_unique(spark, tmp_path):
    """Auto-ids must not collide across INTO append re-runs
    (monotonically_increasing_id restarts per query — the sink offsets
    past the target's max id)."""
    from iot_database_spark.database import IotDatabase

    db = IotDatabase("intodb2", str(tmp_path), spark)
    spark.createDataFrame(
        [(1, "x"), (2, "y")], "id bigint, name string"
    ).createOrReplaceTempView("src_ids")
    lite_sql(spark, "SELECT $.name INTO sink FROM src_ids", db=db)
    lite_sql(spark, "SELECT $.name INTO sink FROM src_ids", db=db)
    ids = [r["id"] for r in db.table("sink").df.collect()]
    assert len(ids) == 4 and len(set(ids)) == 4


def test_into_inside_string_literal_not_split(spark):
    spark.createDataFrame(
        [(1, "went INTO town"), (2, "stayed home")], "id bigint, txt string"
    ).createOrReplaceTempView("notes_lsql")
    out = lite_sql(spark, "SELECT $.id FROM notes_lsql WHERE $.txt = 'went INTO town'")
    assert [r["id"] for r in out.collect()] == [1]


def test_insert_param_at_sign_inside_json_string(spark, tmp_path):
    from iot_database_spark.database import IotDatabase
    from iot_database_spark.query.litesql import execute

    db = IotDatabase("emaildb", str(tmp_path), spark)
    db.tables("users", "id bigint, email string, age int")
    execute(
        db,
        'INSERT INTO users VALUES {"id": 1, "email": "ann@example.com", "age": @age}',
        params={"age": 30},
    )
    row = db.table("users").find_one("id = 1")
    assert row["email"] == "ann@example.com" and row["age"] == 30


def test_update_unknown_column_raises(spark, tmp_path):
    from iot_database_spark.database import IotDatabase
    from iot_database_spark.query.litesql import execute

    db = IotDatabase("updb", str(tmp_path), spark)
    db.tables("people2", "id bigint, name string")
    db.table("people2").insert([{"id": 1, "name": "a"}])
    import pytest

    with pytest.raises(KeyError, match="not"):
        execute(db, "UPDATE people2 SET $.nmae = 'x' WHERE $.id = 1")
