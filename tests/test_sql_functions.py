"""Tests for the SQL-UDF surface (functions/sql_functions.py)."""

from __future__ import annotations

from iot_database_spark.functions.sql_functions import register_sql_functions


def test_sql_functions_register_and_work(spark):
    names = register_sql_functions(spark)
    assert "priority_value" in names and "write_allowed" in names

    row = spark.sql(
        """
        SELECT priority_value(array(NULL, NULL, '9.5', 'x')) AS v,
               priority_of(array(NULL, NULL, '9.5', 'x')) AS p,
               priority_of(array()) AS p_empty,
               slot_as_double('9.5') AS d,
               slot_is_numeric('abc') AS isnum,
               password_hash('secret') AS pw,
               write_allowed(1, 0) AS manual_blocked,
               write_allowed(1, 1) AS manual_ok,
               write_allowed(15, 64) AS p9only_blocked,
               write_allowed(9, 64) AS p9only_ok
        """
    ).collect()[0]
    assert row["v"] == "9.5" and row["p"] == 3
    assert row["p_empty"] is None
    assert row["d"] == 9.5 and row["isnum"] is False
    assert len(row["pw"]) == 64
    assert row["manual_blocked"] is False and row["manual_ok"] is True
    assert row["p9only_blocked"] is False and row["p9only_ok"] is True


def test_slot17_excluded_from_priority_value(spark):
    register_sql_functions(spark)
    row = spark.sql(
        "SELECT priority_value(array(NULL,NULL,NULL,NULL,NULL,NULL,NULL,NULL,"
        "NULL,NULL,NULL,NULL,NULL,NULL,NULL,NULL,'config')) AS v"
    ).collect()[0]
    assert row["v"] is None  # slot 17 never surfaces as the value
