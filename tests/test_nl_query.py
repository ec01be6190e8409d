"""Tests for the FIND natural-language dialect (QueryEngine/2/3 semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_database_spark.database import IotDatabase
from iot_database_spark.query.nl import compile_condition, natural_query, parse_find
from iot_database_spark.tables import ForeignKey


@pytest.fixture()
def db(spark, tmp_path):
    db = IotDatabase("nldb", str(tmp_path), spark)
    db.tables("Customer", "id bigint, Name string, Age int").insert(
        [
            {"id": 1, "Name": "John Smith", "Age": 30},
            {"id": 2, "Name": "jane jones", "Age": 22},
            {"id": 3, "Name": "Jack Major", "Age": 45},
            {"id": 4, "Name": "Bob Minor", "Age": 28},
        ]
    )
    db.tables(
        "Order",
        "id bigint, CustomerId bigint, Amount double",
        foreign_keys=[ForeignKey(column="CustomerId", parent="Customer")],
    ).insert(
        [
            {"id": 1, "CustomerId": 1, "Amount": 150.0},
            {"id": 2, "CustomerId": 1, "Amount": 50.0},
            {"id": 3, "CustomerId": 3, "Amount": 300.0},
        ]
    )
    return db


def test_parse_find_full():
    spec = parse_find(
        "FIND Customer WHERE Age > 25 AND Name startswith 'J' "
        "SELECT Name as Person, Age INCLUDE Order WHERE Amount > 100 "
        "ORDER BY Name DESC LIMIT 10"
    )
    assert spec.tables == ["Customer"]
    assert spec.conditions == ["Age > 25 AND Name startswith 'J'"]
    assert spec.columns[0] == [("Name", "Person"), ("Age", "Age")]
    assert spec.includes[0].table == "Order"
    assert spec.includes[0].condition == "Amount > 100"
    assert spec.order_by == ("Name", False)
    assert spec.limit == 10


def test_condition_ops_case_insensitive(spark):
    df = spark.createDataFrame(
        [("John", 30, None), ("jane", 22, "x")], ["name", "age", "tag"]
    )
    def n(cond):
        return {r["name"] for r in df.filter(compile_condition(cond, df)).collect()}

    assert n("name startswith 'j'") == {"John", "jane"}  # OrdinalIgnoreCase
    assert n("name contains 'OHN'") == {"John"}
    assert n("name not contains 'ohn'") == {"jane"}
    assert n("name endswith 'NE'") == {"jane"}
    assert n("age >= 30") == {"John"}
    assert n("age != 30") == {"jane"}
    assert n("tag is null") == {"John"}
    assert n("tag is not null") == {"jane"}
    assert n("age > 25 OR name = 'JANE'") == {"John", "jane"}
    assert n("(age > 20 AND age < 25) OR name = 'john'") == {"John", "jane"}


def test_left_to_right_connector_semantics(spark):
    # reference combines left-to-right without precedence
    # (QueryEngine.cs:556-571): A OR B AND C == (A OR B) AND C
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], ["n", "s"]
    )
    got = {
        r["n"]
        for r in df.filter(
            compile_condition("n = 1 OR n = 2 AND s = 'b'", df)
        ).collect()
    }
    assert got == {2}  # (n=1 OR n=2) AND s='b'


def test_single_table_find(db):
    rows = natural_query(
        "FIND Customer WHERE Age > 25 SELECT Name as Person, Age "
        "ORDER BY Name LIMIT 10",
        db,
    ).collect()
    assert [r["Person"] for r in rows] == ["Bob Minor", "Jack Major", "John Smith"]
    assert rows[0].asDict().keys() == {"Person", "Age"}


def test_include_nests_children(db):
    rows = natural_query(
        "FIND Customer WHERE Age > 25 INCLUDE Order WHERE Amount > 100 "
        "ORDER BY Name",
        db,
    ).collect()
    by_name = {r["Name"]: r for r in rows}
    john = by_name["John Smith"]["Order_Data"]
    assert len(john) == 1 and john[0]["Amount"] == 150.0
    assert by_name["Bob Minor"]["Order_Data"] is None  # no orders


def test_dual_table_join_fk_inferred(db):
    rows = natural_query(
        "FIND Customer, Order WHERE Age > 20 AND Amount > 100 "
        "SELECT Name, Amount ORDER BY Amount DESC",
        db,
    ).collect()
    assert [(r["Name"], r["Amount"]) for r in rows] == [
        ("Jack Major", 300.0),
        ("John Smith", 150.0),
    ]


def test_dual_table_join_explicit_on(db):
    rows = natural_query(
        "FIND Customer, Order ON Order.CustomerId = Customer.id "
        "WHERE Age > 0 AND Amount >= 50 SELECT Name, Amount",
        db,
    ).collect()
    assert len(rows) == 3


def test_bad_queries_raise(db):
    with pytest.raises(ValueError, match="expected FIND"):
        parse_find("SELECT * FROM x")
    with pytest.raises(ValueError, match="unknown column"):
        natural_query("FIND Customer WHERE Nope > 1", db).collect()


def test_explain_find(db):
    from iot_database_spark.query.nl import explain_find

    plan = explain_find(
        "FIND Customer WHERE Age > 25 SELECT Name as Person ORDER BY Person LIMIT 5",
        db,
    )
    assert plan["tables"] == ["Customer"]
    assert plan["limit"] == 5
    assert "TakeOrderedAndProject" in plan["physical_plan"]
    assert plan["plan_report"]["take_ordered"] is True


def test_triple_fk_inference_through_middle_table(db):
    # t3 relates to t2, not to the primary (QueryEngine3.cs:271-305)
    db.tables(
        "OrderLine",
        "id bigint, OrderId bigint, Item string",
        foreign_keys=[ForeignKey(column="OrderId", parent="Order")],
    ).insert(
        [
            {"id": 1, "OrderId": 1, "Item": "widget"},
            {"id": 2, "OrderId": 3, "Item": "gizmo"},
        ]
    )
    rows = natural_query(
        "FIND Customer, Order, OrderLine "
        "WHERE Age > 0 AND Amount > 0 AND Item contains 'g' "
        "SELECT Name, Amount, Item ORDER BY Item",
        db,
    ).collect()
    assert [(r["Name"], r["Item"]) for r in rows] == [
        ("Jack Major", "gizmo"),
        ("John Smith", "widget"),
    ]
