"""Parity with the reference's own example program — its only de-facto
test (Example.BasicDb/Program.cs:17-71): Customer/Order/Address seed,
programmatic 3-table query, NaturalQueryTriple, INCLUDE nesting."""

from __future__ import annotations

import pytest

from iot_database_spark.database import IotDatabase
from iot_database_spark.query.nl import natural_query
from iot_database_spark.tables import ForeignKey


@pytest.fixture()
def db(spark, tmp_path):
    """Example.BasicDb seed (Program.cs:17-37 incl. the commented rows the
    queries assume)."""
    db = IotDatabase("MyIotDatabase", str(tmp_path), spark)
    db.tables("Customer", "id bigint, Name string, Age int").insert(
        [
            {"id": 1, "Name": "John", "Age": 30},
            {"id": 2, "Name": "Jane", "Age": 25},
        ]
    )
    db.tables(
        "Order",
        "id bigint, CustomerId bigint, Amount double",
        foreign_keys=[ForeignKey(column="CustomerId", parent="Customer")],
    ).insert(
        [
            {"id": 1, "CustomerId": 1, "Amount": 150.0},
            {"id": 2, "CustomerId": 1, "Amount": 200.0},
            {"id": 3, "CustomerId": 2, "Amount": 100.0},
        ]
    )
    db.tables(
        "Address",
        "id bigint, CustomerId bigint, AddressLine1 string",
        foreign_keys=[ForeignKey(column="CustomerId", parent="Customer")],
    ).insert(
        [
            {"id": 1, "CustomerId": 1, "AddressLine1": "123 Main St"},
            {"id": 2, "CustomerId": 2, "AddressLine1": "456 Elm St"},
        ]
    )
    return db


def test_triple_table_query_with_fk_inference(db):
    """The NaturalQueryTriple of Program.cs:64-66: FIND with inferred FK
    joins, per-table WHERE, aliases, ORDER BY + LIMIT. Amount>100 keeps
    customer 1's orders; 'Main' (unquoted bare word, CONTAINS
    case-insensitive) keeps customer 1's address."""
    rows = natural_query(
        "FIND Customer, Order, Address "
        "WHERE Age > 20 AND Amount > 100 AND AddressLine1 CONTAINS Main "
        "SELECT Name as Person, Amount as Total, AddressLine1 as Address "
        "ORDER BY Total ASC LIMIT 10",
        db,
    ).collect()
    assert [(r["Person"], r["Total"], r["Address"]) for r in rows] == [
        ("John", 150.0, "123 Main St"),
        ("John", 200.0, "123 Main St"),
    ]


def test_programmatic_include_query(db):
    """The Find/Include shape of Program.cs:41-46: primary rows with
    nested <table>_Data arrays per related table."""
    rows = natural_query(
        "FIND Customer WHERE Age > 0 "
        "INCLUDE Order WHERE Amount > 100 SELECT Amount as Total "
        "INCLUDE Address WHERE AddressLine1 contains 'Main' SELECT AddressLine1 as Address "
        "ORDER BY Name",
        db,
    ).collect()
    by_name = {r["Name"]: r for r in rows}
    john = by_name["John"]
    assert sorted(x["Total"] for x in john["Order_Data"]) == [150.0, 200.0]
    assert [x["Address"] for x in john["Address_Data"]] == ["123 Main St"]
    jane = by_name["Jane"]
    assert jane["Order_Data"] is None  # her order is 100, filtered out
    assert jane["Address_Data"] is None  # Elm St doesn't contain Main


def test_explicit_on_dual_query(db):
    """The commented dual variant (Program.cs:62): explicit ON clause."""
    rows = natural_query(
        "FIND Customer, Order ON Order.CustomerId = Customer.id "
        "WHERE Age > 20 AND Amount > 100 "
        "SELECT Name as CustomerName, Amount ORDER BY Amount",
        db,
    ).collect()
    assert [(r["CustomerName"], r["Amount"]) for r in rows] == [
        ("John", 150.0),
        ("John", 200.0),
    ]


def test_flatten_join_select(db):
    """The commented Find/Include + Execute('Join ... Select ...') shape
    (Program.cs:47-51): INCLUDE results flattened into rows with the
    selected columns. True inner-flatten of all related rows (the
    reference's 2-row cap is a documented quirk, not replicated)."""
    rows = natural_query(
        "FIND Customer WHERE Age > 0 "
        "INCLUDE Order WHERE Amount > 100 SELECT Amount as Total "
        "INCLUDE Address WHERE AddressLine1 contains 'Main' SELECT AddressLine1 as Addr "
        "JOIN as mytable SELECT Name as Person, Total, Addr "
        "ORDER BY Name",
        db,
    ).collect()
    assert {tuple(r) for r in rows} == {
        ("John", 150.0, "123 Main St"),
        ("John", 200.0, "123 Main St"),
        ("Jane", None, None),  # outer flatten keeps parents without matches
    }
