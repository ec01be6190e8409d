"""Serialized remote query surface (query/remote.py —
Queries/QueryBuilder.cs parity): JSON wire round-trip, execution through
the FindSpec compiler, schema introspection."""

from __future__ import annotations

import json

import pytest

from iot_database_spark.query import remote
from iot_database_spark.query.nl import FindSpec


@pytest.fixture(scope="module")
def tables(spark):
    people = spark.createDataFrame(
        [
            (1, "Alice", 31, 1200.0),
            (2, "Bob", 22, 90.0),
            (3, "Cara", 45, 5000.0),
            (4, "Dan", 29, 700.0),
        ],
        "id bigint, name string, age int, balance double",
    )
    orders = spark.createDataFrame(
        [
            (10, 1, 250.0),
            (11, 1, 40.0),
            (12, 3, 900.0),
            (13, 4, 15.0),
        ],
        "id bigint, person_id bigint, amount double",
    )
    return {"people": people, "orders": orders}


class _Resolver(dict):
    def infer_fk(self, child, parent):
        if (child, parent) == ("orders", "people"):
            return ("person_id", "id")
        return None


def test_roundtrip_is_stable():
    payload = remote.build_query(
        table="people",
        where="age > 25",
        select=[["name", "Person"], ["balance", "Bal"]],
        joins=[{"table": "orders", "on": "orders.person_id = people.id"}],
        include=[{"table": "orders", "select": [["amount", "amount"]]}],
        order_by={"field": "Bal", "ascending": False},
        limit=5,
    )
    spec = remote.deserialize_query(payload)
    assert isinstance(spec, FindSpec)
    assert remote.serialize_query(spec) == payload  # canonical fixed point
    # and parse(serialize(parse(x))) == parse(x)
    assert remote.deserialize_query(remote.serialize_query(spec)) == spec


def test_execute_filter_project_order_limit(tables):
    out = remote.execute_query(
        {
            "table": "people",
            "where": "age > 25 and balance >= 700",
            "select": [["name", "Person"], ["balance", "Bal"]],
            "order_by": {"field": "Bal", "ascending": False},
            "limit": 2,
        },
        _Resolver(tables),
    )
    rows = [(r["Person"], r["Bal"]) for r in out.collect()]
    assert rows == [("Cara", 5000.0), ("Alice", 1200.0)]


def test_execute_join_with_fk_inference(tables):
    out = remote.execute_query(
        json.dumps(
            {
                "table": "people",
                "joins": [{"table": "orders", "where": "amount > 100"}],
                "select": [["name", "name"]],
            }
        ),
        _Resolver(tables),
    )
    # join key inferred via resolver FK metadata; two orders survive
    assert sorted(r["name"] for r in out.collect()) == ["Alice", "Cara"]


def test_execute_include_nests(tables):
    out = remote.execute_query(
        {
            "table": "people",
            "where": "id = 1",
            "include": [{"table": "orders", "select": [["amount", "amount"]]}],
        },
        _Resolver(tables),
    ).collect()
    assert len(out) == 1
    amounts = sorted(x["amount"] for x in out[0]["orders_Data"])
    assert amounts == [40.0, 250.0]


def test_unknown_key_and_missing_table_rejected():
    with pytest.raises(ValueError, match="unknown query keys"):
        remote.deserialize_query({"table": "t", "wehre": "x > 1"})
    with pytest.raises(ValueError, match="needs a 'table'"):
        remote.deserialize_query({"where": "x > 1"})
    with pytest.raises(ValueError, match="at most 3"):
        remote.deserialize_query(
            {"table": "a", "joins": [{"table": "b"}, {"table": "c"}, {"table": "d"}]}
        )


def test_describe_schema(tables):
    doc = json.loads(remote.describe_schema(tables))
    assert set(doc) == {"people", "orders"}
    assert doc["people"]["columns"]["name"]["type"] == "string"
    assert doc["people"]["columns"]["balance"]["type"] == "double"
    # nested types recurse
    nested = {"m": tables["people"].selectExpr("struct(id, name) AS s", "array(balance) AS arr")}
    ndoc = json.loads(remote.describe_schema(nested))
    s = ndoc["m"]["columns"]["s"]
    assert s["type"] == "struct" and s["fields"]["name"]["type"] == "string"
    assert ndoc["m"]["columns"]["arr"]["type"] == "array"
    assert ndoc["m"]["columns"]["arr"]["element"] == "double"
