"""Serialized remote query surface — QueryBuilder.cs parity, Spark-first.

The reference serializes a client LINQ expression tree as Remote.Linq
JSON, ships it over the wire, deserializes it server-side and invokes it
against the collection (Queries/QueryBuilder.cs:20-62); schema
introspection for "GPT-query-ready" clients is a JSON document of the
entity's property tree (SerializeQueryableStructure :58-100).

A LINQ tree is imperative plumbing around a declarative core (filter /
join / project / order / take), and Spark already HAS the declarative
core — so the wire format here is a JSON query DESCRIPTION that maps
1:1 onto `query.nl.FindSpec` and executes through the same
`execute_find` machinery as the NL surface. That keeps one compiler for
all three front doors (NL strings, serialized JSON, Python API) and the
whole payload auditable (no code execution from the wire — a safety
upgrade over deserializing expression trees).

Wire format (all keys optional except `table`):

    {"table": "orders",
     "where": "Amount > 100 and Status = 'open'",
     "select": [["Amount", "Total"], ["CustomerId", "CustomerId"]],
     "joins": [{"table": "customer", "on": "orders.customer_id = customer.id",
                "where": "...", "select": [...]}],
     "include": [{"table": "lineitem", "where": "...", "select": [...]}],
     "order_by": {"field": "Total", "ascending": false},
     "limit": 10}

`describe_schema` returns the introspection document; `execute_query`
runs a JSON payload and returns the result DataFrame.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from iot_database_spark.query.nl import FindSpec, IncludeSpec, execute_find

__all__ = [
    "build_query",
    "deserialize_query",
    "describe_schema",
    "execute_query",
    "serialize_query",
]


def _norm_cols(cols) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    for c in cols or []:
        if isinstance(c, str):
            out.append((c, c))
        else:
            name, alias = (list(c) + [None])[:2]
            out.append((name, alias or name))
    return out


def deserialize_query(payload: str | dict) -> FindSpec:
    """JSON payload -> FindSpec. Raises ValueError on unknown keys so a
    mis-typed clause can never be silently dropped."""
    doc = json.loads(payload) if isinstance(payload, str) else dict(payload)
    known = {
        "table",
        "where",
        "select",
        "joins",
        "include",
        "order_by",
        "limit",
    }
    unknown = set(doc) - known
    if unknown:
        raise ValueError(f"unknown query keys: {sorted(unknown)}")
    if "table" not in doc:
        raise ValueError("query payload needs a 'table'")

    tables = [doc["table"]]
    conditions = [doc.get("where", "")]
    columns = [_norm_cols(doc.get("select"))]
    on: list[str] = []
    for j in doc.get("joins", []):
        tables.append(j["table"])
        conditions.append(j.get("where", ""))
        columns.append(_norm_cols(j.get("select")))
        if j.get("on"):
            on.append(j["on"])
    if len(tables) > 3:
        raise ValueError("at most 3 joined tables (reference FIND limit)")

    includes = [
        IncludeSpec(
            table=i["table"],
            condition=i.get("where", ""),
            columns=_norm_cols(i.get("select")),
        )
        for i in doc.get("include", [])
    ]

    order_by = None
    if doc.get("order_by"):
        ob = doc["order_by"]
        if isinstance(ob, str):
            order_by = (ob, True)
        else:
            order_by = (ob["field"], bool(ob.get("ascending", True)))

    return FindSpec(
        tables=tables,
        on=on,
        conditions=conditions,
        columns=columns,
        includes=includes,
        order_by=order_by,
        limit=doc.get("limit"),
    )


def serialize_query(spec: FindSpec) -> str:
    """FindSpec -> canonical JSON payload (the Build() direction of
    QueryBuilder.cs:50-56). deserialize_query(serialize_query(s))
    round-trips."""
    doc: dict = {"table": spec.tables[0]}
    if spec.conditions and spec.conditions[0]:
        doc["where"] = spec.conditions[0]
    if spec.columns and spec.columns[0]:
        doc["select"] = [list(c) for c in spec.columns[0]]
    joins = []
    for idx, t in enumerate(spec.tables[1:], start=1):
        j: dict = {"table": t}
        if len(spec.on) >= idx:
            j["on"] = spec.on[idx - 1]
        if idx < len(spec.conditions) and spec.conditions[idx]:
            j["where"] = spec.conditions[idx]
        if idx < len(spec.columns) and spec.columns[idx]:
            j["select"] = [list(c) for c in spec.columns[idx]]
        joins.append(j)
    if joins:
        doc["joins"] = joins
    if spec.includes:
        doc["include"] = [
            {
                "table": i.table,
                **({"where": i.condition} if i.condition else {}),
                **({"select": [list(c) for c in i.columns]} if i.columns else {}),
            }
            for i in spec.includes
        ]
    if spec.order_by:
        doc["order_by"] = {
            "field": spec.order_by[0],
            "ascending": spec.order_by[1],
        }
    if spec.limit is not None:
        doc["limit"] = spec.limit
    return json.dumps(doc, sort_keys=True)


def build_query(
    table: str,
    where: str = "",
    select: list | None = None,
    joins: list[dict] | None = None,
    include: list[dict] | None = None,
    order_by: str | dict | None = None,
    limit: int | None = None,
) -> str:
    """Client-side helper: build the JSON wire payload (what the
    reference's QueryBuilder.Build does for a LINQ expression)."""
    doc: dict = {"table": table}
    if where:
        doc["where"] = where
    if select:
        doc["select"] = select
    if joins:
        doc["joins"] = joins
    if include:
        doc["include"] = include
    if order_by:
        doc["order_by"] = order_by
    if limit is not None:
        doc["limit"] = limit
    return serialize_query(deserialize_query(doc))


def execute_query(payload: str | dict, resolver) -> DataFrame:
    """Deserialize and execute a JSON query payload (ExecuteQuery —
    QueryBuilder.cs:20-30). `resolver` is an IotDatabase or a
    {name: DataFrame} dict, exactly as for execute_find."""
    return execute_find(deserialize_query(payload), resolver)


def _field_doc(dt: T.DataType) -> object:
    """Recursive type description (GenerateSchema — QueryBuilder.cs:66-100
    walks the property tree; Spark's StructType IS that tree)."""
    if isinstance(dt, T.StructType):
        return {
            "type": "struct",
            "fields": {
                f.name: {"nullable": f.nullable, **_as_doc(_field_doc(f.dataType))}
                for f in dt.fields
            },
        }
    if isinstance(dt, T.ArrayType):
        return {
            "type": "array",
            "element": _field_doc(dt.elementType),
        }
    if isinstance(dt, T.MapType):
        return {
            "type": "map",
            "key": _field_doc(dt.keyType),
            "value": _field_doc(dt.valueType),
        }
    return dt.simpleString()


def _as_doc(v: object) -> dict:
    return v if isinstance(v, dict) else {"type": v}


def describe_schema(resolver, tables: list[str] | None = None) -> str:
    """JSON schema document for client-side (or LLM) query construction —
    SerializeQueryableStructure parity. Works against an IotDatabase or a
    {name: DataFrame} dict."""
    if hasattr(resolver, "list_tables"):
        names = tables or resolver.list_tables()
        get = lambda n: resolver.table(n).df  # noqa: E731
    else:
        names = tables or sorted(resolver)
        get = lambda n: resolver[n]  # noqa: E731
    doc = {
        name: {
            "columns": {
                f.name: {"nullable": f.nullable, **_as_doc(_field_doc(f.dataType))}
                for f in get(name).schema.fields
            }
        }
        for name in names
    }
    return json.dumps(doc, indent=2, sort_keys=True)
