"""Dataclass -> Spark schema mapper (BsonMapper ergonomics —
LiteDB/Client/Mapper/BsonMapper.cs conventions on typed DataFrames)."""

from __future__ import annotations

import dataclasses
import datetime
import uuid
from typing import Optional

import pytest

from iot_database_spark.database import IotDatabase
from iot_database_spark.mapper import dataclass_to_ddl, to_row


@dataclasses.dataclass
class Tag:
    key: str
    value: str


@dataclasses.dataclass
class SensorPoint:
    id: Optional[int]
    name: str
    reading: float
    online: bool
    seen_at: datetime.datetime
    tags: list[str]
    meta: dict[str, str]
    primary_tag: Tag


@dataclasses.dataclass
class GuidEntity:
    GuidEntityId: uuid.UUID
    label: str


@dataclasses.dataclass
class NoId:
    label: str


@dataclasses.dataclass
class BadId:
    id: float
    label: str


def test_ddl_mapping_covers_scalars_containers_and_structs():
    ddl = dataclass_to_ddl(SensorPoint)
    assert ddl == (
        "id bigint, name string, reading double, online boolean, "
        "seen_at timestamp_ntz, tags array<string>, "
        "meta map<string,string>, primary_tag struct<key:string,value:string>"
    )


def test_classname_id_convention_and_uuid():
    # <ClassName>Id resolves as the Id (BsonMapper AutoId convention)
    # and UUID maps to string, surfacing first as canonical `id`
    assert dataclass_to_ddl(GuidEntity) == "id string, label string"


def test_missing_or_invalid_id_rejected():
    with pytest.raises(ValueError, match="Id field"):
        dataclass_to_ddl(NoId)
    with pytest.raises(TypeError, match="Id must be"):
        dataclass_to_ddl(BadId)


def test_to_row_renames_id_and_stringifies_uuid():
    u = uuid.UUID("12345678-1234-5678-1234-567812345678")
    row = to_row(GuidEntity(GuidEntityId=u, label="x"))
    assert row == {"id": str(u), "label": "x"}


def test_table_roundtrip_with_dataclass_rows(spark, tmp_path):
    db = IotDatabase("mapperdb", str(tmp_path / "wh"), spark=spark)

    @dataclasses.dataclass
    class Device:
        id: Optional[int]
        name: str
        reading: float

    t = db.tables("devices", schema=Device)
    assert t.schema == "id bigint, name string, reading double"
    t.insert([Device(id=None, name="a", reading=1.5),
              Device(id=None, name="b", reading=2.5)])
    rows = {r["name"]: r for r in t.df.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["id"] is not None and rows["a"]["reading"] == 1.5


def test_pep604_union_and_tuple_set_annotations():
    """`T | None` (types.UnionType) must behave exactly like Optional[T];
    tuple[T, ...] and set[T] map to array<T>; heterogeneous tuples are
    rejected with a clear error."""

    @dataclasses.dataclass
    class Pep604:
        id: int | None
        score: float | None
        tags: set[str]
        points: tuple[int, ...]

    assert dataclass_to_ddl(Pep604) == (
        "id bigint, score double, tags array<string>, points array<bigint>"
    )

    @dataclasses.dataclass
    class HeteroTuple:
        id: int
        pair: tuple[int, str]

    with pytest.raises(TypeError, match="heterogeneous tuple"):
        dataclass_to_ddl(HeteroTuple)


def test_to_row_normalizes_nested_uuid_and_sets(spark, tmp_path):
    @dataclasses.dataclass
    class Linked:
        id: int
        refs: list[uuid.UUID]
        alts: set[str]

    u1 = uuid.UUID("12345678-1234-5678-1234-567812345678")
    row = to_row(Linked(id=1, refs=[u1, u1], alts={"x"}))
    assert row["refs"] == [str(u1), str(u1)]
    assert row["alts"] == ["x"]

    # end-to-end: nested UUIDs/sets must survive createDataFrame against
    # the mapped schema (array<string>)
    db = IotDatabase("mapperdb2", str(tmp_path / "wh2"), spark=spark)
    t = db.tables("linked", schema=Linked)
    t.insert([Linked(id=1, refs=[u1], alts={"a", "b"})])
    got = t.df.collect()[0]
    assert got["refs"] == [str(u1)] and sorted(got["alts"]) == ["a", "b"]
