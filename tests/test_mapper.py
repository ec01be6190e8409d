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
