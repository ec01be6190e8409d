"""Dataclass -> Spark schema mapper — the reference's POCO<->document
mapper ergonomics (LiteDB/Client/Mapper/BsonMapper.cs: reflection over
entity properties, AutoId conventions) rebuilt for typed DataFrames.

`db.tables("points", schema=SensorPoint)` works like the reference's
`db.Tables<SensorPoint>()`: column names/types derive from the dataclass
fields, the Id convention is enforced (a field named `id`, `Id`, or
`<ClassName>Id` — BsonMapper's AutoId resolution; Base/BaseDatabase.cs:
172-187 restricts its type to int/long/string-Guid), and rows can be
inserted as dataclass instances.

The mapping itself is plain public Python typing -> Spark SQL DDL:

    int -> bigint        float -> double        str -> string
    bool -> boolean      bytes -> binary        datetime -> timestamp_ntz
    date -> date         Decimal -> decimal(38,18)   UUID -> string
    Optional[T] -> T (Spark columns are nullable)
    list[T] -> array<T>  dict[str, T] -> map<string, T>
    nested dataclass -> struct<...>
"""

from __future__ import annotations

import dataclasses
import datetime
import decimal
import types
import typing
import uuid

_SCALARS = {
    int: "bigint",
    float: "double",
    str: "string",
    bool: "boolean",
    bytes: "binary",
    bytearray: "binary",
    datetime.datetime: "timestamp_ntz",
    datetime.date: "date",
    decimal.Decimal: "decimal(38,18)",
    uuid.UUID: "string",
}

#: Id types the reference accepts (int/long/Guid — BaseDatabase.cs:172-187)
_ID_TYPES = {int, str, uuid.UUID}


def _spark_type(tp) -> str:
    """Spark SQL type string for a Python type annotation."""
    origin = typing.get_origin(tp)
    # identity compare: str(types.UnionType) is "<class 'types.UnionType'>",
    # so a string compare never matches and `int | None` annotations failed
    if origin is typing.Union or origin is types.UnionType:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) != 1:
            raise TypeError(f"unsupported union type: {tp!r}")
        return _spark_type(args[0])
    if origin is tuple:
        targs = typing.get_args(tp)
        if len(targs) == 2 and targs[1] is Ellipsis:
            return f"array<{_spark_type(targs[0])}>"  # tuple[T, ...]
        if len({a for a in targs}) > 1:
            raise TypeError(
                f"heterogeneous tuple {tp!r} cannot map to array<T>; "
                "use a nested dataclass for per-position types"
            )
        return f"array<{_spark_type(targs[0] if targs else str)}>"
    if origin in (list, set, frozenset):
        (elem,) = typing.get_args(tp) or (str,)
        return f"array<{_spark_type(elem)}>"
    if origin is dict:
        key, val = typing.get_args(tp) or (str, str)
        if _spark_type(key) != "string":
            raise TypeError(f"map keys must be strings, got {key!r}")
        return f"map<string,{_spark_type(val)}>"
    if dataclasses.is_dataclass(tp):
        inner = ",".join(
            f"{name}:{stype}" for name, stype in _field_types(tp)
        )
        return f"struct<{inner}>"
    if tp in _SCALARS:
        return _SCALARS[tp]
    raise TypeError(f"no Spark mapping for python type {tp!r}")


def _field_types(cls) -> list[tuple[str, str]]:
    hints = typing.get_type_hints(cls)
    return [
        (f.name, _spark_type(hints[f.name]))
        for f in dataclasses.fields(cls)
    ]


def _id_field(cls) -> str | None:
    """BsonMapper AutoId convention: `id`, `Id`, or `<ClassName>Id`."""
    names = {f.name for f in dataclasses.fields(cls)}
    for cand in ("id", "Id", f"{cls.__name__}Id"):
        if cand in names:
            return cand
    return None


def dataclass_to_ddl(cls) -> str:
    """DDL schema string for a dataclass, with the Id field first and
    renamed to the engine's canonical `id` column.

    Raises if `cls` has no Id field per the reference's convention or if
    the Id type is outside int/string/UUID (BaseDatabase.cs:172-187).
    """
    if not dataclasses.is_dataclass(cls):
        raise TypeError(f"{cls!r} is not a dataclass")
    id_name = _id_field(cls)
    if id_name is None:
        raise ValueError(
            f"{cls.__name__} needs an Id field (id / Id / {cls.__name__}Id) "
            "— BsonMapper AutoId convention"
        )
    hints = typing.get_type_hints(cls)
    id_tp = hints[id_name]
    base = typing.get_origin(id_tp)
    if base is typing.Union or base is types.UnionType:
        args = [a for a in typing.get_args(id_tp) if a is not type(None)]
        id_tp = args[0] if len(args) == 1 else id_tp
    if id_tp not in _ID_TYPES:
        raise TypeError(
            f"Id must be int/str/UUID (reference BaseDatabase.cs:172-187), "
            f"got {id_tp!r}"
        )
    cols = [f"id {_spark_type(id_tp)}"]
    cols += [
        f"{name} {stype}"
        for name, stype in _field_types(cls)
        if name != id_name
    ]
    return ", ".join(cols)


def _normalize_value(v):
    """Recursive value normalization mirroring _spark_type's mapping at
    every depth: UUID -> str (list[UUID] maps to array<string>), set /
    frozenset / tuple -> list (all map to array<T>, and createDataFrame
    rejects raw sets)."""
    if isinstance(v, uuid.UUID):
        return str(v)
    if isinstance(v, (list, tuple, set, frozenset)):
        return [_normalize_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _normalize_value(x) for k, x in v.items()}
    return v


def to_row(obj) -> dict:
    """Dataclass instance -> row dict with the Id field renamed to `id`
    (UUIDs stringified, sets/tuples listified — at any nesting depth).
    Nested dataclasses/containers recurse via dataclasses.asdict."""
    d = dataclasses.asdict(obj)
    id_name = _id_field(type(obj))
    if id_name and id_name != "id":
        d["id"] = d.pop(id_name)
    return {k: _normalize_value(v) for k, v in d.items()}
