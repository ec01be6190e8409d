"""The reference's BsonExpression scalar dialect as a name -> Column registry.

The reference implements these as static C# methods over BsonValues
(reference: Iot.Database/LiteDB/Document/Expression/Methods/{String,Date,
Math,Misc,DataTypes}.cs and Parser/BsonExpressionFunctions.cs). Here each
dialect name maps to a builder over pyspark Columns so user queries written
against the reference's function surface compile to JVM-side Catalyst
expressions (no Python UDFs anywhere in this registry).

Usage:
    from iot_database_spark.functions import call
    df.select(call("UPPER", F.col("name")).alias("u"))

Names are upper-cased on lookup, matching the reference's case-insensitive
method resolution (BsonExpressionParser binds by method name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnLike = Column | str | int | float


def _c(x: ColumnLike) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


# --- String.cs (LOWER:17 UPPER:30 LTRIM:43 RTRIM:56 TRIM:70 INDEXOF:83,96
#     SUBSTRING:109,122 REPLACE:135 LPAD:148 RPAD:165 SPLIT:182,198
#     FORMAT:224 JOIN:237,245 IS_MATCH:261 MATCH:271) ---------------------

def _indexof(s: ColumnLike, sub: ColumnLike, start: ColumnLike | None = None) -> Column:
    # reference returns 0-based index, -1 when absent (String.cs:83-106);
    # Spark instr/locate are 1-based with 0 for absent.
    if start is not None:
        if not isinstance(start, int):
            raise TypeError("INDEXOF start offset must be an int")
        return F.locate(_c(sub), _c(s), pos=start + 1) - 1
    return F.instr(_c(s), _c(sub)) - 1


def _split(s: ColumnLike, sep: ColumnLike, use_regex: bool = False) -> Column:
    # String.cs:182-213 — literal split by default, regex variant when asked.
    sep_col = _c(sep)
    if use_regex:
        return F.split(_c(s), sep_col)
    return F.split(_c(s), F.regexp_replace(sep_col, r"([.*+?^${}()|\[\]\\])", r"\\$1"))


FUNCTIONS: dict[str, Callable[..., Column]] = {
    # strings
    "LOWER": lambda s: F.lower(_c(s)),
    "UPPER": lambda s: F.upper(_c(s)),
    "LTRIM": lambda s: F.ltrim(_c(s)),
    "RTRIM": lambda s: F.rtrim(_c(s)),
    "TRIM": lambda s: F.trim(_c(s)),
    "INDEXOF": _indexof,
    # reference SUBSTRING is 0-based (String.cs:109-133); Spark is 1-based
    "SUBSTRING": lambda s, i, n=2147483647: F.substring(_c(s), _c(i) + F.lit(1), _c(n)),
    "REPLACE": lambda s, a, b: F.replace(_c(s), _c(a), _c(b)),
    "LPAD": lambda s, n, p=" ": F.lpad(_c(s), n, p),
    "RPAD": lambda s, n, p=" ": F.rpad(_c(s), n, p),
    "SPLIT": _split,
    "FORMAT": lambda v, fmt: F.format_string(fmt, _c(v)) if isinstance(fmt, str) else F.format_string(fmt, _c(v)),
    "JOIN": lambda arr, sep="": F.array_join(_c(arr), sep),
    "IS_MATCH": lambda s, pat: _c(s).rlike(pat) if isinstance(pat, str) else F.regexp(_c(s), _c(pat)),
    "MATCH": lambda s, pat, grp=0: F.regexp_extract(_c(s), pat, grp),
    # Date.cs (YEAR:18 MONTH:28 DAY:38 HOUR:49 MINUTE:59 SECOND:70
    # DATEADD:84 DATEDIFF:108 TO_LOCAL:132 TO_UTC:145)
    "YEAR": lambda d: F.year(_c(d)),
    "MONTH": lambda d: F.month(_c(d)),
    "DAY": lambda d: F.dayofmonth(_c(d)),
    "HOUR": lambda d: F.hour(_c(d)),
    "MINUTE": lambda d: F.minute(_c(d)),
    "SECOND": lambda d: F.second(_c(d)),
    "DATEADD": lambda part, n, d: _dateadd(part, n, d),
    "DATEDIFF": lambda part, a, b: _datediff(part, a, b),
    "TO_LOCAL": lambda d: F.from_utc_timestamp(_c(d), _session_tz()),
    "TO_UTC": lambda d: F.to_utc_timestamp(_c(d), _session_tz()),
    # Math.cs (ABS:16 ROUND:32 POW:52)
    "ABS": lambda x: F.abs(_c(x)),
    "ROUND": lambda x, n=0: F.round(_c(x), n),
    "POW": lambda x, y: F.pow(_c(x), _c(y)),
    # Misc.cs (JSON:17 EXTEND:44 ITEMS:69 CONCAT:94 KEYS:102 VALUES:116
    # OID_CREATIONTIME:130 IIF:143 COALESCE:153 LENGTH:161 TOP:175
    # UNION:190 EXCEPT:198 DISTINCT:206 RANDOM:217)
    "JSON": lambda s, schema="map<string,string>": F.from_json(_c(s), schema),
    "EXTEND": lambda a, b: F.map_concat(_c(a), _c(b)),
    "ITEMS": lambda arr: F.explode(_c(arr)),
    "CONCAT": lambda *xs: F.concat(*[_c(x) for x in xs]),
    "KEYS": lambda m: F.map_keys(_c(m)),
    "VALUES": lambda m: F.map_values(_c(m)),
    "IIF": lambda cond, a, b: F.when(_c(cond), _c(a)).otherwise(_c(b)),
    "COALESCE": lambda *xs: F.coalesce(*[_c(x) for x in xs]),
    "LENGTH": lambda x: F.length(_c(x)),
    "TOP": lambda arr, n: F.slice(_c(arr), 1, n),
    "UNION": lambda a, b: F.array_union(_c(a), _c(b)),
    "EXCEPT": lambda a, b: F.array_except(_c(a), _c(b)),
    "DISTINCT": lambda a: F.array_distinct(_c(a)),
    "RANDOM": lambda lo=None, hi=None: F.rand() if lo is None else (F.floor(F.rand() * (_c(hi) - _c(lo))) + _c(lo)),
    # DataTypes.cs constructors / converters
    "MINVALUE": lambda: F.lit(None),
    "OBJECTID": lambda: F.expr("replace(uuid(), '-', '')"),
    "GUID": lambda s=None: F.expr("uuid()") if s is None else _c(s),
    "NOW": lambda: F.current_timestamp(),
    "NOW_UTC": lambda: F.current_timestamp(),
    "TODAY": lambda: F.current_date(),
    "MAXVALUE": lambda: F.lit(None),
    "INT32": lambda x: _c(x).cast("int"),
    "INT64": lambda x: _c(x).cast("bigint"),
    "DOUBLE": lambda x: _c(x).cast("double"),
    "DECIMAL": lambda x: _c(x).cast("decimal(38,18)"),
    "STRING": lambda x: _c(x).cast("string"),
    "ARRAY": lambda *xs: F.array(*[_c(x) for x in xs]),
    "BINARY": lambda x: _c(x).cast("binary"),
    "BOOLEAN": lambda x: _c(x).cast("boolean"),
    "DATETIME": lambda x: _c(x).cast("timestamp"),
    "DATETIME_UTC": lambda x: _c(x).cast("timestamp"),
    # type predicates (DataTypes.cs:441-516) — typed columns make most of
    # these static; the try_cast family covers the dynamic string slots.
    "IS_NULL": lambda x: _c(x).isNull(),
    "IS_NUMBER": lambda x: _c(x).cast("string").try_cast("double").isNotNull(),
    "IS_INT32": lambda x: _c(x).cast("string").try_cast("int").isNotNull(),
    "IS_INT64": lambda x: _c(x).cast("string").try_cast("bigint").isNotNull(),
    "IS_DOUBLE": lambda x: _c(x).cast("string").try_cast("double").isNotNull(),
    "IS_DECIMAL": lambda x: _c(x).cast("string").try_cast("decimal(38,18)").isNotNull(),
    "IS_STRING": lambda x: _c(x).try_cast("string").isNotNull(),
    "IS_BOOLEAN": lambda x: _c(x).cast("string").try_cast("boolean").isNotNull(),
    "IS_DATETIME": lambda x: _c(x).cast("string").try_cast("timestamp").isNotNull(),
    # runtime-type predicates over Spark's type system (DataTypes.cs
    # IS_ARRAY:441 IS_BINARY IS_DOCUMENT IS_GUID IS_OBJECTID): typeof()
    # resolves the column's Catalyst type; GUID/ObjectId are format
    # checks on the string value (their storage type here).
    "IS_ARRAY": lambda x: F.call_function("typeof", _c(x)).startswith("array"),
    "IS_BINARY": lambda x: F.call_function("typeof", _c(x)) == "binary",
    "IS_DOCUMENT": lambda x: F.call_function("typeof", _c(x)).startswith("struct")
    | F.call_function("typeof", _c(x)).startswith("map"),
    "IS_GUID": lambda x: _c(x)
    .cast("string")
    .rlike("^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"),
    "IS_OBJECTID": lambda x: _c(x).cast("string").rlike("^[0-9a-fA-F]{24}$"),
    # BSON Min/Max sentinels have no Spark analog (MINVALUE/MAXVALUE
    # construct null here) — no real value ever matches them
    "IS_MINVALUE": lambda x: F.lit(False),
    "IS_MAXVALUE": lambda x: F.lit(False),
    # ObjectId embeds its creation time in the first 4 bytes (hex
    # seconds since epoch) — Misc.cs OID_CREATIONTIME
    "OID_CREATIONTIME": lambda x: F.timestamp_seconds(
        F.conv(F.substring(_c(x).cast("string"), 1, 8), 16, 10).cast("bigint")
    ),
    # enumerable aggregates over ARRAY arguments (Aggregate.cs:12-100):
    # SUM/AVG consider only numeric members (values.Where(IsNumber)),
    # AVG of no numerics = 0, ANY = non-empty
    "COUNT": lambda arr: F.coalesce(F.size(_c(arr)), F.lit(0)),
    "MIN": lambda arr: F.array_min(_c(arr)),
    "MAX": lambda arr: F.array_max(_c(arr)),
    # F.get is 0-based and null-safe on empty arrays (ANSI element_at throws)
    "FIRST": lambda arr: F.get(_c(arr), 0),
    "LAST": lambda arr: F.get(_c(arr), F.size(_c(arr)) - 1),
    "ANY": lambda arr: F.coalesce(F.size(_c(arr)), F.lit(0)) > 0,
    "SUM": lambda arr: F.aggregate(
        F.filter(_c(arr), lambda v: v.cast("string").try_cast("double").isNotNull()),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("string").try_cast("double"),
    ),
    "AVG": lambda arr: F.aggregate(
        F.filter(_c(arr), lambda v: v.cast("string").try_cast("double").isNotNull()),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("string").try_cast("double"),
    )
    / F.greatest(
        F.size(
            F.filter(
                _c(arr), lambda v: v.cast("string").try_cast("double").isNotNull()
            )
        ),
        F.lit(1),
    ),
    # higher-order (BsonExpressionFunctions MAP:13 FILTER:27 SORT:41-60)
    "MAP": lambda arr, fn: F.transform(_c(arr), fn),
    "FILTER": lambda arr, fn: F.filter(_c(arr), fn),
    "SORT": lambda arr: F.array_sort(_c(arr)),
}

# reference aliases (DataTypes.cs:525-566)
for _alias, _target in {
    "INT": "INT32", "LONG": "INT64", "BOOL": "BOOLEAN", "DATE": "DATETIME",
    "DATE_UTC": "DATETIME_UTC", "IS_INT": "IS_INT32", "IS_LONG": "IS_INT64",
    "IS_BOOL": "IS_BOOLEAN", "IS_DATE": "IS_DATETIME",
}.items():
    FUNCTIONS[_alias] = FUNCTIONS[_target]


_DATE_PARTS = {
    "y": "YEAR", "year": "YEAR", "M": "MONTH", "month": "MONTH",
    "d": "DAY", "day": "DAY", "h": "HOUR", "hour": "HOUR",
    "m": "MINUTE", "minute": "MINUTE", "s": "SECOND", "second": "SECOND",
}


def _dateadd(part: str, n: ColumnLike, d: ColumnLike) -> Column:
    # Date.cs:84-106 — part tokens y/M/d/h/m/s
    return F.timestamp_add(_DATE_PARTS[part], _c(n), _c(d))


def _datediff(part: str, a: ColumnLike, b: ColumnLike) -> Column:
    # Date.cs:108-130
    return F.timestamp_diff(_DATE_PARTS[part], _c(a), _c(b))


def _session_tz() -> str:
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    return s.conf.get("spark.sql.session.timeZone", "UTC") if s else "UTC"


def call(name: str, *args, **kwargs) -> Column:
    """Invoke a dialect function by (case-insensitive) name."""
    fn = FUNCTIONS.get(name.upper())
    if fn is None:
        raise KeyError(f"unknown dialect function: {name}")
    return fn(*args, **kwargs)
