"""The reference's SQL dialect (LiteDB SQL) translated to Spark SQL.

Reference grammar (LiteDB/Client/SqlParser/Commands/Select.cs:12-25):

    [EXPLAIN] SELECT <expr> [INTO col]
    [FROM col] [WHERE <expr>] [GROUP BY <expr>] [HAVING <expr>]
    [ORDER BY <expr> [ASC|DESC]] [LIMIT n] [OFFSET n]

with BsonExpression path syntax (Parser/BsonExpressionOperators.cs):
    $.field            document member          -> field
    $.a.b.c            nested path              -> a.b.c
    $.arr[3]           array index (0-based)    -> arr[3]  (Spark: element_at i+1)
    $.arr[*]           all items                -> explode-ready arr
    $.arr[@.x > 1]     filter inside path       -> filter(arr, _it -> _it.x > 1)
    @param             named parameter          -> literal substitution

The translation is textual (the dialect is expression-compatible with
Spark SQL once paths are rewritten — the function names LOWER/UPPER/
TRIM/YEAR/COALESCE/... exist in both, and the IotValue accessors are
registered as SQL UDFs by functions/sql_functions.py). SELECT-without-
FROM evaluates a bare expression (Select.cs:44-53).
"""

from __future__ import annotations

import re
from datetime import date, datetime

from pyspark.sql import DataFrame, SparkSession

# $.arr[@.x > 1]  ->  filter(arr, _it -> _it.x > 1)
_PATH_FILTER = re.compile(
    r"\$\.(\w+(?:\.\w+)*)\[\s*@\.(\w+)\s*(=|!=|<>|>=|<=|>|<)\s*([^\]]+?)\s*\]"
)
# $.arr[*]  ->  arr
_PATH_ALL = re.compile(r"\$\.(\w+(?:\.\w+)*)\[\*\]")
# $.arr[3]  ->  element_at(arr, 4)   (reference indexes 0-based)
_PATH_INDEX = re.compile(r"\$\.(\w+(?:\.\w+)*)\[(\d+)\]")
# $.a.b  ->  a.b     (and bare $ -> struct(*))
_PATH_MEMBER = re.compile(r"\$\.(\w+(?:\.\w+)*)")
_PARAM = re.compile(r"@(\w+)")

# dialect names that differ from Spark SQL
_FUNC_REWRITES = {
    r"\bIIF\s*\(": "IF(",
    r"\bLEN\s*\(": "LENGTH(",
}


def _quote(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, date):
        return f"DATE '{v.isoformat()}'"
    escaped = str(v).replace("'", "''")
    return f"'{escaped}'"


def translate(sql: str, params: dict | None = None) -> str:
    """Rewrite a LiteDB-dialect SQL string into Spark SQL."""
    out = sql

    out = _PATH_FILTER.sub(
        lambda m: (
            f"filter({m.group(1)}, _it -> _it.{m.group(2)} "
            f"{'<>' if m.group(3) == '!=' else m.group(3)} {m.group(4)})"
        ),
        out,
    )
    out = _PATH_ALL.sub(lambda m: m.group(1), out)
    out = _PATH_INDEX.sub(
        lambda m: f"element_at({m.group(1)}, {int(m.group(2)) + 1})", out
    )
    out = _PATH_MEMBER.sub(lambda m: m.group(1), out)

    for pat, repl in _FUNC_REWRITES.items():
        out = re.sub(pat, repl, out, flags=re.IGNORECASE)

    if params is not None:
        def sub_param(m: re.Match) -> str:
            name = m.group(1)
            if name not in params:
                raise KeyError(f"missing SQL parameter @{name}")
            return _quote(params[name])

        out = _PARAM.sub(sub_param, out)
    return out


# SELECT <expr> INTO <target> [FROM ...]  (Select.cs:26-160; executed by
# QueryExecutor.ExecuteQueryInto :149-180). Captured non-greedily so the
# FROM/WHERE tail stays with the query.
_INTO = re.compile(r"^(\s*SELECT\b.*?)\bINTO\s+(\w+)\s*(.*)$", re.IGNORECASE | re.DOTALL)


def lite_sql(
    spark: SparkSession,
    sql: str,
    params: dict | None = None,
    db=None,
) -> DataFrame:
    """Execute a LiteDB-dialect SQL string (db.Execute equivalent —
    LiteDatabase.Execute, LiteDB/Client/Database/LiteDatabase.cs:229-257).
    Tables must be registered views (IotDatabase registers its tables;
    load_tables registers the testdata).

    SELECT ... INTO <target> pipes the result into a sink
    (QueryExecutor.ExecuteQueryInto :149-180): an `IotDatabase` table
    when `db` is given (created on first write, appended otherwise —
    the engine's insert-into-collection behavior), else a temp view
    named <target>. Returns the piped rows either way."""
    m = _INTO.match(sql)
    if m is None:
        return spark.sql(translate(sql, params))
    query = f"{m.group(1)} {m.group(3)}"
    target = m.group(2)
    out = spark.sql(translate(query, params))
    if db is not None:
        from pyspark.sql import functions as F

        piped = out
        if "id" not in piped.columns:
            # INTO targets get an auto-id (the engine's :autoid sequence;
            # unique-not-dense here, like any distributed id assignment)
            piped = piped.withColumn("id", F.monotonically_increasing_id())
        if target not in db.list_tables():
            ddl = ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in piped.schema.fields
            )
            db.tables(target, ddl)
        db.table(target).insert(piped)
    else:
        out.createOrReplaceTempView(target)
    return out
