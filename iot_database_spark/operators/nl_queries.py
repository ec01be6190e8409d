"""Oracle-checked queries driving the FIND natural-language dialect
(SURVEY.md §3.3) against the driver's testdata tables.

These go through the full parse -> compile -> execute path of
query/nl.py, proving the dialect produces the same answers as plain SQL
(the reference's NL engines bypass its optimizer and nested-loop in
memory; ours compiles to pushed-down DataFrame plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iot_database_spark.query.nl import natural_query
from iot_database_spark.registry import load_views, register

# FK map of the testdata star schema, for ON-inference parity with the
# reference's TableInfo-driven inference (QueryEngine2.cs:248-259)
_TESTDATA_FKS = {
    ("orders", "customer"): ("o_custkey", "c_custkey"),
    ("lineitem", "orders"): ("l_orderkey", "o_orderkey"),
    ("lineitem", "part"): ("l_partkey", "p_partkey"),
    ("lineitem", "supplier"): ("l_suppkey", "s_suppkey"),
    ("customer", "nation"): ("c_nationkey", "n_nationkey"),
    ("supplier", "nation"): ("s_nationkey", "n_nationkey"),
    ("nation", "region"): ("n_regionkey", "r_regionkey"),
}


class _Resolver:
    def __init__(self, tables: dict[str, DataFrame]):
        self._tables = tables

    def __getitem__(self, name: str) -> DataFrame:
        return self._tables[name]

    def infer_fk(self, child: str, parent: str):
        return _TESTDATA_FKS.get((child, parent))


def _resolver(spark: SparkSession, sf_dir: str) -> _Resolver:
    return _Resolver(load_views(spark, sf_dir))


@register(
    "nl_find_filter_sort_limit",
    oracle="""
    SELECT c_name AS Person, CAST(c_acctbal AS DOUBLE) AS Balance
    FROM customer
    WHERE c_acctbal > 1000 AND LOWER(c_name) LIKE '%1%'
    ORDER BY Person
    LIMIT 20
    """,
)
def nl_find_filter_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIND + WHERE (case-insensitive contains) + SELECT alias + ORDER BY
    + LIMIT — the reference's flagship example shape
    (Example.BasicDb/Program.cs:53-71)."""
    from pyspark.sql import functions as F

    out = natural_query(
        "FIND customer WHERE c_acctbal > 1000 AND c_name contains '1' "
        "SELECT c_name as Person, c_acctbal as Balance ORDER BY Person LIMIT 20",
        _resolver(spark, sf_dir),
    )
    return out.withColumn("Balance", F.col("Balance").cast("double"))


@register(
    "nl_find_dual_join",
    oracle="""
    SELECT c.c_name AS c_name, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_totalprice > 200000
    """,
)
def nl_find_dual_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-table FIND with explicit ON (QueryBuilder<T1,T2> —
    QueryEngine2.cs:334-485), compiled to a real join."""
    from pyspark.sql import functions as F

    out = natural_query(
        "FIND customer, orders ON orders.o_custkey = customer.c_custkey "
        "WHERE c_mktsegment = 'BUILDING' AND o_totalprice > 200000 "
        "SELECT c_name, o_totalprice",
        _resolver(spark, sf_dir),
    )
    return out.withColumn("o_totalprice", F.col("o_totalprice").cast("double"))


@register(
    "nl_find_dual_fk_inference",
    oracle="""
    SELECT c.c_name AS c_name, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 5000 AND o.o_orderstatus = 'F'
    """,
)
def nl_find_dual_fk_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-table FIND with the ON clause omitted — join inferred from FK
    metadata (QueryEngine2.cs:248-259)."""
    from pyspark.sql import functions as F

    out = natural_query(
        "FIND customer, orders "
        "WHERE c_acctbal > 5000 AND o_orderstatus = 'F' "
        "SELECT c_name, o_totalprice",
        _resolver(spark, sf_dir),
    )
    return out.withColumn("o_totalprice", F.col("o_totalprice").cast("double"))


@register(
    "nl_find_triple_join",
    oracle="""
    SELECT c.c_name AS c_name, n.n_name AS n_name, r.r_name AS r_name
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE c.c_acctbal > 3000
      AND LOWER(n.n_name) LIKE '%a%'
      AND r.r_name <> 'ASIA'
    """,
)
def nl_find_triple_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-table FIND (QueryBuilder<T1,T2,T3> — QueryEngine3.cs:390-628):
    chained joins, per-table WHERE conditions."""
    return natural_query(
        "FIND customer, nation, region "
        "ON nation.n_nationkey = customer.c_nationkey "
        "AND region.r_regionkey = nation.n_regionkey "
        "WHERE c_acctbal > 3000 AND n_name contains 'a' AND r_name != 'ASIA' "
        "SELECT c_name, n_name, r_name",
        _resolver(spark, sf_dir),
    )


@register(
    "nl_find_include_digest",
    oracle="""
    WITH cust AS (
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey
        FROM customer WHERE c_acctbal > 4000
    ), ords AS (
        SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
               CAST(o_orderkey AS BIGINT) AS k,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS p
        FROM orders WHERE o_totalprice > 100000
    ), agg AS (
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               md5(string_agg(CAST(k AS VARCHAR) || ':' || p, ',' ORDER BY k))
                   AS orders_digest
        FROM ords GROUP BY o_custkey
    )
    SELECT c.c_custkey AS c_custkey,
           COALESCE(a.n_orders, 0) AS n_orders,
           COALESCE(a.orders_digest, md5('')) AS orders_digest
    FROM cust c LEFT JOIN agg a ON a.o_custkey = c.c_custkey
    """,
)
def nl_find_include_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable form of the INCLUDE nesting: run the same FIND ...
    INCLUDE through the NL engine, then canonically serialize each parent's
    nested ``orders_Data`` array (sorted by key, `k:price` CSV) and md5 it.
    Proves the nested shape carries exactly the right related rows per
    parent — the property the rows-only check on `nl_find_include_nested`
    cannot see (QueryEngine.cs:729-823)."""
    from pyspark.sql import functions as F

    out = natural_query(
        "FIND customer WHERE c_acctbal > 4000 "
        "INCLUDE orders WHERE o_totalprice > 100000 SELECT o_orderkey, o_totalprice "
        "ORDER BY c_custkey",
        _resolver(spark, sf_dir),
    )

    def fmt(x):
        return F.concat_ws(
            ":",
            x["o_orderkey"].cast("bigint").cast("string"),
            x["o_totalprice"].cast("decimal(12,2)").cast("string"),
        )

    data = F.col("orders_Data")
    return out.select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        F.when(data.isNull(), F.lit(0).cast("bigint"))
        .otherwise(F.size(data).cast("bigint"))
        .alias("n_orders"),
        F.md5(
            F.when(data.isNull(), F.lit("")).otherwise(
                F.array_join(F.transform(F.array_sort(data), fmt), ",")
            )
        ).alias("orders_digest"),
    )


def nl_find_include_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCLUDE nesting — each primary row carries an orders_Data array of
    structs (QueryEngine.cs:729-823, result shape :685-689).

    RETIRED from the driver registry in round 7 (kept as a library
    entry point): the nested struct-array column crashes the driver's
    pandas canonicalizer (`TypeError: unhashable type: numpy.ndarray`)
    even for a rows-only check, so it could only ever record a red row.
    The nested payload is value-hash-proven by `nl_find_include_digest`
    (driver-green since r5), and the shape stays covered locally by
    tests/test_nl_query.py. See COVERAGE.md "Driver-evidence policy"."""
    return natural_query(
        "FIND customer WHERE c_acctbal > 4000 "
        "INCLUDE orders WHERE o_totalprice > 100000 SELECT o_orderkey, o_totalprice "
        "ORDER BY c_custkey",
        _resolver(spark, sf_dir),
    )


@register(
    "remote_serialized_find",
    oracle="""
    SELECT c.c_name AS Person, CAST(o.o_totalprice AS DOUBLE) AS Total
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'MACHINERY' AND o.o_totalprice > 250000
    ORDER BY Total DESC, Person
    LIMIT 25
    """,
)
def remote_serialized_find(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialized remote query surface (Queries/QueryBuilder.cs:20-62):
    the query arrives as a JSON wire payload — built client-side by
    build_query, shippable over any transport — and executes through the
    same FindSpec compiler as the NL dialect. Round-trip through
    serialize/deserialize is part of the path under test."""
    from pyspark.sql import functions as F

    from iot_database_spark.query import remote

    payload = remote.build_query(
        table="customer",
        where="c_mktsegment = 'MACHINERY'",
        select=[["c_name", "Person"]],
        joins=[
            {
                "table": "orders",
                "on": "orders.o_custkey = customer.c_custkey",
                "where": "o_totalprice > 250000",
                "select": [["o_totalprice", "Total"]],
            }
        ],
        order_by={"field": "Total", "ascending": False},
    )
    # wire round-trip: deserialize(serialize(x)) is the executed plan
    payload = remote.serialize_query(remote.deserialize_query(payload))
    out = remote.execute_query(payload, _resolver(spark, sf_dir))
    # deterministic top-25: Total has ties, break them by Person in both
    # engines (the payload's single order key is the reference's limit)
    out = out.orderBy(F.col("Total").desc(), F.col("Person")).limit(25)
    return out.withColumn("Total", F.col("Total").cast("double"))
