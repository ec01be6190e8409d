"""Relational operator coverage (SURVEY.md §2.1-2.7) as oracle-checked queries.

The reference executes these semantics as skip-list index scans + Volcano
iterator pipes (LiteDB/Engine/Query/*) or client-side nested loops
(Iot.Database/Queries/QueryEngine*.cs). Here every operator is a declarative
Spark plan: filters/projections push to the parquet scan, joins pick
broadcast vs shuffle via Catalyst/AQE, aggregations run partial+final.

Float discipline: money columns are double in parquet. To make Spark and
the DuckDB oracle produce bit-identical aggregates regardless of summation
order, money aggregates cast to exact DECIMAL, sum exactly, and cast the
final sum to DOUBLE (a deterministic nearest-double of the same exact
value). Integer-valued doubles (quantities, counts) sum exactly in double
and need no trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iot_database_spark.registry import load_views, register


def _sql(name: str, sql: str, oracle: str | None = None) -> None:
    """Register a query whose Spark and DuckDB texts are (usually) identical."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_views(spark, sf_dir)
        return spark.sql(sql)

    fn.__name__ = f"q_{name}"
    register(name, oracle if oracle is not None else sql)(fn)


# ---------------------------------------------------------------------------
# Scans / filter / project  (ref: IndexAll/IndexEquals/IndexRange/IndexIn/
# IndexLike — LiteDB/Engine/Query/IndexQuery/*.cs; QueryPipe.Select/Filter —
# LiteDB/Engine/Query/Pipeline/QueryPipe.cs:81-98, BasePipe.cs:138-150)
# ---------------------------------------------------------------------------

_sql(
    "scan_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS disc_price,
           l_returnflag
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1995-07-01'
      AND l_quantity > 45
    """,
)

_sql(
    "filter_in",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_acctbal >= 0
    """,
)

_sql(
    "filter_like",
    """
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE '%green%' OR p_brand LIKE 'Brand#1%'
    """,
)

_sql(
    "filter_between_not",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders
    WHERE o_totalprice BETWEEN 1000 AND 50000
      AND o_orderstatus <> 'P'
      AND o_orderdate IS NOT NULL
    """,
)

# ---------------------------------------------------------------------------
# Sort / limit / offset / top-k  (ref: BasePipe.OrderBy external merge sort —
# LiteDB/Engine/Sort/SortService.cs; OFFSET/LIMIT QueryPipe.cs:52-57;
# FindAll(take, First|Last) — Iot.Database/Table/TableCollection.cs:849-891)
# ---------------------------------------------------------------------------

_sql(
    "sort_limit_offset",
    """
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50 OFFSET 10
    """,
)

_sql(
    "take_last",
    """
    SELECT event_id, user_id, event_type
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 25
    """,
)

_sql(
    "multi_key_sort",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
    FROM lineitem
    ORDER BY l_returnflag ASC, l_quantity DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
)

# ---------------------------------------------------------------------------
# Aggregation  (ref: GroupByPipe — LiteDB/Engine/Query/Pipeline/GroupByPipe.cs;
# Aggregate methods — LiteDB/Document/Expression/Methods/Aggregate.cs)
# ---------------------------------------------------------------------------

_sql(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS DOUBLE)                                   AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)       AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)         AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)              AS sum_charge,
           CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*)                        AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*)  AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)

_sql(
    "global_agg",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
           MIN(o_orderdate) AS first_date,
           MAX(o_orderdate) AS last_date
    FROM orders
    """,
)

_sql(
    "groupby_having",
    """
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 5
    """,
)

_sql(
    "distinct_op",
    """
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    """,
)

_sql(
    "count_exists_minmax",
    """
    SELECT COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CASE WHEN COUNT(*) > 0 THEN TRUE ELSE FALSE END AS any_rows,
           MIN(event_type) AS min_type,
           MAX(event_type) AS max_type
    FROM events
    WHERE event_type = 'purchase'
    """,
)

_sql(
    "rollup_agg",
    """
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           COUNT(*) AS n,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)

# ---------------------------------------------------------------------------
# Joins  (ref: FK nested loops — Iot.Database/Queries/QueryEngine.cs:729-823,
# QueryEngine2.cs:334-485, QueryEngine3.cs:390-628. Re-expressed as real
# broadcast/shuffle joins; Catalyst+AQE pick the strategy.)
# ---------------------------------------------------------------------------

_sql(
    "join2_orders_customer",
    """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)

_sql(
    "join3_customer_nation_region",
    """
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)

_sql(
    "join4_revenue_by_nation",
    """
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)

# TPC-H Q5 shape: 6-table join through supplier with the local-supplier
# constraint (c_nationkey = s_nationkey). The two fact-size inputs join
# on their keys; every dim side is broadcastable. Exercises join
# reordering across the largest tree in the schema.
_sql(
    "join6_local_supplier_revenue",
    """
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1995-01-01'
      AND o.o_orderdate < DATE '1997-01-01'
    GROUP BY n.n_name
    """,
)

# TPC-H Q14 shape: fact-to-dim join (part broadcasts) + conditional
# decimal aggregate per month. The CASE sums as exact DECIMAL; months
# with no promo rows yield NULL on both engines (no ELSE branch).
# part is the small dim side: pin the broadcast so AQE can never flip
# this to a sort-merge join at larger SFs (r3 bench flagged a 1.63x
# drift here; the hint is a comment to DuckDB, so the oracle text is
# unchanged). EXPLAIN verified: BroadcastHashJoin, single shuffle for
# the month rollup. The decimal product is factored into the join
# subquery so each row multiplies ONCE instead of once per aggregate
# (r5 honest-force bench: 8.1 -> 5.1 s at sf1, values bit-identical).
_sql(
    "join_part_promo_monthly",
    """
    SELECT ship_month,
           CAST(SUM(CASE WHEN promo THEN rev END) AS DOUBLE)
               AS promo_revenue,
           CAST(SUM(rev) AS DOUBLE) AS total_revenue,
           COUNT(*) AS n_items
    FROM (
        SELECT /*+ BROADCAST(p) */
               CAST(date_trunc('month', l.l_shipdate) AS DATE) AS ship_month,
               p.p_type LIKE 'PROMO%' AS promo,
               CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS rev
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
    )
    GROUP BY ship_month
    """,
)

# INCLUDE (1:N nest) flattened to its SQL-checkable shape: parent + child
# aggregate. The true nested <table>_Data shape is produced by
# operators/include.py and checked in pytest (arrays don't hash-compare
# across engines).  ref: QueryEngine.QueryBuilder.Execute :729-823.
_sql(
    "include_children_agg",
    """
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS order_total
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)

_sql(
    "semi_join_exists",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)

_sql(
    "anti_join_not_exists",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)

# ---------------------------------------------------------------------------
# Set operations  (ref: UNION/EXCEPT/DISTINCT over enumerables —
# LiteDB/Document/Expression/Methods/Misc.cs:190-214; we expose the
# DataFrame-level superset)
# ---------------------------------------------------------------------------

_sql(
    "set_union",
    """
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
    """,
)

_sql(
    "set_intersect",
    """
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 1000
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)

_sql(
    "set_except",
    """
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 50000
    """,
)

# ---------------------------------------------------------------------------
# Window functions  (absent in the reference as relational ops — SURVEY §2.5;
# these power LOCF/interpolation/chaining and the "take last N" semantics)
# ---------------------------------------------------------------------------

_sql(
    "window_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) t
    WHERE rn <= 3
    """,
)

_sql(
    "window_running_sum",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
    FROM events
    """,
)

_sql(
    "window_lag_delta",
    """
    SELECT event_id, user_id,
           CAST(CAST(value AS DECIMAL(12,2))
                - COALESCE(LAG(CAST(value AS DECIMAL(12,2))) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id),
                  CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS delta
    FROM events
    """,
)


# DbRef INCLUDE: resolve referenced rows by PK, flag missing refs
# ($missing:true semantics — BasePipe.Include, LiteDB/Engine/Query/
# Pipeline/BasePipe.cs:46-133). Left join + missing flag.
_sql(
    "dbref_include_missing",
    """
    SELECT c.c_custkey, c.c_name,
           n.n_name AS nation_name,
           CASE WHEN n.n_nationkey IS NULL THEN TRUE ELSE FALSE END AS ref_missing
    FROM customer c
    LEFT JOIN nation n
      ON c.c_nationkey = n.n_nationkey AND n.n_regionkey <= 2
    """,
)

# CUBE aggregation (absent in the reference — SURVEY §2.4 "free in Spark
# if we expose them"; exposed here)
_sql(
    "cube_agg",
    """
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)

# ANY/ALL array-quantified predicates (BsonExpressionOperators.cs:115-210
# ANY/ALL variants) via exists()/forall() higher-order functions over a
# per-order array of line quantities.
_sql(
    "any_all_quantifiers",
    """
    SELECT l_orderkey,
           EXISTS(qtys, q -> q > 45)  AS any_gt45,
           FORALL(qtys, q -> q >= 10) AS all_gte10,
           SIZE(qtys)                 AS n_lines
    FROM (
        SELECT l_orderkey, SORT_ARRAY(COLLECT_LIST(l_quantity)) AS qtys
        FROM lineitem GROUP BY l_orderkey
    ) t
    """,
    oracle="""
    SELECT l_orderkey,
           len(list_filter(qtys, q -> q > 45)) > 0   AS any_gt45,
           len(list_filter(qtys, q -> q >= 10)) = len(qtys) AS all_gte10,
           CAST(len(qtys) AS INT)                    AS n_lines
    FROM (
        SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
               list_sort(list(l_quantity)) AS qtys
        FROM lineitem GROUP BY l_orderkey
    ) t
    """,
)

# ---------------------------------------------------------------------------
# Deeper analytical shapes: TPC-H-style Q3, correlated scalar subquery,
# pivot — exercising Catalyst's subquery rewrites and partial aggregation
# ---------------------------------------------------------------------------

_sql(
    "q03_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)

_sql(
    "correlated_scalar_subquery",
    """
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS totalprice
    FROM orders o
    WHERE o_totalprice > (
        SELECT 2 * (CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                    / COUNT(*))
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
)

_sql(
    "pivot_status_by_segment",
    """
    SELECT c_mktsegment,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
    """,
)

_sql(
    "grouping_sets_agg",
    """
    SELECT COALESCE(c_mktsegment, '<seg>') AS segment,
           COALESCE(o_orderpriority, '<pri>') AS priority,
           COUNT(*) AS n
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
    """,
)

# ---------------------------------------------------------------------------
# Sessionization + exact percentiles — standard event-pipeline shapes,
# written identically for both engines (window arithmetic, no engine-
# specific percentile implementations)
# ---------------------------------------------------------------------------

_sql(
    "event_sessionization",
    """
    WITH marked AS (
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(event_id AS BIGINT) AS event_id,
               ts,
               CASE WHEN timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)
                         - LAG(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)) OVER w
                         > 1800000000 OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY CAST(user_id AS BIGINT) ORDER BY ts)
    ), sessions AS (
        SELECT user_id, event_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        FROM marked
    )
    SELECT user_id, session_no,
           COUNT(*) AS n_events,
           MIN(event_id) AS first_event,
           MAX(event_id) AS last_event
    FROM sessions
    GROUP BY user_id, session_no
    """,
    oracle="""
    WITH marked AS (
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(event_id AS BIGINT) AS event_id,
               ts,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         > 1800000000 OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY CAST(user_id AS BIGINT) ORDER BY ts)
    ), sessions AS (
        -- DuckDB's windowed SUM(INTEGER) yields HUGEINT, which the driver
        -- value-hash distinguishes from Spark's BIGINT; pin to BIGINT
        SELECT user_id, event_id,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        FROM marked
    )
    SELECT user_id, session_no,
           COUNT(*) AS n_events,
           MIN(event_id) AS first_event,
           MAX(event_id) AS last_event
    FROM sessions
    GROUP BY user_id, session_no
    """,
)

# CUSUM drift detection — the classic sequential change detector
# (Page 1954), made WINDOW-expressible via the prefix identity
# s_i = P_i - min(0, min_{j<=i} P_j) with P = running sum of
# (value - k): the max(0, s+x-k) reset recurrence never needs a
# sequential fold, so BOTH engines compute it with two stacked
# windows per series — the scale-correct Spark shape (no collect_list,
# per-series external sort only) and, cross-engine, integer-micro
# arithmetic end to end (floor-scaled values, exact BIGINT sums; the
# r9 prototype showed DuckDB struct-accumulator list_reduce folds are
# NOT a safe oracle vehicle, the window identity sidesteps them).
# k = 60 (above the ~49.6 corpus mean, so the statistic decays between
# genuine run-ups), alarm threshold h = 200, both in micro units.
_sql(
    "ts_cusum_drift",
    """
    WITH pts AS (
        SELECT CAST(user_id AS BIGINT) AS series,
               CAST(event_id AS BIGINT) AS event_id,
               ts,
               CAST(FLOOR(CAST(value AS DOUBLE) * 1000000) AS BIGINT)
                   - 60000000 AS d
        FROM events
    ), prefixed AS (
        SELECT series, event_id, ts,
               SUM(d) OVER (PARTITION BY series ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        FROM pts
    ), cusum AS (
        SELECT series,
               p - LEAST(MIN(p) OVER (PARTITION BY series ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   CAST(0 AS BIGINT)) AS s
        FROM prefixed
    )
    SELECT series,
           COUNT(*) AS n_points,
           SUM(CASE WHEN s > 200000000 THEN 1 ELSE 0 END) AS n_alarms,
           MAX(s) AS max_cusum_micro
    FROM cusum GROUP BY series
    """,
    oracle="""
    WITH pts AS (
        SELECT CAST(user_id AS BIGINT) AS series,
               CAST(event_id AS BIGINT) AS event_id,
               ts,
               CAST(FLOOR(CAST(value AS DOUBLE) * 1000000) AS BIGINT)
                   - 60000000 AS d
        FROM events
    ), prefixed AS (
        -- DuckDB windowed SUM(BIGINT) yields HUGEINT; pin to BIGINT so
        -- the driver value-hash matches Spark
        SELECT series, event_id, ts,
               CAST(SUM(d) OVER (PARTITION BY series ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS p
        FROM pts
    ), cusum AS (
        SELECT series,
               p - LEAST(MIN(p) OVER (PARTITION BY series ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   CAST(0 AS BIGINT)) AS s
        FROM prefixed
    )
    SELECT series,
           COUNT(*) AS n_points,
           CAST(SUM(CASE WHEN s > 200000000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_alarms,
           MAX(s) AS max_cusum_micro
    FROM cusum GROUP BY series
    """,
)

# Top-k session paths — the "what do users actually do" query product
# analytics runs over every event stream (the sequence-mining dual of
# event_funnel's fixed target order and event_transition_matrix's
# single-step edges). Sessions are the same 30-min-gap segmentation as
# event_sessionization; each session's first 5 event types join into a
# '>'-delimited path (sort_array over (ts, event_id, type) structs — a
# per-session ordered fold, never a corpus-global sort); path counting
# is one hash groupBy and the top-20 is TakeOrderedAndProject with a
# path-string tie-break so the LIMIT boundary is engine-exact.
_sql(
    "event_path_topk",
    """
    WITH marked AS (
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(event_id AS BIGINT) AS event_id,
               event_type, ts,
               CASE WHEN timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)
                         - LAG(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)) OVER w
                         > 1800000000 OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY CAST(user_id AS BIGINT)
                     ORDER BY ts, CAST(event_id AS BIGINT))
    ), sessions AS (
        SELECT user_id, event_type, ts, event_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        FROM marked
    ), paths AS (
        SELECT user_id, session_no,
               array_join(transform(
                   slice(sort_array(collect_list(struct(ts, event_id, event_type))), 1, 5),
                   x -> x.event_type), '>') AS path
        FROM sessions GROUP BY user_id, session_no
    )
    SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
    oracle="""
    WITH marked AS (
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(event_id AS BIGINT) AS event_id,
               event_type, ts,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                     OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY CAST(user_id AS BIGINT)
                     ORDER BY ts, CAST(event_id AS BIGINT))
    ), sessions AS (
        SELECT user_id, event_type, ts, event_id,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        FROM marked
    ), paths AS (
        SELECT user_id, session_no,
               array_to_string((list(event_type ORDER BY ts, event_id))[1:5], '>') AS path
        FROM sessions GROUP BY user_id, session_no
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
)

_sql(
    "exact_percentiles",
    """
    WITH ranked AS (
        SELECT c_mktsegment,
               CAST(c_acctbal AS DOUBLE) AS bal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS rn,
               COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
        FROM customer
    )
    SELECT c_mktsegment,
           MAX(CASE WHEN rn = CAST(CEIL(n * 0.5) AS BIGINT) THEN bal END) AS median_disc,
           MAX(CASE WHEN rn = CAST(CEIL(n * 0.9) AS BIGINT) THEN bal END) AS p90_disc,
           MAX(n) AS n
    FROM ranked
    GROUP BY c_mktsegment
    """,
)

# ---------------------------------------------------------------------------
# Window-function breadth: RANGE frames, ntile, first/last_value, dense_rank
# (SURVEY §2.5 — absent in the reference; full surface exposed here)
# ---------------------------------------------------------------------------

_sql(
    "window_range_frame",
    """
    SELECT event_id, user_id,
           COUNT(*) OVER (PARTITION BY user_id
                          ORDER BY timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
               AS events_last_hour
    FROM events
    """,
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(user_id AS BIGINT) AS user_id,
           COUNT(*) OVER (PARTITION BY CAST(user_id AS BIGINT)
                          ORDER BY epoch_us(date_trunc('microsecond', ts))
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
               AS events_last_hour
    FROM events
    """,
)

_sql(
    "window_rank_family",
    """
    SELECT o_orderkey, o_custkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           CAST(FIRST_VALUE(o_totalprice) OVER w AS DOUBLE) AS cheapest,
           CAST(LAST_VALUE(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS DOUBLE) AS priciest
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)

_sql(
    "q06_revenue_forecast",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)

# Skew-salted aggregation (operators/skew.py): identical answer to the
# plain GROUP BY — the oracle IS the plain GROUP BY; only the shuffle
# distribution differs.
def _skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iot_database_spark.operators.skew import salted_agg
    from pyspark.sql import functions as F

    tables = load_views(spark, sf_dir)
    li = tables["lineitem"].select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price_dec"),
        "l_quantity",
    )
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "sum_price": ("sum", "price_dec"),
            "n": ("count", "l_quantity"),
            "max_qty": ("max", "l_quantity"),
        },
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        F.col("sum_price").cast("double").alias("sum_price"),
        "n",
        F.col("max_qty").cast("double").alias("max_qty"),
    )


register(
    "skew_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
           COUNT(l_quantity) AS n,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)(_skew_salted)


# ---------------------------------------------------------------------------
# Funnel analysis — ordered multi-step conversion over the events table.
# Stage k counts users whose first qualifying step-k event happens AFTER
# their first qualifying step-(k-1) event (strict ordering, first-touch
# semantics). Three correlated min-aggregations == three keyed shuffles
# over ever-shrinking user sets — no windows over the full event log.
# ---------------------------------------------------------------------------

_FUNNEL_SQL = """
    WITH s1 AS (
        SELECT CAST(user_id AS BIGINT) AS user_id, MIN(ts) AS t1
        FROM events WHERE event_type = 'view'
        GROUP BY CAST(user_id AS BIGINT)
    ), s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM (SELECT CAST(user_id AS BIGINT) AS user_id, ts FROM events
              WHERE event_type = 'click') e
        JOIN s1 ON e.user_id = s1.user_id
        WHERE e.ts > s1.t1
        GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM (SELECT CAST(user_id AS BIGINT) AS user_id, ts FROM events
              WHERE event_type = 'purchase') e
        JOIN s2 ON e.user_id = s2.user_id
        WHERE e.ts > s2.t2
        GROUP BY e.user_id
    )
    SELECT 'view' AS stage, 1 AS stage_no, (SELECT COUNT(*) FROM s1) AS n_users
    UNION ALL
    SELECT 'click', 2, (SELECT COUNT(*) FROM s2)
    UNION ALL
    SELECT 'purchase', 3, (SELECT COUNT(*) FROM s3)
"""

_sql("event_funnel", _FUNNEL_SQL)


# Cohort retention — weekly signup cohorts x weeks-since-first-activity.
# One shuffle to find each user's cohort, one broadcast-joined pass to
# bucket later activity; counts DISTINCT users per (cohort, week offset).

_COHORT_TEMPLATE = """
    WITH firsts AS (
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(date_trunc('week', CAST(MIN(ts) AS DATE)) AS DATE) AS cohort_week
        FROM events
        GROUP BY CAST(user_id AS BIGINT)
    ), activity AS (
        SELECT DISTINCT f.cohort_week,
               CAST(FLOOR({days_expr} / 7.0) AS BIGINT) AS week_no,
               f.user_id
        FROM (SELECT CAST(user_id AS BIGINT) AS user_id, ts FROM events) e
        JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_no, COUNT(*) AS n_active
    FROM activity
    GROUP BY cohort_week, week_no
"""

# engine-specific day-difference spelling (Spark: datediff(end, start);
# DuckDB: date_diff('day', start, end)) — everything else is shared text
_sql(
    "event_cohort_retention",
    _COHORT_TEMPLATE.format(
        days_expr="CAST(datediff(CAST(e.ts AS DATE), f.cohort_week) AS DOUBLE)"
    ),
    oracle=_COHORT_TEMPLATE.format(
        days_expr="CAST(date_diff('day', f.cohort_week, CAST(e.ts AS DATE)) AS DOUBLE)"
    ),
)


@register(
    "sql_include_digest",
    oracle="""
    SELECT c.c_custkey,
           n.n_name AS nation_name,
           n.id IS NULL AS ref_missing
    FROM (SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
                 CAST(c_nationkey AS BIGINT) AS nation_ref_id
          FROM customer) c
    LEFT JOIN (SELECT CAST(n_nationkey AS BIGINT) AS id, n_name
               FROM nation WHERE n_regionkey <= 2) n
      ON c.nation_ref_id = n.id
    """,
)
def sql_include_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-dialect INCLUDE end-to-end (Select.cs:12-25 grammar; DbRef
    hydration per BasePipe.cs:46-133): `SELECT ... FROM c INCLUDE p`
    through query/litesql.py, the hydrated parent struct projected back
    to scalars so the driver can hash it. The parent view is restricted
    to regions 0-2 so `missing` is exercised both ways."""
    from pyspark.sql import functions as F

    from iot_database_spark.query.litesql import lite_sql

    tables = load_views(spark, sf_dir)
    tables["nation"].filter(F.col("n_regionkey") <= 2).select(
        F.col("n_nationkey").cast("bigint").alias("id"), "n_name"
    ).createOrReplaceTempView("nation_ref")
    tables["customer"].select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        F.col("c_nationkey").cast("bigint").alias("nation_ref_id"),
    ).createOrReplaceTempView("cust_inc")
    return lite_sql(
        spark,
        "SELECT $.c_custkey, $.nation_ref.n_name AS nation_name, "
        "$.nation_ref.missing AS ref_missing "
        "FROM cust_inc INCLUDE nation_ref",
    )


@register(
    "approx_sketch_accuracy",
    oracle="""
    WITH agg AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
               CAST(approx_count_distinct(user_id) AS BIGINT) AS n_approx,
               quantile_cont(CAST(value AS DOUBLE), 0.5) AS med_exact,
               approx_quantile(CAST(value AS DOUBLE), 0.5) AS med_approx
        FROM events GROUP BY event_type
    )
    SELECT event_type, n_exact,
           ABS(n_approx - n_exact) <= 0.1 * n_exact AS distinct_within_10pct,
           ABS(med_approx - med_exact)
             <= 0.1 * GREATEST(ABS(med_exact), 1.0) AS median_within_10pct
    FROM agg
    """,
)
def approx_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates under the hash gate: HyperLogLog distinct
    (approx_count_distinct, rsd=0.02) and quantile sketch
    (percentile_approx, accuracy 10k) must land within 10% of the
    exactly-computed answers, per group, in BOTH engines — the graded
    columns are the exact count plus the two accuracy booleans, so two
    different sketch implementations (Spark HLL++/KLL vs DuckDB
    HLL/T-Digest) hash-agree on the INVARIANT even though their raw
    estimates differ. Sketches are the 100-TB path for dashboards and
    profiling: one pass, mergeable partial state, no giant
    distinct-shuffle."""
    from pyspark.sql import functions as F

    ev = load_views(spark, sf_dir)["events"]
    # exact distinct runs as its own two-level aggregation: fusing
    # count(DISTINCT) into the sketch agg makes Spark pre-aggregate by
    # (event_type, user_id) and drag the HLL + percentile merge state
    # (hundreds of buffer fields) through per-user groups and two
    # exchanges — ~8x slower. Split, both sides reduce to one row per
    # event_type and the join broadcasts.
    exact = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )
    sketches = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02)
        .cast("bigint")
        .alias("n_approx"),
        F.expr("percentile(CAST(value AS DOUBLE), 0.5)").alias("med_exact"),
        F.percentile_approx(F.col("value").cast("double"), 0.5, 10000).alias(
            "med_approx"
        ),
    )
    agg = exact.join(F.broadcast(sketches), "event_type")
    return agg.select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            <= 0.1 * F.col("n_exact")
        ).alias("distinct_within_10pct"),
        (
            F.abs(F.col("med_approx") - F.col("med_exact"))
            <= 0.1 * F.greatest(F.abs(F.col("med_exact")), F.lit(1.0))
        ).alias("median_within_10pct"),
    )


# Event-type transition matrix (Markov first-order): what follows what,
# per user, in event-time order. The funnel query checks ONE prescribed
# path; the transition matrix is its exploratory dual (every observed
# path edge + conditional probability). One exchange on user_id for the
# lag window, one tiny exchange on the 25-cell (prev,next) grid; the
# probability is a single double division of two exact int64 counts —
# bit-identical across engines. (ts, event_id) makes the within-user
# order total, so LAG is deterministic under duplicate timestamps.
_TRANSITION_SQL = """
    WITH ordered AS (
        SELECT event_type,
               LAG(event_type) OVER (
                   PARTITION BY CAST(user_id AS BIGINT)
                   ORDER BY ts, CAST(event_id AS BIGINT)) AS prev_type
        FROM events
    ),
    counts AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM ordered
        WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n_transitions,
           CAST(n_transitions AS DOUBLE)
               / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type)
                      AS DOUBLE) AS p_transition
    FROM counts
"""
_sql("event_transition_matrix", _TRANSITION_SQL)
