"""Layout tests: partition pruning must be visible in the physical plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_database_spark.layout import (
    bucket_for,
    read_timeseries_layout,
    write_timeseries_layout,
)
from iot_database_spark.plans.audit import explain_str


def test_partition_pruning_on_date_and_bucket(spark, tmp_path, smoke_dir):
    events = spark.read.parquet(f"{smoke_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("guid"),
        F.col("ts"),
        "value",
    )
    path = str(tmp_path / "ts_layout")
    write_timeseries_layout(events, path, n_buckets=4)

    back = read_timeseries_layout(spark, path)
    assert back.count() == events.count()

    one_day = back.filter(F.col("p_date") == "2024-01-03")
    plan = explain_str(one_day)
    assert "PartitionFilters" in plan and "p_date" in plan
    # pruned scan reads strictly fewer rows than the full log
    assert 0 < one_day.count() < back.count()

    one_series = back.filter(
        (F.col("p_bucket") == bucket_for("7", 4)) & (F.col("guid") == "7")
    )
    plan2 = explain_str(one_series)
    assert "p_bucket" in plan2
    assert one_series.count() == back.filter("guid = '7'").count()


def test_sorted_within_partitions(spark, tmp_path, smoke_dir):
    events = spark.read.parquet(f"{smoke_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("guid"),
        F.col("ts"),
        "value",
    )
    path = str(tmp_path / "sorted_layout")
    write_timeseries_layout(events, path, n_buckets=2)
    # every parquet file is internally sorted by (guid, ts): check one
    # partition's rows are non-decreasing when read file-ordered
    import glob

    files = glob.glob(f"{path}/p_date=*/p_bucket=*/part-*.parquet")
    assert files
    one = spark.read.parquet(files[0]).select("guid", "ts").collect()
    assert one == sorted(one, key=lambda r: (r["guid"], r["ts"]))


def test_bucketed_join_avoids_shuffle(spark, tmp_path, smoke_dir):
    from iot_database_spark.layout import write_bucketed_table
    from iot_database_spark.plans.audit import count_exchanges, explain_str

    orders = spark.read.parquet(f"{smoke_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{smoke_dir}/lineitem.parquet")
    write_bucketed_table(orders, "orders_b", "o_orderkey", 8)
    write_bucketed_table(lineitem, "lineitem_b", "l_orderkey", 8)

    joined = spark.sql(
        """
        SELECT /*+ MERGE(o) */ o.o_orderkey, o.o_totalprice, l.l_quantity
        FROM orders_b o JOIN lineitem_b l ON l.l_orderkey = o.o_orderkey
        """
    )
    # both sides pre-bucketed on the join key: zero shuffle exchanges
    assert count_exchanges(joined) == 0, explain_str(joined, "simple")
    assert joined.count() > 0

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_zorder_layout_clusters_every_column(spark, tmp_path):
    """Z-order rewrite: every output file must cover a NARROW min/max
    range on BOTH clustered columns (the multi-column pruning contract
    a single-column sort cannot give — its files span the full range of
    the second column)."""
    import glob

    from iot_database_spark.layout import write_zordered

    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).cast("bigint").alias("x"),
        (F.col("id") / n).cast("bigint").alias("y"),
        F.col("id").alias("payload"),
    )

    def spans(path):
        files = glob.glob(f"{path}/part-*.parquet")
        assert len(files) >= 4
        out = []
        for f in files:
            r = (
                spark.read.parquet(f)
                .agg(
                    (F.max("x") - F.min("x")).alias("sx"),
                    (F.max("y") - F.min("y")).alias("sy"),
                )
                .collect()[0]
            )
            out.append((r["sx"], r["sy"]))
        return out

    zpath = str(tmp_path / "zord")
    write_zordered(grid, zpath, ["x", "y"], n_files=16)
    # each file's span must be well under the full 0..63 extent on BOTH
    # dims (16 files over a 64x64 grid -> ~16x16 Morton tiles)
    for sx, sy in spans(zpath):
        assert sx <= n // 2 and sy <= n // 2, (sx, sy)

    # contrast: lexicographic sort on x leaves y unclustered
    lpath = str(tmp_path / "lex")
    (
        grid.repartitionByRange(16, F.col("x"))
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    assert any(sy >= n - 1 for _, sy in spans(lpath))

    # the rewrite preserves the rows exactly
    assert spark.read.parquet(zpath).count() == n * n


def test_writers_bound_row_groups(spark, tmp_path, monkeypatch):
    """r9 verdict #2's lesson applied to the engine's own writers: scan
    parallelism comes from byte-range splits over ROW GROUPS, so a
    writer must never emit one giant group. Shrink the bound and check
    the written file carries multiple groups."""
    import os

    import pyarrow.parquet as pq

    from iot_database_spark import layout

    monkeypatch.setattr(layout, "ROW_GROUP_BYTES", 64 * 1024)
    df = spark.range(0, 60_000).select(
        F.col("id").alias("a"),
        (F.col("id") * 7 % 1000).alias("b"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    ).coalesce(1)
    out = str(tmp_path / "zordered")
    layout.write_zordered(df, out, ["a", "b"], n_files=1)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files
    groups = max(pq.ParquetFile(os.path.join(out, f)).num_row_groups for f in files)
    assert groups > 1  # one coalesced writer still yields splittable files
