"""Column mapping: O(1) ALTER TABLE RENAME/DROP COLUMN on the upsert
format — metadata-only schema changes with physically-stable files
(hard-link carries stay valid), Delta columnMapping parity."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.streaming.cdf import (
    read_changes_batch, read_changes_batch_pysource)
from house_price_etl_pipeline_spark.streaming.colmap import (
    drop_table_column, rename_table_column, table_column_mapping)
from house_price_etl_pipeline_spark.streaming.ingest import (
    _journal_state, clone_upsert_table, optimize_upsert_target,
    read_upsert_version, set_table_check_constraint,
    set_table_generated_column, upsert_commit_batch, upsert_delete_where,
    upsert_merge_into, upsert_update_where)
from house_price_etl_pipeline_spark.streaming.partitioning import (
    set_table_partitioning)


def _mk(spark, tmp_path, name="tbl"):
    t = os.path.join(str(tmp_path), name)
    df = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("price"),
        F.lit("x").alias("note"))
    upsert_commit_batch(df, t, 0, key_cols=["k"], order_col="price",
                        keep_versions=8, incremental_min_bytes=0)
    return t


def _physical_cols(target):
    import pyarrow.parquet as pq
    head = os.path.realpath(target)
    f = sorted(x for x in os.listdir(head) if x.endswith(".parquet"))[0]
    return pq.ParquetFile(os.path.join(head, f)).schema_arrow.names


def test_rename_is_metadata_only_and_physical_names_freeze(spark,
                                                           tmp_path):
    t = _mk(spark, tmp_path)
    before = os.path.realpath(t)
    rename_table_column(spark, t, "price", "amount")
    # zero data movement: the published snapshot is untouched
    assert os.path.realpath(t) == before
    snap = read_upsert_version(spark, t)
    assert snap.columns == ["k", "amount", "note"]
    assert snap.agg(F.sum("amount")).first()[0] == sum(
        i * 10 for i in range(50))
    # writes use the logical name; files keep the physical one
    d = spark.range(0, 5).select(
        F.col("id").alias("k"),
        F.lit(7000).cast("bigint").alias("amount"),
        F.lit("y").alias("note"))
    upsert_commit_batch(d, t, 1, key_cols=["k"], order_col="amount",
                        keep_versions=8, incremental_min_bytes=0)
    assert "price" in _physical_cols(t)
    assert read_upsert_version(spark, t) \
        .filter("amount = 7000").count() == 5
    # rename-back and chained rename resolve through the mapping
    rename_table_column(spark, t, "amount", "cost")
    assert table_column_mapping(t)["renames"] == {"cost": "price"}
    rename_table_column(spark, t, "cost", "price")
    assert table_column_mapping(t)["renames"] == {}


def test_rename_guards(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="not a column"):
        rename_table_column(spark, t, "ghost", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_table_column(spark, t, "price", "note")
    set_table_check_constraint(spark, t, "pos", "price >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        rename_table_column(spark, t, "price", "amount")
    # a column NOT referenced by the constraint renames fine
    rename_table_column(spark, t, "note", "remark")
    t2 = os.path.join(str(tmp_path), "t2")
    set_table_partitioning(t2, {"bucket": "bigint"})
    df = spark.range(10).select(F.col("id").alias("k"),
                                (F.col("id") % 2).alias("bucket"),
                                F.col("id").alias("v"))
    upsert_commit_batch(df, t2, 0, key_cols=["k", "bucket"],
                        order_col="v", keep_versions=8)
    with pytest.raises(ValueError, match="PARTITIONED BY"):
        rename_table_column(spark, t2, "bucket", "pail")


def test_drop_column_hides_and_reorg_reclaims(spark, tmp_path):
    t = _mk(spark, tmp_path)
    drop_table_column(spark, t, "note")
    snap = read_upsert_version(spark, t)
    assert snap.columns == ["k", "price"]
    assert "note" in _physical_cols(t)          # bytes linger
    # DML keeps working on the narrowed logical schema
    upsert_delete_where(spark, t, 1, "price >= 400", keep_versions=8,
                        incremental_min_bytes=0)
    upsert_update_where(spark, t, 2, "price = 0", {"price": "5"},
                        key_cols=["k"], keep_versions=8,
                        incremental_min_bytes=0)
    src = spark.createDataFrame([(100, 1)], "k bigint, price bigint")
    upsert_merge_into(spark, t, 3, src, ["k"], keep_versions=8,
                      incremental_min_bytes=0)
    assert read_upsert_version(spark, t).count() == 41
    # reusing the dropped physical name is refused
    bad = spark.createDataFrame([(200, 1, "q")],
                                "k bigint, price bigint, note string")
    with pytest.raises(ValueError, match="DROPPED"):
        upsert_commit_batch(bad, t, 4, key_cols=["k"],
                            order_col="price", keep_versions=8)
    # full-rewrite OPTIMIZE = REORG: physical bytes reclaimed
    optimize_upsert_target(spark, t, keep_versions=8, stats_cols=[])
    assert "note" not in _physical_cols(t)
    with pytest.raises(ValueError, match="last column"):
        drop_table_column(spark, t, "price")
        drop_table_column(spark, t, "k")


def test_drop_guards_generated_and_identity(spark, tmp_path):
    t = os.path.join(str(tmp_path), "gen")
    from house_price_etl_pipeline_spark.streaming.ingest import (
        set_table_identity_column)
    set_table_identity_column(t, "rid")
    set_table_generated_column(spark, t, "dbl", "price * 2")
    df = spark.range(5).select(F.col("id").alias("k"),
                               (F.col("id") * 10).alias("price"))
    upsert_commit_batch(df, t, 0, key_cols=["k"], order_col="price",
                        keep_versions=8)
    with pytest.raises(ValueError, match="generated column"):
        drop_table_column(spark, t, "price")
    with pytest.raises(ValueError, match="IDENTITY"):
        rename_table_column(spark, t, "rid", "row_id")
    with pytest.raises(ValueError, match="generated column"):
        rename_table_column(spark, t, "dbl", "twice")


def test_change_feed_sees_logical_names(spark, tmp_path):
    t = _mk(spark, tmp_path)
    rename_table_column(spark, t, "price", "amount")
    drop_table_column(spark, t, "note")
    d = spark.range(0, 3).select(
        F.col("id").alias("k"), F.lit(1).cast("bigint").alias("amount"))
    upsert_commit_batch(d, t, 1, key_cols=["k"], order_col="amount",
                        keep_versions=8, incremental_min_bytes=0)
    jvm = read_changes_batch(spark, t, ["k"])
    py = read_changes_batch_pysource(spark, t, ["k"])
    assert jvm.columns == ["k", "amount", "change_type",
                           "_commit_version"]
    assert set(map(tuple, jvm.collect())) == set(map(tuple, py.collect()))


def test_clone_carries_mapping(spark, tmp_path):
    t = _mk(spark, tmp_path)
    rename_table_column(spark, t, "price", "amount")
    drop_table_column(spark, t, "note")
    c = os.path.join(str(tmp_path), "clone")
    clone_upsert_table(t, c)
    assert table_column_mapping(c) == {"renames": {"amount": "price"},
                                       "dropped": ["note"]}
    assert read_upsert_version(spark, c).columns == ["k", "amount"]


def test_colmap_composes_with_partitioning(spark, tmp_path):
    """Rename a DATA column on a PARTITIONED BY table: the Hive layout
    keys stay physical-stable, DML and the typed read work through the
    logical name, and partition pruning still fires."""
    t = os.path.join(str(tmp_path), "pt")
    set_table_partitioning(t, {"bucket": "bigint"})
    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("bucket"),
        (F.col("id") * 10).alias("price"))
    upsert_commit_batch(df, t, 0, key_cols=["k", "bucket"],
                        order_col="price", keep_versions=8,
                        incremental_min_bytes=0)
    rename_table_column(spark, t, "price", "amount")
    upsert_update_where(spark, t, 1, "bucket = 2", {"amount": "0"},
                        key_cols=["k", "bucket"], keep_versions=8,
                        incremental_min_bytes=0)
    snap = read_upsert_version(spark, t)
    assert snap.columns == ["k", "amount", "bucket"]
    assert snap.filter("bucket = 2 AND amount = 0").count() == 10
    pruned = snap.filter(F.col("bucket") == 1) \
        .select(F.input_file_name()).distinct().count()
    total = snap.select(F.input_file_name()).distinct().count()
    assert pruned < total


def test_new_column_cannot_reuse_renamed_physical_name(spark, tmp_path):
    """After RENAME a->b, a batch evolving the schema with a NEW column
    literally named 'a' (b's in-use PHYSICAL name) must be refused —
    otherwise two logical columns would alias onto one physical column
    in the staged write (ADVICE r11)."""
    t = _mk(spark, tmp_path)
    rename_table_column(spark, t, "price", "amount")
    bad = spark.range(0, 3).select(
        F.col("id").alias("k"),
        F.lit(1).cast("bigint").alias("amount"),
        F.lit("y").alias("note"),
        F.lit(5).cast("bigint").alias("price"))   # = amount's physical
    with pytest.raises(ValueError, match="PHYSICAL"):
        upsert_commit_batch(bad, t, 1, key_cols=["k"],
                            order_col="amount", keep_versions=8,
                            incremental_min_bytes=0)
    # a genuinely new name still evolves fine
    ok = bad.withColumnRenamed("price", "list_price")
    upsert_commit_batch(ok, t, 1, key_cols=["k"], order_col="amount",
                        keep_versions=8, incremental_min_bytes=0)
    assert "list_price" in read_upsert_version(spark, t).columns


def test_rename_chain_reusing_freed_logical_name_stays_writable(
        spark, tmp_path):
    """Legal rename chains must not brick writes: RENAME price->amount
    then RENAME note->price makes 'price' a live LOGICAL column (mapped
    to physical 'note') whose name equals amount's in-use PHYSICAL name
    — the aliasing guard must only refuse UNMAPPED columns (a mapped
    column writes to its own target, no aliasing exists)."""
    t = _mk(spark, tmp_path)
    rename_table_column(spark, t, "price", "amount")
    rename_table_column(spark, t, "note", "price")
    snap = read_upsert_version(spark, t)
    assert set(snap.columns) == {"k", "amount", "price"}
    batch = spark.range(50, 53).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("amount"),
        F.lit("y").alias("price"))
    upsert_commit_batch(batch, t, 1, key_cols=["k"],
                        order_col="amount", keep_versions=8,
                        incremental_min_bytes=0)
    got = read_upsert_version(spark, t)
    assert got.count() == 53
    assert got.filter("price = 'y'").count() == 3
    # physical layout unchanged: logical 'price' writes physical 'note'
    assert sorted(_physical_cols(t)) == ["k", "note", "price"]
