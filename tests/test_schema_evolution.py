"""Schema evolution at the source boundary: mergeSchema parquet reads
and unionByName over drifted schemas — how a long-lived 100 TB table
absorbs new columns without rewriting history."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_schema_reads_union_of_columns(spark, tmp_path):
    """Old partitions lack the new column; mergeSchema presents the union
    schema with NULLs for history — no rewrite of old files."""
    old = str(tmp_path / "evo" / "batch=old")
    new = str(tmp_path / "evo" / "batch=new")
    spark.range(3).select(F.col("id").alias("k"),
                          F.lit(1.0).alias("v")).write.parquet(old)
    spark.range(3, 5).select(F.col("id").alias("k"), F.lit(2.0).alias("v"),
                             F.lit("added").alias("tag")).write.parquet(new)
    df = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "evo"))
    assert {"k", "v", "tag", "batch"} == set(df.columns)
    assert df.count() == 5
    assert df.filter(F.col("tag").isNull()).count() == 3   # old files
    assert df.filter(F.col("tag") == "added").count() == 2


def test_union_by_name_allow_missing_columns(spark):
    """unionByName(allowMissingColumns=True): the dataframe-level form of
    the same evolution — absent columns null-filled, matched by NAME not
    position (positional union silently corrupts reordered schemas)."""
    a = spark.createDataFrame([(1, "x")], ["k", "s"])
    b = spark.createDataFrame([("y", 2, 9.5)], ["s", "k", "extra"])
    u = a.unionByName(b, allowMissingColumns=True).orderBy("k")
    rows = u.collect()
    assert [r.k for r in rows] == [1, 2]
    assert [r.s for r in rows] == ["x", "y"]
    assert rows[0].extra is None and rows[1].extra == 9.5
