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


def test_malformed_json_records_permissive_vs_dropmalformed(spark, tmp_path):
    """Source-robustness contract for text formats: PERMISSIVE mode keeps
    bad lines (nulled fields + the raw line in _corrupt_record),
    DROPMALFORMED silently drops them, FAILFAST raises — the three
    policies a 100 TB ingest chooses between when a crawler emits
    garbage mid-file."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    p = tmp_path / "mixed.jsonl"
    p.write_text('\n'.join([
        '{"id": 1, "v": 10.5}',
        'not json at all',
        '{"id": 2, "v": "not-a-number"}',
        '{"id": 3, "v": 3.25}',
    ]) + '\n')
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("_corrupt_record", T.StringType()),
    ])

    permissive = spark.read.schema(schema).json(str(p)).cache()
    assert permissive.count() == 4
    bad = permissive.filter(F.col("_corrupt_record").isNotNull())
    assert bad.count() == 2  # the non-JSON line and the bad-typed field
    assert permissive.filter(F.col("id").isNotNull()).count() == 3

    dropped = (spark.read.schema("id long, v double")
        .option("mode", "DROPMALFORMED").json(str(p)))
    assert [r.id for r in dropped.orderBy("id").collect()] == [1, 3]

    with pytest.raises(Exception):
        (spark.read.schema("id long, v double")
         .option("mode", "FAILFAST").json(str(p)).collect())
