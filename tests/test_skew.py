"""Salted-join equivalence: same rows as the plain join, salt never leaks."""

from __future__ import annotations

from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.operators.skew import salted_join
from house_price_etl_pipeline_spark.sources.tables import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey")

    plain = o.join(c, "o_custkey").groupBy("c_mktsegment").count()
    salted = salted_join(o, c, "o_custkey", n_salts=8).groupBy(
        "c_mktsegment").count()
    assert sorted(plain.collect()) == sorted(salted.collect())
    assert "_salt" not in salted_join(o, c, "o_custkey").columns


def test_salted_join_left_matches_and_outer_flavors_rejected(spark, sf_dir):
    """LEFT keeps unmatched big rows exactly once; right/full outer are
    rejected — the replicated small side would emit unmatched small rows
    n_salts times, so the construction is only sound for inner/left."""
    import pytest

    o = load_table(spark, sf_dir, "orders")
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_custkey") % 2 == 0)  # force unmatched big rows
         .withColumnRenamed("c_custkey", "o_custkey"))
    plain = o.join(c, "o_custkey", "left").groupBy("c_mktsegment").count()
    salted = salted_join(o, c, "o_custkey", n_salts=8, how="left").groupBy(
        "c_mktsegment").count()
    key = lambda r: (r[0] is None, r[0], r[1])  # null group sorts first
    assert sorted(plain.collect(), key=key) == sorted(salted.collect(), key=key)
    for bad in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(o, c, "o_custkey", how=bad)


def test_salted_join_spreads_a_hot_key(spark):
    """90%-hot-key input: every (key, salt) bucket must hold ~1/R of the
    hot key — the whole point of salting."""
    hot = spark.range(0, 9000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(0, 1000).select((F.col("id") % 50 + 2).alias("k"),
                                       F.col("id").alias("v"))
    big = hot.unionByName(cold)
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(1, 60)], "k long, name string")

    out = salted_join(big, small, "k", n_salts=8)
    assert out.count() == 10000  # all rows matched, none duplicated

    # inspect the salt distribution the join would shuffle on
    salt = (F.abs(F.xxhash64(*big.columns)) % 8).cast("int")
    dist = (big.filter(F.col("k") == 1).withColumn("_salt", salt)
            .groupBy("_salt").count().collect())
    assert len(dist) == 8  # hot key spread across all 8 salt buckets
    assert max(r["count"] for r in dist) < 9000 * 0.25  # no bucket ~whole key


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's automatic skew-join handling — the runtime complement to
    manual salting (skew.salted_join): with one key holding ~99% of the
    rows, AQE must mark the sort-merge join `skew=true` and split the
    hot partition into advisory-sized reads instead of letting one task
    own it. Thresholds are shrunk so the ~MB-scale local shuffle
    qualifies; on a real cluster the defaults (256MB) play this role."""
    from pyspark.sql import functions as F

    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        left = (spark.range(500_000)
                .select(F.lit(0).alias("k"), F.col("id").alias("v"))
                .union(spark.range(5_000)
                       .select((F.col("id") % 50 + 1).alias("k"),
                               F.col("id").alias("v"))))
        right = (spark.range(51).select(F.col("id").alias("k"),
                                        F.lit("x").alias("tag")))
        j = left.join(right, "k").groupBy("tag").agg(F.count("*").alias("n"))
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
        assert "AQEShuffleRead skewed" in plan
        assert rows[0].n == 505_000  # split partitions lose no rows
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
