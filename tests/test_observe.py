"""``DataFrame.observe`` / CollectMetrics coverage: free pipeline
telemetry computed inline with the job (no second scan) — the hook a
production pipeline uses for row-count / checksum circuit breakers."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.sources.tables import load_table


def test_observe_metrics_match_direct_aggregation(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("scan_stats")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).cast("double")
        .alias("sum_price"),
        F.max("l_shipdate").alias("max_shipdate"),
    )
    # downstream job runs as usual; metrics ride along on the same scan
    result = observed.filter(F.col("l_quantity") >= 25).count()

    direct = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).cast("double")
        .alias("s"),
        F.max("l_shipdate").alias("m"),
        F.sum((F.col("l_quantity") >= 25).cast("bigint")).alias("big"),
    ).first()

    got = obs.get
    assert got["n_rows"] == direct.n          # metrics see PRE-filter rows
    assert got["sum_price"] == direct.s
    assert got["max_shipdate"] == direct.m
    assert result == direct.big               # the job result is unaffected


def test_observe_appears_as_collect_metrics_node(spark, sf_dir):
    """The observation is a plan node on the existing scan — not a second
    job; assert CollectMetrics is in the executed plan."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("plan_probe")
    df = li.observe(obs, F.count(F.lit(1)).alias("n")).groupBy(
        "l_returnflag").count()
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CollectMetrics" in plan
