"""Observable metrics (DataFrame.observe): per-action data-quality
counters collected as a side effect of the main job — no second pass
over the data, the way a 100 TB pipeline self-reports row counts and
null rates without doubling its scan cost."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.sources.tables import load_table


def test_observe_collects_metrics_in_one_pass(spark, sf_dir):
    obs = Observation("orders_quality")
    o = load_table(spark, sf_dir, "orders")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("o_totalprice") <= 0).alias("n_nonpositive"),
        F.max("o_orderdate").cast("string").alias("max_date"),
    )
    n_out = observed.filter(F.col("o_orderstatus") == "F").count()  # the action
    metrics = obs.get
    assert metrics["n_rows"] == o.count()          # observed BEFORE the filter
    assert metrics["n_rows"] >= n_out
    assert metrics["n_nonpositive"] == 0
    assert metrics["max_date"] is not None
