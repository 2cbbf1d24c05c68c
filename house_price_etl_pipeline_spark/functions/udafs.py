"""User-defined aggregate surface: GROUPED_AGG pandas UDFs (SURVEY §2.9
U3 — the reference has no UDAF at all; this is the extension exemplar
for aggregation semantics the built-ins don't ship).

The kernel uses ``math.fsum`` (correctly-rounded float summation) so the
result is ORDER-INDEPENDENT — a plain float64 running sum would differ
in the last bits between partitionings (and from the DuckDB oracle,
which sums in scan order), exactly the instability the engine's
decimal-exact native aggregates (functions/numeric.py) exist to avoid.
A UDAF must solve the same problem on the Python side, and fsum does it
without Decimal's 30x cost.

Scale note: GROUPED_AGG ships each group's column slices to the Python
worker as Arrow — fine for bounded per-group data (here: weights+values
per returnflag), wrong for billion-row groups. At 100 TB the native
decimal path stays the default; the UDAF surface exists for genuinely
custom math (trimmed/winsorized estimators, domain scores).

NB: ``pd`` must be a module-level import — under ``from __future__
import annotations`` the pandas_udf type hints stringify and resolve
against this module's globals (same trap documented in bench.py).
"""

from __future__ import annotations

import math
import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..plans.catalog import register
from ..sources.tables import load_table

# Python-invocation cap for the cogrouped kernel: one applyInPandas call
# per bucket, NOT per user. A real cluster sizes this to cores × a small
# factor; env-overridable like SPARK_GRAFT_DEDUP_PARTITIONS.
COGROUP_BUCKETS = int(os.environ.get("SPARK_GRAFT_COGROUP_BUCKETS", "64"))


def weighted_avg():
    """Quantity-weighted mean as a GROUPED_AGG pandas UDF, via
    exactly-rounded (order-independent) float summation. Built lazily:
    the ``pandas_udf`` decorator parses its DDL return type through the
    active SparkContext, so it cannot run at import time (catalog
    modules import before any session exists)."""

    @pandas_udf("double")
    def _wavg(value: pd.Series, weight: pd.Series) -> float:
        num = math.fsum((value * weight).to_numpy())
        den = math.fsum(weight.to_numpy())
        return num / den if den else float("nan")

    return _wavg


def group_size():
    """Row count as a GROUPED_AGG pandas UDF — Spark disallows mixing
    group-aggregate pandas UDFs with native aggregates in one ``agg``
    (INVALID_PANDAS_UDF_PLACEMENT), so the count rides the same surface."""

    @pandas_udf("long")
    def _n(value: pd.Series) -> int:
        return len(value)

    return _n


@register(
    "udaf_weighted_avg_price",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           round(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(25,6)))
                 AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE), 6)
             AS wavg_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def udaf_weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate through the GROUPED_AGG pandas-UDF surface:
    quantity-weighted average price per return flag. The oracle computes
    the same quantity in exact DECIMAL; parity holds because fsum's
    correctly-rounded sum equals the decimal sum of these (exactly
    representable) products cast back to double."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(group_size()("l_quantity").alias("n_items"),
             F.round(weighted_avg()("l_extendedprice", "l_quantity"), 6)
             .alias("wavg_price"))
        .orderBy("l_returnflag")
    )


# --- grouped-map applyInPandas ---------------------------------------------

@register(
    "pandas_mad_by_flag",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS m
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           round(ANY_VALUE(med.m), 6) AS median_price,
           round(quantile_cont(abs(l.l_extendedprice - med.m), 0.5), 6)
             AS mad_price
    FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag
    GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """,
)
def pandas_mad_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group via **grouped-map
    ``applyInPandas``** (the batch grouped-map surface; the stateful twin
    lives in streaming/stateful.py). One shuffle on the group key, each
    group materialized as a pandas frame in the worker — the contract is
    bounded groups, same as any grouped map; for billion-row groups the
    two-pass percentile composition (see clean_winsorize_prices) is the
    shape that scales. numpy's interpolated median == DuckDB
    quantile_cont(0.5), so the kernel is value-hash checkable — rare for
    a Python-path operator."""
    import numpy as np

    def mad(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["l_extendedprice"].to_numpy(dtype="float64")
        m = float(np.median(x))
        return pd.DataFrame({
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "n_rows": [len(x)],
            "median_price": [round(m, 6)],
            "mad_price": [round(float(np.median(np.abs(x - m))), 6)],
        })

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .applyInPandas(
            mad,
            "l_returnflag string, n_rows bigint, "
            "median_price double, mad_price double")
        .orderBy("l_returnflag")
    )


# --- cogrouped applyInPandas -----------------------------------------------

@register(
    "pandas_cogroup_conversion_lag",
    oracle="""
    WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(c.ts) AS BIGINT) AS n_attributed,
           CAST(SUM(CASE WHEN c.ts IS NULL THEN 0
                    ELSE epoch_us(p.ts) - epoch_us(c.ts) END)
                AS BIGINT) AS total_lag_us
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    GROUP BY p.user_id ORDER BY p.user_id
    """,
)
def pandas_cogroup_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution lag via **cogrouped ``applyInPandas``**
    (``groupBy(...).cogroup(...)``): both sides shuffle once on user_id,
    and each user's click/purchase frames arrive together in one worker
    call — the two-sided grouped-map surface. The kernel is
    ``pd.merge_asof`` (backward search = latest click at-or-before each
    purchase), the per-key micro-batch twin of the engine's native as-of
    join (operators/temporal.py, which remains the 100 TB path — this
    entry pins the cogroup API itself under the value-hash gate, lag
    sums in exact integer microseconds).

    The cogroup key is a HASH BUCKET of user_id, not user_id itself:
    cogrouping on the raw key costs one Python invocation (~10 ms of
    pandas fixed overhead) per user — 1500 users made this a 20 s query
    at sf0.1. Bucketing caps the invocation count at COGROUP_BUCKETS
    while ``merge_asof(by='user_id')`` keeps the per-user semantics
    vectorized inside each call (measured 20 s → ~1 s, identical hash).
    The same pattern is what survives 100 TB: Python call count is
    O(buckets), never O(distinct keys)."""
    ev = load_table(spark, sf_dir, "events")
    # the two sides carry DISTINCT column names: with both named `ts`,
    # Spark's column pruning over FlatMapCoGroupsInPandas can drop the
    # right side's ts (same-name attribute dedup) — observed, not just
    # theoretical
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.pmod(F.col("user_id"), F.lit(COGROUP_BUCKETS)).alias("cbucket"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.pmod(F.col("user_id"), F.lit(COGROUP_BUCKETS)).alias("pbucket"),
        F.col("user_id").alias("purchase_user"),
        F.col("ts").alias("purchase_ts"))

    def lag(key, cdf: pd.DataFrame, pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                columns=["user_id", "n_purchases", "n_attributed",
                         "total_lag_us"])
        cdf = cdf.rename(columns={"click_user": "user_id"})
        pdf = pdf.rename(columns={"purchase_user": "user_id"})
        # merge_asof requires global sort on the `on` key; `by` does the
        # per-user partitioning vectorized
        pdf = pdf.sort_values("purchase_ts", kind="mergesort")
        cdf = cdf.sort_values("click_ts", kind="mergesort")
        if cdf.empty:
            matched = pdf.assign(click_ts=pd.NaT)
        else:
            matched = pd.merge_asof(
                pdf, cdf,
                left_on="purchase_ts", right_on="click_ts",
                by="user_id", direction="backward")
        # exact integer microseconds (timedelta floordiv runs on int64
        # nanoseconds — no float round-trip, any lag magnitude)
        lag_us = ((matched["purchase_ts"] - matched["click_ts"])
                  // pd.Timedelta(microseconds=1)).fillna(0).astype("int64")
        out = (
            matched.assign(
                _attr=matched["click_ts"].notna().astype("int64"),
                _lag=lag_us)
            .groupby("user_id", sort=False)
            .agg(n_purchases=("user_id", "size"),
                 n_attributed=("_attr", "sum"),
                 total_lag_us=("_lag", "sum"))
            .reset_index()
        )
        return out

    return (
        clicks.groupBy("cbucket")
        .cogroup(purchases.groupBy("pbucket"))
        .applyInPandas(
            lag,
            "user_id bigint, n_purchases bigint, n_attributed bigint, "
            "total_lag_us bigint")
        .orderBy("user_id")
    )


@register(
    "udtf_analyze_numeric_profile",
    oracle="""
    SELECT l_returnflag AS key_l_returnflag,
           CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100
             AS sum_l_quantity,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / 100 AS sum_l_extendedprice
    FROM lineitem WHERE l_orderkey % 20 = 0
    GROUP BY 1 ORDER BY 1
    """,
)
def udtf_analyze_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4): ``analyze()`` derives the
    output schema from the input TABLE's schema at plan time — string
    columns become ``key_<name>``, numeric columns become
    ``sum_<name>`` — so ONE table function profiles any table shape
    (the static-returnType UDTF next door, text_udtf_positional_tokens,
    cannot). Consumed as ``FROM profile(TABLE(...) PARTITION BY ...)``:
    Spark shuffles on the partition key and runs one UDTF instance per
    partition; eval() folds rows, terminate() emits the partition
    summary. Numeric sums accumulate in integer cents (inputs are
    2-decimal doubles) so the emitted doubles are bit-identical to the
    oracle's integer-cents form — no float-order drift across engines.

    A UDTF here is the API demonstration — eval() is row-at-a-time
    Python, so the input is bounded to a 1-in-20 order slice (like the
    sibling UDTF bounds its doc range); the hot-path form of this exact
    query is a plain groupBy().agg() (what the oracle runs)."""
    from dataclasses import dataclass, field

    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import DoubleType, StringType, StructType

    _NUMERIC = {"double", "float", "long", "integer", "short", "decimal"}

    @dataclass
    class ProfileResult(AnalyzeResult):
        # (input field name, is_numeric) in field order — computed ONCE
        # from the SCHEMA in analyze() and handed to every eval instance,
        # so classification can never drift from the promised output
        # schema (the old first-row isinstance probe misclassified
        # NULL/Decimal first rows — ADVICE r3)
        fields: tuple = field(default_factory=tuple)

    class NumericProfile:
        @staticmethod
        def analyze(tbl: AnalyzeArgument) -> "ProfileResult":
            out = StructType()
            fields = []
            for f in tbl.dataType.fields:
                num = f.dataType.typeName() in _NUMERIC
                fields.append((f.name, num))
                if num:
                    out = out.add(f"sum_{f.name}", DoubleType())
                else:
                    out = out.add(f"key_{f.name}", StringType())
            return ProfileResult(schema=out, fields=tuple(fields))

        def __init__(self, analyze_result: "ProfileResult"):
            self.fields = analyze_result.fields
            # positional field indices: eval() runs once per row, and
            # row.asDict() there cost ~25% of the whole query's wall —
            # the TABLE argument's Row carries the input fields in
            # schema order, so index access is loss-free (guide §4.2:
            # make the per-row Python do as little as possible; Arrow
            # serialization for UDTFs was ALSO measured — 2.4x SLOWER
            # here, eval stays per-row and the batches are tiny)
            self.num_idx = [i for i, (_k, num) in enumerate(self.fields)
                            if num]
            self.key_idx = [i for i, (_k, num) in enumerate(self.fields)
                            if not num]
            self.acc: list = [0 if num else None for _k, num in self.fields]
            self.saw_rows = False

        def eval(self, row):
            self.saw_rows = True
            acc = self.acc
            for i in self.num_idx:
                v = row[i]
                if v is not None:  # NULLs don't contribute to sums
                    acc[i] += int(round(v * 100))
            for i in self.key_idx:
                acc[i] = row[i]  # partition key: constant here

        def terminate(self):
            if self.saw_rows:
                yield tuple(
                    self.acc[i] / 100.0 if num else self.acc[i]
                    for i, (_k, num) in enumerate(self.fields))

    spark.udtf.register("numeric_profile", udtf(NumericProfile))
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT * FROM numeric_profile(
          TABLE(SELECT l_returnflag, l_quantity, l_extendedprice
                FROM lineitem WHERE l_orderkey % 20 = 0)
          PARTITION BY l_returnflag)
        ORDER BY key_l_returnflag
    """)


@register(
    "arrow_grouped_price_profile",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           round(MIN(l_extendedprice), 2) AS min_price,
           round(MAX(l_extendedprice), 2) AS max_price,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / 100 AS sum_price
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def arrow_grouped_price_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupBy().applyInArrow`` exemplar — the grouped zero-copy Arrow
    entry point (completes the Python-kernel matrix next to mapInPandas
    / mapInArrow / applyInPandas / cogroup / the stateful pair): the
    kernel receives one pyarrow.Table per group and answers with
    pyarrow.compute aggregations — no pandas boxing anywhere. Sum
    accumulates in integer cents (2-decimal inputs) so the emitted
    double is bit-identical to the oracle. The hot-path form of this
    query is plain groupBy().agg(); the Arrow route exists for kernels
    that genuinely need whole-group array access."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def profile(table: "pa.Table") -> "pa.Table":
        price = table.column("l_extendedprice")
        cents = pc.cast(pc.round(pc.multiply(price, pa.scalar(100.0))),
                        pa.int64())
        return pa.table({
            "l_returnflag": [table.column("l_returnflag")[0].as_py()],
            "n_rows": [table.num_rows],
            "min_price": [round(pc.min(price).as_py(), 2)],
            "max_price": [round(pc.max(price).as_py(), 2)],
            "sum_price": [pc.sum(cents).as_py() / 100.0],
        })

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInArrow(
            profile,
            "l_returnflag string, n_rows bigint, min_price double, "
            "max_price double, sum_price double")
        .orderBy("l_returnflag")
    )
