"""Physical-layout operators: Z-order (Morton) clustering keys.

At 100 TB the cheapest scan is the one that never happens: parquet
row-group/file skipping works when each file's min/max envelope is tight
on the PREDICATE columns. A single-column sort gives tight envelopes on
one column and full-range envelopes on every other; interleaving the
bits of two (or more) key columns — the Z-order curve — bounds BOTH
envelopes at once, so point/range predicates on either column skip most
files. The key is a pure per-row JVM bit expression (32 shift/mask
terms, whole-stage codegen): computing it costs nothing next to the
write, and `repartitionByRange(zkey)` + write is the whole recipe.

tests/test_layout.py demonstrates the property end-to-end: the same
relation written z-clustered vs single-column-sorted, per-file min/max
envelopes read back, and the skippable-file count compared under
single-column predicates on each dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..sources.tables import load_table

ZORDER_BITS = 16


def zorder_key(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton interleave of the low `bits` bits of two non-negative int
    columns: x occupies even result bits, y odd (y's top bit is the most
    significant — ties broken x-major below it). Disjoint bits make the
    sum an OR; everything stays in one codegen'd bigint expression."""
    xb, yb = x.cast("bigint"), y.cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)),
                            2 * i + 1)
    return z


# every 16/65536/>>16 below derives from ZORDER_BITS so retuning the
# knob can never desynchronize the Spark key from the oracle (review r9)
_ZMOD = 1 << ZORDER_BITS

_ZKEY_SQL = f"""
    CAST(list_sum(list_transform(range(0, {ZORDER_BITS}), i ->
        ((((l_partkey % {_ZMOD}) >> i) & 1) << (2*i))
      | ((((l_suppkey % {_ZMOD}) >> i) & 1) << (2*i+1)))) AS BIGINT)
"""


@register(
    "layout_zorder_profile",
    oracle=f"""
    WITH z AS (
      SELECT l_partkey, l_suppkey, {_ZKEY_SQL} AS zkey
      FROM lineitem
    )
    SELECT CAST(zkey >> {ZORDER_BITS} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MAX(l_partkey) - MIN(l_partkey) AS BIGINT) AS part_span,
           CAST(MAX(l_suppkey) - MIN(l_suppkey) AS BIGINT) AS supp_span
    FROM z GROUP BY bucket ORDER BY bucket
    """,
)
def layout_zorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering profile of lineitem on (l_partkey, l_suppkey):
    rows grouped by the top z-key bits (= the files a z-clustered write
    would produce) with each group's min/max span on BOTH key columns —
    the quantity parquet skipping actually uses. The whole key is narrow
    bit arithmetic; the only shuffle is the profile's group-by. The
    DuckDB oracle replays the identical interleave, so the bit math is
    value-hash-pinned cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    z = zorder_key(F.pmod(F.col("l_partkey"), F.lit(_ZMOD)),
                   F.pmod(F.col("l_suppkey"), F.lit(_ZMOD)))
    return (
        li.select("l_partkey", "l_suppkey", z.alias("zkey"))
        .groupBy(F.shiftright(F.col("zkey"), ZORDER_BITS)
                 .alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            (F.max("l_partkey") - F.min("l_partkey")).cast("bigint")
            .alias("part_span"),
            (F.max("l_suppkey") - F.min("l_suppkey")).cast("bigint")
            .alias("supp_span"),
        )
        .orderBy("bucket")
    )
