"""Temporal join operators: as-of join and range (band) join.

Absent from the reference (SURVEY §2.12 lists every join flavor as a
missing category) and from Spark's built-in join menu — implemented here
as compositions of existing DataFrame ops (SURVEY §7 / the brief's
"custom operators" ladder, option (a)):

- **as-of join**: the union-marker + last_value window technique — both
  sides union into one keyed stream ordered by time, the right side's
  payload is carried forward with ``last(ignorenulls)`` over a running
  window, then left rows are filtered back out. ONE shuffle (on the key,
  same as a sort-merge join would pay) and no inequality join, so it
  scales exactly like a groupBy at 100 TB. Verified against DuckDB's
  native ``ASOF LEFT JOIN``.
- **range/band join**: mapping a continuous value to a small band
  dimension. The naive form is an inequality theta-join (nested-loop —
  fine only because the band side is tiny and broadcast); the scale form
  maps each row O(1) to its band id with a width_bucket expression and
  equi-joins — no inequality predicate anywhere in the plan. Both are
  registered; the oracle proves them identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..sources.tables import load_table


# --------------------------------------------------------------------------
# As-of join: each click event matched to the user's most recent
# prior-or-simultaneous purchase.
# --------------------------------------------------------------------------

def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              payload_cols: list[str],
              direction: str = "backward") -> DataFrame:
    """Generic as-of join. ``backward`` (default): left row ← latest
    right row with right.ts <= left.ts, per key. ``forward``: left row
    ← earliest right row with right.ts >= left.ts. Returns every left
    column plus ``payload_cols`` from the matched right row (NULL when
    no match exists on that side).

    Implementation: union with a side marker — ONE shuffle on the key,
    never an inequality join. Backward: right rows sort before left at
    equal timestamps (ties match) and last_value(ignorenulls) over a
    preceding frame carries the payload forward. Forward is the mirror:
    left rows sort before right at equal timestamps and
    first_value(ignorenulls) over a following frame pulls the next
    payload back.

    The payload travels as ONE wrapped struct, non-null iff a right row
    exists: picking each payload column independently with ignorenulls
    would skip a genuinely-matched right row whose payload value is
    NULL (returning an older/newer row's value instead — diverging from
    true as-of / pandas merge_asof semantics) and could even mix
    columns from different right rows. The struct is atomic, so the
    matched row's payload arrives whole, NULL fields included.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    from pyspark.sql import types as T

    lcols = left.columns
    payload_t = T.StructType([right.schema[c] for c in payload_cols])
    l = left.select(
        F.lit(1).alias("_side"),
        *lcols,
        F.lit(None).cast(payload_t).alias("_r_payload"),
    )
    r = right.select(
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c != on and c != ts
          else F.col(c).alias(c) for c in lcols],
        F.struct(*payload_cols).alias("_r_payload"),
    )
    if direction == "backward":
        w = (Window.partitionBy(on).orderBy(F.col(ts), F.col("_side"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        pick = F.last
    else:
        w = (Window.partitionBy(on).orderBy(F.col(ts), F.col("_side").desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        pick = F.first
    carried = l.unionByName(r).select(
        "_side", *lcols,
        pick("_r_payload", ignorenulls=True).over(w).alias("_r_payload"),
    )
    return (
        carried.filter(F.col("_side") == 1)
        .select(*lcols, *[F.col(f"_r_payload.{c}").alias(f"asof_{c}")
                          for c in payload_cols])
    )


@register(
    "join_asof_last_purchase",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, MAX(value) AS pvalue
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.event_id,
           c.user_id,
           CAST(c.ts AS VARCHAR) AS click_ts,
           CAST(p.ts AS VARCHAR) AS purchase_ts,
           round(p.pvalue, 6) AS purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    ORDER BY c.event_id
    """,
)
def join_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join on the events table: every click annotated with the
    user's latest purchase at-or-before the click. Purchases are deduped
    to one row per (user, ts) first (MAX value) so tie resolution is
    deterministic in both engines."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts"))
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts").agg(F.max("value").alias("pvalue"))
        .select("user_id", "ts", F.col("ts").alias("pts"), "pvalue")
    )
    joined = asof_join(clicks, purchases, on="user_id", ts="ts",
                       payload_cols=["pts", "pvalue"])
    return (
        joined.select(
            "event_id", "user_id",
            F.col("ts").cast("string").alias("click_ts"),
            F.col("asof_pts").cast("string").alias("purchase_ts"),
            F.round("asof_pvalue", 6).alias("purchase_value"),
        )
        .orderBy("event_id")
    )


@register(
    "join_asof_next_purchase",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, MAX(value) AS pvalue
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.event_id,
           c.user_id,
           CAST(c.ts AS VARCHAR) AS click_ts,
           CAST(p.ts AS VARCHAR) AS purchase_ts,
           round(p.pvalue, 6) AS purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    ORDER BY c.event_id
    """,
)
def join_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: every click annotated with the user's NEXT
    purchase at-or-after the click — time-to-conversion attribution's
    building block. Same one-shuffle union+window machinery as the
    backward direction (asof_join(direction='forward')), mirrored: ties
    sort left-first so an equal-timestamp purchase matches."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts"))
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts").agg(F.max("value").alias("pvalue"))
        .select("user_id", "ts", F.col("ts").alias("pts"), "pvalue")
    )
    joined = asof_join(clicks, purchases, on="user_id", ts="ts",
                       payload_cols=["pts", "pvalue"], direction="forward")
    return (
        joined.select(
            "event_id", "user_id",
            F.col("ts").cast("string").alias("click_ts"),
            F.col("asof_pts").cast("string").alias("purchase_ts"),
            F.round("asof_pvalue", 6).alias("purchase_value"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Range (band) join: part retail prices mapped into price bands.
# --------------------------------------------------------------------------

BAND_WIDTH = 200.0
N_BANDS = 10  # bands [0,200), [200,400), ... [1800, inf)


def price_bands(spark: SparkSession) -> DataFrame:
    """Small band dimension (band_id, lo, hi); the last band is open-ended."""
    rows = [
        (b, b * BAND_WIDTH,
         float("inf") if b == N_BANDS - 1 else (b + 1) * BAND_WIDTH)
        for b in range(N_BANDS)
    ]
    return spark.createDataFrame(rows, "band_id int, lo double, hi double")


_BANDS_SQL = " UNION ALL ".join(
    f"SELECT {b} AS band_id, {b * BAND_WIDTH} AS lo, "
    + ("CAST('inf' AS DOUBLE)" if b == N_BANDS - 1 else str((b + 1) * BAND_WIDTH))
    + " AS hi"
    for b in range(N_BANDS)
)

_BAND_ORACLE = f"""
    WITH bands AS ({_BANDS_SQL})
    SELECT b.band_id, b.lo,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           round(CAST(SUM(CAST(p.p_retailprice AS DECIMAL(25,6))) AS DOUBLE), 2)
             AS sum_price
    FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band_id, b.lo ORDER BY b.band_id
    """


def join_range_band_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join, literal form: inequality predicates against the
    broadcast band table (BroadcastNestedLoopJoin — acceptable ONLY
    because the band side is ~10 rows; the plan shape to avoid on two
    large sides). NOT registered in the catalog: kept as the test-only
    contrast for join_range_band_bucketed
    (tests/test_plans.py::test_band_join_bucketed_form_is_equi_hash_join)
    so the catalog itself contains no BNLJ outside 1-row-side probes."""
    p = load_table(spark, sf_dir, "part")
    b = price_bands(spark)
    return (
        p.join(F.broadcast(b),
               (p.p_retailprice >= b.lo) & (p.p_retailprice < b.hi))
        .groupBy("band_id", "lo")
        .agg(F.count("*").alias("n_parts"),
             F.round(F.sum(F.col("p_retailprice").cast("decimal(25,6)"))
                     .cast("double"), 2).alias("sum_price"))
        .orderBy("band_id")
    )


@register("join_range_band_bucketed", oracle=_BAND_ORACLE)
def join_range_band_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join, scale form: each row maps O(1) to its band_id via
    width_bucket — the inequality disappears and the join is a broadcast
    EQUI-join (hash, codegen'd). Same result as the theta form by
    construction; this is the shape that survives two large sides
    (band id becomes a shuffle key)."""
    p = load_table(spark, sf_dir, "part")
    b = price_bands(spark)
    band_id = F.least(
        F.floor(F.col("p_retailprice") / BAND_WIDTH), F.lit(N_BANDS - 1)
    ).cast("int")
    return (
        p.withColumn("band_id", band_id)
        .join(F.broadcast(b), "band_id")
        .groupBy("band_id", "lo")
        .agg(F.count("*").alias("n_parts"),
             F.round(F.sum(F.col("p_retailprice").cast("decimal(25,6)"))
                     .cast("double"), 2).alias("sum_price"))
        .orderBy("band_id")
    )


# --------------------------------------------------------------------------
# Batch sessionization: gap-based session ids over the events table.
# --------------------------------------------------------------------------

SESSION_GAP_S = 1800  # 30-minute inactivity gap


@register(
    "events_sessionization",
    oracle=f"""
    WITH marks AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_S}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marks
    )
    SELECT user_id, CAST(session_no AS INTEGER) AS session_no,
           CAST(MIN(ts) AS VARCHAR) AS session_start,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_s,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, session_no
    ORDER BY user_id, session_no
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (the batch twin of streaming session windows):
    a new session starts after a >30-min gap; session id = running count
    of session-starts. ONE shuffle on user_id serves both windows (mark +
    running sum share the partition/order spec) and the session rollup —
    the canonical clickstream/session-feature shape at any scale.
    Deterministic under timestamp ties via the (ts, event_id) order."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    sess_no = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        e.withColumn("session_no", sess_no.cast("int"))
        .groupBy("user_id", "session_no")
        .agg(F.min("ts").cast("string").alias("session_start"),
             (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
             .cast("long").alias("duration_s"),
             F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
             .alias("sum_value"))
        .orderBy("user_id", "session_no")
    )


@register(
    "events_session_window_builtin",
    oracle=f"""
    WITH marks AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts >= lag(ts) OVER w
                               + INTERVAL {SESSION_GAP_S} SECOND
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marks
    )
    SELECT user_id,
           CAST(MIN(ts) AS VARCHAR) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
)
def events_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's BUILT-IN batch ``session_window`` (gap-merged windows in
    the aggregation itself — no lag/running-sum decomposition), checked
    against the classic window-function rewrite in the oracle: both
    merge events whose exact-microsecond gap is STRICTLY under the
    30-minute gap (an event at exactly prev+gap lands on the previous
    window's exclusive end and opens a new session — the oracle's
    ``ts >= lag(ts) + INTERVAL`` comparison is µs-exact for the same
    boundary; a second-truncated date_diff would merge gaps in
    [1800 s, 1801 s), review r9). One shuffle on (user_id, session
    merge), same as the manual form — the built-in just moves the
    merge into the agg operator."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_S} seconds"),
            "user_id")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
             .alias("sum_value"))
        .select("user_id",
                F.col("session_window.start").cast("string")
                .alias("session_start"),
                "n_events", "sum_value")
        .orderBy("user_id", "session_start")
    )


SESS_GAP_H = 6    # idle gap that closes a session
SESS_CAP_H = 24   # hard cap on session duration from its first event


@register(
    "sessionize_capped_duration",
    oracle=f"""
    WITH RECURSIVE ordered AS (
      SELECT user_id, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    walk AS (
      SELECT user_id, ts, rn, 1 AS session_no, ts AS session_start
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.ts, o.rn,
             CASE WHEN o.ts - w.ts >= INTERVAL {SESS_GAP_H} HOUR
                       OR o.ts - w.session_start >= INTERVAL {SESS_CAP_H} HOUR
                  THEN w.session_no + 1 ELSE w.session_no END,
             CASE WHEN o.ts - w.ts >= INTERVAL {SESS_GAP_H} HOUR
                       OR o.ts - w.session_start >= INTERVAL {SESS_CAP_H} HOUR
                  THEN o.ts ELSE w.session_start END
      FROM ordered o JOIN walk w
        ON o.user_id = w.user_id AND o.rn = w.rn + 1
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(ts) AS VARCHAR) AS start_ts,
           CAST(MAX(ts) AS VARCHAR) AS end_ts
    FROM walk GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def sessionize_capped_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-CAPPED sessionization: a session closes on an idle gap
    (SESS_GAP_H) **or** when it has lasted SESS_CAP_H from its first
    event. The cap makes the recurrence genuinely sequential — each
    row's session depends on the running session START, which depends
    on every earlier split — so no window/lag rewrite exists (the
    gap-only variant has one: events_sessionization). This is the
    operator-ladder case (b): a grouped ``applyInPandas`` kernel walks
    each user's timeline once; groups are Arrow-batched, the single
    shuffle is the user_id grouping, and the per-group walk is O(n) —
    the same cost as the window rewrite would be. The DuckDB oracle
    states the identical recurrence as a recursive CTE (row-at-a-time
    per user), so the driver value-hash covers the Python kernel.

    The grouping key is a HASH BUCKET of user_id, not user_id itself
    (the round-2 cogroup lesson: per-group Python invocations carry
    ~13 ms of fixed Arrow/pandas overhead, so keying on raw user_id
    costs O(users) calls — 28 s at sf0.1; bucketing caps calls at
    COGROUP_BUCKETS and the kernel walks each user inside one call)."""
    import pandas as pd

    from ..functions.udafs import COGROUP_BUCKETS

    ev = load_table(spark, sf_dir, "events")
    # pandas datetime64 astype(int64) yields NANOSECONDS
    gap_ns = SESS_GAP_H * 3_600_000_000_000
    cap_ns = SESS_CAP_H * 3_600_000_000_000

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        # ONE flat pass + ONE pandas aggregation per bucket call: a
        # per-user groupby/agg/concat inside the kernel costs ~10 ms of
        # pandas overhead per user (measured 19 s at sf0.1); the flat
        # numpy walk + single agg is ~1 s for the same rows.
        import numpy as np

        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        u = pdf["user_id"].to_numpy()
        t = pdf["ts"].astype("int64").to_numpy()  # ns since epoch
        sess = np.empty(len(t), dtype=np.int64)
        cur_u = no = start = prev = None
        for i in range(len(t)):
            if u[i] != cur_u:
                cur_u, no, start, prev = u[i], 0, None, None
            x = t[i]
            if prev is None or x - prev >= gap_ns or x - start >= cap_ns:
                no += 1
                start = x
            sess[i] = no
            prev = x
        return (pdf.assign(session_no=sess)
                .groupby(["user_id", "session_no"], as_index=False)
                .agg(n_events=("ts", "size"), start_ts=("ts", "min"),
                     end_ts=("ts", "max"))
                [["user_id", "session_no", "n_events",
                  "start_ts", "end_ts"]])

    return (
        ev.select("user_id", "ts", "event_id",
                  F.pmod(F.col("user_id"), F.lit(COGROUP_BUCKETS)).alias("sbucket"))
        .groupBy("sbucket")
        .applyInPandas(
            walk,
            schema="user_id long, session_no long, n_events long, "
                   "start_ts timestamp, end_ts timestamp")
        .select("user_id", "session_no", "n_events",
                F.col("start_ts").cast("string").alias("start_ts"),
                F.col("end_ts").cast("string").alias("end_ts"))
        .orderBy("user_id", "session_no")
    )
