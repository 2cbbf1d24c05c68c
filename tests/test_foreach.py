"""foreachBatch upsert sink: idempotent replay + versioned-pointer
crash safety (streaming/foreach.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from house_price_etl_pipeline_spark.sources.pydatasource import (
    read_synthetic_events,
)
from house_price_etl_pipeline_spark.streaming.foreach import (
    _load_pointer,
    upsert_batch,
)


def _state(spark, root):
    ptr = _load_pointer(str(root))
    return sorted(
        map(tuple,
            spark.read.parquet(f"{root}/v{ptr['version']}")
            .select("user_id", "n_events", "last_event_id", "last_value")
            .collect())
    )


def test_replayed_batch_is_a_no_op(spark, tmp_path):
    """Re-delivering an applied batch id must not double-count: the
    journal makes the at-least-once foreachBatch contract exactly-once."""
    root = str(tmp_path / "state")
    ev = read_synthetic_events(spark, rows=1000, partitions=2)
    b0 = ev.filter(F.col("event_id") < 500)
    b1 = ev.filter(F.col("event_id") >= 500)

    upsert_batch(root, b0, 0)
    upsert_batch(root, b1, 1)
    want = _state(spark, root)

    upsert_batch(root, b1, 1)  # replay
    upsert_batch(root, b0, 0)  # late replay of an older batch
    assert _state(spark, root) == want
    assert _load_pointer(root)["applied"] == [0, 1]


def test_incremental_merge_equals_one_shot(spark, tmp_path):
    """Two-batch incremental state == the single-batch state over the
    concatenated input (merge associativity — the property that lets the
    snapshot be maintained instead of recomputed). Fresh load() per
    query — the pushdown-on contract (pushFilters docstring); a real
    stream delivers each micro-batch as its own fresh frame anyway."""
    def ev():
        return read_synthetic_events(spark, rows=1000, partitions=2)

    root_inc = str(tmp_path / "inc")
    upsert_batch(root_inc, ev().filter(F.col("event_id") < 300), 0)
    upsert_batch(root_inc, ev().filter(F.col("event_id") >= 300), 1)

    root_one = str(tmp_path / "one")
    upsert_batch(root_one, ev(), 0)

    assert _state(spark, root_inc) == _state(spark, root_one)
