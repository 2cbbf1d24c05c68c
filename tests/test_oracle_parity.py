"""Local replica of the driver's correctness gate.

For every catalog query with an oracle: run the Spark plan and the DuckDB
SQL on the same parquet, compare row count, column names, and an
order-insensitive multiset of normalized values. Strictly at least as
strict as the driver's value-hash — if this passes, CORRECTNESS_r{N}
should too.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from house_price_etl_pipeline_spark.plans.catalog import REGISTRY, load_all

load_all()

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if not q.oracle)


def _normalize(pdf: pd.DataFrame) -> list[tuple]:
    """Columns sorted by name; every value → canonical python scalar."""
    pdf = pdf[sorted(pdf.columns)]

    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if pd.api.types.is_scalar(v) and pd.isna(v):
            return None
        if isinstance(v, float):
            # exact compare is the goal; round only to strip float32 noise
            return round(v, 9)
        if hasattr(v, "isoformat"):  # datetime/date/pd.Timestamp
            ts = v
            if getattr(ts, "tzinfo", None) is not None:
                ts = ts.tz_convert("UTC").tz_localize(None)
            return ts.isoformat()
        if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
            # The driver's canonicalizer CRASHES on unhashable cells
            # (pandas sort_values → `unhashable type: 'list'`), so
            # tolerating them here would make this gate weaker than the
            # driver's. Catalog queries must serialize complex values.
            raise AssertionError(
                f"non-scalar cell {type(v).__name__} in query output — "
                "the driver cannot hash this; serialize to CSV/JSON"
            )
        return v

    return sorted(
        (tuple(canon(v) for v in row) for row in pdf.itertuples(index=False)),
        key=lambda r: tuple(str(x) for x in r),
    )


def test_normalize_rejects_array_cells():
    """The gate itself must red-flag array-typed outputs (the driver's
    canonicalizer crashes on them) — guards the guard."""
    with pytest.raises(AssertionError, match="non-scalar cell"):
        _normalize(pd.DataFrame({"k": [1], "v": [[1, 2, 3]]}))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    duck_pdf = duck.execute(q.oracle).fetchdf()

    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    s_rows, d_rows = _normalize(spark_pdf), _normalize(duck_pdf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(name, spark, sf_dir):
    """Non-SQL-expressible ops at least run and return a stable schema."""
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert df.schema == q.fn(spark, sf_dir).schema
