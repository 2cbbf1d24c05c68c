"""Local replica of the driver's correctness gate.

For every catalog query with an oracle: run the Spark plan and the DuckDB
SQL on the same parquet, compare row count, column names, and an
order-insensitive multiset of normalized values. Strictly at least as
strict as the driver's value-hash — if this passes, CORRECTNESS_r{N}
should too.
"""

from __future__ import annotations

import math
import os

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


# Queries whose semantics are LEGITIMATELY empty at the gate SF — every
# addition needs a comment saying why. Round 9's review found three
# queries that had returned 0 rows at every SF and therefore trivially
# "hash-matched" an equally-empty oracle for eight rounds (dead
# predicates, commit 136562a); this gate keeps that class out.
EMPTY_OK: set[str] = set()


def _assert_parity(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    duck_pdf = duck.execute(q.oracle).fetchdf()

    assert len(spark_pdf) > 0 or name in EMPTY_OK, (
        f"{name}: 0 rows at the gate SF — an empty result trivially "
        f"'matches' an equally-empty oracle (dead predicate?); only "
        f"add to EMPTY_OK with a justification"
    )
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


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, duck, sf_dir):
    _assert_parity(name, spark, duck, sf_dir)


# --- rotating sf0.1 subset (VERDICT r5 item 8) -----------------------------
#
# The driver's gate has sampled the same fixed 50 queries since round 1,
# and the full local replica above runs at sf0.001 — a parity bug that
# only manifests at larger scale (plan changes from AQE/stats, overflow,
# skew-dependent paths) could hide in the unsampled set. Each round a
# DIFFERENT 20-query window of the catalog also runs at sf0.1; the round
# number is derived from the driver's committed BENCH_r{N} artifacts so
# the rotation advances exactly once per round. The window for the
# current round is recorded in COVERAGE.md.

_SF01_DIR = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
_ROTATION_WIDTH = 20


def _current_round() -> int:
    import glob
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [int(m.group(1))
              for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
              if (m := re.search(r"BENCH_r(\d+)\.json$", p))]
    return max(rounds, default=0) + 1


def sf01_rotation_window(round_no: int | None = None) -> list[str]:
    r = _current_round() if round_no is None else round_no
    start = (r * _ROTATION_WIDTH) % max(len(ORACLE_QUERIES), 1)
    return [ORACLE_QUERIES[(start + i) % len(ORACLE_QUERIES)]
            for i in range(min(_ROTATION_WIDTH, len(ORACLE_QUERIES)))]


@pytest.fixture(scope="session")
def duck01():
    import duckdb

    from house_price_etl_pipeline_spark.sources.tables import TABLE_NAMES

    if not os.path.isdir(_SF01_DIR):
        pytest.skip(f"{_SF01_DIR} not present")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * "
            f"FROM read_parquet('{_SF01_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sf01_rotation_window())
def test_oracle_parity_sf01_rotation(name, spark, duck01):
    _assert_parity(name, spark, duck01, _SF01_DIR)


# VERDICT r13 item 2: the window keys off max(BENCH_r*), so the
# driver's own artifact drop advances it AFTER the builder's close run
# — every round used to ship with its NEXT window untested (that's how
# dq_k_anonymity's sf0.1 vacuity shipped in r13). Run next round's
# window too, minus the overlap with the current one, so the advance
# can't fail after sign-off.
_NEXT_ONLY = [n for n in sf01_rotation_window(_current_round() + 1)
              if n not in set(sf01_rotation_window())]


@pytest.mark.parametrize("name", _NEXT_ONLY)
def test_oracle_parity_sf01_rotation_next_round(name, spark, duck01):
    _assert_parity(name, spark, duck01, _SF01_DIR)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(name, spark, sf_dir):
    """Non-SQL-expressible ops at least run, return rows (the same
    dead-predicate guard as the oracled set), and a stable schema."""
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    assert df.count() > 0 or name in EMPTY_OK, (
        f"{name}: 0 rows at the gate SF — dead predicate?")
    assert df.schema == q.fn(spark, sf_dir).schema


def test_bm25_null_text_matches_oracle(spark, tmp_path):
    """ADVICE r8: Spark's size(split(NULL)) is -1 (it would drag avgdl
    below the oracle's NULL-skipping AVG), so text_bm25_topk coalesces
    text to '' on BOTH sides. Prove parity holds on a corpus that DOES
    contain NULL text — the case the synthetic testdata never
    exercises."""
    import duckdb

    sf001 = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                           "/root/testdata/sf0.001")
    base = spark.read.parquet(os.path.join(sf001, "documents.parquet"))
    nulls = spark.createDataFrame(
        [(100001, None, "en", "synthetic", 0),
         (100002, None, "en", "synthetic", 0)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    corpus_dir = str(tmp_path / "null_corpus")
    base.unionByName(nulls).coalesce(1).write.parquet(
        os.path.join(corpus_dir, "documents.parquet"))

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{corpus_dir}/documents.parquet/*.parquet')")
        _assert_parity("text_bm25_topk", spark, con, corpus_dir)
    finally:
        con.close()
