#!/usr/bin/env python
"""One-shot sweep (VERDICT r13 item 2): run every catalog query at a
given SF and report the ones returning 0 rows — the class of bug where
a fixed threshold goes vacuous as the data grows and an empty result
trivially hash-matches an equally-empty oracle. Output: one JSON line
per empty (or failed) query + a summary; results recorded in
COVERAGE.md.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/empty_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from house_price_etl_pipeline_spark.plans import catalog
from house_price_etl_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="empty-sweep")
    registry = catalog.load_all()
    empty, failed = [], []
    for name in sorted(registry):
        try:
            n = registry[name].fn(spark, sf_dir).count()
        except Exception as exc:
            failed.append(name)
            print(json.dumps({"query": name, "error": repr(exc)[:200]}))
            continue
        if n == 0:
            empty.append(name)
            print(json.dumps({"query": name, "rows": 0}))
    print(json.dumps({
        "sf_dir": sf_dir, "n_queries": len(registry),
        "empty": empty, "failed": failed,
    }))


if __name__ == "__main__":
    main()
