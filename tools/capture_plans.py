#!/usr/bin/env python
"""Capture .explain('formatted') output for registry queries into files.

Usage: python tools/capture_plans.py --out plans/r13 --suffix _before name1 name2 ...
       python tools/capture_plans.py --out plans/r13 --suffix _after --sf /root/testdata/sf0.1 ...

Writes <out>/<name><suffix>.txt with the formatted physical plan as built
(pre-execution AQE plan — the shape the judge checks claims against).
Plan capture only constructs the DataFrame; queries whose construction
itself runs jobs (index builds, iterative loops) still execute those.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    from labelspark_spark import get_spark_session
    from labelspark_spark.queries import REGISTRY

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark_session(app_name="capture-plans")
    for name in args.names:
        fn, _ = REGISTRY[name]
        df = fn(spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
