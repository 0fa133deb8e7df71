#!/usr/bin/env python
"""Time individual registry queries at a given sf dir (default sf0.1).

Usage: python tools/qtime.py name1 name2 ...  [--passes N]
Prints cold + per-pass warm timings per query. Builder-side iteration
tool only — the official numbers come from bench.py's 3-pass min.
"""
from __future__ import annotations

import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()
    passes = max(1, args.passes)
    from labelspark_spark import get_spark_session
    from labelspark_spark.queries import REGISTRY

    spark = get_spark_session(app_name="qtime")
    spark.range(1).count()
    for name in args.names:
        fn, _ = REGISTRY[name]
        t0 = time.perf_counter()
        n = fn(spark, SF_DIR).count()
        print(f"{name}: cold {time.perf_counter() - t0:.3f}s ({n} rows)")
        best = None
        for p in range(passes):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            print(f"{name}: warm{p + 1} {dt:.3f}s")
        print(f"{name}: BEST {best:.3f}s")


if __name__ == "__main__":
    main()
