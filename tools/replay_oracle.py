#!/usr/bin/env python
"""Full-registry oracle replay at an arbitrary scale factor.

The round driver hash-checks the declared queries against DuckDB at
ONE data scale (sf0.01). A query/oracle pair can agree there and still
hide a SIZE-dependent assumption — a top-k that happens to cover the
whole domain, a filter arm a smaller corpus never populates, a
threshold tuned to one SF's distribution (exactly the blind-spot class
the r13 mutation audit found at sf0.01: three outer joins that were
inner AT THAT DATA). Replaying the registry at a second and third
scale measures that residual:

    python tools/replay_oracle.py /root/testdata/sf0.001 [--out f]
    python tools/replay_oracle.py /root/testdata/sf0.1   [--out f]

Per query: hash-checked pairs run through the driver-replica compare
(tests/oracle_util.compare — column-sorted, type-tagged, order-
insensitive value hash); declared-approximate rows-only queries are
run-checked (they must still execute and return a well-formed frame at
every scale). Any exception is a failure. Exit 1 on any red.

Same plain driver-parity session as the verify recipe (local[8],
shuffle=8, UTC) — factory-only configs are themselves a bug class.

Row cap (NOT silent): the compare materializes both engines' results
in driver memory; a pair-level output that is modest at sf0.01 can be
tens of millions of rows at sf0.1 (dedup_char_ngram's 10.5M candidate
pairs killed the JVM on the first attempt). Queries whose output
exceeds ROW_CAP at the replayed scale are reported as
'skipped-too-large' with the observed count — they are NOT counted
green, and the skip list is part of the output.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

ROW_CAP = 2_000_000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/root/testdata/sf0.01"
    out_path = None
    names = None
    for i, a in enumerate(sys.argv):
        if a == "--out":
            out_path = sys.argv[i + 1]
        if a == "--names":
            names = sys.argv[i + 1].split(",")

    import duckdb
    from pyspark.sql import SparkSession

    from oracle_util import compare, register_views

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             # capacity, not semantics: the 1g default driver heap dies
             # executing the pair-heavy queries at sf0.1 (the sweep
             # precedent runs them on the factory's 20g); every
             # SQL-semantics conf stays at driver parity
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .getOrCreate())
    con = duckdb.connect()
    register_views(con, sf_dir)

    from labelspark_spark.queries import REGISTRY

    t0 = time.time()
    green = rows_only = 0
    failures: dict[str, str] = {}
    skipped: dict[str, int] = {}
    for name in (names or list(REGISTRY)):
        fn, sql = REGISTRY[name]
        try:
            if sql is None:
                n = fn(spark, sf_dir).count()  # run-check: executes, has a schema
                assert n >= 0
                rows_only += 1
                status = f"rows-only ({n} rows)"
            else:
                df = fn(spark, sf_dir)
                n = df.count()
                if n > ROW_CAP:
                    skipped[name] = n
                    print(f"# {name}: skipped-too-large ({n} rows)",
                          file=sys.stderr)
                    continue
                r = compare(df, con, sql)
                if r["values_match"]:
                    green += 1
                    status = "green"
                else:
                    failures[name] = json.dumps(
                        {k: v for k, v in r.items() if k != "values_match"}
                    )[:300]
                    status = "HASH-MISMATCH"
        except Exception as e:
            failures[name] = f"EXC {type(e).__name__}: {e}"[:300]
            status = f"EXC {type(e).__name__}"
        if status != "green":
            print(f"# {name}: {status}", file=sys.stderr)

    out = {
        "sf_dir": sf_dir,
        "n_queries": len(names or REGISTRY),
        "n_green": green,
        "n_rows_only": rows_only,
        "n_skipped_too_large": len(skipped),
        "skipped_too_large": skipped,
        "n_failures": len(failures),
        "failures": failures,
        "elapsed_sec": round(time.time() - t0, 1),
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("sf_dir", "n_queries", "n_green", "n_rows_only",
                       "n_skipped_too_large", "n_failures", "elapsed_sec")}))
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
