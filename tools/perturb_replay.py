#!/usr/bin/env python
"""Determinism under plan perturbation — the correctness class the
DuckDB oracle cannot see (VERDICT r12 item 2).

The per-round oracle gate proves Spark-vs-DuckDB value agreement at ONE
physical configuration (local[8], shuffle.partitions=8, AQE on, the
driver's testdata file layout). A query can pass that gate and still be
partition-order-dependent: `F.first` without an ordering, rand(seed)
feeding a VALUE (per-partition streams move when the partitioning
does), float SUM exposed at full precision (partial-agg association
changes with the shuffle), ties broken by arrival order. The engine's
determinism doctrine (SURVEY §2.9) excludes such shapes by
CONSTRUCTION; this tool MEASURES the doctrine: replay the full registry
under perturbed physics and assert every query's driver-style value
hash is bit-identical across configurations.

    python tools/perturb_replay.py [sf_dir] [--names a,b,...] [--out f]

Three passes over every registry query (rows-only/approximate ones
included — self-consistency across physics is exactly what their
declared-approximate status still promises):

  baseline       shuffle.partitions=8, AQE on     — driver parity
  replan         shuffle.partitions=4, AQE OFF    — different shuffle
                 fan-in, no runtime coalescing/skew-splitting
  reinput        shuffle.partitions=32, AQE on, every input table
                 rewritten via round-robin repartition(7) — different
                 file count, file order, and row placement at the scan

The hash is the oracle replica's order-insensitive, type-sensitive
rowset (tests/oracle_util.rowset) digested with sha256, so a mismatch
here is exactly a mismatch the round driver would see between two of
its own runs. Exceptions hash as their exception text: a query that
CRASHES only under some physics is also a finding.

Caveats (documented, not hidden): streaming replays scope their own
shuffle.partitions via queries._replay_conf, so for them the replan
pass perturbs only AQE + the input side; and the reinput rewrite
normalizes events.ts TIMESTAMP(NANOS) to bigint nanos (read under
nanosAsLong), which queries._normalize_ts already branches on — same
values, same downstream semantics.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from oracle_util import TABLES, rowset  # noqa: E402

PASSES = [
    ("baseline", {"spark.sql.shuffle.partitions": "8",
                  "spark.sql.adaptive.enabled": "true"}, False),
    ("replan", {"spark.sql.shuffle.partitions": "4",
                "spark.sql.adaptive.enabled": "false"}, False),
    ("reinput", {"spark.sql.shuffle.partitions": "32",
                 "spark.sql.adaptive.enabled": "true"}, True),
]


def digest(pdf) -> str:
    """Stable sha256 of the driver-replica rowset (order-insensitive
    multiset of rows, columns sorted by name, type-tagged values)."""
    cols = list(pdf.columns)
    rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    fs = rowset(cols, rows)
    body = "\n".join(sorted(repr(item) for item in fs))
    head = ",".join(sorted(cols)) + f"|{len(rows)}|"
    return hashlib.sha256((head + body).encode()).hexdigest()


def build_perturbed_input(spark, sf_dir: str, out_dir: str) -> None:
    """Round-robin repartition(7) rewrite of every table: different
    file count, different row placement, same rows.

    `events.parquet` is rewritten with PYARROW instead: the streaming
    replays stage it with a plain file copy (a directory raises
    IsADirectoryError) and its physical timestamp type must survive
    byte-exact (TIMESTAMP(NANOS) in some driver builds — a Spark
    rewrite under nanosAsLong would silently retype it to bigint). The
    single output file carries the rows in 7 interleaved strides
    concatenated in reverse: row order and row-group boundaries
    perturbed, layout and schema contracts preserved."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from labelspark_spark.sources import read_table

    for t in TABLES:
        dest = os.path.join(out_dir, f"{t}.parquet")
        if t == "events":
            src = _pq.read_table(os.path.join(sf_dir, "events.parquet"))
            strides = [src.take(list(range(i, src.num_rows, 7)))
                       for i in range(7)]
            _pq.write_table(
                _pa.concat_tables(reversed(strides)), dest,
                row_group_size=max(1, src.num_rows // 5),
            )
            continue
        (read_table(spark, sf_dir, t)
         .repartition(7)
         .write.mode("overwrite")
         .parquet(dest))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names_arg = None
    out_path = os.path.join(REPO, "PERTURB.json")
    for i, a in enumerate(sys.argv):
        if a == "--names":
            names_arg = sys.argv[i + 1].split(",")
        if a == "--out":
            out_path = sys.argv[i + 1]

    from pyspark.sql import SparkSession

    # plain driver-parity session (NOT the session factory): the gate
    # this tool extends is the driver's, and factory-only configs are
    # themselves a bug class the verify recipe warns about
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())

    from labelspark_spark.queries import REGISTRY

    names = names_arg or list(REGISTRY)
    perturb_dir = tempfile.mkdtemp(prefix="sfperturb_")
    build_perturbed_input(spark, sf_dir, perturb_dir)

    results: dict[str, dict[str, str]] = {n: {} for n in names}
    timings: dict[str, float] = {}
    try:
        for pass_name, confs, use_perturbed in PASSES:
            for k, v in confs.items():
                spark.conf.set(k, v)
            in_dir = perturb_dir if use_perturbed else sf_dir
            t0 = time.time()
            for n in names:
                fn = REGISTRY[n][0]
                try:
                    results[n][pass_name] = digest(fn(spark, in_dir).toPandas())
                except Exception as e:  # a physics-dependent crash is a finding
                    results[n][pass_name] = f"EXC {type(e).__name__}: {e}"[:200]
            timings[pass_name] = round(time.time() - t0, 1)
            print(f"# pass {pass_name}: {timings[pass_name]}s", file=sys.stderr)
    finally:
        shutil.rmtree(perturb_dir, ignore_errors=True)

    mismatches = {
        n: h for n, h in results.items() if len(set(h.values())) > 1
    }
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(names),
        "passes": {p: c for p, c, _ in PASSES},
        "pass_sec": timings,
        "n_mismatches": len(mismatches),
        "mismatches": mismatches,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("sf_dir", "n_queries", "n_mismatches", "pass_sec")}))
    if mismatches:
        for n, h in mismatches.items():
            print(f"MISMATCH {n}: {h}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
