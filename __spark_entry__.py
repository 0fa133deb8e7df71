"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``labelspark_spark`` (see SURVEY.md §2.9 for
the declared-query contract; queries + oracles in
``labelspark_spark/queries.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from labelspark_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3-style 3-way join + agg + top-10) on
    /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q_q3_shipping_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.9."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for every hash-checkable query.

    Approximate operators (approx_distinct, dedup_minhash_lsh,
    similarity_lsh, similarity_ivf) are intentionally omitted ->
    driver records the weaker rows-only check; their recall/error
    bounds are asserted in tests/test_approx_recall.py and each has a
    hash-checked driver companion (hll_error_bound,
    dedup_minhash_recall, similarity_lsh_replay, similarity_ivf_recall).
    dedup_simhash is fully hash-checked as of r8 (deterministic
    pipeline + pigeonhole-exact banding).
    """
    return Q.oracle_sql()
