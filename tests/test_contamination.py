"""Benchmark decontamination: n-gram overlap flagging and the anti-join
survivor set (operators/contamination.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from labelspark_spark.operators import contamination as ct
from labelspark_spark.sources import read_table

from .conftest import SF_SMOKE


def _fixtures(spark):
    bench = spark.createDataFrame(
        [(100, "the secret benchmark passphrase is right here")],
        "doc_id int, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "training doc quoting the secret benchmark passphrase is right here verbatim"),
            (2, "a completely unrelated clean document about spark joins"),
            (3, None),
        ],
        "doc_id int, text string",
    )
    return bench, docs


def test_contamination_hits_flags_overlap_only(spark):
    bench, docs = _fixtures(spark)
    hits = {r.doc_id: r.n_hits for r in ct.contamination_hits(docs, bench).collect()}
    assert set(hits) == {1}, f"only the quoting doc should be flagged: {hits}"
    # "the secret benchmark", "secret benchmark passphrase",
    # "benchmark passphrase is", "passphrase is right", "is right here"
    assert hits[1] == 5


def test_decontaminate_keeps_clean_and_null_text(spark):
    bench, docs = _fixtures(spark)
    kept = {r.doc_id for r in ct.decontaminate(docs, bench).collect()}
    # null-text rows produce no shingles -> never flagged, never dropped
    assert kept == {2, 3}


def test_contamination_self_overlap_is_total(spark):
    docs = read_table(spark, SF_SMOKE, "documents").filter(F.col("text").isNotNull()).limit(20)
    hits = ct.contamination_hits(docs, docs).count()
    assert hits == 20, "every doc shares all its shingles with itself"


def test_contamination_plan_is_blocked_join(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    plan = (
        ct.contamination_hits(train, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
