"""Benchmark decontamination: flag training documents sharing word
n-grams with an evaluation/benchmark corpus.

Not present in the reference engine — part of the large-scale
training-data pipeline surface this repo adds (SURVEY.md "beyond the
reference"). Semantics follow standard n-gram-overlap decontamination
for LLM training corpora: a training doc is contaminated when it shares
at least ``min_hits`` distinct word n-grams with any benchmark doc.

Scale shape: posting-list equi-join on 64-bit hashed shingles
(:func:`labelspark_spark.operators.dedup._hash_shingled` — same
normalize/tokenize/hash chain as the dedup family, so dedup and
decontamination share one shingle definition). The benchmark side is
reduced to DISTINCT shingle hashes first; benchmarks are small
(thousands of docs vs billions of training docs), so Catalyst
broadcasts that side and the training corpus NEVER shuffles. With an
unusually large benchmark the plan degrades gracefully to a shuffled
hash join on bigint keys — never all-pairs, never n^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from labelspark_spark.operators.dedup import _hash_shingled


def benchmark_shingles(
    benchmark: DataFrame, text_col: str = "text", n: int = 3, unit: str = "word"
) -> DataFrame:
    """Distinct hashed n-gram shingles of the benchmark corpus — the
    (small) probe set every training partition is checked against."""
    sh = _hash_shingled(benchmark, text_col, benchmark.columns[0], n, unit)
    return sh.select(F.explode("_sh").alias("_h")).distinct()


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    unit: str = "word",
) -> DataFrame:
    """Per-doc count of DISTINCT n-gram shingles shared with the
    benchmark. Returns (id_col, n_hits), n_hits >= 1 — clean docs don't
    appear (anti-join them downstream or use :func:`decontaminate`).

    The shingle arrays are per-doc distinct, so the left-semi join
    against the distinct benchmark set followed by a count is exactly
    |shingles(doc) & shingles(benchmark)| — no double counting.
    """
    posting = _hash_shingled(docs, text_col, id_col, n, unit).select(
        "_id", F.explode("_sh").alias("_h")
    )
    bench = benchmark_shingles(benchmark, text_col, n, unit)
    return (
        posting.join(bench, "_h", "left_semi")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(F.col("_id").alias(id_col), "n_hits")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    unit: str = "word",
    min_hits: int = 1,
) -> DataFrame:
    """Training corpus minus contaminated docs (>= ``min_hits`` shared
    n-grams). Anti-join on the id — the surviving rows keep every
    original column."""
    flagged = contamination_hits(docs, benchmark, text_col, id_col, n, unit).filter(
        F.col("n_hits") >= min_hits
    )
    return docs.join(flagged.select(id_col), id_col, "left_anti")
