"""Pin the scaling harness's shard-tagging invariants (r10).

The SURVEY §6 scaling exponents are only meaningful if the synthetic
N x dataset really is N disjoint same-shape shards: exact duplicates
across shards would measure duplication blow-up, key collisions would
merge shards. These tests build a tiny factor-3 dataset from sf0.001
with pyarrow/pandas only (no Spark session) and check the invariants
the tool's docstring claims.
"""

import importlib
import json
import os
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale3x"))
    os.environ["SPARK_GRAFT_SF_DIR"] = SF
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import scaling_bench

    importlib.reload(scaling_bench)  # re-read SF_DIR from the env
    scaling_bench.build(out, 3)
    yield out
    os.environ.pop("SPARK_GRAFT_SF_DIR", None)
    importlib.reload(scaling_bench)


def test_row_counts_scale_exactly(built):
    for name in ("documents", "embeddings", "lineitem", "part"):
        src = pq.read_table(f"{SF}/{name}.parquet")
        out = pq.read_table(f"{built}/{name}.parquet")
        assert out.num_rows == 3 * src.num_rows, name
        assert out.schema == src.schema, name


def test_keys_never_collide_across_shards(built):
    for name, key in (("documents", "doc_id"), ("embeddings", "vec_id"),
                      ("part", "p_partkey")):
        col = pq.read_table(f"{built}/{name}.parquet").column(key).to_pylist()
        assert len(set(col)) == len(col), f"{name}.{key} collides"


def test_document_texts_distinct_across_shards(built):
    d = pq.read_table(f"{built}/documents.parquet").to_pandas()
    # no exact duplicate text anywhere (plain replication would hand
    # every doc factor-1 exact twins and poison the dedup measurements)
    assert not d["text"].duplicated().any()
    # n_chars stays consistent with the tagged text
    assert (d["n_chars"] == d["text"].str.len()).all()


def test_embeddings_distinct_and_norm_preserving(built):
    d = pq.read_table(f"{built}/embeddings.parquet").to_pandas()
    vecs = [tuple(np.asarray(v, dtype=np.float32)) for v in d["embedding"]]
    assert len(set(vecs)) == len(vecs), "exact duplicate vectors across shards"
    base = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    n = len(base)
    for i in (1, 2):
        a = np.vstack([np.asarray(v, np.float64) for v in base["embedding"]])
        b = np.vstack([np.asarray(v, np.float64) for v in d["embedding"][i * n:(i + 1) * n]])
        assert np.allclose(
            np.einsum("ij,ij->i", a, a), np.einsum("ij,ij->i", b, b), rtol=1e-6
        ), "rotation must preserve norms"


def test_part_block_keys_are_shard_disjoint(built):
    d = pq.read_table(f"{built}/part.parquet").to_pandas()
    n = len(d) // 3
    first_tok = d["p_name"].str.split(" ").str[0]
    shards = [set(first_tok[i * n:(i + 1) * n]) for i in range(3)]
    assert not (shards[0] & shards[1]) and not (shards[0] & shards[2]) and not (
        shards[1] & shards[2]
    ), "ER block keys shared across shards would grow blocks instead of adding them"


def test_build_refuses_embedding_factor_past_both_periods(tmp_path):
    os.environ["SPARK_GRAFT_SF_DIR"] = SF
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import scaling_bench

    importlib.reload(scaling_bench)
    scaling_bench.TABLES = ("embeddings",)
    try:
        with pytest.raises(AssertionError, match="factor 128"):
            scaling_bench.build(str(tmp_path / "never"), 129)
    finally:
        os.environ.pop("SPARK_GRAFT_SF_DIR", None)
        importlib.reload(scaling_bench)


def test_embeddings_negation_period_distinct_and_norm_preserving(tmp_path):
    # factor 66 spans the roll->negation boundary: shard 64 re-uses
    # roll shift 0 and shard 65 re-uses shift 1, both distinct from
    # shards 0/1 only through the global negation
    os.environ["SPARK_GRAFT_SF_DIR"] = SF
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import scaling_bench

    importlib.reload(scaling_bench)
    scaling_bench.TABLES = ("embeddings",)
    out = str(tmp_path / "scale66x")
    try:
        scaling_bench.build(out, 66)  # build's own uniqueness assert runs
    finally:
        os.environ.pop("SPARK_GRAFT_SF_DIR", None)
        importlib.reload(scaling_bench)
    d = pq.read_table(f"{out}/embeddings.parquet").to_pandas()
    base = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    n = len(base)
    assert len(d) == 66 * n
    a = np.vstack([np.asarray(v, np.float32) for v in base["embedding"]])
    s64 = np.vstack([np.asarray(v, np.float32) for v in d["embedding"][64 * n:65 * n]])
    # shard 64 = global negation of the base (roll shift 64 % 64 == 0)
    assert np.array_equal(s64, -a)
    vecs = {np.asarray(v, np.float32).tobytes() for v in d["embedding"]}
    assert len(vecs) == 66 * n


def test_freshness_queue_is_total_and_oldest_first():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import freshness

    q = freshness.freshness_queue()
    rounds = [r for _, r in q]
    assert rounds == sorted(rounds), "queue must be oldest-first"
    from labelspark_spark import queries as Q

    # attested ∪ current-window == registry (nothing orphaned)
    names = {n for n, _ in q} | set(list(Q.REGISTRY)[:50])
    assert names == set(Q.REGISTRY)
    json.dumps(q)  # the CLI contract: serializable


def test_run_mode_end_to_end_mini(built, spark, capsys):
    # VERDICT r10 item 5: the §6 curves are load-bearing evidence, so
    # one cheap END-TO-END run() per round guards the measurement path
    # itself (build -> registry resolve -> timed 1x/Nx -> JSON), not
    # just the tagging invariants above. One query per measured family
    # group that lives entirely in the tables build() ships: exact
    # dedup (hash-groupBy), banded simhash (posting join), broadcast
    # exact top-k (embeddings). passes=1: this guards breakage, not
    # the exponents — the real measurements stay in tools/ runs.
    #
    # Re-pin the module's SF_DIR to the base the factor-3 dir was
    # built from: earlier tests in this file pop SPARK_GRAFT_SF_DIR
    # and reload scaling_bench in their cleanup, which resets SF_DIR
    # to the sf0.1 default — running after them, the 1x leg would
    # silently time a 33x-bigger base against the tiny 3x build
    # (order-dependent and meaningless; caught by r11 code review).
    os.environ["SPARK_GRAFT_SF_DIR"] = SF
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import scaling_bench

    importlib.reload(scaling_bench)
    try:
        scaling_bench.run(
            built, ["dedup_exact", "dedup_simhash", "similarity_topk"],
            factor=3, passes=1, spark=spark,
        )
    finally:
        os.environ.pop("SPARK_GRAFT_SF_DIR", None)
        importlib.reload(scaling_bench)
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    payload = json.loads(out[-1])
    assert payload["mode"] == "scaling" and payload["factor"] == 3
    assert payload["sf_1x"] == SF, "1x leg must time the build's own base"
    for name in ("dedup_exact", "dedup_simhash", "similarity_topk"):
        r = payload["results"][name]
        assert r["t_1x_sec"] > 0 and r["t_3x_sec"] > 0
        assert "exponent" in r and "ratio" in r
    # the injected session must survive (run() only stops its own)
    assert spark.range(1).count() == 1


def test_stream_scale_mode_end_to_end_mini(spark, capsys):
    # stream_scale's four state-count hypotheses (keyed state grows
    # with KEYS and only keys; window state is row-volume-immune and
    # watermark-evicted over a long horizon) are asserted INSIDE the
    # tool; this guards the measurement path itself (two-shape dir
    # build -> multi-batch file-source replay -> statestore read-back
    # -> JSON) at a toy factor, same pattern as the run-mode mini-run.
    os.environ["SPARK_GRAFT_SF_DIR"] = SF
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import scaling_bench

    importlib.reload(scaling_bench)
    try:
        scaling_bench.stream_scale(2, 1, spark=spark)
    finally:
        os.environ.pop("SPARK_GRAFT_SF_DIR", None)
        importlib.reload(scaling_bench)
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    payload = json.loads(out[-1])
    assert payload["mode"] == "stream_scale" and payload["factor"] == 2
    s = payload["results"]["sessions"]
    assert s["2x_keys"]["state_rows"] == 2 * s["1x"]["state_rows"]
    assert s["2x_depth"]["state_rows"] == s["1x"]["state_rows"]
    assert payload["results"]["window_agg"]["1x"]["state_rows"] > 0
    # the injected session must survive (the tool only stops its own)
    assert spark.range(1).count() == 1
