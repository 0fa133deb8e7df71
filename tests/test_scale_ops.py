"""Scale-posture operators: salted skew joins equal plain joins,
bucketed tables join without an exchange, stateful streaming operator
maintains keyed state."""

from __future__ import annotations

import pyspark.sql.functions as F

from labelspark_spark.operators import skew
from labelspark_spark.plans import explain
from labelspark_spark.sources import read_table
from labelspark_spark.sources.writers import write_bucketed

from .conftest import SF_SMOKE


def test_salted_join_matches_plain_join(spark):
    li = read_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    p = read_table(spark, SF_SMOKE, "part").select("p_partkey", "p_brand")
    plain = li.join(p.withColumnRenamed("p_partkey", "l_partkey"), ["l_partkey"])
    salted = skew.salted_join(
        li, p.withColumnRenamed("p_partkey", "l_partkey"), on=["l_partkey"], buckets=4
    )
    assert plain.count() == salted.count()
    key = lambda df: df.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")
    )
    diff = key(plain).exceptAll(key(salted))
    assert diff.count() == 0


def test_salted_join_spreads_hot_key(spark):
    # one hot key: every lineitem row -> same part
    li = read_table(spark, SF_SMOKE, "lineitem").withColumn("k", F.lit(1))
    dim = spark.createDataFrame([(1, "hot")], ["k", "name"])
    out = skew.salted_join(li, dim, on=["k"], buckets=8)
    assert out.count() == li.count()
    # the salted shuffle key must appear in the pre-drop plan: the join
    # is on (k, _salt), so 8 distinct shuffle keys exist instead of 1
    salts = (
        li.withColumn("_salt", skew._salt_expr(["l_orderkey", "l_quantity"], 8))
        .select("_salt").distinct().count()
    )
    assert salts == 8


def test_salted_group_count_matches_plain(spark):
    e = read_table(spark, SF_SMOKE, "events")
    plain = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    salted = skew.salted_group_count(e, ["event_type"], buckets=4)
    assert {(r.event_type, r.n) for r in plain.collect()} == {
        (r.event_type, r.n) for r in salted.collect()
    }


def test_bucketed_join_has_no_exchange(spark):
    li = read_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    o = read_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", ["l_orderkey"], num_buckets=8)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_b", ["l_orderkey"], num_buckets=8
    )
    joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
    # disable broadcast so the co-location is what saves the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n_shuffles = explain.count_shuffles(joined)
        assert n_shuffles == 0, f"bucketed join still shuffles: {n_shuffles}"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_stateful_user_session_stats(spark, tmp_path):
    import shutil

    from labelspark_spark.streaming import events as se
    from labelspark_spark.streaming.stateful import user_session_stats

    d = tmp_path / "stream_src"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "part-0.parquet")

    from labelspark_spark.queries import _normalize_ts

    stream = _normalize_ts(se.read_events_stream(spark, str(d)))
    # NoTimeout mode: bounded replay must quiesce (with processing-time
    # timeouts the engine schedules cleanup batches forever and
    # processAllAvailable never returns — see user_session_stats docstring)
    out = user_session_stats(stream, idle_timeout_ms=None)
    q = out.writeStream.format("memory").queryName("user_stats").outputMode("update").start()
    try:
        q.processAllAvailable()
        got = {r.user_id: r for r in spark.sql("SELECT * FROM user_stats").collect()}
        batch = (
            read_table(spark, SF_SMOKE, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        )
        expect = {r.user_id: r for r in batch.collect()}
        assert set(got) == set(expect)
        for uid, r in got.items():
            assert r.n_events == expect[uid].n
            assert abs(r.sum_value - expect[uid].s) < 1e-6
            assert r.status == "active"
    finally:
        q.stop()


def test_embedding_lsh_dedup_at_10x_scale(spark):
    """Scale-up smoke: 10 shifted copies of the embeddings corpus (10x
    rows, 100x potential pairs). The blocked plan must (a) stay
    cartesian-free, (b) complete, and (c) find every within-copy pair
    10x — near-linear candidate growth, where an unblocked all-pairs
    approach would grow 100x."""
    from labelspark_spark.operators.dedup import embedding_dup_pairs_lsh

    emb = read_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    scaled = emb
    for i in range(1, 10):
        # id-shifted copies; identical vectors, so each copy contributes
        # the same within-copy duplicate pairs
        scaled = scaled.union(
            emb.select((F.col("vec_id") + i * 10 * n).alias("vec_id"), "embedding")
        )
    base_pairs = embedding_dup_pairs_lsh(
        emb, "embedding", "vec_id", threshold=0.4, num_planes=3, num_tables=10
    ).count()
    big = embedding_dup_pairs_lsh(
        scaled, "embedding", "vec_id", threshold=0.4, num_planes=3, num_tables=10
    )
    plan = explain.formatted_plan(big)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    got = big.count()
    # every within-copy pair appears per copy, plus cross-copy pairs of
    # identical-by-construction vectors; the within-copy floor is exact
    assert got >= 10 * base_pairs, (got, base_pairs)


def test_spread_to_parallelism_gating(spark):
    # r13 optimization: the spread is scale-adaptive by construction —
    # an under-parallel input (the single-row-group sf parquet scans as
    # ONE task) is round-robined to defaultParallelism with the row
    # multiset unchanged; an input already at/above defaultParallelism
    # passes through UNTOUCHED (same object, no extra exchange), which
    # is the 100 TB no-op guarantee.
    from labelspark_spark.sources.readers import spread_to_parallelism

    par = spark.sparkContext.defaultParallelism
    li = read_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    assert li.rdd.getNumPartitions() < par, "fixture no longer under-parallel"
    spread = spread_to_parallelism(li)
    assert spread.rdd.getNumPartitions() == par
    assert sorted(map(tuple, spread.collect())) == sorted(map(tuple, li.collect()))

    wide = li.repartition(par)
    assert spread_to_parallelism(wide) is wide


def test_write_bucketed_one_file_per_bucket(spark):
    # r13 optimization: the pre-write repartition on the bucket key
    # must yield exactly ONE data file per bucket (n_tasks x n_buckets
    # small files before; >1 file/bucket also voids the per-bucket
    # sort property downstream scans rely on).
    import os

    li = read_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(li, "li_onefile", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"])
    try:
        loc = (
            spark.sql("DESCRIBE FORMATTED li_onefile")
            .filter("col_name = 'Location'")
            .collect()[0][1]
        )
        path = loc.removeprefix("file:")
        data_files = [
            f for f in os.listdir(path) if not f.startswith(("_", "."))
        ]
        assert len(data_files) == 8, sorted(data_files)
    finally:
        spark.sql("DROP TABLE IF EXISTS li_onefile")
