#!/usr/bin/env python
"""Empirical scaling curves for the heavy query families (VERDICT r9
item 5): measure t(10x)/t(1x) on a synthetic 10x dataset and record the
observed scaling exponent, so the 100 TB claims rest on measurement,
not only plan shape.

The 10x dataset is TEN DISJOINT SHARDS of the sf0.1 tables — the honest
model of "10x more data at the same distribution" (what adding shards
to a 100 TB corpus does). Keys are offset per shard; content columns
that drive candidate generation (document text tokens, part names,
embedding vectors) are shard-TAGGED so cross-shard rows neither collide
nor become exact duplicates: plain replication would hand every doc 9
exact twins (quadratic candidate blow-up that says nothing about
scaling), while key-offset-only replication would multiply every
posting/block list by 10 (same problem). Shard tagging keeps per-shard
structure identical to sf0.1, which is exactly the TPC-style scale
model the sf dirs themselves use. NEVER writes to /root/testdata —
scaled data lands in a temp dir (or --out).

Usage:
  python tools/scaling_bench.py build  [--out DIR] [--factor 10]
  python tools/scaling_bench.py run    [--out DIR] [--queries a,b,c]
  python tools/scaling_bench.py probe  [--out DIR] [--factor 100]
                                            # persisted-index probe
                                            # latency: flat vs corpus
  python tools/scaling_bench.py triangles   # oriented-vs-census on a
                                            # skewed synthetic graph

Outputs one JSON line per mode on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_OUT = "/tmp/spark_graft_scale10x"
OFF = 10_000_000  # per-shard key offset

# The slowest audited bench lines whose 100 TB posture VERDICT r9 asks
# to back with measurement, mapped to the tables the scaled dir needs.
TARGETS = [
    "bpe_train_iters",
    "dedup_jaccard_prefix",
    "dedup_embedding_ivf",
    "dedup_canonicalize",
    "dedup_simhash",
    "dedup_winnowing",
    "knn_ivf_agreement",
    "er_score_pairs",
    "market_basket",
    "item_cooccur_cosine",
    "sssp_levels",
    "similarity_pq",
]
TABLES = ("documents", "embeddings", "lineitem", "part")


def _tag_words(text: str, tag: str) -> str:
    # suffix every token: per-shard vocabularies are disjoint, so
    # posting lists / BPE pair tables keep their sf0.1 lengths and the
    # shard contributes new rows, not wider lists
    return " ".join(w + tag for w in text.split(" "))


def build(out_dir: str, factor: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        src = pq.read_table(f"{SF_DIR}/{name}.parquet")
        base = src.to_pandas()
        parts = [src]
        if name == "embeddings":
            base_mat = np.vstack(
                [np.asarray(v, dtype=np.float32) for v in base["embedding"]]
            )
            # canonicalize -0.0 -> +0.0 before hashing (negated shards
            # can flip a zero's sign without changing the vector) and
            # accumulate per shard — never materialize the scaled
            # corpus as python floats just to check uniqueness
            seen = {row.tobytes() for row in base_mat + np.float32(0.0)}
            # base-corpus uniqueness is a PRECONDITION of the shard
            # check below, asserted separately so a duplicate-bearing
            # base table is blamed as such, not as a tagging bug
            assert len(seen) == len(base_mat), (
                f"base embeddings corpus already contains "
                f"{len(base_mat) - len(seen)} exact duplicate vectors; "
                "shard-tagging uniqueness cannot be checked on it"
            )
        for i in range(1, factor):
            d = base.copy()
            if name == "documents":
                d["doc_id"] = d["doc_id"] + i * OFF
                d["text"] = d["text"].map(lambda t, i=i: _tag_words(t, f"~{i}"))
                d["n_chars"] = d["text"].str.len()
            elif name == "embeddings":
                # two composed norm-preserving devices: cyclic roll
                # (period 64 — the roll is the IDENTITY at shift % 64
                # == 0) x global negation for the second period. Past
                # 128 both are exhausted -> refuse rather than
                # mismeasure; the post-build uniqueness assert below
                # backs the structural argument with a measurement.
                assert factor <= 128, (
                    "embeddings shard tagging (cyclic roll x negation) "
                    "only yields distinct vectors up to factor 128; "
                    "build embeddings at <= 128 or add a third "
                    "norm-preserving transform"
                )
                d["vec_id"] = d["vec_id"] + i * OFF
                # cyclic rotation (+ negation for shards 64..127):
                # norm-preserving, shard vectors are distinct but
                # identically distributed (negation flips every cosine's
                # sign against non-negated shards — fine for near-dup
                # measurement, which only blocks on high-cos pairs)
                sgn = np.float32(-1.0 if i >= 64 else 1.0)
                mat = np.roll(base_mat, i % 64, axis=1) * sgn
                for row in mat + np.float32(0.0):
                    seen.add(row.tobytes())
                d["embedding"] = mat.tolist()
            elif name == "lineitem":
                for k in ("l_orderkey", "l_partkey", "l_suppkey"):
                    d[k] = d[k] + i * OFF
            elif name == "part":
                d["p_partkey"] = d["p_partkey"] + i * OFF
                # tag the FIRST name token (the ER block key): blocks
                # stay sf0.1-sized, there are just 10x more of them
                d["p_name"] = d["p_name"].map(
                    lambda s, i=i: (lambda w: (w[0] + f"x{i}" + (" " + w[1] if len(w) > 1 else "")))(
                        s.split(" ", 1)
                    )
                )
            parts.append(pa.Table.from_pandas(d, schema=src.schema, preserve_index=False))
        full = pa.concat_tables(parts)
        if name == "embeddings":
            # measured (not just structural) distinctness: a roll- or
            # negation-invariant base vector would silently hand shards
            # exact twins and poison the dedup measurements
            assert len(seen) == full.num_rows, (
                f"shard tagging produced {full.num_rows - len(seen)} exact "
                "duplicate embedding vectors"
            )
        pq.write_table(full, f"{out_dir}/{name}.parquet")
    print(json.dumps({"built": out_dir, "factor": factor, "tables": list(TABLES)}))


def _session():
    from labelspark_spark import get_spark_session

    return get_spark_session(app_name="labelspark-scaling-bench")


def _ivf_kpropn(spark, sf_dir: str, k: int):
    """dedup_embedding_ivf under the SURVEY §6 deployment rule k ∝ n
    (bounded cell size). The registry query pins k=16 — correct at
    sf0.1, quadratic if shipped unchanged to a 10x/100x corpus because
    every k-means cell grows with the corpus and the in-cell verify is
    quadratic in cell size BY DESIGN (that is what blocking means).
    This variant is the same operator call with k scaled to the built
    factor, so the rule is measured, not asserted."""
    from labelspark_spark.operators import dedup as dd
    from labelspark_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    return dd.embedding_dup_pairs_ivf(
        emb, "embedding", "vec_id", threshold=0.4, k=k, nprobe=4
    )


def _resolve(name: str, factor: int):
    """(fn_1x, fn_scaled) for a query name; kpropn pseudo-queries scale
    a parameter with the factor instead of re-using the registry fn."""
    if name == "dedup_embedding_ivf_kpropn":
        return (
            lambda spark, d: _ivf_kpropn(spark, d, k=16),
            lambda spark, d: _ivf_kpropn(spark, d, k=16 * factor),
        )
    from labelspark_spark.queries import REGISTRY

    fn, _ = REGISTRY[name]
    return fn, fn


def _time_query(spark, fn, sf_dir: str, passes: int = 2) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def run(out_dir: str, queries: list[str], factor: int, passes: int = 2,
        spark=None) -> None:
    # `spark` injection exists for the pytest end-to-end mini-run
    # (tests/test_scaling_tool.py): the CLI path owns (and stops) its
    # session; a caller-provided session is left running
    own_session = spark is None
    if own_session:
        spark = _session()
        spark.range(1).count()
    results = {}
    for name in queries:
        fn_1x, fn_nx = _resolve(name, factor)
        t1 = _time_query(spark, fn_1x, SF_DIR, passes)
        tn = _time_query(spark, fn_nx, out_dir, passes)
        results[name] = {
            "t_1x_sec": t1,
            f"t_{factor}x_sec": tn,
            "ratio": round(tn / t1, 2),
            # observed exponent: t ~ n^e  =>  e = log_factor(ratio),
            # so the same family reports the same exponent whether
            # measured against a 10x or a 100x dir
            "exponent": round(float(np.log(tn / t1) / np.log(factor)), 2),
        }
        print(f"# {name}: 1x={t1}s {factor}x={tn}s ratio={results[name]['ratio']}", file=sys.stderr)
    print(json.dumps({"mode": "scaling", "factor": factor, "sf_1x": SF_DIR,
                      "dir_scaled": out_dir, "results": results}))
    if own_session:
        spark.stop()


def probe_flat(out_dir: str, factor: int, passes: int) -> None:
    """The SERVING-side IVF scale claim, measured: with the deployment
    rule applied to the index (cells k ∝ n, storage buckets ∝ n — both
    keep their per-unit size constant), the latency of PROBING a
    persisted index for a fixed query batch must stay ~flat as the
    corpus grows, because a probe touches nprobe cells of constant
    size, never the corpus. ivf_build cost (one corpus pass + one
    bucketed write) is reported separately — it's the amortized side.
    The registry's similarity_ivf_probe line re-BUILDS per call (the
    honest per-query cost at sf0.1), so the bench number can't show
    probe flatness; this mode exists for exactly that."""
    from pyspark.sql import functions as F

    from labelspark_spark.operators import similarity as sim
    from labelspark_spark.queries import _drop_managed_table
    from labelspark_spark.sources.readers import read_table

    spark = _session()
    spark.range(1).count()
    results = {}
    try:
        for label, d, fct in (("1x", SF_DIR, 1), (f"{factor}x", out_dir, factor)):
            emb = read_table(spark, d, "embeddings")
            t0 = time.perf_counter()
            cents = sim.kmeans_fit(emb, k=16 * fct, dim=64, max_iters=3)
            table = f"ivf_probe_flat_{label}"
            _drop_managed_table(spark, table)
            sim.ivf_build(emb, cents, table=table, num_buckets=32 * fct)
            t_build = round(time.perf_counter() - t0, 3)
            queries = emb.filter(F.col("vec_id") < 40).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            best, cold = float("inf"), None
            for _ in range(passes + 1):
                t0 = time.perf_counter()
                sim.ivf_probe(queries, cents, table=table, k=10, nprobe=4).count()
                dt = time.perf_counter() - t0
                cold = dt if cold is None else cold
                best = min(best, dt)
            results[label] = {
                "t_build_sec": t_build,
                "t_probe_cold_sec": round(cold, 3),
                "t_probe_warm_sec": round(best, 3),
            }
            print(f"# {label}: build={t_build}s probe cold={cold:.3f}s "
                  f"warm={best:.3f}s", file=sys.stderr)
        ratio = round(
            results[f"{factor}x"]["t_probe_warm_sec"] / results["1x"]["t_probe_warm_sec"], 2
        )
        print(json.dumps({"mode": "probe_flat", "factor": factor, "sf_1x": SF_DIR,
                          "dir_scaled": out_dir, "probe_warm_ratio": ratio,
                          "results": results}))
    finally:
        # disk hygiene: don't leave two persisted bucketed indexes
        # (corpus-sized at 100x) in the warehouse after the tool exits
        for label in ("1x", f"{factor}x"):
            _drop_managed_table(spark, f"ivf_probe_flat_{label}")
        spark.stop()


def _zipf_edges(n_nodes: int, n_edges: int, seed: int) -> "np.ndarray":
    """Skewed (Zipf-endpoint) undirected edge list, deduped, a<b.

    Node ids are RANDOMLY PERMUTED after sampling: zipf puts hubs at
    rank 1,2,3..., and a hub at id~0 is the one lucky placement for the
    id-ordered census (nearly all its edges point outward, so it never
    serves as the join's middle node). Real graphs don't hand hubs
    convenient ids; the permutation restores the adversarial case the
    degree orientation exists for. a=1.02 keeps the top hub at ~2% of
    samples so the census blows up measurably but finishes."""
    rng = np.random.default_rng(seed)
    a = rng.zipf(1.02, size=int(n_edges * 1.6)) % n_nodes
    b = rng.integers(0, n_nodes, size=a.size)
    perm = rng.permutation(n_nodes)
    a, b = perm[a], perm[b]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    keep = lo != hi
    e = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
    return e[:n_edges] if len(e) > n_edges else e


def triangles() -> None:
    """Oriented-vs-census triangle runtime on a HUB-SKEWED graph — the
    regime where the O(m^1.5) degree-orientation bound actually pays
    (the sf0.1 co-purchase graph is uniform-degree, so the bench shows
    census ~= oriented there; VERDICT r9 item 5 asks for the skewed
    demonstration). Census = the id-ordered two-join enumeration of
    q_triangle_count (queries.py); oriented = count_triangles_oriented.
    Also reports the closed-form wedge counts (the joins' intermediate
    row counts) for both orientations, which explain the gap."""
    from pyspark.sql import functions as F

    from labelspark_spark.queries import count_triangles_oriented

    spark = _session()
    spark.range(1).count()
    out = {"mode": "triangles", "graphs": {}}
    for label, n_nodes, n_edges in (
        ("small", 20_000, 100_000),
        ("10x", 200_000, 1_000_000),
        # the third decade-step is where the census's hub-square growth
        # becomes decisive rather than incremental (wedge table below)
        ("30x", 600_000, 3_000_000),
    ):
        e = _zipf_edges(n_nodes, n_edges, seed=7)
        df = spark.createDataFrame(
            [(int(a), int(b)) for a, b in e], "a bigint, b bigint"
        ).repartition(32).localCheckpoint()
        deg = (
            df.select(F.col("a").alias("p")).unionAll(df.select(F.col("b").alias("p")))
            .groupBy("p").agg(F.count(F.lit(1)).alias("d"))
        )
        # census intermediate rows: the a<b two-join pivots on the
        # MIDDLE node b, so its join row count is sum_b in(b)*out(b)
        # where in = neighbors below b, out = neighbors above
        inout = (
            df.groupBy(F.col("b").alias("p")).agg(F.count(F.lit(1)).alias("i"))
            .join(df.groupBy(F.col("a").alias("p")).agg(F.count(F.lit(1)).alias("o")), "p")
        )
        wedges_id = inout.select(F.sum(F.col("i") * F.col("o")).alias("w")).collect()[0].w
        ori = (
            df.join(deg.select(F.col("p").alias("a"), F.col("d").alias("da")), "a")
            .join(deg.select(F.col("p").alias("b"), F.col("d").alias("db")), "b")
            .select(
                F.when(
                    (F.col("da") < F.col("db"))
                    | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                    F.col("a"),
                ).otherwise(F.col("b")).alias("src")
            )
            .groupBy("src").agg(F.count(F.lit(1)).alias("o"))
        )
        wedges_deg = ori.select(F.sum(F.col("o") * (F.col("o") - 1) / 2).alias("w")).collect()[0].w

        def census(edges):
            e1, e2 = edges.alias("e1"), edges.alias("e2")
            e3 = edges.alias("e3")
            tri = (
                e1.join(e2, F.col("e1.b") == F.col("e2.a"))
                .join(
                    e3,
                    (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
                    "left_semi",
                )
            )
            return tri.agg(F.count(F.lit(1)).alias("n")).collect()[0].n

        # the census's join key is the wedge's MIDDLE node, so every
        # hub wedge lands in ONE task: past ~2e8 id-ordered wedges the
        # single hub task alone runs for tens of minutes (observed:
        # stuck >9 min at 2.3e9). The wedge sums are closed-form and
        # cheap, so gate the census on them instead of hanging — the
        # skip IS the demonstration at that scale.
        CENSUS_WEDGE_BUDGET = 200_000_000
        t0 = time.perf_counter()
        n_oriented = count_triangles_oriented(df).collect()[0].n_triangles
        t_oriented = round(time.perf_counter() - t0, 2)
        if wedges_id <= CENSUS_WEDGE_BUDGET:
            t0 = time.perf_counter()
            n_census = census(df)
            t_census = round(time.perf_counter() - t0, 2)
            assert n_census == n_oriented, (n_census, n_oriented)
        else:
            t_census = None
        out["graphs"][label] = {
            "n_nodes": int(n_nodes),
            "n_edges": int(df.count()),
            "triangles": int(n_oriented),
            "wedges_id_ordered": int(wedges_id),
            "wedges_degree_oriented": int(wedges_deg),
            "t_census_sec": t_census,
            "census_skipped": None if t_census is not None else (
                f"id-ordered wedge sum {wedges_id:.2e} exceeds budget "
                f"{CENSUS_WEDGE_BUDGET:.0e}; the hub's wedges all hash to "
                "one join task (projected >>10 min)"
            ),
            "t_oriented_sec": t_oriented,
        }
        census_render = "skipped" if t_census is None else f"{t_census}s"
        print(f"# {label}: census={census_render} oriented={t_oriented}s "
              f"wedges id={wedges_id:.0f} deg={wedges_deg:.0f}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


def skew_agg(factor: int, passes: int, n_base: int = 2_000_000,
             spark=None) -> None:
    """Aggregation under a Zipf-hot group key, measured (VERDICT r10
    stretch item 7 — the last unmeasured skew surface; joins got their
    attestation via aqe_skew_join).

    Synthesizes a distributed table (spark.range, no driver data) where
    ONE key owns 90% of the rows — the hot shape salted_agg exists for —
    at 1x (n_base rows) and {factor}x, and times four arms:

      plain_sum     GROUP BY key -> SUM/COUNT. Algebraic agg: map-side
                    partial combine emits ONE partial row per key per
                    task, so the hot key never concentrates ROWS on its
                    reducer — the hypothesis is that plain scales ~linear
                    with the data regardless of skew.
      salted_sum    the salted_agg registry rewrite on the same data
                    (16-way salt + second-stage merge): measures what
                    the salt buys WHEN the agg is algebraic (expected:
                    nothing but overhead — the mapper already split the
                    hot key across tasks).
      exact_median  percentile(v, 0.5) per key. HOLISTIC agg: partial
                    buffers carry raw VALUES, so the hot key's 0.9*n
                    values all land in one final-stage buffer — the real
                    aggregation-skew straggler, growing with data size
                    on a single reducer no matter how many executors.
      sketch_median approx_percentile(v, 0.5, 1000) per key. The GK
                    sketch is MERGEABLE with bounded size, restoring
                    constant-size partials — the deployment answer for
                    holistic aggs under skew. (Salting cannot fix a
                    holistic agg: exact sub-medians of salted shards do
                    not merge into the median.)

    The two *_dv arms (r11 follow-up) repeat the median pair on a
    DISTINCT-VALUED metric (v = id): the bounded 1M-value domain above
    lets Spark's exact `percentile` buffer — a value->count map —
    SATURATE at 1M entries per task, so its measured growth there is
    parallel map-update work, not buffer growth. A real double-valued
    metric is ~all-distinct, where the hot key's map degenerates to
    raw-value storage ∝ its row count — the true holistic-straggler
    shape (one final merge buffer of 0.9*n entries no executor count
    can shrink). The sketch arm is domain-shape-immune by construction.

      exact_median_dv / sketch_median_dv: same aggregates, v = id.

    Second-decade note: the dv exact arm measured 17.2x for 10x data
    (2M->20M base); at 200M rows its hot-key buffer is ~180M raw
    values in ONE merge+sort — extrapolated minutes-to-OOM, so the
    second decade is documented by closed form (buffer ∝ 0.9·n) rather
    than timed. Raise --factor/n_base deliberately if you mean to.

    Sanity: plain and salted sums must agree exactly (bigint cents
    math); each sketch median must land within rank-error of its exact
    twin. Output is one JSON line with per-arm 1x/{factor}x timings
    and ratios — a §6 table row, the triangle-demonstration pattern.
    """
    from pyspark.sql import functions as F

    own_session = spark is None
    if own_session:
        spark = _session()
        spark.range(1).count()

    def _hot_table(n: int, distinct_vals: bool = False):
        # 90% of rows carry key 0; the rest spread over 999 cold keys.
        # Bounded shape: v is a deterministic pseudo-random value
        # (Knuth multiplicative hash of the row id) over a 1M domain so
        # medians are non-trivial. Distinct shape: v = id, every value
        # unique — the exact-percentile buffer cannot saturate.
        v = F.col("id") if distinct_vals else F.pmod(
            F.col("id") * 2654435761, F.lit(1_000_000)
        )
        return (
            spark.range(n)
            .select(
                F.when(F.pmod("id", F.lit(10)) < 9, F.lit(0))
                .otherwise(F.pmod(F.col("id") * 2654435761, F.lit(999)) + 1)
                .alias("k"),
                v.alias("v"),
            )
        )

    def _plain_sum(df):
        return df.groupBy("k").agg(
            F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("n")
        )

    def _salted_sum(df):
        partial = (
            df.withColumn("_salt", F.pmod(F.xxhash64("v"), F.lit(16)))
            .groupBy("k", "_salt")
            .agg(F.sum("v").alias("_s"), F.count(F.lit(1)).alias("_n"))
        )
        return partial.groupBy("k").agg(
            F.sum("_s").alias("sum_v"), F.sum("_n").alias("n")
        )

    def _exact_median(df):
        return df.groupBy("k").agg(F.percentile("v", F.lit(0.5)).alias("med"))

    def _sketch_median(df):
        return df.groupBy("k").agg(
            F.approx_percentile("v", F.lit(0.5), F.lit(1000)).alias("med")
        )

    def _sketch_rank_error_check(df):
        # approx_percentile(accuracy=1000) guarantees rank error
        # <= 1/accuracy, so the sketch's hot-key median must fall
        # between the exact (0.5 - eps) and (0.5 + eps) quantiles
        eps = 1.0 / 1000
        hot = df.filter(F.col("k") == 0)
        b = hot.agg(
            F.percentile("v", F.lit(0.5 - eps)).alias("lo"),
            F.percentile("v", F.lit(0.5 + eps)).alias("hi"),
        ).collect()[0]
        sketch_med = {r.k: r.med for r in _sketch_median(df).collect()}[0]
        assert b.lo <= sketch_med <= b.hi, (
            f"sketch hot-key median {sketch_med} outside the exact "
            f"rank-error band [{b.lo}, {b.hi}] at eps={eps}"
        )

    # (arm name, aggregate, which table shape)
    arms = [
        ("plain_sum", _plain_sum, "bounded"),
        ("salted_sum", _salted_sum, "bounded"),
        ("exact_median", _exact_median, "bounded"),
        ("sketch_median", _sketch_median, "bounded"),
        ("exact_median_dv", _exact_median, "distinct"),
        ("sketch_median_dv", _sketch_median, "distinct"),
    ]
    out = {"mode": "skew_agg", "factor": factor, "n_base": n_base,
           "hot_share": 0.9, "results": {}}
    for label, n in (("1x", n_base), (f"{factor}x", n_base * factor)):
        shapes = {
            "bounded": _hot_table(n),
            "distinct": _hot_table(n, distinct_vals=True),
        }
        res = {}
        # cross-arm sanity on THIS size: salted == plain exactly;
        # each sketch median within GK rank error of its exact twin
        plain = {r.k: (r.sum_v, r.n) for r in _plain_sum(shapes["bounded"]).collect()}
        salted = {r.k: (r.sum_v, r.n) for r in _salted_sum(shapes["bounded"]).collect()}
        assert plain == salted, "salted rewrite changed the answer"
        for shape in ("bounded", "distinct"):
            _sketch_rank_error_check(shapes[shape])
        for arm, fn, shape in arms:
            best = float("inf")
            for _ in range(passes):
                t0 = time.perf_counter()
                # collect(), never count(): Catalyst prunes aggregate
                # expressions a count doesn't need (r8 lesson) — output
                # is <= 1000 rows by construction
                fn(shapes[shape]).collect()
                best = min(best, time.perf_counter() - t0)
            res[arm] = round(best, 3)
        out["results"][label] = res
        print(f"# {label} (n={n}): " + " ".join(
            f"{a}={t}s" for a, t in res.items()), file=sys.stderr)
    r1, rn = out["results"]["1x"], out["results"][f"{factor}x"]
    out["ratios"] = {a: round(rn[a] / r1[a], 2) for a, _, _ in arms}
    print(json.dumps(out))
    if own_session:
        spark.stop()


def stream_scale(factor: int, passes: int, spark=None) -> None:
    """Structured-Streaming state scaling, measured (the one §6 family
    with no empirical row): replay the events table through the two
    stateful surfaces at 1x and {factor}x and read the state store back
    (format('statestore')) so the 100 TB state claims are counted, not
    asserted.

    The {factor}x stream is built two ways — the skew_agg two-shape
    pattern — because 'more data' means different things to state:

      keys   shard i offsets user_id (and event_id): {factor}x rows AND
             {factor}x distinct users, same time horizon. Hypothesis:
             per-user session state (applyInPandasWithState, NoTimeout)
             grows exactly with KEYS (1500 -> 1500*factor rows in the
             store), while the windowed agg's state (windows x types)
             is UNCHANGED — row volume alone never grows it.
      depth  shard i shifts ts by one horizon-span: {factor}x rows and
             a {factor}x time horizon, same 1500 users. Hypothesis:
             session state stays EXACTLY 1500 rows under {factor}x
             rows; the windowed agg creates {factor}x windows over the
             replay but the WATERMARK evicts closed ones between
             micro-batches, so the final store holds far fewer than
             windows-created (bounded by the eviction horizon, not by
             stream length).

    Each dir replays as a REAL multi-batch stream (file source,
    maxFilesPerTrigger=1 -> one micro-batch per shard file, state
    carried across commits; the 1x dir is 1 batch). Timing is the
    min over {passes} full replays with fresh checkpoints. All four
    state-count hypotheses are ASSERTED in-tool; timings + state rows
    go to the JSON line. Temp dirs are removed in a finally.

    At 100 TB the reading is: keyed state capacity plans on distinct
    keys (RocksDB spill per partition), window state on
    horizon/watermark — neither on row count. Stream replays here reuse
    queries._replay_conf (4 shuffle partitions -> 4 state stores;
    production sizes this to the cluster)."""
    import shutil
    import tempfile

    import pandas as pd

    from labelspark_spark.queries import _replay_conf
    from labelspark_spark.streaming import events as se
    from labelspark_spark.streaming import stateful as st

    own_session = spark is None
    if own_session:
        spark = _session()
        spark.range(1).count()

    base = os.path.join(SF_DIR, "events.parquet")
    d = pq.read_table(base).to_pandas()
    span = (d["ts"].max() - d["ts"].min()) + pd.Timedelta(hours=1)
    tmp: list[str] = []

    def _mkdir(prefix: str) -> str:
        p = tempfile.mkdtemp(prefix=prefix)
        tmp.append(p)
        return p

    def _build_dir(shape: str, n_shards: int) -> str:
        out = _mkdir(f"stream_{n_shards}x_{shape}_")
        for i in range(n_shards):
            s = d.copy()
            s["event_id"] = s["event_id"] + i * OFF
            if shape == "keys":
                s["user_id"] = s["user_id"] + i * OFF
            else:
                s["ts"] = s["ts"] + i * span
            pq.write_table(
                pa.Table.from_pandas(s, preserve_index=False),
                f"{out}/part-{i:03d}.parquet",
            )
        return out

    def _replay(build_stream, src_dir: str, tag: str):
        """One full fresh-checkpoint replay; returns (seconds,
        final state-store row count)."""
        ckpt = _mkdir(f"ck_{tag}_")
        stream = se.read_events_stream(spark, src_dir)
        out = build_stream(stream)
        with _replay_conf(spark):
            t0 = time.perf_counter()
            q = (
                out.writeStream.format("memory")
                .queryName(f"stream_scale_{tag}")
                .option("checkpointLocation", ckpt)
                .outputMode("update")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            dt = time.perf_counter() - t0
        state_rows = spark.read.format("statestore").load(ckpt).count()
        return dt, state_rows

    arms = {
        "sessions": st.user_session_stats,  # NoTimeout bounded replay
        "window_agg": se.tumbling_counts,   # 1h windows, 2h watermark
    }
    try:
        dirs = {("1x", None): _build_dir("keys", 1)}
        for shape in ("keys", "depth"):
            dirs[(f"{factor}x", shape)] = _build_dir(shape, factor)
        out = {"mode": "stream_scale", "factor": factor,
               "base_rows": len(d), "base_users": int(d["user_id"].nunique()),
               "results": {}}
        for arm, builder in arms.items():
            res = {}
            for (label, shape), src in dirs.items():
                key = label if shape is None else f"{label}_{shape}"
                best, state = float("inf"), None
                for p in range(passes):
                    dt, state = _replay(builder, src, f"{arm}_{key}_{p}")
                    best = min(best, dt)
                res[key] = {"sec": round(best, 3), "state_rows": state}
                print(f"# {arm} {key}: {res[key]}", file=sys.stderr)
            out["results"][arm] = res
        # the four state hypotheses, asserted
        users = out["base_users"]
        s = out["results"]["sessions"]
        w = out["results"]["window_agg"]
        assert s["1x"]["state_rows"] == users
        assert s[f"{factor}x_keys"]["state_rows"] == users * factor, (
            "keyed state must grow exactly with distinct keys"
        )
        assert s[f"{factor}x_depth"]["state_rows"] == users, (
            "keyed state must NOT grow with rows at fixed keys"
        )
        assert w[f"{factor}x_keys"]["state_rows"] == w["1x"]["state_rows"], (
            "window state must not grow with row volume at a fixed horizon"
        )
        created = w["1x"]["state_rows"] * factor  # ~windows x types created
        assert w[f"{factor}x_depth"]["state_rows"] < created, (
            "watermark must evict closed windows: final store must hold "
            "fewer rows than windows created over the long horizon"
        )
        print(json.dumps(out))
    finally:
        for p in tmp:
            shutil.rmtree(p, ignore_errors=True)
        if own_session:
            spark.stop()


def main() -> None:
    global TABLES
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "run", "probe", "triangles",
                                     "skew_agg", "stream_scale"])
    ap.add_argument("--out", default=DEFAULT_OUT)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--queries", default=",".join(TARGETS))
    ap.add_argument("--tables", default=",".join(TABLES),
                    help="subset of tables to build (100x lineitem would "
                         "need ~11GB of driver pandas; build only what the "
                         "measured queries read)")
    ap.add_argument("--passes", type=int, default=2,
                    help="warm passes per measurement (min is reported); "
                         "1 for the multi-minute 100x points")
    args = ap.parse_args()
    if args.mode == "build":
        TABLES = tuple(t for t in args.tables.split(",") if t)
        build(args.out, args.factor)
    elif args.mode == "run":
        run(args.out, [q for q in args.queries.split(",") if q], args.factor,
            args.passes)
    elif args.mode == "probe":
        probe_flat(args.out, args.factor, args.passes)
    elif args.mode == "skew_agg":
        skew_agg(args.factor, args.passes)
    elif args.mode == "stream_scale":
        stream_scale(args.factor, args.passes)
    else:
        triangles()


if __name__ == "__main__":
    main()
