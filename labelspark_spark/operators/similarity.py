"""Approximate-nearest-neighbor similarity search (north-star).

Two tiers:

- :func:`brute_force_topk` — exact cosine top-k, the correctness
  baseline. Broadcast the (small) query set against the (huge) corpus:
  one broadcast-nested-loop with no corpus shuffle; per-corpus-partition
  partial top-k would be the AQE-free refinement at extreme k*q.
- :func:`lsh_ann_topk` — random-hyperplane LSH bucketing: corpus is
  pre-bucketed once (write-amortized at scale), queries probe matching
  buckets only, so cost ~ bucket size, not corpus size.
- :func:`ivf_topk` — inverted-file variant: corpus assigned to nearest
  centroid; queries probe ``nprobe`` nearest centroid lists.

All vector math is HOF expressions (no UDF); hyperplanes are
deterministic (seeded LCG) so results reproduce everywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from labelspark_spark.functions.vectors import cosine, dot


def exact_cosine_rescore(qv, nv, nq, nb):
    """The ONE scoring expression both IVF probe strategies report.

    ``ivf_probe`` (broadcast + per-pair HOF fold) and
    ``ivf_probe_batch`` (Arrow cogroup matmul pre-selector) are
    bit-identical BY CONSTRUCTION: the batch matmul only pre-selects
    candidates, and every reported ``cos`` comes from this expression —
    left-associated HOF fold dot product, the precomputed query/index
    norms, ``F.round(..., 6)`` HALF_UP. Keeping it in one helper makes
    the guarantee structural: an edit here changes both physical
    strategies identically, so they cannot drift at a rounding boundary
    (the r8 ADVICE failure mode). All four args are double-typed
    Columns: query vector, neighbor vector, query norm, neighbor norm.
    """
    from labelspark_spark.functions.vectors import cosine_from_parts

    return F.round(cosine_from_parts(dot(qv, nv), nq, nb), 6)


def _rank_topk(
    scored: DataFrame,
    query_id: str,
    k: int,
    two_phase: bool = False,
    order_cols=None,
) -> DataFrame:
    """Deterministic top-k: rank on rounded cosine desc, id asc by
    default; pass ``order_cols`` for other metrics (e.g. L2 distance
    ascending).

    ``two_phase=True`` first ranks within (scan partition, query) — the
    shuffle spreads over num_partitions × num_queries reducers and cuts
    each group to k rows — then runs the final per-query rank on the
    ~partitions*k survivors. Without it, the per-query window partition
    holds the FULL scored set for that query (the whole corpus for brute
    force): a guaranteed straggler/OOM at 100 TB. Results are identical:
    the global top-k is a subset of the union of per-partition top-ks,
    and both phases share the same total tie order.
    """
    order = (
        list(order_cols)
        if order_cols is not None
        else [F.col("cos").desc(), F.col("neighbor_id").asc()]
    )
    if two_phase:
        w1 = Window.partitionBy("_pid", query_id).orderBy(*order)
        scored = (
            scored.withColumn("_pid", F.spark_partition_id())
            .withColumn("_r", F.row_number().over(w1))
            .filter(F.col("_r") <= k)
            .drop("_pid", "_r")
        )
    w = Window.partitionBy(query_id).orderBy(*order)
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    dim: int = 64,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Queries are broadcast (small side); the corpus never shuffles.
    Returns (query_id, neighbor_id, cos, rank).
    """
    # HOF cosine, not the flat dim-term expression: pair count here is
    # Q*N with Q broadcast-small by contract, so per-pair eval cost is
    # negligible — while the flat form's ~7*dim-node tree costs ~0.5s of
    # driver-side analysis PER PLAN BUILD (measured; it dominated the
    # whole query at sf0.1). Flat codegen stays reserved for the one
    # quadratic-pair JVM site (dedup.embedding_dup_pairs).
    q = F.broadcast(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = c.crossJoin(q).select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine(F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>")), 6
        ).alias("cos"),
    )
    # two-phase: the cross-join output is |corpus| rows per query; a
    # single per-query window would funnel the whole corpus into one task
    return _rank_topk(scored, "query_id", k, two_phase=True).select(
        "query_id", "neighbor_id", "cos", "rank"
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim (LCG)."""
    planes = []
    state = seed
    for _ in range(num_planes):
        v = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
            v.append((state / float(2**63)) * 2.0 - 1.0)
        planes.append(v)
    return planes


def lsh_bucket_expr(vec, planes: list[list[float]]):
    """Random-hyperplane signature -> int bucket (sign bit per plane)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bucket = bucket + F.when(dot(vec.cast("array<double>"), plane) >= 0, F.lit(2**i)).otherwise(
            F.lit(0)
        )
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only corpus rows in the query's
    hyperplane bucket. Equi-join on bucket id — shuffle keyed on a
    2^num_planes-ary key instead of a cross join.

    Recall < 1.0 by construction; verify against brute force by recall
    bound, not hash equality.
    """
    planes = _hyperplanes(dim, num_planes, seed)
    bucket = lsh_bucket_expr(F.col(vec_col), planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        bucket.alias("_bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            bucket.alias("_bucket"),
        )
    )
    scored = c.join(q, "_bucket").select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine(F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>")), 6
        ).alias("cos"),
    )
    return _rank_topk(scored, "query_id", k).select("query_id", "neighbor_id", "cos", "rank")


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    dim: int = 64,
    max_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Lloyd's k-means over an embedding column — learns the centroid
    table :func:`ivf_topk` probes, entirely in DataFrame ops.

    Per iteration: assign every row to its max-cosine centroid (broadcast
    cross join + per-row rank — centroids are k*dim floats, always
    broadcastable), then recompute centroids as element-wise means
    (``avg(vec[i])`` per dimension — map-side partial agg, one shuffle of
    k*dim partials). Only the k centroids ever reach the driver, never
    the data. Init is the k rows with the smallest ``xxhash64(id, seed)``
    — a deterministic pseudo-random sample.

    For ``k`` past :data:`_FLAT_K_MAX` the flat loop's O(n*k*d)
    per-iteration matmul is replaced by the two-level fit
    (:func:`_kmeans_fit_hierarchical`) — O(n*sqrt(k)*d) per pass —
    which is what the IVF deployment rule k ∝ n (SURVEY §6) needs to
    stay sub-quadratic at 100 TB. Every registry query pins k <= 64,
    so all attested plans stay on the flat path bit-for-bit.
    """
    if k > _FLAT_K_MAX:
        return _kmeans_fit_hierarchical(
            df, k, dim, max_iters, vec_col, id_col, seed
        )
    spark = df.sparkSession
    src_iv = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    # Single-partition inputs (every single-row-group sf scan — the same
    # unsplittable-input class spread_to_parallelism gates on) run the
    # WHOLE fit as one Arrow task: the distributed loop degenerates to
    # `1 init job + max_iters serial one-task jobs` there, each paying
    # the ~0.2s Python-stage launch floor for work a single kernel does
    # in milliseconds (r13 optimization round, guide §2.5/§4.5 — job
    # COUNT is the only remaining lever on these serial fits). The
    # fused kernel replays the loop path's arithmetic per batch in the
    # same order, so the centroids are bit-identical
    # (tests/test_approx_recall.py::test_kmeans_fit_fused_matches_loop).
    # A many-split 100 TB scan takes the distributed loop unchanged.
    if _FUSE_SINGLE_PARTITION and src_iv.rdd.getNumPartitions() == 1:
        centroids = _kmeans_fit_fused_one_partition(src_iv, k, max_iters, seed)
        return spark.createDataFrame(
            [(i, v) for i, v in enumerate(centroids)],
            "centroid_id int, centroid array<double>",
        )
    init = (
        src_iv
        .orderBy(F.xxhash64(F.col("_id"), F.lit(seed)), F.col("_id"))
        .limit(k)
        .select(F.col("_v").cast("array<double>").alias("centroid"))
        .collect()
    )
    centroids = [list(r.centroid) for r in init]

    # NB (r13 optimization round): spreading src to defaultParallelism
    # was tried and reverted — with a small vector table each of the 32
    # per-iteration Arrow tasks pays ~0.2s of Python-worker round-trip
    # for a ~60-row batch, so the fit got SLOWER (1.2s -> 1.9s at
    # sf0.1). At scale the scan splits naturally and the fused partials
    # already parallelize.
    src = df.select(F.col(vec_col).alias("_v"))
    for _ in range(max_iters):
        # one fused Arrow pass per iteration: assign AND partial-sum in
        # the same mapInPandas (one (cnt, sum-vector) partial per cid
        # per PARTITION reaches the driver — k*dim doubles per
        # partition, bounded by design). The merge mirrors avg()'s own
        # per-partition partial-sum shape; the old form paid a separate
        # pandas-UDF pass plus a 64-expression avg aggregation per
        # iteration (~0.7s/iter at sf0.1 vs ~0.25s fused).
        cents_m = np.array(centroids, dtype=np.float64)
        cnorm = np.sqrt(np.einsum("ij,ij->i", cents_m, cents_m))

        def _partials(batches):
            cnt = np.zeros(len(cents_m), dtype=np.int64)
            sums = np.zeros_like(cents_m)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.vstack(pdf["_v"].to_numpy()).astype(np.float64)
                den = np.sqrt(np.einsum("ij,ij->i", m, m))[:, None] * cnorm[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(den == 0, 0.0, (m @ cents_m.T) / den)
                # same quantized argmax discipline as _nearest_cells_udf
                # (round 9, lowest cid wins ties via stable argsort)
                cid = np.argsort(-np.round(cos, 9), axis=1, kind="stable")[:, 0]
                np.add.at(cnt, cid, 1)
                np.add.at(sums, cid, m)
            yield pd.DataFrame(
                {
                    "cid": np.arange(len(cents_m), dtype=np.int64),
                    "cnt": cnt,
                    "s": list(sums),
                }
            )

        parts = src.mapInPandas(
            _partials, "cid bigint, cnt bigint, s array<double>"
        ).collect()
        cnt_tot = np.zeros(len(cents_m), dtype=np.int64)
        sum_tot = np.zeros_like(cents_m)
        for r in parts:
            cnt_tot[r.cid] += r.cnt
            sum_tot[r.cid] += np.asarray(r.s, dtype=np.float64)
        new_centroids = list(centroids)
        for i in range(len(cents_m)):
            if cnt_tot[i] > 0:  # empty clusters keep their previous centroid
                new_centroids[i] = [float(x) for x in sum_tot[i] / cnt_tot[i]]
        if new_centroids == centroids:
            break
        centroids = new_centroids

    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(centroids)],
        "centroid_id int, centroid array<double>",
    )


def _kmeans_fit_fused_one_partition(
    src_iv: DataFrame, k: int, max_iters: int, seed: int
) -> list:
    """Flat Lloyd's fit fused into ONE Arrow task for a single-partition
    input — returns the centroid list the caller materializes.

    Bit-identity with the distributed loop on the same (one-partition)
    input is the contract, and every float op mirrors it exactly:

    - init: the k rows with the smallest ``(xxhash64(id, seed), id)`` —
      the hash is computed by the SAME JVM expression (shipped in as a
      column); the kernel only sorts and slices, and float32 vectors
      widen via ``astype(float64)`` exactly as the loop path's JVM
      ``cast("array<double>")``;
    - per iteration: the same per-BATCH ``np.add.at`` partial sums in
      the same batch order as ``_partials`` (never one concatenated
      matmul — BLAS blocking may differ by matrix shape), the same
      quantized stable-argmax assignment, the same Python-float
      round-trip of each new centroid, the same empty-cluster keep and
      list-equality early break. The loop path's driver merge adds the
      single partial onto zeros, which is the identity — so skipping
      it changes nothing.
    """
    with_h = src_iv.select(
        F.xxhash64(F.col("_id"), F.lit(seed)).alias("_h"), "_id", "_v"
    )

    def _fit(batches):
        hs, ids, mats = [], [], []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hs.append(pdf["_h"].to_numpy())
            ids.append(pdf["_id"].to_numpy())
            mats.append(np.vstack(pdf["_v"].to_numpy()).astype(np.float64))
        if not mats:
            return
        h = np.concatenate(hs)
        idv = np.concatenate(ids)
        # total order (hash asc, id asc) == the loop path's
        # orderBy(xxhash64, _id).limit(k); Python tuple sort keeps it
        # exact for any orderable id type
        order = sorted(range(len(h)), key=lambda i: (h[i], idv[i]))[:k]
        offs = np.cumsum([0] + [len(m) for m in mats])
        X_at = lambda i: mats[np.searchsorted(offs, i, side="right") - 1][  # noqa: E731
            i - offs[np.searchsorted(offs, i, side="right") - 1]
        ]
        centroids = [[float(x) for x in X_at(i)] for i in order]
        for _ in range(max_iters):
            cents_m = np.array(centroids, dtype=np.float64)
            cnorm = np.sqrt(np.einsum("ij,ij->i", cents_m, cents_m))
            cnt_tot = np.zeros(len(cents_m), dtype=np.int64)
            sum_tot = np.zeros_like(cents_m)
            for m in mats:
                den = np.sqrt(np.einsum("ij,ij->i", m, m))[:, None] * cnorm[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(den == 0, 0.0, (m @ cents_m.T) / den)
                cid = np.argsort(-np.round(cos, 9), axis=1, kind="stable")[:, 0]
                np.add.at(cnt_tot, cid, 1)
                np.add.at(sum_tot, cid, m)
            new_centroids = list(centroids)
            for i in range(len(cents_m)):
                if cnt_tot[i] > 0:  # empty clusters keep their previous centroid
                    new_centroids[i] = [float(x) for x in sum_tot[i] / cnt_tot[i]]
            if new_centroids == centroids:
                break
            centroids = new_centroids
        yield pd.DataFrame(
            {
                "centroid_id": np.arange(len(centroids), dtype=np.int32),
                "centroid": centroids,
            }
        )

    rows = with_h.mapInPandas(
        _fit, "centroid_id int, centroid array<double>"
    ).collect()
    return [list(r.centroid) for r in sorted(rows, key=lambda r: r.centroid_id)]


# Escape hatch for the single-partition fused fit (parity tests flip it
# to force the distributed loop on the same input and assert the two
# paths return bit-identical centroids).
_FUSE_SINGLE_PARTITION = True

# k above which kmeans_fit switches to the two-level strategy. Every
# registry query pins k <= 64 (flat path, attested plans unchanged);
# only the k ∝ n scale configurations cross it.
_FLAT_K_MAX = 64


def _kmeans_fit_hierarchical(
    df: DataFrame,
    k: int,
    dim: int,
    max_iters: int,
    vec_col: str,
    id_col: str,
    seed: int,
) -> DataFrame:
    """Two-level (coarse, then per-cell local) k-means for large ``k``.

    Motivation (measured, SURVEY §6): under the IVF deployment rule
    k ∝ n (bounded cell size), the flat Lloyd's fit is O(n*k*d) =
    O(n^2*d / cell_size) — the fit, not the candidate verify, becomes
    the quadratic piece of the near-dup pipeline (the 100x k∝n point's
    super-linear step is entirely fit growth). This is the same answer
    production ANN systems give (FAISS's coarse quantizer hierarchy):

    1. fit ``k1 = ceil(sqrt(k))`` COARSE centroids with the flat loop —
       O(n*sqrt(k)*d) per iteration;
    2. assign every row to its nearest coarse cell (one Arrow matmul
       pass);
    3. fit each coarse cell's budget of LOCAL centroids (k // k1, +1
       for the first k % k1 cells — budgets sum to exactly k) with
       ``groupBy().applyInPandas`` — cells fit independently and
       in parallel, total O(n*sqrt(k)*d) per iteration.

    Total fit work is O(n*sqrt(k)*d) — O(n^1.5) under k ∝ n — and the
    result is still "~k centroids whose cells are corpus-size/k" (what
    the blocking join needs). Per-cell budgets sum to exactly k
    (k // k1 each, +1 for the first k % k1 cells), so the count NEVER
    exceeds k; cells smaller than their budget emit one centroid per
    row, so it can land under k on degenerate splits. Like the flat
    path, the returned DataFrame is a materialized local relation —
    only the ~k centroids ever reach the driver, and downstream
    actions never re-execute the fit.

    Determinism discipline matches the flat path: group rows are
    re-ordered by a seeded md5 of their id before any float touches
    them (applyInPandas group order is shuffle-dependent; float sums
    are order-sensitive), init is the first budget rows in that hash
    order, assignment uses the quantized argmax with stable ties
    (coarse assignment passes decimals=9 so its quantization matches
    the flat fit's per-iteration argmax, not the probe paths' 6), and
    empty clusters keep their previous centroid.

    Memory contract: step 3's ``groupBy().applyInPandas`` loads ONE
    coarse cell per executor pandas frame, so each cell must fit in
    executor memory — ~n/k1 rows * dim doubles for a balanced coarse
    fit. A degenerate coarse fit (e.g. a near-identical corpus) can
    dump most rows into one cell and OOM that executor; if the corpus
    may degenerate, cap cell size upstream (salt oversized cells on a
    hash of the id) before fitting.
    """
    import hashlib

    k1 = max(2, int(np.ceil(np.sqrt(k))))
    # Single-partition inputs run coarse fit + assignment + every local
    # fit as ONE Arrow task (r13 optimization round — the same gate and
    # rationale as the flat path's fused kernel: on a one-task scan the
    # staged form is 2 serial Python-stage jobs at the measured ~0.2s
    # launch floor each, plus an exchange that buys nothing). Arithmetic
    # is replayed op-for-op — bit-identity with the staged path is
    # pinned by test_kmeans_fit_fused_matches_loop's hierarchical leg.
    src_iv = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if _FUSE_SINGLE_PARTITION and src_iv.rdd.getNumPartitions() == 1:
        return _kmeans_fit_hierarchical_fused(
            src_iv, k, k1, max_iters, seed
        )
    coarse = kmeans_fit(
        df, k=k1, dim=dim, max_iters=max_iters,
        vec_col=vec_col, id_col=id_col, seed=seed,
    )
    cent = F.broadcast(
        coarse.select(
            F.col("centroid_id").alias("_cid"), F.col("centroid").alias("_cvec")
        )
    )
    assigned = _assign_to_centroids(
        df.select(id_col, vec_col), cent, id_col, vec_col, 1, "_id", dim,
        decimals=9,
    )

    base, extra = k // k1, k % k1

    def _local(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = np.array(
            [
                hashlib.md5(f"{v}#s{seed}".encode()).hexdigest()
                for v in pdf["_id"].astype(str).to_numpy()
            ]
        )
        order = np.argsort(keys, kind="stable")
        mat = np.vstack(pdf["_v"].to_numpy()).astype(np.float64)[order]
        cid0 = int(pdf["_cid"].iloc[0])
        budget = base + (1 if cid0 < extra else 0)
        kk = min(budget, len(pdf))
        cents = mat[:kk].copy()
        vnorm = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        for _ in range(max_iters):
            cnorm = np.sqrt(np.einsum("ij,ij->i", cents, cents))
            den = vnorm[:, None] * cnorm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(den == 0, 0.0, (mat @ cents.T) / den)
            cid = np.argsort(-np.round(cos, 9), axis=1, kind="stable")[:, 0]
            new = cents.copy()
            for i in range(kk):
                sel = cid == i
                if sel.any():
                    new[i] = mat[sel].mean(axis=0)
            if np.array_equal(new, cents):
                break
            cents = new
        return pd.DataFrame(
            {
                "_ccid": np.full(kk, cid0, dtype=np.int64),
                "_lidx": np.arange(kk, dtype=np.int32),
                "centroid": list(cents),
            }
        )

    locals_df = assigned.groupBy("_cid").applyInPandas(
        _local, "_ccid bigint, _lidx int, centroid array<double>"
    )
    # materialize ONCE (<= k rows — the same driver-bounded collect the
    # flat path ends in): returning the lazy plan would re-execute the
    # corpus assignment + every local fit on EACH downstream action
    # (e.g. per probe pass), and the global ids come from a plain sort
    # of the collected rows instead of a window
    rows = sorted(
        locals_df.collect(), key=lambda r: (r._ccid, r._lidx)
    )
    return df.sparkSession.createDataFrame(
        [(i, list(r.centroid)) for i, r in enumerate(rows)],
        "centroid_id int, centroid array<double>",
    )


def _kmeans_fit_hierarchical_fused(
    src_iv: DataFrame, k: int, k1: int, max_iters: int, seed: int
) -> DataFrame:
    """Two-level fit fused into ONE Arrow task for a single-partition
    input: coarse Lloyd's, nearest-cell assignment, and every per-cell
    local fit run inside a single kernel instead of two serial
    Python-stage jobs with an exchange between them.

    Every float op replays the staged path op-for-op (the kernel bodies
    are kept self-contained by repo convention — executors must not
    need the package importable — so the Lloyd's block is duplicated
    from `_kmeans_fit_fused_one_partition`; the hierarchical leg of
    test_kmeans_fit_fused_matches_loop pins the two paths bit-equal):

    - coarse: identical init selection and per-batch partial-sum loop
      as the flat fused kernel;
    - assignment: the same per-batch matmul + round(9) stable argmax as
      `_nearest_cells_udf` (row-local, so batch boundaries are moot);
    - locals: `_local`'s exact body per cell — md5 re-order, first-kk
      init, quantized argmax, per-cluster mean, array_equal break —
      iterated in ascending cell order (cell row ORDER is neutralized
      by the md5 re-sort, so scan order vs shuffle order is immaterial);
    - driver: the same sort by (_ccid, _lidx) + enumerate.
    """
    import hashlib

    with_h = src_iv.select(
        F.xxhash64(F.col("_id"), F.lit(seed)).alias("_h"), "_id", "_v"
    )
    base, extra = k // k1, k % k1

    def _fit_all(batches):
        hs, ids, mats = [], [], []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hs.append(pdf["_h"].to_numpy())
            ids.append(pdf["_id"].to_numpy())
            mats.append(np.vstack(pdf["_v"].to_numpy()).astype(np.float64))
        if not mats:
            return
        h = np.concatenate(hs)
        idv = np.concatenate(ids)
        # ---- coarse Lloyd's: same block as the flat fused kernel ----
        order = sorted(range(len(h)), key=lambda i: (h[i], idv[i]))[:k1]
        offs = np.cumsum([0] + [len(m) for m in mats])
        X_at = lambda i: mats[np.searchsorted(offs, i, side="right") - 1][  # noqa: E731
            i - offs[np.searchsorted(offs, i, side="right") - 1]
        ]
        centroids = [[float(x) for x in X_at(i)] for i in order]
        for _ in range(max_iters):
            cents_m = np.array(centroids, dtype=np.float64)
            cnorm = np.sqrt(np.einsum("ij,ij->i", cents_m, cents_m))
            cnt_tot = np.zeros(len(cents_m), dtype=np.int64)
            sum_tot = np.zeros_like(cents_m)
            for m in mats:
                den = np.sqrt(np.einsum("ij,ij->i", m, m))[:, None] * cnorm[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(den == 0, 0.0, (m @ cents_m.T) / den)
                cid = np.argsort(-np.round(cos, 9), axis=1, kind="stable")[:, 0]
                np.add.at(cnt_tot, cid, 1)
                np.add.at(sum_tot, cid, m)
            new_centroids = list(centroids)
            for i in range(len(cents_m)):
                if cnt_tot[i] > 0:
                    new_centroids[i] = [float(x) for x in sum_tot[i] / cnt_tot[i]]
            if new_centroids == centroids:
                break
            centroids = new_centroids
        # ---- assignment: _nearest_cells_udf(n=1, decimals=9) ----
        cents_s = np.array(centroids, dtype=np.float64)
        cids_s = np.arange(len(centroids), dtype=np.int64)
        cnorm = np.sqrt(np.einsum("ij,ij->i", cents_s, cents_s))
        cid_parts = []
        for m in mats:
            den = np.sqrt(np.einsum("ij,ij->i", m, m))[:, None] * cnorm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(den == 0, 0.0, (m @ cents_s.T) / den)
            idx = np.argsort(-np.round(cos, 9), axis=1, kind="stable")[:, :1]
            cid_parts.append(cids_s[idx][:, 0].astype(np.int32))
        allcid = np.concatenate(cid_parts)
        X = np.concatenate(mats)
        id_series = pd.Series(idv)
        # ---- per-cell local fits: _local's body, ascending cell id ----
        out_ccid, out_lidx, out_cent = [], [], []
        for c in sorted(set(allcid.tolist())):
            sel_cell = allcid == c
            cell_ids = id_series[sel_cell]
            keys = np.array(
                [
                    hashlib.md5(f"{v}#s{seed}".encode()).hexdigest()
                    for v in cell_ids.astype(str).to_numpy()
                ]
            )
            order = np.argsort(keys, kind="stable")
            mat = np.vstack(list(X[sel_cell])).astype(np.float64)[order]
            budget = base + (1 if c < extra else 0)
            kk = min(budget, len(mat))
            cents = mat[:kk].copy()
            vnorm = np.sqrt(np.einsum("ij,ij->i", mat, mat))
            for _ in range(max_iters):
                cn = np.sqrt(np.einsum("ij,ij->i", cents, cents))
                den = vnorm[:, None] * cn[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(den == 0, 0.0, (mat @ cents.T) / den)
                cid = np.argsort(-np.round(cos, 9), axis=1, kind="stable")[:, 0]
                new = cents.copy()
                for i in range(kk):
                    sel = cid == i
                    if sel.any():
                        new[i] = mat[sel].mean(axis=0)
                if np.array_equal(new, cents):
                    break
                cents = new
            out_ccid.extend([int(c)] * kk)
            out_lidx.extend(range(kk))
            out_cent.extend(list(cents))
        yield pd.DataFrame(
            {
                "_ccid": np.array(out_ccid, dtype=np.int64),
                "_lidx": np.array(out_lidx, dtype=np.int32),
                "centroid": out_cent,
            }
        )

    rows = sorted(
        with_h.mapInPandas(
            _fit_all, "_ccid bigint, _lidx int, centroid array<double>"
        ).collect(),
        key=lambda r: (r._ccid, r._lidx),
    )
    return src_iv.sparkSession.createDataFrame(
        [(i, list(r.centroid)) for i, r in enumerate(rows)],
        "centroid_id int, centroid array<double>",
    )


def _nearest_cells_udf(cids: "np.ndarray", cents: "np.ndarray", n: int, decimals: int):
    """Arrow-batched nearest-``n``-centroid assignment: ONE numpy matmul
    per batch against the (k x dim) centroid matrix.

    Replaces the broadcast-crossJoin + window-rank formulation, whose
    per-centroid flat dot expressions (k * dim terms) blew past
    whole-stage codegen and whose rank shuffled k rows per input row.
    Ranking matches the SQL form bit-for-bit at sane inputs: cosine
    rounded to ``decimals``, ties broken by ascending centroid id
    (centroids pre-sorted by id + stable argsort). Boundary caveat
    (r11 review): np.round is half-even where the SQL twin's round is
    HALF_UP — the two can rank differently only when two centroid
    cosines straddle the SAME 6-dp half boundary within ~1 ulp, the
    epsilon class the twin-equality driver row would surface; kept
    as-is because changing the quantizer would perturb every attested
    assignment for a measure-zero tie case.
    """
    order = np.argsort(cids, kind="stable")
    cids_s = cids[order]
    cents_s = cents[order]
    cnorm = np.sqrt(np.einsum("ij,ij->i", cents_s, cents_s))

    @F.pandas_udf("array<int>")
    def _near(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        m = np.vstack(vs.to_numpy()).astype(np.float64)
        den = np.sqrt(np.einsum("ij,ij->i", m, m))[:, None] * cnorm[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(den == 0, 0.0, (m @ cents_s.T) / den)
        idx = np.argsort(-np.round(cos, decimals), axis=1, kind="stable")[:, :n]
        return pd.Series(list(cids_s[idx].astype(np.int32)))

    return _near


def _assign_to_centroids(
    df: DataFrame,
    cent,
    idc: str,
    vecc: str,
    n: int,
    out_id: str,
    dim: int = 64,
    decimals: int = 6,
) -> DataFrame:
    """Nearest-``n`` centroid assignment. The centroid side is k*dim
    floats BY DESIGN (kmeans_fit only ever materializes that much), so
    it collects to a numpy matrix and the assignment is a vectorized
    Pandas-UDF matmul over the (never-collected) vector side.

    ``decimals`` sets the tie-quantization of the argmax: the PROBE
    paths keep the default 6 (bit-for-bit parity with the SQL oracles'
    ``round(cos, 6)``); the hierarchical FIT path passes 9 to match the
    flat fit's per-iteration argmax quantization exactly."""
    rows = cent.select("_cid", "_cvec").collect()
    cids = np.array([r._cid for r in rows], dtype=np.int64)
    cents = np.array([list(r._cvec) for r in rows], dtype=np.float64)
    near = _nearest_cells_udf(cids, cents, n, decimals)
    return (
        df.select(F.col(idc).alias(out_id), F.col(vecc).alias("_v"))
        .withColumn("_cid", F.explode(near(F.col("_v"))))
        .select(out_id, "_v", "_cid")
    )


def ivf_build(
    corpus: DataFrame,
    centroids: DataFrame,
    table: str = "ivf_index",
    num_buckets: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
    dim: int = 64,
    assign: int = 1,
) -> None:
    """Build the IVF index ONCE and persist it bucketed by centroid id.

    At scale the corpus->centroid assignment IS the index: re-deriving
    it per query (as :func:`ivf_topk` does) repeats a full corpus pass
    every call. This writes (vec_id, embedding, centroid_id) as a
    bucketed managed table so :func:`ivf_probe` reads co-located
    centroid lists with no assignment stage and no exchange.

    ``assign > 1`` is MULTI-ASSIGNMENT (the spill/multi-probe trick):
    each corpus vector is indexed in its ``assign`` nearest cells, so
    a probe catches true neighbors whose primary cell was not probed.
    Recall rises steeply for the cost of an ``assign``x larger index —
    at 100 TB, 2x storage is far cheaper than probing ~all cells
    (which degenerates to a corpus scan per query batch). The probe
    side dedups (query, neighbor) pairs, so multiply-indexed rows
    never double-score.

    The vector's L2 norm is computed ONCE here and stored as an index
    column (`_norm`): at 100 TB the index is written once and probed
    many times, so the norm fold belongs on the build side — each
    probe then pays exactly one fold (the pair dot product) per
    scored candidate.
    """
    from labelspark_spark.functions.vectors import l2_norm
    from labelspark_spark.sources.writers import write_bucketed

    cent = F.broadcast(
        centroids.select(
            F.col(centroid_id_col).alias("_cid"), F.col(centroid_vec_col).alias("_cvec")
        )
    )
    # NB (r13 optimization round): the bucketed write below now
    # repartitions to the bucket spec, so the write parallelizes
    # regardless of the scan's split count; spreading the corpus before
    # the assignment UDF was tried and reverted (per-task Arrow
    # overhead outweighed the one-matmul stage on small inputs).
    assignment = _assign_to_centroids(
        corpus, cent, id_col, vec_col, assign, "vec_id", dim
    ).select(
        F.col("vec_id"),
        F.col("_v").alias("embedding"),
        F.col("_cid").alias("centroid_id"),
        l2_norm(F.col("_v").cast("array<double>")).alias("_norm"),
    )
    write_bucketed(assignment, table, bucket_cols=["centroid_id"], num_buckets=num_buckets)


def ivf_probe(
    queries: DataFrame,
    centroids: DataFrame,
    table: str = "ivf_index",
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
    dim: int = 64,
) -> DataFrame:
    """Probe a persisted IVF index: NO corpus-wide work.

    Queries (small) are assigned to their ``nprobe`` centroids and
    BROADCAST against the bucketed index scan — the index never
    shuffles, never re-assigns, and only the probed centroid lists'
    rows survive the join. The probe plan contains no cross join over
    the corpus (asserted in tests/test_plan_quality.py).

    Pair scoring hoists the two NORM folds to per-row projections
    (computed once per index row / per assigned query) and keeps only
    the dot-product fold per pair — with nprobe/k cells probed the
    pair count is a corpus fraction PER QUERY, so cutting the per-pair
    folds from three to one is the probe's dominant lever (measured
    5.8s -> 2.1s at sf0.1). The folds stay HIGHER-ORDER-FUNCTION form:
    the flat 64-term expression tree falls out of whole-stage codegen
    (method-size limit) and interprets SLOWER than the HOF fold here
    (measured 15.6s — the opposite of the small-expression sites where
    flat wins). Bit-equal results: cosine_from_parts documents the
    identical IEEE op order."""
    from labelspark_spark.functions.vectors import l2_norm

    spark = queries.sparkSession
    raw = spark.table(table)
    # prefer the build-time stored norm; recompute only for indexes
    # written before the `_norm` column existed
    if "_norm" in raw.columns:
        index = raw.select(
            "centroid_id", "vec_id", "embedding", F.col("_norm").alias("_nb")
        )
    else:
        index = raw.select(
            "centroid_id",
            "vec_id",
            "embedding",
            l2_norm(F.col("embedding").cast("array<double>")).alias("_nb"),
        )
    cent = F.broadcast(
        centroids.select(
            F.col(centroid_id_col).alias("_cid"), F.col(centroid_vec_col).alias("_cvec")
        )
    )
    q = F.broadcast(
        _assign_to_centroids(queries, cent, query_id_col, vec_col, nprobe, "query_id", dim)
        .withColumnRenamed("_v", "_qv")
        .withColumnRenamed("_cid", "centroid_id")
        .withColumn("_nq", l2_norm(F.col("_qv").cast("array<double>")))
    )
    scored = (
        index.join(q, "centroid_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            exact_cosine_rescore(
                F.col("_qv").cast("array<double>"),
                F.col("embedding").cast("array<double>"),
                F.col("_nq"),
                F.col("_nb"),
            ).alias("cos"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _rank_topk(scored, "query_id", k).select("query_id", "neighbor_id", "cos", "rank")


def ivf_probe_batch(
    queries: DataFrame,
    centroids: DataFrame,
    table: str = "ivf_index",
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
    dim: int = 64,
    chunk_rows: int = 512,
) -> DataFrame:
    """IVF probe for LARGE query batches — the physical strategy twin of
    :func:`ivf_probe`, with BIT-IDENTICAL output by construction.

    ``ivf_probe``'s broadcast + per-pair HOF fold is the right plan
    when the query set is small; at pseudo-labeling batch sizes (20% of
    the corpus probing 5/8 of the cells it is ~7e8 fold evaluations,
    measured ~5s at sf0.1 — the #1 line of knn_ivf_agreement). Here
    each cell's scoring is ONE numpy matmul: the bucketed index cogroups
    with the assigned queries on centroid_id (the index side reads
    bucket-aligned; queries shuffle on the same key), evaluated in
    Arrow batches chunked to ``chunk_rows`` query rows (bounds the
    matrix at chunk*|cell| doubles).

    The matmul is a PRE-SELECTOR only, never the reported score: per
    query it keeps every cell row within ``1e-4`` of the cell's k-th
    best matmul cosine, and the survivors (<= nprobe*(k+ties) rows per
    query) are re-scored ON THE SPARK SIDE with the exact expression
    chain :func:`ivf_probe` uses — left-associated HOF fold dot, the
    index's stored build-time ``_norm``, ``F.round(..., 6)`` HALF_UP —
    so the two physical strategies cannot diverge at a rounding
    boundary or across float accumulation orders (numpy matmul is
    pairwise/SIMD-summed; the fold is sequential; both land within
    ~1e-15 of the true cosine, so the 1e-4 margin provably covers every
    ordering flip the 1e-6 quantization could surface). Measured
    5.0s -> ~0.9s at sf0.1 for the knn batch with the same votes."""
    from labelspark_spark.functions.vectors import l2_norm

    spark = queries.sparkSession
    raw = spark.table(table)
    # same norm source as ivf_probe: build-time stored `_norm`, else a
    # recompute with the identical fold expression
    nb = (
        F.col("_norm")
        if "_norm" in raw.columns
        else l2_norm(F.col("embedding").cast("array<double>"))
    )
    index = raw.select("centroid_id", "vec_id", "embedding", nb.alias("_nb"))
    cent = F.broadcast(
        centroids.select(
            F.col(centroid_id_col).alias("_cid"), F.col(centroid_vec_col).alias("_cvec")
        )
    )
    q = (
        _assign_to_centroids(queries, cent, query_id_col, vec_col, nprobe, "query_id", dim)
        .withColumnRenamed("_v", "_qv")
        .withColumnRenamed("_cid", "centroid_id")
    )

    _EMPTY = {
        "query_id": pd.array([], dtype="int64"),
        "neighbor_id": pd.array([], dtype="int64"),
        "_qv": pd.array([], dtype="object"),
        "_nbr": pd.array([], dtype="object"),
        "_nb": pd.array([], dtype="float64"),
    }

    def _select_cell(idx_pdf: pd.DataFrame, q_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(idx_pdf) == 0 or len(q_pdf) == 0:
            return pd.DataFrame(_EMPTY)
        ids = idx_pdf["vec_id"].to_numpy()
        C = np.vstack([np.asarray(v, dtype=np.float64) for v in idx_pdf["embedding"]])
        nbs = idx_pdf["_nb"].to_numpy(dtype="float64")
        cn = np.sqrt(np.einsum("ij,ij->i", C, C))
        kk = min(k, len(ids))
        outs = []
        qids_all = q_pdf["query_id"].to_numpy()
        qvs_all = q_pdf["_qv"].to_numpy()
        for s in range(0, len(q_pdf), chunk_rows):
            Qm = np.vstack([np.asarray(v, dtype=np.float64) for v in qvs_all[s : s + chunk_rows]])
            qid = qids_all[s : s + chunk_rows]
            qn = np.sqrt(np.einsum("ij,ij->i", Qm, Qm))
            den = qn[:, None] * cn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(den == 0, 0.0, (Qm @ C.T) / den)
            # keep everything within the margin of the cell's k-th best:
            # a dropped row is > 1e-4 below kk in-cell rows, so it can
            # never re-enter the exact global top-k after the <= 1e-6
            # rounding movement (fp error ~1e-15)
            kth = np.partition(cos, len(ids) - kk, axis=1)[:, len(ids) - kk]
            qi, ci = np.nonzero(cos >= (kth[:, None] - 1e-4))
            outs.append(
                pd.DataFrame(
                    {
                        "query_id": qid[qi],
                        "neighbor_id": ids[ci],
                        "_qv": [Qm[i] for i in qi],
                        "_nbr": [C[j] for j in ci],
                        "_nb": nbs[ci],
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(_EMPTY)

    survivors = (
        index.groupBy("centroid_id")
        .cogroup(q.groupBy("centroid_id"))
        .applyInPandas(
            lambda left, right: _select_cell(left, right),
            "query_id bigint, neighbor_id bigint, "
            "_qv array<double>, _nbr array<double>, _nb double",
        )
    )
    # exact rescore: the SAME shared expression tree ivf_probe
    # evaluates (exact_cosine_rescore), on the same doubles
    # (float->double widening is IEEE-exact both in numpy and in
    # Spark's cast), so cos is bit-equal across the twins
    scored = survivors.select(
        "query_id",
        "neighbor_id",
        exact_cosine_rescore(
            F.col("_qv"),
            F.col("_nbr"),
            l2_norm(F.col("_qv")),
            F.col("_nb"),
        ).alias("cos"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    return _rank_topk(scored, "query_id", k).select("query_id", "neighbor_id", "cos", "rank")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
    dim: int = 64,
) -> DataFrame:
    """IVF ANN: corpus rows indexed by nearest centroid; each query
    probes its ``nprobe`` nearest centroid lists.

    ``centroids`` is small (broadcast); corpus assignment is one
    broadcast pass; probe is an equi-join on centroid id.
    """
    cent = F.broadcast(
        centroids.select(
            F.col(centroid_id_col).alias("_cid"), F.col(centroid_vec_col).alias("_cvec")
        )
    )
    c = _assign_to_centroids(corpus, cent, id_col, vec_col, 1, "neighbor_id", dim)
    q = _assign_to_centroids(
        queries, cent, query_id_col, vec_col, nprobe, "query_id", dim
    ).withColumnRenamed("_v", "_qv")
    scored = c.join(q, "_cid").select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine(F.col("_qv").cast("array<double>"), F.col("_v").cast("array<double>")), 6
        ).alias("cos"),
    ).distinct()
    return _rank_topk(scored, "query_id", k).select("query_id", "neighbor_id", "cos", "rank")


def knn_label_vote_arrow(
    emb: DataFrame,
    corpus_parquet: str,
    k: int = 5,
    dim: int = 64,
    corpus_mask_fn=None,
) -> DataFrame:
    """Exact k-NN majority-label vote, Arrow/numpy scoring path.

    Produces BIT-IDENTICAL results to the expression-tree formulation
    (pair cosine via flat left-fold dot/norms, ppm floor, neighbor order
    (cos_ppm desc, id asc), vote order (votes desc, label asc)) — the
    numpy inner loop accumulates over the dim axis sequentially
    (``acc += A[:,d] * B[:,d]``), which is element-wise the same IEEE
    mul-then-add chain as the flat SQL expression, so every double and
    every floor comes out equal. Justification for Python here: the
    64-term dot sits above a BroadcastNestedLoopJoin, outside whole-stage
    codegen, and evaluates INTERPRETED at ~100us/pair; Arrow + vectorized
    numpy is ~100x faster with identical bits. This is the declared
    ORACLE variant — the 100 TB path is the IVF probe
    (queries.py:q_knn_label_vote_ivf); here the corpus side is read
    executor-side per task from parquet (no driver collect), exactly the
    build-side read a broadcast hash join would do.

    ``corpus_mask_fn(ids: np.ndarray) -> bool ndarray`` optionally
    restricts the NEIGHBOR side after the read (e.g. the 80% labeled
    slice in the IVF-agreement companion) — queries vote only over the
    masked corpus; the ids-disjoint case skips nothing else.
    """
    out_schema = (
        "vec_id long, label int, predicted_label int, n_votes long"
    )

    def _score(batches):
        import pyarrow.parquet as pq

        t = pq.read_table(corpus_parquet, columns=["vec_id", "embedding", "label"])
        b_ids = t.column("vec_id").to_numpy()
        b_labels = t.column("label").to_numpy()
        # cast float32 -> float64 BEFORE any arithmetic, as the
        # expression form casts each element before the product
        B = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        if corpus_mask_fn is not None:
            m = corpus_mask_fn(b_ids)
            b_ids, b_labels, B = b_ids[m], b_labels[m], B[m]
        nb = np.zeros(len(b_ids))
        for d in range(dim):
            nb += B[:, d] * B[:, d]
        nb = np.sqrt(nb)

        for pdf in batches:
            A = np.asarray(pdf["embedding"].to_list(), dtype=np.float64)
            a_ids = pdf["vec_id"].to_numpy()
            a_labels = pdf["label"].to_numpy()
            na = np.zeros(len(a_ids))
            for d in range(dim):
                na += A[:, d] * A[:, d]
            na = np.sqrt(na)

            out = []
            # chunk the query rows so the m x n score matrix stays small
            for lo in range(0, len(a_ids), 512):
                Ac = A[lo : lo + 512]
                dots = np.zeros((len(Ac), len(b_ids)))
                for d in range(dim):
                    dots += Ac[:, d : d + 1] * B[None, :, d]
                denom = na[lo : lo + 512, None] * nb[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(denom == 0.0, 0.0, dots / denom)
                ppm = np.floor(cos * 1000000.0 + 0.5).astype(np.int64)
                for r in range(len(Ac)):
                    self_mask = b_ids != a_ids[lo + r]
                    cand_ppm = ppm[r][self_mask]
                    cand_ids = b_ids[self_mask]
                    cand_lab = b_labels[self_mask]
                    # neighbor order: cos_ppm desc, id asc (stable lexsort)
                    order = np.lexsort((cand_ids, -cand_ppm))[:k]
                    top_lab = cand_lab[order]
                    labs, votes = np.unique(top_lab, return_counts=True)
                    # vote order: votes desc, label asc
                    win = np.lexsort((labs, -votes))[0]
                    out.append(
                        (
                            int(a_ids[lo + r]),
                            int(a_labels[lo + r]),
                            int(labs[win]),
                            int(votes[win]),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["vec_id", "label", "predicted_label", "n_votes"]
            )

    par = emb.sparkSession.sparkContext.defaultParallelism
    return (
        emb.repartition(par)
        .select("vec_id", "label", "embedding")
        .mapInPandas(_score, schema=out_schema)
    )


# ---------------------------------------------------------------------------
# Product quantization (round 5): the classic memory-side ANN scale lever —
# vectors compress to M sub-space codebook codes (here 8 x 4-bit = 8 bytes
# vs 256 bytes of float32), candidate scoring is table lookups against the
# broadcastable codebooks (asymmetric distance computation), and only a
# small re-rank candidate set ever touches real vectors. At 100 TB the
# corpus rides scans 32x lighter and the codebooks are k*dim driver data,
# exactly like kmeans_fit's centroids.
# ---------------------------------------------------------------------------


def pq_train(
    df: DataFrame,
    num_subspaces: int = 8,
    dim: int = 64,
    ksub: int = 16,
    max_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> "np.ndarray":
    """Train per-subspace codebooks: Lloyd's k-means (the existing
    distributed :func:`kmeans_fit`) over each dim/M-wide slice of the
    embedding. Returns an (M, ksub, dsub) float64 array — codebooks are
    index metadata (M*ksub*dsub floats), the only thing collected."""
    if dim % num_subspaces:
        raise ValueError(
            f"dim={dim} is not divisible by num_subspaces={num_subspaces}: "
            f"the trailing {dim % num_subspaces} dimensions would be "
            "silently excluded from every codebook and ADC lookup while "
            "pq_encode's stored norm still includes them — recall would "
            "quietly degrade with no error"
        )
    dsub = dim // num_subspaces

    def _one_subspace(m: int) -> list:
        sub = df.select(
            F.col(id_col).alias("_sid"),
            F.slice(F.col(vec_col).cast("array<double>"), m * dsub + 1, dsub).alias("_sv"),
        )
        cb = kmeans_fit(
            sub, k=ksub, dim=dsub, max_iters=max_iters,
            vec_col="_sv", id_col="_sid", seed=seed + m,
        )
        return [r.centroid for r in cb.orderBy("centroid_id").collect()]

    # The M subspace fits are fully independent (disjoint slices, own
    # seeds), but each is a chain of small driver-blocking actions, and
    # each subspace's DISTINCT slice plan pays its own analysis/codegen
    # on the driver — run them from a small thread pool so compile and
    # execution overlap instead of serializing (guide §2.6; measured
    # ~18s -> ~6s cold at sf0.1). pool.map preserves subspace order, so
    # the stacked array is bit-identical to the sequential build.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, num_subspaces)) as pool:
        books = list(pool.map(_one_subspace, range(num_subspaces)))
    return np.asarray(books, dtype=np.float64)


def pq_encode(
    df: DataFrame,
    books: "np.ndarray",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode each vector to its per-subspace nearest codeword (L2,
    ties -> lowest code id via argmin-first) plus its true L2 norm (one
    scalar — needed to turn ADC dot estimates into cosine estimates).
    Arrow-batched; one (batch x ksub) distance matmul per subspace."""
    M, ksub, dsub = books.shape

    @F.pandas_udf("struct<codes: array<int>, norm: double>")
    def _enc(vs: pd.Series) -> pd.DataFrame:
        if len(vs) == 0:
            return pd.DataFrame({"codes": [], "norm": []})
        X = np.vstack(vs.to_numpy()).astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", X, X))
        codes = np.empty((len(X), M), dtype=np.int32)
        for m in range(M):
            sub = X[:, m * dsub : (m + 1) * dsub]
            b = books[m]
            d2 = (
                np.einsum("ij,ij->i", sub, sub)[:, None]
                - 2.0 * (sub @ b.T)
                + np.einsum("ij,ij->i", b, b)[None, :]
            )
            codes[:, m] = np.argmin(d2, axis=1)
        return pd.DataFrame(
            {"codes": [list(c) for c in codes], "norm": norms.astype(np.float64)}
        )

    return df.select(
        F.col(id_col).alias("neighbor_id"), _enc(F.col(vec_col)).alias("_pq")
    ).select("neighbor_id", F.col("_pq.codes").alias("codes"), F.col("_pq.norm").alias("norm"))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: "np.ndarray",
    k: int = 10,
    rerank: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage PQ ANN: (1) ADC candidate generation — each query builds
    an (M x ksub) dot-lookup table against the codebooks, every corpus
    code scores as M table lookups normalized by the stored norm; the
    per-partition top-``rerank`` per query is taken INSIDE the Arrow
    batch, so at most partitions*rerank candidate rows leave each scan
    task (queries are broadcast via closure-captured collect of the query
    slice — bounded like centroids, never the corpus). (2) Exact re-rank
    — candidates join back their true vectors and the final top-k uses
    the exact rounded cosine with the same total order as
    :func:`brute_force_topk`. Approximate overall (a true neighbor can
    miss the ADC cut): declared rows-only, recall asserted in tests."""
    M, ksub, dsub = books.shape
    q_rows = (
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
        .orderBy("query_id")
        .collect()
    )
    q_ids = np.array([r.query_id for r in q_rows], dtype=np.int64)
    Q = np.asarray([list(r._qv) for r in q_rows], dtype=np.float64)
    qnorm = np.sqrt(np.einsum("ij,ij->i", Q, Q))
    # per-query ADC lookup tables: dot(q_m, book[m][c])
    tables = np.stack(
        [Q[:, m * dsub : (m + 1) * dsub] @ books[m].T for m in range(M)], axis=1
    )  # (nq, M, ksub)

    enc = pq_encode(corpus, books, vec_col=vec_col, id_col=id_col)

    out_schema = "query_id long, neighbor_id long, adc double"

    def _adc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.vstack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, M)
            norms = pdf["norm"].to_numpy()
            nids = pdf["neighbor_id"].to_numpy()
            # dots[q, x] = sum_m tables[q, m, codes[x, m]]
            dots = np.zeros((len(q_ids), len(nids)))
            for m in range(M):
                dots += tables[:, m, :][:, codes[:, m]]
            with np.errstate(divide="ignore", invalid="ignore"):
                est = np.where(
                    (qnorm[:, None] * norms[None, :]) == 0.0,
                    0.0,
                    dots / (qnorm[:, None] * norms[None, :]),
                )
            rows = []
            keep = min(rerank, len(nids))
            for qi in range(len(q_ids)):
                # partial top-keep inside the batch; ties by neighbor id
                order = np.lexsort((nids, -est[qi]))[:keep]
                for j in order:
                    rows.append((int(q_ids[qi]), int(nids[j]), float(est[qi][j])))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "adc"])

    cand = (
        enc.mapInPandas(_adc, schema=out_schema)
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("adc").alias("adc"))
    )
    wc = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), F.col("neighbor_id"))
    cand = cand.withColumn("_cr", F.row_number().over(wc)).filter(
        F.col("_cr") <= rerank
    ).drop("_cr", "adc")
    # exact re-rank on the candidate set only
    qv = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nvec"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine(F.col("_qvec").cast("array<double>"), F.col("_nvec").cast("array<double>")),
                6,
            ).alias("cos"),
        )
    )
    return _rank_topk(scored, "query_id", k).select(
        "query_id", "neighbor_id", "cos", "rank"
    )
