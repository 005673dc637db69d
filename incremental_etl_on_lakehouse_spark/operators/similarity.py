"""Vector similarity search over embedding columns.

Two paths, same contract:

- ``topk_cosine_bruteforce`` — the correctness baseline: broadcast the (small)
  query set against the corpus, dot-product with ``zip_with``/``aggregate``
  (pure Catalyst), per-query top-k with a ranking window. At 100 TB the
  corpus side stays partitioned and is scanned once; the broadcast-nested-loop
  join never shuffles the corpus.
- ``topk_cosine_lsh`` — the scale path: sign-bucket both sides with
  deterministic random hyperplanes (same family as
  :func:`...dedup.embedding_dup_pairs`), MULTI-TABLE probing — L
  independent hyperplane tables, a candidate needs to collide in any one —
  and only score candidates sharing a bucket. Trades recall for a
  candidate set ~buckets-fraction of the corpus. (The complementary
  bit-flip multi-probe variant lives in ``dedup.embedding_dup_pairs``'s
  ``probe_flips``.)

Per-partition top-k before the global window keeps the shuffle tiny: each
partition emits at most k rows per query, so the final rank sees
O(k * partitions) rows instead of the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from incremental_etl_on_lakehouse_spark.functions import cosine_similarity, vec_norm


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Two-phase per-query top-k over a (query_id, corpus_id, cosine_sim) set.

    Phase 1 pre-reduces per INPUT partition: a window keyed by
    ``(query_id, spark_partition_id())`` hashes uniformly across reducers
    (every scored partition contributes its own key), so no single reducer
    ever sees a whole query's |corpus| candidates. After its ``<= k`` filter,
    at most ``k * n_partitions`` rows per query survive. Phase 2 runs the
    global per-query rank over that reduced set — the classic
    single-reducer-per-query straggler now sees O(k * partitions) rows
    instead of |corpus|. Results are identical to a one-shot window: the
    global top-k by (sim desc, corpus_id asc) is a subset of every
    partition-local top-k under the same ordering.

    Spark >= 3.5 additionally applies InferWindowGroupLimit, planning a
    map-side ``WindowGroupLimit ... Partial`` before EACH window exchange
    (visible in the executed plan). The explicit phase keeps the
    O(k * partitions) bound an engine-independent property of the operator
    rather than an optimizer courtesy; the extra exchange it introduces
    moves only the already-reduced row set.
    """
    w_local = Window.partitionBy("query_id", "__part").orderBy(
        F.col("cosine_sim").desc(), F.col("corpus_id").asc()
    )
    pruned = (
        scored.withColumn("__part", F.spark_partition_id())
        .withColumn("__lrank", F.row_number().over(w_local))
        .where(F.col("__lrank") <= k)
        .drop("__part", "__lrank")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine_sim", "rank")
    )


def _score(queries: DataFrame, corpus: DataFrame, qid: str, cid: str, qv: str, cv: str):
    q = queries.select(F.col(qid).alias("query_id"), F.col(qv).alias("__qv"))
    c = corpus.select(F.col(cid).alias("corpus_id"), F.col(cv).alias("__cv"))
    scored = q.hint("broadcast").crossJoin(c).select(
        "query_id",
        "corpus_id",
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias("cosine_sim"),
    )
    return scored


def topk_cosine_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id_col: str = "vec_id",
    corpus_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    corpus_vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Deterministic ordering: ties broken by corpus id ascending.
    """
    scored = _score(queries, corpus, query_id_col, corpus_id_col, query_vec_col, corpus_vec_col)
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("corpus_id"))
    return _rank_topk(scored, k)


def _bucket_expr(vec_col: str, planes: int, table: int):
    dims = F.size(F.col(vec_col))
    def plane_dot(j):
        seed = table * 1000 + j
        return F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.transform(
                    F.sequence(F.lit(0), dims - 1),
                    lambda d: ((F.xxhash64(d, F.lit(seed)) % 2001 + 2001) % 2001 - 1000)
                    / 1000.0,
                ),
                lambda x, h: x.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    bits = [F.when(plane_dot(j) >= 0, 1).otherwise(0) for j in range(planes)]
    acc = F.lit(table)
    for bit in bits:
        acc = acc * 2 + bit
    return acc


def topk_cosine_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    planes: int = 6,
    num_tables: int = 8,
    query_id_col: str = "vec_id",
    corpus_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    corpus_vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane-LSH candidates + exact rescore.

    Standard (L tables x p planes) LSH: a pair is a candidate if it collides
    in ANY table — recall = 1-(1-s_bit^p)^L where s_bit = 1 - angle/pi. More
    tables buy recall at the cost of candidate volume; fewer planes widen
    buckets. Both sides compute L bucket keys in one projection (explode), so
    the corpus is still scanned once; the join shuffles on (table, bucket).
    Same output shape as the brute-force path.
    """
    c_buckets = F.array(
        *[_bucket_expr(corpus_vec_col, planes, t) for t in range(num_tables)]
    )
    c = corpus.select(
        F.col(corpus_id_col).alias("corpus_id"),
        F.col(corpus_vec_col).alias("__cv"),
        F.explode(c_buckets).alias("bucket"),
    )
    q_buckets = F.array(
        *[_bucket_expr(query_vec_col, planes, t) for t in range(num_tables)]
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qv"),
        F.explode(q_buckets).alias("bucket"),
    )
    scored = q.hint("broadcast").join(c, "bucket").select(
        "query_id",
        "corpus_id",
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias("cosine_sim"),
    ).dropDuplicates(["query_id", "corpus_id"])
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("corpus_id"))
    return _rank_topk(scored, k)


def _nearest_centroid(df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str, n: int = 1) -> DataFrame:
    """Assign each row its ``n`` nearest centroids.

    Centroids are metadata-scale (k <= dozens), so they are collected and
    inlined as literal arrays: the assignment is ONE narrow projection — a
    per-row argmax over k inline cosine expressions, via ``sort_array`` on a
    k-element array of ``struct(sim, -centroid_id)`` (descending struct
    order = sim desc, centroid_id asc on ties). No crossJoin, no shuffle,
    no window, no aggregate — the whole stage is codegen'd map work, which
    is exactly the shape broadcast-centroid assignment should have at
    100 TB. (The previous formulation cross-joined the corpus against the
    centroid set and ranked with a per-id row_number window — a k× wider
    shuffle plus a per-key sort, for the same answer.)

    The ``.collect()`` here is k rows of dim-d floats — the same
    metadata-scale the merge planner's touched-file list lives at.
    """
    rows = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    entries = []
    for r in rows:
        cvec = F.array(*[F.lit(float(x)).cast("float") for x in r["__cvec"]])
        sim = cosine_similarity(F.col(vec_col), cvec)
        entries.append(
            F.struct(
                sim.alias("s"), F.lit(-int(r["centroid_id"])).alias("nc")
            )
        )
    best = F.slice(F.sort_array(F.array(*entries), asc=False), 1, min(n, len(rows)))
    return (
        df.withColumn("__best", F.explode(best))
        .withColumn("centroid_id", (-F.col("__best.nc")).cast("int"))
        .drop("__best")
    )


def fit_ivf_centroids(
    corpus: DataFrame,
    k: int = 16,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic mini k-means for IVF partitioning: seed centroids are
    the ``k`` smallest ids (deterministic, no RNG), refined with Lloyd
    iterations (assign -> elementwise mean via posexplode + groupBy).

    Returns (centroid_id, __cvec). At 100 TB you fit on a sample (the
    centroid quality barely moves past ~100k sampled rows) and broadcast the
    result — exactly what this function produces.
    """
    seeds = (
        corpus.orderBy(F.col(id_col)).limit(k)
        .select(F.col(id_col).alias("__seed_id"), F.col(vec_col).alias("__cvec"))
    )
    w = Window.orderBy("__seed_id")
    centroids = seeds.select(
        (F.row_number().over(w) - 1).alias("centroid_id"), "__cvec"
    )
    for _ in range(iterations):
        assigned = _nearest_centroid(
            corpus.select(id_col, vec_col), centroids, id_col, vec_col
        )
        means = (
            assigned.select(
                "centroid_id", F.posexplode(F.col(vec_col)).alias("pos", "val")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "centroid_id",
                F.transform(F.col("pm"), lambda s: s["m"].cast("float")).alias("__cvec"),
            )
        )
        centroids = means
    return centroids


def topk_cosine_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    query_id_col: str = "vec_id",
    corpus_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    corpus_vec_col: str = "embedding",
    exclude_self: bool = True,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus bucketed by nearest centroid; each query
    probes its ``n_probe`` nearest centroid buckets and exact-rescored.

    Candidate volume ≈ corpus x (n_probe / n_centroids); recall grows with
    n_probe. Same output schema as the brute-force path. The centroid fit is
    reusable (pass ``centroids=``) — at scale it's fit once on a sample and
    shared by every query batch.
    """
    if centroids is None:
        centroids = fit_ivf_centroids(
            corpus, k=n_centroids, id_col=corpus_id_col, vec_col=corpus_vec_col
        )
    c = _nearest_centroid(
        corpus.select(
            F.col(corpus_id_col).alias("corpus_id"), F.col(corpus_vec_col).alias("__cv")
        ),
        centroids,
        "corpus_id",
        "__cv",
    )
    q = _nearest_centroid(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qv")
        ),
        centroids,
        "query_id",
        "__qv",
        n=n_probe,
    )
    scored = (
        q.join(c, "centroid_id")
        .select(
            "query_id",
            "corpus_id",
            F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias(
                "cosine_sim"
            ),
        )
        .dropDuplicates(["query_id", "corpus_id"])
    )
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("corpus_id"))
    return _rank_topk(scored, k)


def normalize_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """L2-normalize an embedding column (pre-normalized corpora turn cosine
    into a plain dot product — cheaper at query time)."""
    norm = vec_norm(F.col(vec_col))
    return df.withColumn(
        vec_col,
        F.when(
            norm != 0.0,
            F.transform(F.col(vec_col), lambda x: (x.cast("double") / norm).cast("float")),
        ).otherwise(F.col(vec_col)),
    )


def semantic_dedup(
    corpus: DataFrame,
    k: int = 8,
    threshold: float = 0.95,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means partition the embedding corpus, then inside
    each cluster drop every vector that has a LOWER-id neighbor with cosine
    >= ``threshold``. The greedy smallest-id-wins rule makes the kept set a
    pure function of the data — no RNG, no iteration-order dependence — so
    the operator is retry/replan deterministic.

    Returns (id_col, kept boolean) for every input row.

    Scale shape: the pairwise comparison is quadratic ONLY within a
    cluster (the SemDeDup design point — k is chosen so clusters fit the
    pair budget, ~n/k rows each); globally it is one broadcast-centroid
    assignment (narrow projection), one self-join shuffled on cluster_id,
    and one anti-join. No corpus-wide all-pairs comparison exists in the
    plan. At 100 TB: fit centroids on a sample, raise k so n/k stays
    bounded, and salt any mega-cluster the same way skewed join keys are
    salted.
    """
    cents = fit_ivf_centroids(corpus, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col)
    assigned = _nearest_centroid(
        corpus.select(id_col, vec_col), cents, id_col, vec_col
    ).select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), "centroid_id")
    left = assigned.select(
        F.col("__id").alias("__id_a"), F.col("__v").alias("__va"), "centroid_id"
    )
    right = assigned.select(
        F.col("__id").alias("__id_b"), F.col("__v").alias("__vb"), "centroid_id"
    )
    dup_pairs = (
        left.join(right, "centroid_id")
        .where(F.col("__id_a") < F.col("__id_b"))
        .where(cosine_similarity(F.col("__va"), F.col("__vb")) >= threshold)
        .select(F.col("__id_b").alias("__dup_id"))
        .distinct()
    )
    return (
        corpus.select(F.col(id_col))
        .join(
            dup_pairs, F.col(id_col) == F.col("__dup_id"), "left_outer"
        )
        .select(id_col, F.col("__dup_id").isNull().alias("kept"))
    )
