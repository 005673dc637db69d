"""Reproduces the SCALE.md measured parameter sweep (marked slow).

Every number in SCALE.md's "Measured parameter sweep" tables is asserted
here exactly: all operators involved are deterministic (seeded hyperplanes,
xxhash64 MinHash family), so the measurements are properties of the code +
fixture, not of a lucky run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incremental_etl_on_lakehouse_spark.operators import dedup as D
from incremental_etl_on_lakehouse_spark.operators import similarity as SIM
from incremental_etl_on_lakehouse_spark.operators import text as T
from incremental_etl_on_lakehouse_spark.tables import load_table

pytestmark = pytest.mark.slow

# (planes, tables) -> (candidate pairs, recall@10 hits of 50)
ANN_EXPECTED = {
    (2, 8): (2227, 48),
    (4, 8): (1040, 30),
    (4, 16): (1628, 44),
    (8, 4): (43, 4),
}

# bands -> (candidate pairs, found with est >= 0.5); truth is 28 pairs
MINHASH_EXPECTED = {8: (28, 28), 16: (28, 28), 32: (68, 28)}
MINHASH_TRUTH = 28


def test_minhash_banding_sweep(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    sh = docs.select("doc_id", T.shingles(F.col("text"), 3).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    uni = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    truth = {
        (r.id_a, r.id_b)
        for r in (
            a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                (inter.cast("double") / uni).alias("j"),
            )
            .where(F.col("j") >= 0.5)
            .collect()
        )
    }
    assert len(truth) == MINHASH_TRUTH
    for bands, (exp_cand, exp_found) in MINHASH_EXPECTED.items():
        rows = D.minhash_lsh_pairs(
            docs, bands=bands, jaccard_threshold=0.0
        ).collect()
        found = {(r.id_a, r.id_b) for r in rows if r.jaccard_sim >= 0.5}
        assert len(rows) == exp_cand, f"bands={bands} candidates"
        assert len(found) == exp_found, f"bands={bands} found"
        # recall 1.0 at every setting: exact dups collide in every band
        assert found >= truth, f"bands={bands} missed true pairs"


def test_ann_lsh_sweep(spark, sf_dir):
    embs = load_table(spark, "embeddings", sf_dir)
    q = embs.where("vec_id < 5")
    bf = {
        (r.query_id, r.corpus_id)
        for r in SIM.topk_cosine_bruteforce(q, embs, k=10).collect()
    }
    assert len(bf) == 50
    for (planes, tables), (exp_cand, exp_hits) in ANN_EXPECTED.items():
        out = {
            (r.query_id, r.corpus_id)
            for r in SIM.topk_cosine_lsh(
                q, embs, k=10, planes=planes, num_tables=tables
            ).collect()
        }
        buckets = lambda df, idc: df.select(  # noqa: E731
            F.col("vec_id").alias(idc),
            F.explode(
                F.array(
                    *[
                        SIM._bucket_expr("embedding", planes, t)
                        for t in range(tables)
                    ]
                )
            ).alias("bucket"),
        )
        cands = (
            buckets(q, "query_id")
            .join(buckets(embs, "corpus_id"), "bucket")
            .select("query_id", "corpus_id")
            .distinct()
            .count()
        )
        assert cands == exp_cand, f"(p={planes},L={tables}) candidates"
        assert len(out & bf) == exp_hits, f"(p={planes},L={tables}) recall"
