"""Measured ANN recall guard on the ORGANIC embeddings fixture.

The planted-twin keys (ext_sim_lsh_planted / ext_sim_ivf_planted) prove
the production paths are LIVE (the twin always surfaces at rank 1); this
suite pins their QUALITY: recall@5 of the registered approximate keys
against the exact brute-force answer on the natural corpus — a silent
bucketing bug that halves recall stays green on the planted fixtures but
fails here.

Measured values at the pinned parameters (sf0.01 organic embeddings,
both deterministic — hash-derived hyperplanes / deterministic
mini-kmeans):

- ext_sim_lsh  (planes=4, tables=16):       recall@5 = 0.92 (23/25)
- ext_sim_ivf  (centroids=8, probe=3):      recall@5 = 0.92 (23/25)
"""

from incremental_etl_on_lakehouse_spark.queries import QUERIES

RECALL_FLOOR = 0.9
K = 5


def _top5(spark, sf_dir, key):
    df = QUERIES[key](spark, sf_dir)
    return {
        (r["query_id"], r["corpus_id"])
        for r in df.where(f"rank <= {K}").collect()
    }


def test_ann_recall_at_5_on_organic_corpus(spark, sf_dir):
    exact = _top5(spark, sf_dir, "ext_sim_topk")
    assert len(exact) == 25  # 5 queries x top-5
    for key in ("ext_sim_lsh", "ext_sim_ivf"):
        approx = _top5(spark, sf_dir, key)
        recall = len(exact & approx) / len(exact)
        assert recall >= RECALL_FLOOR, (
            f"{key} recall@{K} regressed to {recall:.2f} "
            f"({len(exact & approx)}/{len(exact)}) — the approximate path "
            "is returning materially worse neighbors than its measured "
            "0.92 baseline"
        )
