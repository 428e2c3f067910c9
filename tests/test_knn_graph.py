"""kNN graph over the corpus: exact in the nprobe=n_cells regime
(hash-checked against brute-force SQL), subset-with-measured-recall in
the approximate regime, and a shuffle-join plan with no cartesian
product and no corpus broadcast."""

from __future__ import annotations

from pyspark.sql import functions as F

from hama_spark.extensions import knn_graph
from tests.conftest import assert_df_equals_oracle

_BRUTE_SQL = """
    WITH n AS (
      SELECT vec_id, list_transform(embedding::DOUBLE[], x -> x /
        sqrt(list_aggregate(list_transform(embedding::DOUBLE[], y -> y*y),
             'sum'))) AS v
      FROM embeddings)
    SELECT src, dst, cosine, rank FROM (
      SELECT q.vec_id AS src, c.vec_id AS dst,
             round(list_dot_product(c.v, q.v), 9) AS cosine,
             row_number() OVER (PARTITION BY q.vec_id
                ORDER BY round(list_dot_product(c.v, q.v), 9) DESC,
                         c.vec_id) AS rank
      FROM n c, n q WHERE c.vec_id <> q.vec_id)
    WHERE rank <= {k}
"""


def test_exact_regime_matches_brute_force_oracle(spark, tables, duck):
    emb = tables["embeddings"]
    out = knn_graph(emb, k=5, n_cells=8, nprobe=8, kmeans_iter=2)
    assert_df_equals_oracle(out, duck, _BRUTE_SQL.format(k=5))


def test_approximate_regime_is_subset_with_decent_recall(spark, tables):
    emb = tables["embeddings"]
    exact = knn_graph(emb, k=5, n_cells=8, nprobe=8, kmeans_iter=3)
    approx = knn_graph(emb, k=5, n_cells=8, nprobe=3, kmeans_iter=3)
    e = {(r["src"], r["dst"]) for r in exact.collect()}
    a = {(r["src"], r["dst"]) for r in approx.collect()}
    # every approximate edge is a real pair comparison (subset of the
    # full pair space with correct scores); recall is the only loss
    recall = len(a & e) / len(e)
    assert recall >= 0.5, recall
    # scores on shared edges agree exactly (same dot/round discipline)
    es = {(r["src"], r["dst"]): r["cosine"] for r in exact.collect()}
    for r in approx.collect():
        key = (r["src"], r["dst"])
        if key in es:
            assert es[key] == r["cosine"]


def test_every_point_gets_neighbors_and_no_self_edges(spark, tables):
    emb = tables["embeddings"]
    n = emb.count()
    out = knn_graph(emb, k=3, n_cells=4, nprobe=4, kmeans_iter=2)
    assert out.filter(F.col("src") == F.col("dst")).count() == 0
    per_src = out.groupBy("src").count().collect()
    assert len(per_src) == n
    assert all(r["count"] == 3 for r in per_src)


def test_plan_is_shuffle_join_without_corpus_broadcast(spark, tables):
    """The self-join must NOT broadcast a corpus side (that is the
    ivf_topk query-side pattern this operator exists to avoid) and must
    not degenerate to a cartesian product; top-k is a keyed window."""
    emb = tables["embeddings"]
    df = knn_graph(emb, k=3, n_cells=4, nprobe=2, kmeans_iter=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    from hama_spark.plans.audit import audit_plan

    assert not audit_plan(df, allow_nested_loop=False, allow_python=False)
