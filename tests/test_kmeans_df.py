"""Large-k Lloyd path (kmeans_df / ivf_build): centers stay a DataFrame
end-to-end — only a scalar moved-count hits the driver per iteration.
Must be VALUE-IDENTICAL to the driver-state kmeans() (same argmin, same
lowest-index tie-break, same unassigned-center rule, same stop rule)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hama_spark.ml.kmeans import kmeans, kmeans_df


def _points(spark, n=600, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, dim)).round(4)
    # three planted clusters
    pts[: n // 3] += 4.0
    pts[n // 3 : 2 * n // 3] -= 4.0
    return (
        spark.createDataFrame(
            [(r.tolist(),) for r in pts], "features array<double>"
        ),
        pts,
    )


def test_kmeans_df_matches_driver_state_kmeans(spark):
    df, pts = _points(spark)
    init = [pts[0].tolist(), pts[205].tolist(), pts[410].tolist(), pts[1].tolist()]
    ref = kmeans(df, init, max_iterations=7)
    got = kmeans_df(df, init, max_iterations=7)
    assert got.iterations == ref.iterations
    centers_df = {
        r["center_id"]: r["center"]
        for r in got.centers.orderBy("center_id").collect()
    }
    for i, c in enumerate(ref.centers):
        assert np.allclose(centers_df[i], c, atol=1e-12), i
    # assignment histograms identical
    ref_sizes = {
        r["center_id"]: r["n"]
        for r in ref.assignments.groupBy("center_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got_sizes = {
        r["center_id"]: r["n"]
        for r in got.assignments.groupBy("center_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert ref_sizes == got_sizes


def test_kmeans_df_unassigned_center_keeps_position(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0],), ([0.1, 0.0],), ([10.0, 10.0],)], "features array<double>"
    )
    # center 2 is far from everything: never assigned, must not move
    init = [[0.0, 0.0], [10.0, 10.0], [99.0, 99.0]]
    got = kmeans_df(df, init, max_iterations=5)
    centers = {r["center_id"]: r["center"] for r in got.centers.collect()}
    assert centers[2] == [99.0, 99.0]


def test_ivf_build_serves_ivf_topk_with_df_centers(spark):
    from hama_spark.extensions.similarity import cosine_topk, ivf_build, ivf_topk

    rng = np.random.default_rng(11)
    corpus = spark.createDataFrame(
        [(i, rng.normal(size=16).round(4).tolist()) for i in range(800)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(i, rng.normal(size=16).round(4).tolist()) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    cells = ivf_build(corpus, n_cells=12, kmeans_iter=3)
    assigned, centers = cells
    # every corpus point got a cell in [0, 12)
    stats = assigned.agg(
        F.count(F.lit(1)).alias("n"), F.min("cell").alias("lo"), F.max("cell").alias("hi")
    ).collect()[0]
    assert stats["n"] == 800 and 0 <= stats["lo"] and stats["hi"] < 12

    got = ivf_topk(corpus, queries, k=5, nprobe=6, cells=cells)
    assert got.groupBy("query_id").count().filter("count != 5").count() == 0
    # recall vs brute force with a generous probe is high
    exact = cosine_topk(corpus, queries, k=5)
    g = {(r["query_id"], r["vec_id"]) for r in got.collect()}
    x = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    assert len(g & x) / len(x) >= 0.6


def test_numpy_kernel_matches_expr_kernel_on_separated_clusters(spark):
    """The BLAS assignment kernel (float32 scores) must produce the
    same clustering as the JVM expression kernel away from ties —
    planted well-separated clusters leave no room for rounding flips."""
    df, pts = _points(spark)
    init = [pts[0].tolist(), pts[205].tolist(), pts[410].tolist()]
    a = kmeans_df(df, init, max_iterations=6, kernel="expr")
    b = kmeans_df(df, init, max_iterations=6, kernel="numpy")
    ca = {r["center_id"]: r["center"] for r in a.centers.collect()}
    cb = {r["center_id"]: r["center"] for r in b.centers.collect()}
    assert a.iterations == b.iterations
    for i in ca:
        assert np.allclose(ca[i], cb[i], atol=1e-9), i
    sa = {
        r["center_id"]: r["n"]
        for r in a.assignments.groupBy("center_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sb = {
        r["center_id"]: r["n"]
        for r in b.assignments.groupBy("center_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sa == sb


def test_expr_kernel_rejects_gapped_center_ids(spark):
    """Gapped center ids would silently relabel every point by sort
    position in the expr kernel (the numpy kernel already raises) —
    the guard lives inside the consumed ctrs expression so no
    projection can prune it away."""
    import pytest
    from hama_spark.ml.kmeans import assign_with_centers_df
    from hama_spark.functions.distance import MEASURES

    pts = spark.createDataFrame(
        [([0.0, 0.0],), ([5.0, 5.0],)], "features array<double>"
    )
    gapped = spark.createDataFrame(
        [(0, [0.0, 0.0]), (2, [5.0, 5.0])], "center_id int, center array<double>"
    )
    with pytest.raises(Exception, match="contiguous"):
        assign_with_centers_df(pts, gapped, MEASURES["euclidean"]).collect()
    ok = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [5.0, 5.0])], "center_id int, center array<double>"
    )
    got = assign_with_centers_df(pts, ok, MEASURES["euclidean"]).collect()
    assert sorted(r["center_id"] for r in got) == [0, 1]


def test_assignments_survive_source_recompute(spark):
    """kmeans_df must return the rows training saw even when the input
    lineage is nondeterministic — the final assignment is materialized
    before the points cache is dropped."""
    src = spark.range(400).select(
        F.array(F.rand(seed=None), F.rand(seed=None)).alias("features")
    )
    res = kmeans_df(src, [[0.2, 0.2], [0.8, 0.8]], max_iterations=3)
    # two evaluations of a lazy plan over rand(seed=None) would differ;
    # a materialized result is stable
    a = res.assignments.groupBy("center_id").count().collect()
    b = res.assignments.groupBy("center_id").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ivf_build_empty_corpus_raises(spark):
    import pytest
    from hama_spark.extensions.similarity import ivf_build

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="no rows"):
        ivf_build(empty, n_cells=4)


def test_materialize_assignments_gate(spark):
    """r6 ADVICE low: the default eager localCheckpoint of assignments
    pins ONE ROW PER INPUT POINT in executor storage; callers that
    immediately aggregate a deterministic input can opt out. Pinned =
    the returned plan is a bare checkpoint scan (no compute above the
    leaf); lazy = the assignment expression is still in the plan (zero
    storage footprint, recomputed on use). Values identical either way
    on deterministic lineage."""
    df, pts = _points(spark, n=120)
    init = [pts[0].tolist(), pts[50].tolist(), pts[90].tolist()]
    for fn in (kmeans, kmeans_df):
        pinned = fn(df, init, max_iterations=4)
        lazy = fn(df, init, max_iterations=4, materialize_assignments=False)
        plan_pinned = (
            pinned.assignments._jdf.queryExecution().optimizedPlan().toString()
        )
        plan_lazy = (
            lazy.assignments._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "Project" not in plan_pinned, (fn.__name__, plan_pinned)
        assert "Project" in plan_lazy, (fn.__name__, plan_lazy)
        sizes = lambda r: sorted(
            map(tuple, r.assignments.groupBy("center_id").count().collect())
        )
        assert sizes(pinned) == sizes(lazy), fn.__name__
