"""Tests for Online CF (M3) and the sources layer (G12/G13, S12, S13).

Reference test models: ml/src/test/.../TestOnlineCF.java (train on
preferences, assert estimatePreference close to the trained ratings),
examples/src/test/.../FastGraphGenTest.java and
SymmetricMatrixGenTest.java (structural asserts on generated graphs).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hama_spark.ml import online_cf_train
from hama_spark.sources import (
    fast_graph_gen,
    read_json_graph,
    read_movielens,
    read_tab_adjacency,
    read_weighted_adjacency,
    symmetric_matrix_gen,
)


# ------------------------------------------------------------ online CF
def _synthetic_ratings(spark, n_users=30, n_items=20, rank=2):
    """Low-rank ground truth: r(u,i) = dot(p_u, q_i) with deterministic
    factors — learnable by MF."""
    rows = []
    for u in range(n_users):
        pu = [math.sin(u * 1.3 + k) for k in range(rank)]
        for i in range(n_items):
            if (u * 7 + i * 3) % 4 == 0:  # ~25% observed
                qi = [math.cos(i * 0.7 + k) for k in range(rank)]
                rows.append((u, i, sum(a * b for a, b in zip(pu, qi))))
    return spark.createDataFrame(rows, "user long, item long, rating double")


def test_online_cf_rmse_decreases(spark):
    ratings = _synthetic_ratings(spark)
    model = online_cf_train(ratings, rank=4, iterations=10, learning_rate=0.05)
    h = model.rmse_history
    assert len(h) == 10
    assert h[-1] < h[0] * 0.7, f"RMSE did not improve: {h}"
    assert h == sorted(h, reverse=True), f"RMSE not monotone: {h}"


def test_online_cf_estimate_and_topk(spark):
    ratings = _synthetic_ratings(spark)
    model = online_cf_train(ratings, rank=4, iterations=12, learning_rate=0.05)
    est = model.estimate_preference(ratings.select("user", "item"))
    joined = ratings.join(est, ["user", "item"])
    rmse = joined.agg(
        F.sqrt(F.avg(F.pow(F.col("rating") - F.col("score"), 2)))
    ).collect()[0][0]
    assert rmse < 1.0
    top = model.most_preferred_items(
        ratings.select("user").distinct().limit(3), count=5
    ).collect()
    by_user = {}
    for r in top:
        by_user.setdefault(r["user"], []).append((r["rnk"], r["score"]))
    for u, rows in by_user.items():
        rows.sort()
        assert [r for r, _ in rows] == [1, 2, 3, 4, 5]
        scores = [s for _, s in rows]
        assert scores == sorted(scores, reverse=True)


def test_online_cf_topk_ann_matches_exact(spark):
    # Full-probe IVF (nprobe == n_cells) must recover the exact top-k:
    # the MIPS->cosine augmentation preserves dot-product order, and the
    # candidate set is then the whole catalog (bucketed scan, never a
    # cartesian). The final rank uses exact re-scored dots, so the
    # result is identical to the cross-join scorer.
    ratings = _synthetic_ratings(spark)
    model = online_cf_train(ratings, rank=4, iterations=8, learning_rate=0.05)
    users = ratings.select("user").distinct().limit(4)
    exact = sorted(
        (r["user"], r["item"], r["rnk"])
        for r in model.most_preferred_items(users, count=5).collect()
    )
    ann = sorted(
        (r["user"], r["item"], r["rnk"])
        for r in model.most_preferred_items_ann(
            users, count=5, n_cells=4, nprobe=4
        ).collect()
    )
    assert ann == exact


def test_online_cf_topk_ann_plan_not_cartesian(spark):
    ratings = _synthetic_ratings(spark, n_users=10, n_items=8)
    model = online_cf_train(ratings, rank=3, iterations=2, track_rmse=False)
    users = ratings.select("user").distinct().limit(2)
    plan = model.most_preferred_items_ann(
        users, count=3, n_cells=2, nprobe=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_online_cf_deterministic(spark):
    ratings = _synthetic_ratings(spark, n_users=10, n_items=8)
    m1 = online_cf_train(ratings, rank=3, iterations=3, track_rmse=False)
    m2 = online_cf_train(ratings, rank=3, iterations=3, track_rmse=False)
    a = sorted(map(tuple, m1.user_factors.collect()))
    b = sorted(map(tuple, m2.user_factors.collect()))
    assert a == b


# -------------------------------------------------------------- readers
def test_read_tab_adjacency(spark, tmp_path):
    p = str(tmp_path / "g.txt")
    with open(p, "w") as f:
        f.write("a\tb c\nb\tc\nc\ta\n")
    got = sorted(map(tuple, read_tab_adjacency(spark, p).collect()))
    assert got == [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")]


def test_read_weighted_adjacency(spark, tmp_path):
    p = str(tmp_path / "g.txt")
    with open(p, "w") as f:
        f.write("0\t1:85\t2:217\n1\t3:10\n")
    got = sorted(map(tuple, read_weighted_adjacency(spark, p).collect()))
    assert got == [("0", "1", 85), ("0", "2", 217), ("1", "3", 10)]


def test_read_json_graph(spark, tmp_path):
    p = str(tmp_path / "g.json")
    with open(p, "w") as f:
        f.write("[0, 0, [[1, 3], [2, 5]]]\n[1, 0, [[0, 7]]]\n")
    got = sorted(map(tuple, read_json_graph(spark, p).collect()))
    assert got == [("0", "1", 3), ("0", "2", 5), ("1", "0", 7)]


def test_read_movielens(spark, tmp_path):
    p = str(tmp_path / "ratings.dat")
    with open(p, "w") as f:
        f.write("1::31::2.5::1260759144\n2::1029::3.0::1260759179\n")
    got = sorted(map(tuple, read_movielens(spark, p).collect()))
    assert got == [(1, 31, 2.5), (2, 1029, 3.0)]


# ----------------------------------------------------------- generators
def test_fast_graph_gen_structure(spark):
    g = fast_graph_gen(spark, n=100, max_out=3, weight=10, seed=7)
    rows = g.collect()
    assert 100 <= len(rows) <= 300  # <= max_out per src, dups collapsed
    srcs = {int(r["src"]) for r in rows}
    assert srcs == set(range(100))  # every vertex emits >= 1 edge
    assert all(0 <= int(r["dst"]) < 100 for r in rows)
    assert all(0 <= r["weight"] < 10 for r in rows)
    # per-src distinct dsts (the HashSet semantics)
    per_src = {}
    for r in rows:
        per_src.setdefault(r["src"], []).append(r["dst"])
    assert all(len(v) == len(set(v)) <= 3 for v in per_src.values())


def test_fast_graph_gen_seeded_reproducible(spark):
    a = sorted(map(tuple, fast_graph_gen(spark, 50, seed=9).collect()))
    b = sorted(map(tuple, fast_graph_gen(spark, 50, seed=9, num_partitions=3).collect()))
    assert a == b  # partitioning-independent determinism


def test_symmetric_matrix_gen(spark):
    m = symmetric_matrix_gen(spark, n=30, density=0.3, seed=5)
    rows = [(r["row"], r["col"], r["value"]) for r in m.collect()]
    cells = {(r, c): v for r, c, v in rows}
    assert len(cells) == len(rows), "duplicate cells"
    for (r, c), v in cells.items():
        assert cells[(c, r)] == v, f"asymmetric at {(r, c)}"
    n_offdiag = sum(1 for (r, c) in cells if r < c)
    assert 0.15 < n_offdiag / (30 * 29 / 2) < 0.45  # density ~0.3
