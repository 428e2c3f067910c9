"""KMV-HyperBall neighborhood function / effective diameter: with k
above the vertex count the sketches never fill, so the whole
computation is EXACT — pinned against hand-computed ball sizes."""

import pytest

from hama_spark.graph.diameter import effective_diameter, neighborhood_function


def _path_edges(spark, n=10):
    rows = [(str(i), str(i + 1)) for i in range(n - 1)]
    return spark.createDataFrame(rows, "src string, dst string")


def _exact_path_curve(n=10):
    """N(r) for the undirected path 0..n-1."""
    out = []
    r = 0
    while True:
        total = sum(
            min(n - 1, v + r) - max(0, v - r) + 1 for v in range(n)
        )
        out.append((r, float(total)))
        if total == n * n:
            return out
        r += 1


def test_neighborhood_function_exact_on_path(spark):
    got = {
        r["r"]: r["reachable_pairs"]
        for r in neighborhood_function(_path_edges(spark), max_r=16, k=64).collect()
    }
    for r, n in _exact_path_curve():
        assert got[r] == n, f"N({r}) = {got[r]} != exact {n}"
    # saturated exactly at the path diameter
    assert max(got) == 9


def test_effective_diameter_path_and_star(spark):
    d = effective_diameter(_path_edges(spark), q=1.0, k=64)
    assert d == pytest.approx(9.0)

    star = spark.createDataFrame(
        [("c", f"l{i}") for i in range(9)], "src string, dst string"
    )
    assert effective_diameter(star, q=1.0, k=64) == pytest.approx(2.0)
    # q=0.5: N(0)=10, N(1)=28, N(2)=100; target 50 -> between r=1 and 2
    d_half = effective_diameter(star, q=0.5, k=64)
    assert 1.0 < d_half < 2.0

    with pytest.raises(ValueError):
        effective_diameter(star, q=0.0)
    with pytest.raises(ValueError):
        neighborhood_function(star, k=1)


def test_neighborhood_function_estimates_with_small_k(spark, tables):
    """On the fixture customer->nation graph, a small-k estimate must
    land within KMV tolerance of the exact (large-k) curve's final
    value — the property a user relies on at scale."""
    edges = (
        tables["customer"]
        .select(
            tables["customer"]["c_custkey"].cast("string").alias("src"),
            tables["customer"]["c_nationkey"].cast("string").alias("dst"),
        )
    )
    exact = neighborhood_function(edges, max_r=6, k=4096).collect()
    approx = neighborhood_function(edges, max_r=6, k=64).collect()
    n_exact = exact[-1]["reachable_pairs"]
    n_approx = approx[-1]["reachable_pairs"]
    assert abs(n_approx - n_exact) / n_exact < 0.35  # 1/sqrt(64) ~ 0.125, 3 sigma
    # curve is monotone nondecreasing in both cases
    for rows in (exact, approx):
        vals = [r["reachable_pairs"] for r in rows]
        assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:]))


def test_effective_diameter_low_q_clamps_to_zero(spark):
    star = spark.createDataFrame(
        [("c", f"l{i}") for i in range(9)], "src string, dst string"
    )
    # target 0.05 * 100 = 5 <= N(0) = 10: reached before any hop
    assert effective_diameter(star, q=0.05, k=64) == 0.0


def test_neighborhood_function_empty_graph_raises(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError):
        neighborhood_function(empty)


def test_reachability_counts_exact_on_directed_chain(spark):
    """Directed chain v0->...->v9: vertex i reaches exactly 10-i
    vertices (itself + downstream). k=64 > n keeps KMV exact."""
    from hama_spark.graph.diameter import reachability_counts

    edges = spark.createDataFrame(
        [(f"v{i}", f"v{i+1}") for i in range(9)], "src string, dst string"
    )
    got = {
        r["id"]: r["reachable_est"]
        for r in reachability_counts(edges, k=64, symmetrize=False).collect()
    }
    assert got == {f"v{i}": float(10 - i) for i in range(10)}


def test_effective_diameter_refuses_truncated_curve(spark):
    # path of 10 vertices: undirected diameter 9; max_r=3 cannot
    # saturate, so the last curve point underestimates N(inf)
    edges = _path_edges(spark, n=10)
    with pytest.raises(RuntimeError, match="did not saturate"):
        effective_diameter(edges, q=1.0, max_r=3, k=64)
    # opting in yields the lower-bound diameter of the truncation
    d = effective_diameter(edges, q=1.0, max_r=3, k=64, allow_truncated=True)
    assert 0.0 < d <= 3.0
