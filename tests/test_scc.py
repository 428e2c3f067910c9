"""Directed SCC (coloring algorithm) vs an in-test iterative Tarjan on
structured and randomized graphs."""

import random

import pytest
from pyspark.sql import functions as F

from hama_spark.graph.scc import strongly_connected_components


def _tarjan(edges: list[tuple[str, str]]) -> set[frozenset]:
    """Iterative Tarjan — ground-truth SCC partition."""
    adj: dict = {}
    verts = set()
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        verts.add(s)
        verts.add(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    out = []
    counter = [0]

    for root in sorted(verts):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj.get(v, []))):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                out.append(frozenset(comp))
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return set(out)


def _spark_partition(spark, edges: list[tuple[str, str]]) -> set[frozenset]:
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = strongly_connected_components(df).collect()
    by_scc: dict = {}
    for r in rows:
        by_scc.setdefault(r["scc"], set()).add(r["id"])
    return {frozenset(v) for v in by_scc.values()}


def test_scc_structured_graphs(spark):
    # two 3-cycles joined by a one-way bridge, plus a dangling chain
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),          # cycle 1
        ("c", "x"),                                   # bridge ->
        ("x", "y"), ("y", "z"), ("z", "x"),          # cycle 2
        ("z", "t1"), ("t1", "t2"),                    # chain of singletons
    ]
    assert _spark_partition(spark, edges) == _tarjan(edges)


def test_scc_figure_eight_and_self_loops(spark):
    edges = [
        ("p", "q"), ("q", "p"),
        ("q", "r"), ("r", "q"),    # two cycles sharing q -> ONE scc
        ("s", "s"),                # self-loop singleton scc
        ("r", "s"),
    ]
    got = _spark_partition(spark, edges)
    assert got == _tarjan(edges)
    assert frozenset({"p", "q", "r"}) in got


def test_scc_random_graphs_match_tarjan(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 24
        m = 40 + trial * 15
        edges = list(
            {
                (f"v{rng.randrange(n):02d}", f"v{rng.randrange(n):02d}")
                for _ in range(m)
            }
        )
        assert _spark_partition(spark, edges) == _tarjan(edges), edges


def test_scc_canonical_label_and_validation(spark):
    edges = [("a", "b"), ("b", "a"), ("b", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = {r["id"]: r["scc"] for r in strongly_connected_components(df).collect()}
    assert rows == {"a": "b", "b": "b", "c": "c"}  # max id labels the scc

    with pytest.raises(ValueError):
        strongly_connected_components(df.where("src = 'zzz'"))


def test_scc_raises_instead_of_shattering_on_low_max_iter(spark):
    """A cycle deeper than max_iter must RAISE, never silently return
    singletons: pregel exits quietly at max_iter and half-propagated
    colors would mint fake roots."""
    n = 12
    edges = [(f"v{i:02d}", f"v{(i + 1) % n:02d}") for i in range(n)]
    df = spark.createDataFrame(edges, "src string, dst string")
    with pytest.raises(RuntimeError, match="max_iter"):
        strongly_connected_components(df, max_iter=4)
    # and with enough iterations the single big SCC comes back whole
    got = _spark_partition(spark, edges)
    assert got == {frozenset(f"v{i:02d}" for i in range(n))}


def test_scc_trim_settles_tendrils_identically(spark):
    """r7 verdict item 3: degree-0 peeling must settle tendril
    singletons WITHOUT changing any label — trim on/off produce the
    identical (id, scc) relation, and on a cycle-with-tendrils graph
    the trim pass settles every off-cycle vertex."""
    # 4-cycle core with an in-tendril chain and an out-tendril chain
    edges = (
        [("c0", "c1"), ("c1", "c2"), ("c2", "c3"), ("c3", "c0")]
        + [("t0", "t1"), ("t1", "t2"), ("t2", "c0")]  # feeds the cycle
        + [("c2", "u0"), ("u0", "u1"), ("u1", "u2")]  # drains the cycle
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    stats: dict = {}
    with_trim = {
        (r["id"], r["scc"])
        for r in strongly_connected_components(df, stats_out=stats).collect()
    }
    without = {
        (r["id"], r["scc"])
        for r in strongly_connected_components(df, trim_iters=0).collect()
    }
    assert with_trim == without
    # all 6 tendril vertices are acyclic-by-degree within 3 peels
    assert stats["trim_settled"] == 6
    # the cycle still needed exactly one color/collect round
    assert stats["rounds"] == 1


def test_scc_trim_only_graph_skips_pregel_entirely(spark):
    """A pure DAG shallow enough for the peel cap settles with ZERO
    Pregel rounds."""
    df = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")],
        "src string, dst string",
    )
    stats: dict = {}
    got = {
        (r["id"], r["scc"])
        for r in strongly_connected_components(df, stats_out=stats).collect()
    }
    assert got == {(v, v) for v in "abcd"}
    assert stats["rounds"] == 0 and stats["trim_settled"] == 4


def test_scc_trim_random_graphs_match_tarjan(spark):
    """Randomized equivalence incl. self-loops, trim at default."""
    rng = random.Random(99)
    for trial in range(3):
        n = rng.randrange(8, 18)
        edges = list(
            {
                (f"v{rng.randrange(n)}", f"v{rng.randrange(n)}")
                for _ in range(rng.randrange(n, 3 * n))
            }
        )
        assert _spark_partition(spark, edges) == _tarjan(edges), (trial, edges)


def test_scc_bwd_skip_regimes_identical(spark, monkeypatch):
    """r10: the size-aware e_bwd skip (giant-SCC regime reuses the full
    edge checkpoint for the backward phase) must label identically to
    the always-restrict path on a graph that actually trips the gate."""
    import hama_spark.graph.scc as sccmod

    # one giant cycle (all edges same-color after coloring) plus a tail
    n = 12
    edges = [(f"v{i}", f"v{(i + 1) % n}") for i in range(n)] + [
        ("v0", "t1"), ("t1", "t2")
    ]
    df = spark.createDataFrame(edges, "src string, dst string")

    def labels():
        return sorted(
            (r["id"], r["scc"])
            for r in sccmod.strongly_connected_components(df, trim_iters=0).collect()
        )

    monkeypatch.setattr(sccmod, "_BWD_SKIP_RATIO", 0.0)  # always skip
    always_skip = labels()
    monkeypatch.setattr(sccmod, "_BWD_SKIP_RATIO", 1.1)  # never skip
    never_skip = labels()
    assert always_skip == never_skip
