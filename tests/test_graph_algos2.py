"""Tests for K-Core (A6), BipartiteMatching (A5), SemiClustering (A7).

Mirrors the reference's example-test tier (SURVEY §5): exact golden
asserts for deterministic ops (k-core vs a Python peel oracle),
structural-invariant asserts for randomized/greedy ones (matching
validity+maximality — BipartiteMatchingTest.java; cluster well-formedness
— SemiClusterMatchingTest.java).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from hama_spark.graph import bipartite_matching, kcore, semi_clustering


# ---------------------------------------------------------------- k-core
def _peel_coreness(edges: list[tuple[str, str]]) -> dict[str, int]:
    """Reference oracle: classic O(E) peel (Batagelj-Zaveršnik)."""
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    deg = {v: len(ns) for v, ns in adj.items()}
    core = {}
    remaining = set(deg)
    while remaining:
        v = min(remaining, key=lambda x: (deg[x], x))
        core[v] = deg[v]
        remaining.remove(v)
        for u in adj[v]:
            if u in remaining and deg[u] > deg[v]:
                deg[u] -= 1
    return core


def test_kcore_clique_plus_pendant(spark):
    # 4-clique {a,b,c,d} (coreness 3) + pendant e-a (coreness 1)
    clique = ["a", "b", "c", "d"]
    e = [(u, v) for u in clique for v in clique if u < v] + [("a", "e")]
    edges = spark.createDataFrame(e, "src string, dst string")
    got = {r["id"]: r["core"] for r in kcore(edges).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 1}


def test_kcore_matches_peel_oracle(spark, tables):
    # supplier-part bipartite graph at sf0.001, vs the Python peel
    el = (
        tables["lineitem"]
        .select(
            F.concat(F.lit("s"), "l_suppkey").alias("src"),
            F.concat(F.lit("p"), "l_partkey").alias("dst"),
        )
        .distinct()
    )
    pairs = [(r["src"], r["dst"]) for r in el.collect()]
    expected = _peel_coreness(pairs)
    got = {r["id"]: r["core"] for r in kcore(el).collect()}
    assert got == expected


def test_kcore_fixed_iters_deterministic(spark):
    ring = [(str(i), str((i + 1) % 6)) for i in range(6)]
    edges = spark.createDataFrame(ring, "src string, dst string")
    a = sorted(map(tuple, kcore(edges, fixed_iters=3).collect()))
    b = sorted(map(tuple, kcore(edges, fixed_iters=3).collect()))
    assert a == b
    # a 6-ring fully converges to coreness 2 everywhere
    full = {r["id"]: r["core"] for r in kcore(edges).collect()}
    assert set(full.values()) == {2}


def _sync_hindex_rounds(edges: list[tuple[str, str]], iters: int) -> dict[str, int]:
    """Reference replay: full synchronous Montresor rounds — every
    vertex recomputes its h-index from ALL neighbor estimates, all
    ``iters`` rounds run. The operator (which EXITS EARLY once a round
    changes nothing) must match this exactly at every fixed iteration
    count, converged or not — early exit may only ever skip identity
    rounds."""
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    core = {v: len(ns) for v, ns in adj.items()}
    for _ in range(iters):
        nxt = {}
        for v, ns in adj.items():
            vals = sorted((core[n] for n in ns), reverse=True)
            h = max(min(c, i + 1) for i, c in enumerate(vals))
            nxt[v] = min(core[v], h)
        core = nxt
    return core


def test_kcore_early_exit_matches_full_schedule(spark):
    # seeded random graph; assert at iteration counts BELOW and AT
    # convergence — truncating the schedule at the fixpoint must never
    # alter the synchronous result
    import hashlib

    n = 40
    el = []
    for i in range(n):
        for j in range(3):
            h = int(hashlib.md5(f"kc:{i}:{j}".encode()).hexdigest()[:8], 16) % n
            if h != i:
                el.append((str(i), str(h)))
    edges = spark.createDataFrame(el, "src string, dst string")
    for iters in (1, 2, 3, 8):
        got = {r["id"]: r["core"] for r in kcore(edges, fixed_iters=iters).collect()}
        assert got == _sync_hindex_rounds(el, iters), f"diverged at iters={iters}"


# ------------------------------------------------------------- matching
def _matching_fixture(spark, n_left=40, n_right=30):
    verts = [(f"l{i}", "L") for i in range(n_left)] + [
        (f"r{j}", "R") for j in range(n_right)
    ]
    # deterministic pseudo-random bipartite edges
    edges = [
        (f"l{i}", f"r{(i * 7 + k * 13) % n_right}")
        for i in range(n_left)
        for k in range(3)
    ]
    v = spark.createDataFrame(verts, "id string, side string")
    e = spark.createDataFrame(sorted(set(edges)), "src string, dst string")
    return v, e, sorted(set(edges))


def test_bipartite_matching_is_valid_and_maximal(spark):
    v, e, edge_set = _matching_fixture(spark)
    res = bipartite_matching(v, e, seed=42).collect()
    match = {r["id"]: r["match"] for r in res}
    side = {r["id"]: r["side"] for r in res}
    # symmetry + edges exist + L/R only
    for vid, m in match.items():
        if m is None:
            continue
        assert match[m] == vid, f"{vid}<->{m} not symmetric"
        l, r = (vid, m) if side[vid] == "L" else (m, vid)
        assert (l, r) in set(edge_set), f"matched non-edge {(l, r)}"
    # maximality: no unmatched L adjacent to unmatched R
    for l, r in edge_set:
        assert not (match[l] is None and match[r] is None), (
            f"unmatched edge {(l, r)} — matching not maximal"
        )


def test_bipartite_matching_seeded_reproducible(spark):
    v, e, _ = _matching_fixture(spark)
    a = sorted(map(tuple, bipartite_matching(v, e, seed=7).collect()))
    b = sorted(map(tuple, bipartite_matching(v, e, seed=7).collect()))
    assert a == b


def test_bipartite_matching_perfect_on_disjoint_pairs(spark):
    v = spark.createDataFrame(
        [(f"l{i}", "L") for i in range(5)] + [(f"r{i}", "R") for i in range(5)],
        "id string, side string",
    )
    e = spark.createDataFrame(
        [(f"l{i}", f"r{i}") for i in range(5)], "src string, dst string"
    )
    res = bipartite_matching(v, e).collect()
    assert all(r["match"] is not None for r in res)
    assert {r["id"]: r["match"] for r in res}["l3"] == "r3"


# -------------------------------------------------------- semiclustering
def test_semi_clustering_two_triangles(spark):
    # two unit-weight triangles joined by one weak bridge
    tri1 = [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0)]
    tri2 = [("x", "y", 1.0), ("y", "z", 1.0), ("x", "z", 1.0)]
    bridge = [("c", "x", 0.1)]
    edges = spark.createDataFrame(tri1 + tri2 + bridge, "src string, dst string, weight double")
    res = semi_clustering(edges, max_iter=4, max_vertex_count=3).collect()
    by_id = {r["id"]: r["clusters"] for r in res}
    assert set(by_id) == {"a", "b", "c", "x", "y", "z"}
    for vid, clusters in by_id.items():
        assert clusters, f"{vid} has no clusters"
        for c in clusters:
            assert vid in c["members"], "cluster does not contain its vertex"
            assert len(c["members"]) <= 3
            assert c["cid"] == "+".join(sorted(c["members"]))
        # best-first ordering
        scores = [c["score"] for c in clusters]
        assert scores == sorted(scores, reverse=True)
    # a triangle of unit weights has score iC / (vC(vC-1)/2) = 3/3 = 1,
    # the best possible here; every triangle member should find it
    for vid, tri in [("a", {"a", "b", "c"}), ("z", {"x", "y", "z"})]:
        best = by_id[vid][0]
        assert set(best["members"]) == tri
        assert abs(best["score"] - 1.0) < 1e-9


def test_triangle_count_known_graph(spark):
    from hama_spark.graph import triangle_count

    # K4 minus one edge (a-b, a-c, a-d, b-c, b-d): triangles abc, abd
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("b", "a")],
        "src string, dst string",
    )
    rows = {r["id"]: r for r in triangle_count(edges).collect()}
    assert {i: r["triangles"] for i, r in rows.items()} == {
        "a": 2, "b": 2, "c": 1, "d": 1,
    }
    assert rows["c"]["degree"] == 2 and rows["c"]["lcc"] == 1.0
    assert rows["a"]["degree"] == 3 and abs(rows["a"]["lcc"] - 2 / 3) < 1e-9


def test_triangle_count_oracle(spark, tables, duck):
    import __spark_entry__ as entry
    from tests.conftest import assert_df_equals_oracle

    got = entry.queries()["triangle_count"](spark, "/root/testdata/sf0.001")
    assert_df_equals_oracle(got, duck, entry.oracle_sql()["triangle_count"])


def test_personalized_pagerank_concentrates_on_source(spark):
    """PPR invariants on a small path+cycle graph: ranks sum to ~1,
    the source holds the largest rank, and a vertex unreachable from
    the source gets only pass-through damping mass (near zero)."""
    from pyspark.sql import functions as F

    from hama_spark.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("x", "a")],
        "src string, dst string",
    )
    pr = pagerank(edges, epsilon=None, max_iter=20, self_ref=True, personalize="a")
    rows = {r["id"]: r["rank"] for r in pr.collect()}
    assert abs(sum(rows.values()) - 1.0) < 1e-6
    assert rows["a"] == max(rows.values())
    # x has no in-edges from the walk (teleport returns to 'a' only)
    assert rows["x"] < 1e-6
    # uniform pagerank still behaves: same graph, no personalization
    pu = {r["id"]: r["rank"] for r in pagerank(edges, epsilon=None, max_iter=20).collect()}
    assert abs(sum(pu.values()) - 1.0) < 1e-6
    assert pu["x"] > 1e-3  # uniform teleport gives x mass


def test_random_walks_follow_edges_and_are_deterministic(spark):
    from pyspark.sql import functions as F

    from hama_spark.graph import random_walks

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "d")],
        "src string, dst string",
    )
    out = {r["walk_src"]: r["walk"] for r in random_walks(edges, walk_len=6, seed=7).collect()}
    adj = {"a": {"b", "c"}, "b": {"c"}, "c": {"a"}, "d": {"d"}}
    assert set(out) == {"a", "b", "c", "d"}
    for src, walk in out.items():
        steps = walk.split("->")
        assert steps[0] == src and len(steps) == 7
        for u, v in zip(steps, steps[1:]):
            assert v in adj[u], (walk, u, v)
    again = {r["walk_src"]: r["walk"] for r in random_walks(edges, walk_len=6, seed=7).collect()}
    assert out == again
    other = {r["walk_src"]: r["walk"] for r in random_walks(edges, walk_len=6, seed=8).collect()}
    assert other != out  # a different seed changes at least one walk


def test_random_walks_super_node_cap(spark):
    from pyspark.sql import functions as F

    from hama_spark.graph import random_walks

    # hub vertex with 1000 out-edges, plus a small tail component
    hub = spark.range(1000).select(
        F.lit("hub").alias("src"), F.concat(F.lit("n"), F.col("id")).alias("dst")
    )
    tail = spark.createDataFrame([("x", "y"), ("y", "x")], "src string, dst string")
    edges = hub.union(tail)

    capped = {
        r["walk_src"]: r["walk"]
        for r in random_walks(edges, walk_len=4, seed=3, max_degree=16).collect()
    }
    # every walk still follows real edges and keeps uniform length
    hub_targets = {f"n{i}" for i in range(1000)}
    for src, walk in capped.items():
        steps = walk.split("->")
        assert len(steps) == 5 and steps[0] == src
        if steps[0] == "hub":
            assert steps[1] in hub_targets
    # determinism across runs with the hub present
    again = {
        r["walk_src"]: r["walk"]
        for r in random_walks(edges, walk_len=4, seed=3, max_degree=16).collect()
    }
    assert capped == again
    # the materialized neighbor list is cap-bounded for the hub and
    # untouched elsewhere, and the sampled subset is deterministic
    from hama_spark.graph.walks import _capped_neighbors

    nb = {r["src"]: r["nbrs"] for r in _capped_neighbors(edges, 3, 16).collect()}
    assert len(nb["hub"]) == 16 and set(nb["hub"]) <= hub_targets
    assert nb["x"] == ["y"] and nb["y"] == ["x"]
    nb2 = {r["src"]: r["nbrs"] for r in _capped_neighbors(edges, 3, 16).collect()}
    assert nb == nb2
    # a graph entirely at/below the cap is bit-identical to uncapped
    small = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    assert {
        r["walk_src"]: r["walk"] for r in random_walks(small, walk_len=5, seed=7).collect()
    } == {
        r["walk_src"]: r["walk"]
        for r in random_walks(small, walk_len=5, seed=7, max_degree=2).collect()
    }


def test_kcore_fixed_iters_zero_returns_degrees(spark):
    """Degenerate schedule: zero rounds = core_0 = degree, and the
    result must be usable AFTER kcore returns (the r6 ADVICE case: the
    lazy degree checkpoint must be materialized before the edge cache
    is dropped, so this collect doesn't replay the symmetrize)."""
    e = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    edges = spark.createDataFrame(e, "src string, dst string")
    got = {r["id"]: r["core"] for r in kcore(edges, fixed_iters=0).collect()}
    assert got == {"a": 2, "b": 2, "c": 3, "d": 1}


def test_random_walks_join_strategy_identical(spark):
    """r7 verdict item 5: the shuffle-hash step join (default) and the
    sort-merge plan must produce identical walks — the hint changes
    physical co-location only, never the seeded draw."""
    import random as _random

    from hama_spark.graph import random_walks

    rng = _random.Random(3)
    e = spark.createDataFrame(
        list({(f"v{rng.randrange(30)}", f"v{rng.randrange(30)}") for _ in range(80)}),
        "src string, dst string",
    )
    a = {r["walk_src"]: r["walk"] for r in random_walks(e, walk_len=6, seed=9).collect()}
    b = {
        r["walk_src"]: r["walk"]
        for r in random_walks(e, walk_len=6, seed=9, step_join="sort_merge").collect()
    }
    assert a == b and len(a) > 0
    import pytest

    with pytest.raises(ValueError, match="step_join"):
        random_walks(e, step_join="broadcast")


def test_random_walks_path_assembly_identical(spark):
    """r9 lever: the carry (default) and final path-assembly plans must
    produce identical walks — final only changes WHERE the path string
    is built (end-of-run groupBy vs per-step concat), never the seeded
    draw. Covers dead ends (d has no out-edges) and walk_len=0."""
    import random as _random

    import pytest

    from hama_spark.graph import random_walks

    rng = _random.Random(7)
    pairs = {(f"v{rng.randrange(30)}", f"v{rng.randrange(30)}") for _ in range(80)}
    pairs.add(("zz", "d"))  # 'd' is a dead end: no out-edges
    e = spark.createDataFrame(sorted(pairs), "src string, dst string")
    for L in (0, 6):
        a = {
            r["walk_src"]: r["walk"]
            for r in random_walks(e, walk_len=L, seed=9).collect()
        }
        b = {
            r["walk_src"]: r["walk"]
            for r in random_walks(
                e, walk_len=L, seed=9, path_assembly="final"
            ).collect()
        }
        assert a == b and len(a) > 0
    with pytest.raises(ValueError, match="path_assembly"):
        random_walks(e, path_assembly="streaming")
