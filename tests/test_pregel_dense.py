"""pregel(dense=True): exchange-free cached vertex loop for
dense-message algorithms. Asserts BOTH value-equivalence with the
default loop and the plan property the mode exists for — no Exchange
and no Sort on the vertex side of the per-superstep inbox join."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

import importlib

pagerank_mod = importlib.import_module("hama_spark.graph.pagerank")
from hama_spark.plans.pregel import MSG, pregel


def _skewed_edges(spark, n=2000):
    ring = spark.range(n).select(
        F.col("id").cast("string").alias("src"),
        F.pmod(F.col("id") + 1, F.lit(n)).cast("string").alias("dst"),
    )
    halving = spark.range(n).select(
        F.col("id").cast("string").alias("src"),
        F.floor(F.col("id") / 2).cast("string").alias("dst"),
    )
    return ring.union(halving)


def test_dense_pagerank_matches_default_loop(spark):
    edges = _skewed_edges(spark)
    kw = dict(epsilon=None, max_iter=6)
    sparse = {
        r["id"]: r["rank"]
        for r in pagerank_mod.pagerank(edges, dense=False, **kw).collect()
    }
    dense = {
        r["id"]: r["rank"]
        for r in pagerank_mod.pagerank(edges, dense=True, **kw).collect()
    }
    assert set(sparse) == set(dense)
    assert max(abs(sparse[k] - dense[k]) for k in sparse) < 1e-12


def test_dense_pagerank_epsilon_mode_matches(spark):
    edges = _skewed_edges(spark)
    kw = dict(epsilon=1e-5, max_iter=10)
    sparse = {
        r["id"]: round(r["rank"], 12)
        for r in pagerank_mod.pagerank(edges, dense=False, **kw).collect()
    }
    dense = {
        r["id"]: round(r["rank"], 12)
        for r in pagerank_mod.pagerank(edges, dense=True, **kw).collect()
    }
    assert sparse == dense


def test_dense_loop_has_no_vertex_side_exchange(spark):
    """The defining plan property: from superstep 1 on, the inbox-join
    input seen by compute() has EXACTLY ONE Exchange (the message
    combine shuffle) and one Sort (the message side of the SMJ) — the
    vertex side is an InMemoryTableScan whose cached layout satisfies
    both distribution and ordering. Broadcast is disabled so the sparse
    loop's BHJ escape hatch can't mask a vertex re-exchange."""
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_abc = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        n = 500
        vertices = spark.range(n).select(
            F.col("id").cast("long").alias("id"), F.lit(1.0).alias("val")
        )
        edges = spark.range(n).select(
            F.col("id").alias("src"), F.pmod(F.col("id") * 3 + 1, F.lit(n)).alias("dst")
        )
        plans: dict[int, str] = {}

        def compute(with_inbox, ctx):
            plans[ctx.superstep] = (
                with_inbox._jdf.queryExecution().executedPlan().toString()
            )
            return with_inbox.select(
                "id", (F.coalesce(F.col(MSG), F.lit(0.0)) + F.col("val")).alias("val")
            )

        def send(verts, edg, ctx):
            return verts.join(edg, verts["id"] == edg["src"]).select(
                edg["dst"].alias("id"), F.col("val").alias(MSG)
            )

        out = pregel(
            vertices,
            edges,
            compute=compute,
            send=send,
            combine=F.sum,
            initial_message=None,
            max_iter=4,
            detect_halt=False,
            dense=True,
            checkpoint_interval=100,  # no mid-run lineage cut: pure cache chain
        )
        assert out.count() == n
        assert set(plans) == {0, 1, 2, 3}
        for step in (1, 2, 3):
            plan = plans[step]
            # the vertex (left/streamed) side of the SortMergeJoin must
            # be the cache scan DIRECTLY — no Exchange, no Sort above it.
            # (The plan string also shows the cached child plan nested
            # inside InMemoryRelation, exchanges included — those ran
            # once at layout time, not per superstep, so match only the
            # join's immediate child.)
            m = re.search(r"SortMergeJoin .*\n\s*:- (\S+)", plan)
            assert m is not None, f"superstep {step}: no SMJ found\n{plan}"
            assert m.group(1).startswith("InMemoryTableScan"), (
                f"superstep {step}: vertex side is {m.group(1)}, "
                f"not the bare cache scan\n{plan}"
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        if old_abc is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_abc)


def test_dense_with_recover_dir_resumes(spark, tmp_path, monkeypatch):
    """dense mode composes with mid-fixpoint recovery."""
    edges = _skewed_edges(spark, 100)
    rdir = str(tmp_path / "dense_ck")
    kw = dict(epsilon=None, max_iter=8, checkpoint_interval=3, dense=True)
    expected = sorted(
        (r["id"], round(r["rank"], 12))
        for r in pagerank_mod.pagerank(edges, **kw).collect()
    )

    real = pagerank_mod.pregel

    def crashing(v, e, compute, **kws):
        def cc(df, ctx):
            if ctx.superstep == 6:
                raise RuntimeError("crash")
            return compute(df, ctx)

        return real(v, e, compute=cc, **kws)

    monkeypatch.setattr(pagerank_mod, "pregel", crashing)
    with pytest.raises(RuntimeError):
        pagerank_mod.pagerank(edges, recover_dir=rdir, **kw)
    monkeypatch.undo()
    resumed = pagerank_mod.pagerank(edges, recover_dir=rdir, **kw)
    got = sorted((r["id"], round(r["rank"], 12)) for r in resumed.collect())
    assert got == expected
