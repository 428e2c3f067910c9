"""K-Core decomposition (A6) — coreness per vertex.

Reference: ml/src/main/java/org/apache/hama/ml/kcore/KCoreVertex.java:36-228
(Montresor et al. distributed k-core): core starts at degree; each
superstep a vertex recomputes its estimate as the largest ``i <= core``
such that at least ``i`` neighbors have estimate ``>= i`` (the h-index
of the neighbor-estimate multiset, floored at 1 — KCoreVertex
.computeEstimate:138-173), sends its new core to neighbors when it
drops, and halts otherwise.

The reference updates asynchronously per message; the synchronous
DataFrame round (all vertices recompute from all neighbor values each
iteration) converges to the same fixpoint — the true coreness — and is
reproducible in ANSI SQL (window-function h-index), which is what makes
this oracle-checkable.

Scale: each iteration is one shuffle (messages grouped by dst) plus a
window over (vertex, neighbor-core) rows; after round 0 the h-index is
recomputed ONLY for vertices adjacent to a changed vertex (a vertex's
h can only move when a neighbor's core moved), so late iterations — and
the no-op tail of a fixed replay schedule — touch a shrinking frontier
instead of the full graph, with a bit-identical synchronous fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kcore(
    edges: DataFrame,
    max_iter: int = 20,
    fixed_iters: int | None = None,
    checkpoint_interval: int = 4,
) -> DataFrame:
    """edges(src, dst) undirected input (symmetrized internally) ->
    (id, core int).

    ``fixed_iters`` runs exactly that many synchronous rounds with no
    convergence check (for oracle replay); otherwise stops early when no
    core changed.
    """
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition(n_part, "src")
        .cache()
    )
    sym.count()

    # core_0 = degree (KCoreVertex.compute superstep 0: core = edges.size)
    cores = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("int").alias("core")
    )
    # LAZY: materializes with the first downstream action (pregel-style
    # one-job-per-round; in fixed mode the whole schedule chains into
    # the caller's single action)
    cores = cores.localCheckpoint(eager=False)

    iters = fixed_iters if fixed_iters is not None else max_iter
    # frontier: ids whose core changed last round. A vertex's h-index can
    # only change when a NEIGHBOR's core changed, so later rounds
    # recompute h only for vertices adjacent to the changed set — the
    # synchronous fixpoint is bit-identical (unchanged inputs give
    # unchanged outputs), but converged regions stop paying the
    # join+window every round. Round 0 recomputes everyone (core just
    # initialized to degree).
    changed = None
    for i in range(iters):
        if changed is None:
            # neighbor estimates: core of src delivered to dst
            nbr = sym.join(cores, sym["src"] == cores["id"]).select(
                F.col("dst").alias("id"), F.col("core").alias("nbr_core")
            )
        else:
            # affected = vertices adjacent to a changed vertex. sym is
            # SYMMETRIC, so "edges whose dst is affected, delivering
            # core(src) to dst" is the same multiset as "edges whose
            # src is affected, delivering core(dst) to src" — and the
            # latter keys BOTH frontier joins on src/id, so the cached
            # src-partitioned edge relation never re-shuffles (the
            # dst-filtered form would exchange the full edge set by dst
            # every round, which at 10x scale cost more than the prune
            # saved on graphs that keep changing)
            aff = (
                sym.join(changed.withColumnRenamed("id", "src"), "src")
                .select(F.col("dst").alias("id"))
                .distinct()
            )
            edges_in = sym.join(aff.withColumnRenamed("id", "src"), "src")
            nbr = edges_in.join(cores, edges_in["dst"] == cores["id"]).select(
                edges_in["src"].alias("id"), F.col("core").alias("nbr_core")
            )
        # h-index H = max over distinct core values c of min(c, N_c),
        # N_c = #neighbors with core >= c (equivalent to the sorted-rank
        # definition, but the window runs over distinct (id, core) pairs
        # instead of every neighbor edge — far fewer rows on skewed
        # degree distributions)
        cnts = nbr.groupBy("id", "nbr_core").agg(F.count(F.lit(1)).alias("n"))
        w = (
            Window.partitionBy("id")
            .orderBy(F.desc("nbr_core"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        h = (
            cnts.withColumn("cum", F.sum("n").over(w))
            .groupBy("id")
            .agg(F.max(F.least(F.col("nbr_core").cast("long"), F.col("cum"))).alias("h"))
        )
        # h is null for vertices outside the affected set (their inputs
        # did not change) — they keep their core unchanged
        new_core = F.least(F.col("core"), F.coalesce(F.col("h"), F.col("core")))
        new_cores = (
            cores.join(h, "id", "left")
            .select(
                "id",
                new_core.cast("int").alias("core"),
                (F.col("core") != new_core).alias("_chg"),
            )
        )
        # lazy checkpoint still truncates the plan (attribute re-anchor +
        # bounded analysis cost); the convergence count — or in fixed
        # mode the caller's action — materializes the chain
        new_cores = new_cores.localCheckpoint(eager=False)
        changed = new_cores.filter("_chg").select("id")
        if fixed_iters is None:
            n_changed = changed.limit(1).count()
            cores = new_cores.drop("_chg")
            if n_changed == 0:
                break
        else:
            cores = new_cores.drop("_chg")

    if fixed_iters is not None:
        # fixed mode has no mid-loop action: materialize the chained
        # rounds NOW, while sym's cache is still alive — otherwise
        # unpersist drops it before the caller's first action and every
        # round recomputes the symmetrized-distinct edge set
        cores = cores.localCheckpoint(eager=True)
    sym.unpersist()
    return cores
