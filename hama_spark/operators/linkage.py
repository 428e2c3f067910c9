"""Blocked fuzzy record linkage: approximate string matching between
(or within) tables via blocking keys + edit-distance predicates — the
classic entity-resolution shape (Fellegi & Sunter 1969; blocking per
Christen 2012). Beyond the reference surface (north-star extension):
a training-data pipeline uses this to reconcile near-identical
metadata records (authors, domains, titles) the exact dedup operators
cannot see.

Spark-first shape: candidate generation is an EQUI-join on the
blocking key(s), so the quadratic pair explosion is bounded by
Σ|block|² instead of n² — the same fence the MinHash-LSH band join
uses. The edit-distance predicate (``F.levenshtein``, a JVM built-in
inside whole-stage codegen) runs as a post-join filter on candidate
pairs only; no Python anywhere. At 100 TB the operative knob is the
blocking function: block keys must keep the largest block's pair count
tractable (compose with a length band or sorted-neighborhood key when
a single attribute blocks too coarsely).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def _deletion_variants(text: Column) -> Column:
    """FastSS deletion neighborhood (Bocek et al. 2007, public
    technique): the string itself plus every single-character deletion.
    Two strings within edit distance 1 MUST share a variant (equal
    strings share themselves; a substitution at position i shares the
    deletion at i; an insertion/deletion shares the shorter string),
    so an equi-join on variants yields a candidate superset verified
    by one levenshtein evaluation each."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(text)),
        lambda i: F.concat(
            text.substr(F.lit(1), i - 1),
            text.substr(i + 1, F.length(text)),
        ),
    )
    return F.when(
        F.length(text) > 0, F.array_union(F.array(text), dels)
    ).otherwise(F.array(text))


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    max_distance: int = 1,
) -> DataFrame:
    """Self-linkage: all (id_a, id_b, distance) pairs within a block
    with ``levenshtein(text_a, text_b) <= max_distance`` and
    ``id_a < id_b`` (each unordered pair once). Blocks are equi-join
    keys, so cross-block pairs are never materialized.

    Candidate generation is adaptive: for ``max_distance == 1`` the
    join key is the FastSS single-deletion neighborhood — two strings
    within one edit MUST share a variant — so candidate count scales
    with the number of true near-matches instead of Σ|block|²
    all-pairs, which is what keeps one hot block (a single nation,
    domain, or date) from going quadratic at 100 TB. Measured on the
    sf0.1 customer driver query: ~4.5M levenshtein evaluations down to
    the ~10k verified candidates. Larger distances fall back to the
    all-pairs-within-block comparison.
    """
    if not block_cols:
        raise ValueError("blocked_fuzzy_pairs requires >=1 blocking column")
    keys = [f"_bk{i}" for i in range(len(block_cols))]

    def side(suffix: str) -> DataFrame:
        return df.select(
            _c(id_col).alias(f"id_{suffix}"),
            _c(text_col).alias(f"text_{suffix}"),
            *[_c(c).alias(k) for c, k in zip(block_cols, keys)],
        )

    a, b = side("a"), side("b")
    if max_distance == 1:
        av = a.select(
            "id_a",
            "text_a",
            *keys,
            F.explode(_deletion_variants(F.col("text_a"))).alias("_v"),
        )
        bv = b.select(
            "id_b",
            "text_b",
            *keys,
            F.explode(_deletion_variants(F.col("text_b"))).alias("_v"),
        )
        cand = (
            av.join(bv, [*keys, "_v"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "text_a", "text_b")
            .distinct()
        )
    else:
        cand = a.join(b, keys).filter(F.col("id_a") < F.col("id_b"))
    return (
        cand.withColumn("distance", F.levenshtein("text_a", "text_b"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    block_on: list[tuple[str, str]],
    max_distance: int = 1,
) -> DataFrame:
    """Two-table linkage: left rows joined to right rows sharing every
    blocking pair ``(left_col, right_col)`` whose texts are within
    ``max_distance`` edits. Returns all left/right columns plus
    ``distance``; right-side columns that collide with a left-side name
    come back suffixed ``_right``. Candidates are all pairs within a
    block (Σ|block|²):
    correct for selective blocks, but for distance-1 linkage over a
    hot block prefer :func:`blocked_fuzzy_pairs` on the union of both
    tables (tag rows with a side column) — its FastSS deletion-
    neighborhood join avoids the quadratic; generalizing that path
    here would need a row-identity contract this column-preserving
    signature deliberately doesn't impose."""
    if not block_on:
        raise ValueError("fuzzy_join requires >=1 blocking column pair")
    # column names shared by both sides would come back duplicated and
    # ambiguous downstream — suffix the right side's collisions
    clash = set(left.columns) & set(right.columns)
    renames = {c: f"{c}_right" for c in clash}
    taken = set(left.columns) | set(right.columns)
    for old, new in renames.items():
        if new in taken:
            raise ValueError(
                f"cannot disambiguate shared column {old!r}: {new!r} "
                "already exists — rename inputs before joining"
            )
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    rtext = renames.get(right_text, right_text)
    cond = [
        _c(f"l.{lc}") == _c(f"r.{renames.get(rc, rc)}") for lc, rc in block_on
    ]
    return (
        left.alias("l")
        .join(r.alias("r"), cond)
        .withColumn("distance", F.levenshtein(f"l.{left_text}", f"r.{rtext}"))
        .filter(F.col("distance") <= max_distance)
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 2,
    prefix_len: int = 3,
    window: int = 5,
) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernández & Stolfo
    1995) for the distances where FastSS doesn't apply (d > 1, where
    :func:`blocked_fuzzy_pairs` falls back to all-pairs): rows sort by
    text within a deterministic prefix block, and only pairs within
    ``window`` positions of each other are compared — O(n·w) candidate
    comparisons instead of Σ|block|².

    The tradeoff is stated, not hidden: SNM is a HEURISTIC canopy.
    A true near-match whose strings diverge in the first ``prefix_len``
    characters (e.g. a typo in character 1) lands in different blocks
    and is missed; within a block, more than ``window`` interleaving
    rows also hide a pair. Recall rises with ``window`` and falls with
    ``prefix_len``. Output is the same (id_a, id_b, distance) contract
    as :func:`blocked_fuzzy_pairs`, fully deterministic (block +
    sorted-order windows, no sampling).

    Scale shape: one window function per prefix block (partitioned,
    never global), one equi-join on the block key with a ±window rank
    band — candidates stream through the levenshtein verify map-side.
    """
    from pyspark.sql import Window as W

    base = df.select(
        _c(id_col).alias("id"),
        _c(text_col).alias("text"),
        F.substring(_c(text_col), 1, prefix_len).alias("_blk"),
    )
    w = W.partitionBy("_blk").orderBy("text", "id")
    ranked = base.withColumn("_rn", F.row_number().over(w))
    a = ranked.select(
        F.col("_blk"),
        F.col("id").alias("id_a"),
        F.col("text").alias("text_a"),
        F.col("_rn").alias("_ra"),
    )
    b = ranked.select(
        F.col("_blk"),
        F.col("id").alias("id_b"),
        F.col("text").alias("text_b"),
        F.col("_rn").alias("_rb"),
    )
    return (
        a.join(b, "_blk")
        .filter(
            (F.col("_rb") > F.col("_ra"))
            & (F.col("_rb") - F.col("_ra") <= window)
        )
        .withColumn("distance", F.levenshtein("text_a", "text_b"))
        .filter(F.col("distance") <= max_distance)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "distance",
        )
    )


def entity_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
) -> DataFrame:
    """Entity resolution tail: collapse linkage ``pairs`` (id_a, id_b —
    from ``blocked_fuzzy_pairs`` / ``sorted_neighborhood_pairs``) into
    entities via connected components, and label EVERY input record
    with its entity: df columns + ``entity_id`` (the component's
    minimum id — the canonical record) + ``cluster_size``. Unlike the
    dedup collapse (``extensions.dedup.dedup_near``), which keeps one
    survivor per cluster, this keeps all records — the shape a
    golden-record / master-data step consumes.

    Components run distributed — no driver-side union-find — via
    two-phase star contraction (graph/cc_twophase.py, O(log n) rounds
    regardless of diameter; same min-id labels as the Pregel min-label
    engine, graph/components.py, measured ~2x faster on match-pair
    graphs and asymptotically safer on the chain-shaped clusters fuzzy
    matching produces). ids propagate zero-padded so the string min
    equals the numeric min.
    """
    from hama_spark.graph.cc_twophase import connected_components_twophase

    pad = lambda c: F.lpad(F.col(c).cast("string"), 15, "0")
    edges = pairs.select(pad("id_a").alias("src"), pad("id_b").alias("dst"))
    comp = connected_components_twophase(edges)

    ids = df.select(_c(id_col), pad(id_col).alias("_pid"))
    # qualify through the frame handles: comp also carries an `id`
    # column, which would otherwise collide with an `id`-named id_col
    labeled = ids.join(comp, ids["_pid"] == comp["id"], "left").select(
        ids[id_col],
        F.coalesce(comp["component"], ids["_pid"]).alias("_comp"),
    )
    stats = labeled.groupBy("_comp").agg(
        F.min(id_col).alias("entity_id"),
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
    )
    assign = labeled.join(stats, "_comp").select(
        id_col, "entity_id", "cluster_size"
    )
    return df.join(assign, id_col)
