"""Sketch-based approximate aggregates for 100 TB rollups.

Exact COUNT(DISTINCT) and exact percentiles are the two aggregations
that stop scaling first: both need all distinct values (or all values)
of a group on one reducer. Spark ships mergeable sketches for each —
HyperLogLog++ (``approx_count_distinct``, fixed ~KB state per group,
tunable relative error) and a Greenwald-Khanna-style quantile sketch
(``percentile_approx``) — which keep the aggregation map-side
combinable: partials merge associatively, so shuffle volume per group
is the sketch size, independent of group cardinality.

These wrappers pin the engine's recommended accuracy defaults and give
the operators a stable, tested surface; tests assert the error bounds
against exact answers on the driver tables. For oracle hashing they are
excluded — sketch estimates are implementation-defined, so the
correctness gate covers them with error-bound tests instead of value
hashes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(col: str | Column, rsd: float = 0.02) -> Column:
    """HyperLogLog++ distinct-count estimate with relative standard
    deviation ``rsd`` (2% default ≈ 4 KB of state per group)."""
    return F.approx_count_distinct(col, rsd=rsd)


def approx_quantiles(
    col: str | Column, probabilities: list[float], accuracy: int = 10_000
) -> Column:
    """Mergeable quantile-sketch estimates at the given probabilities;
    rank error <= 1/accuracy of the group size."""
    return F.percentile_approx(
        col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    )


def approx_group_profile(
    df: DataFrame,
    keys: str | list[str],
    value_col: str,
    distinct_col: str | None = None,
    probabilities: tuple[float, ...] = (0.5, 0.95, 0.99),
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group scale-safe profile: approximate distinct count of
    ``distinct_col`` (defaults to ``value_col``) plus approximate
    quantiles of ``value_col`` — one map-side-combined aggregation,
    bounded state per group regardless of group size."""
    kl = [keys] if isinstance(keys, str) else list(keys)
    return df.groupBy(*kl).agg(
        F.count(F.lit(1)).alias("n"),
        approx_distinct(distinct_col or value_col, rsd=rsd).alias("approx_distinct"),
        approx_quantiles(value_col, list(probabilities)).alias("approx_quantiles"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketches with SET ALGEBRA.
#
# HLL++ answers "how many distinct" but two HLL sketches cannot be
# INTERSECTED, and corpus work constantly needs overlap: how much of
# snapshot B is already in snapshot A, how similar are two domains'
# vocabularies, does the eval benchmark leak into a training slice. The
# KMV sketch (Bar-Yossef et al., "Counting distinct elements in a data
# stream") keeps the k smallest hash values of a set; it is mergeable
# (union = k smallest of the concatenation) and supports Jaccard /
# intersection estimates (fraction of the union sketch that belongs to
# both sides). Hashing uses the repo-wide cross-engine md5 pattern
# (48-bit conv(substr(md5))), so sketches are deterministic across
# runs, partitionings, and engines — unlike HLL, a KMV sketch IS
# hash-checkable.
#
# Scale: per-group sketches use a keyed window (sort-based top-k,
# spillable, never a single-partition window); the global path uses
# sort+limit, which Spark executes as per-partition top-k merged on the
# driver (TakeOrderedAndProject), shuffle-free. Merging and estimation
# are pure JVM array expressions over <= k-element arrays. 48-bit
# hash collisions merge values (~n^2/2^49 expected pairs — at n=1e9
# about 2k collisions, noise far below the sketch's own 1/sqrt(k)
# relative error).
# ---------------------------------------------------------------------------

_KMV_SPACE = float(2**48)


def _kmv_hash(col: Column, seed: int) -> Column:
    """48-bit md5 draw; DuckDB twin:
    ('0x' || substr(md5(seed || ':' || v), 1, 12))::BIGINT."""
    s = F.concat_ws(":", F.lit(str(seed)), col.cast("string"))
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 12), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    col: str,
    keys: str | list[str] | None = None,
    k: int = 256,
    seed: int = 1,
) -> DataFrame:
    """Build a KMV sketch of the distinct values of ``col`` — per group
    when ``keys`` is given, else one global row. Output:
    (keys..., kmv array<bigint> ascending, len <= k).

    NULL values are excluded (matching COUNT(DISTINCT col) semantics).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = _kmv_hash(F.col(col), seed).alias("_h")
    if keys is None:
        vals = df.where(F.col(col).isNotNull()).select(h).distinct()
        topk = vals.orderBy("_h").limit(k)  # TakeOrderedAndProject
        return topk.agg(F.sort_array(F.collect_list("_h")).alias("kmv"))
    kl = [keys] if isinstance(keys, str) else list(keys)
    vals = (
        df.where(F.col(col).isNotNull())
        .select(*[F.col(c) for c in kl], h)
        .distinct()
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(*kl).orderBy("_h")
    ranked = vals.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return ranked.groupBy(*kl).agg(F.sort_array(F.collect_list("_h")).alias("kmv"))


def kmv_distinct(sketch: str | Column, k: int) -> Column:
    """Distinct-count estimate from a KMV sketch column: exact when the
    sketch is not full (fewer than k distinct values existed), else the
    unbiased (k-1) / F(k-th smallest) estimator."""
    s = F.col(sketch) if isinstance(sketch, str) else sketch
    kth = F.element_at(s, k).cast("double")
    est = F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / kth
    return F.when(F.size(s) < k, F.size(s).cast("double")).otherwise(est)


def kmv_union(a: str | Column, b: str | Column, k: int) -> Column:
    """Merge two KMV sketches: k smallest of the deduplicated union —
    exactly the sketch of the union of the underlying sets, which is
    what makes KMV partial-aggregatable."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.slice(F.array_sort(F.array_union(ca, cb)), 1, k)


def kmv_jaccard(a: str | Column, b: str | Column, k: int) -> Column:
    """Jaccard estimate: the fraction of the UNION sketch's values that
    appear in both input sketches (each union-sketch value is a uniform
    draw from the union set, so membership in A∩B is a Bernoulli
    sample of the true Jaccard)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    u = kmv_union(ca, cb, k)
    both = F.array_intersect(ca, cb)
    matches = F.size(F.array_intersect(u, both))
    # empty union (both sets empty) is Jaccard 0, not 0.0/0.0 = NaN
    return F.when(
        F.size(u) > 0, matches.cast("double") / F.size(u).cast("double")
    ).otherwise(F.lit(0.0))


def kmv_overlap_matrix(
    df: DataFrame,
    col: str,
    keys: str,
    k: int = 256,
    seed: int = 1,
) -> DataFrame:
    """Pairwise distinct-value overlap between every two slices of the
    corpus (domains, sources, snapshot versions): one sketch-building
    pass, then an all-pairs join over the per-slice SKETCHES — the
    joined relation is (#slices)^2 rows of <= k-element arrays, never
    the data itself. Output per (slice_a < slice_b): estimated Jaccard,
    estimated intersection size, and each side's distinct estimate.
    """
    sk = kmv_sketch(df, col, keys=keys, k=k, seed=seed).localCheckpoint(
        eager=True
    )
    a = sk.select(
        F.col(keys).alias("slice_a"), F.col("kmv").alias("kmv_a")
    )
    b = sk.select(
        F.col(keys).alias("slice_b"), F.col("kmv").alias("kmv_b")
    )
    pairs = a.join(b, F.col("slice_a") < F.col("slice_b"))
    jacc = kmv_jaccard("kmv_a", "kmv_b", k)
    union_est = kmv_distinct(kmv_union("kmv_a", "kmv_b", k), k)
    return pairs.select(
        "slice_a",
        "slice_b",
        F.round(jacc, 6).alias("jaccard_est"),
        F.round(jacc * union_est, 2).alias("intersect_est"),
        F.round(kmv_distinct("kmv_a", k), 2).alias("distinct_a_est"),
        F.round(kmv_distinct("kmv_b", k), 2).alias("distinct_b_est"),
    )


def exact_group_quantiles(
    df: DataFrame,
    keys: str | list[str],
    value_col: str,
    probabilities: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """EXACT per-group quantiles (sort-based, linear interpolation) —
    the ground-truth twin of :func:`approx_group_profile`, the same
    pairing the dedup layer uses (exact baseline / sketch scale path).
    Exact percentile buffers each group's values, so at very large
    group sizes prefer the sketch; as an oracle baseline the
    interpolation formula (1-based rank 1 + (n-1)p) is identical to
    ANSI quantile_cont, which is what makes it hash-checkable.
    Output: keys..., n, p50/p90/p99-style columns (rounded doubles).
    """
    kl = [keys] if isinstance(keys, str) else list(keys)
    aggs = [F.count(F.lit(1)).alias("n")]
    for p in probabilities:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"probability out of range: {p}")
        # numeric naming: 0.5 -> p50, 0.99 -> p99, 0.125 -> p12_5,
        # 1e-05 -> p0_001 (never scientific notation / sign characters)
        name = "p" + f"{p * 100:.10g}".replace(".", "_")
        aggs.append(F.round(F.percentile(value_col, F.lit(p)), 6).alias(name))
    return df.groupBy(*kl).agg(*aggs)


def key_overlap_report(
    a: DataFrame,
    b: DataFrame,
    key: str,
    k: int = 1024,
    seed: int = 1,
    key_b: str | None = None,
    auto_escalate: bool = True,
) -> DataFrame:
    """Join pre-flight: how much do two relations' KEY SETS overlap?
    One KMV sketch pass per side (per-partition top-k merged on the
    driver — no join, no shuffle of the data), then pure array math.
    Answers "is this join even going to match anything" and "which side
    is contained in which" BEFORE paying a 100 TB shuffle.

    One row: (distinct_a_est, distinct_b_est, intersect_est,
    jaccard_est, containment_a_in_b, containment_b_in_a, exact).
    Containment = |A∩B| / |A| — the fraction of a's keys that will find
    a partner (row multiplicity is
    ``operators.skew.join_explosion_report``'s job; this is the cheap
    distinct-level screen).

    Regime transparency: the KMV estimator silently switches from
    exact set algebra (sketch never filled) to a ±1/√k estimate once
    distinct keys exceed ``k`` — ``exact`` makes the regime visible
    (true iff both side sketches AND their union stayed under k, i.e.
    every output value is exact). With ``auto_escalate`` (default),
    sketches that would fill at ``k`` are automatically read at 4·k —
    so sketches that missed exactness by a small factor report exact
    numbers instead of estimates. This costs NO extra pass: each side
    is sketched ONCE at 4·k, and because KMV's k smallest hashes are a
    prefix of its 4k smallest, slicing that sketch back to ``k``
    reproduces the plain k-sketch exactly when no escalation is needed.
    The sketch passes run eagerly (<=4·k longs per side to the driver)."""

    def _sketch(df: DataFrame, col: str, kk: int) -> list[int]:
        row = kmv_sketch(df, col, k=kk, seed=seed).collect()
        return list(row[0]["kmv"]) if row else []

    k = int(k)
    if auto_escalate:
        # ONE pass per side at 4k; the k-sketch is its length-k prefix.
        # Escalate (keep the 4k sketches) exactly when the k-sketches
        # could have a filled union: len_a@k + len_b@k >= k, where
        # len@k = min(len@4k, k). Output is bit-identical to the old
        # sketch-at-k-then-retry-at-4k flow, minus the second scan.
        sk_a = _sketch(a, key, 4 * k)
        sk_b = _sketch(b, key_b or key, 4 * k)
        if min(len(sk_a), k) + min(len(sk_b), k) >= k:
            k_eff = 4 * k
        else:
            k_eff = k
            sk_a, sk_b = sk_a[:k], sk_b[:k]
    else:
        k_eff = k
        sk_a = _sketch(a, key, k_eff)
        sk_b = _sketch(b, key_b or key, k_eff)

    # The INTEGER set algebra (union top-k, intersection membership)
    # runs right here in Python — the sketches are already driver-side
    # lists, and shipping 2x16k longs back through createDataFrame plus
    # evaluating array_union/sort/intersect once per output column was
    # the dominant cost of the whole report (measured ~2.2s of a 3.3s
    # warm query at k=4096-escalated-to-16k). Only the FLOAT pipeline
    # stays a Spark expression, operating on these integer scalars with
    # the exact same operations in the exact same order as the old
    # array form — the doubles (and their F.round results, and the
    # DuckDB oracle hash) are bit-identical.
    set_a, set_b = set(sk_a), set(sk_b)
    u = sorted(set_a | set_b)[:k_eff]  # kmv_union: k smallest of dedup
    both = set_a & set_b
    matches = sum(1 for h in u if h in both)  # kmv_jaccard numerator

    def _kth(sk: list[int]) -> int | None:
        return sk[k_eff - 1] if len(sk) >= k_eff else None

    spark = a.sparkSession
    pair = spark.createDataFrame(
        [
            (
                len(sk_a), _kth(sk_a),
                len(sk_b), _kth(sk_b),
                len(u), _kth(u),
                matches,
            )
        ],
        "sz_a int, kth_a bigint, sz_b int, kth_b bigint, "
        "sz_u int, kth_u bigint, matches int",
    )

    def _distinct(sz: str, kth: str):
        # mirrors kmv_distinct on the (size, k-th smallest) pair
        est = (
            F.lit(float(k_eff - 1))
            * F.lit(_KMV_SPACE)
            / F.col(kth).cast("double")
        )
        return F.when(F.col(sz) < k_eff, F.col(sz).cast("double")).otherwise(est)

    # mirrors kmv_jaccard: matches / |union sketch|, 0.0 on empty union
    jacc = F.when(
        F.col("sz_u") > 0,
        F.col("matches").cast("double") / F.col("sz_u").cast("double"),
    ).otherwise(F.lit(0.0))
    union_est = _distinct("sz_u", "kth_u")
    da = _distinct("sz_a", "kth_a")
    db = _distinct("sz_b", "kth_b")
    inter = jacc * union_est
    exact = (
        (F.col("sz_a") < k_eff)
        & (F.col("sz_b") < k_eff)
        & (F.col("sz_u") < k_eff)
    )
    return pair.select(
        F.round(da, 2).alias("distinct_a_est"),
        F.round(db, 2).alias("distinct_b_est"),
        F.round(inter, 2).alias("intersect_est"),
        F.round(jacc, 6).alias("jaccard_est"),
        F.round(
            F.when(da > 0, F.least(inter / da, F.lit(1.0))).otherwise(0.0), 6
        ).alias("containment_a_in_b"),
        F.round(
            F.when(db > 0, F.least(inter / db, F.lit(1.0))).otherwise(0.0), 6
        ).alias("containment_b_in_a"),
        exact.alias("exact"),
    )
