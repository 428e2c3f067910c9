"""Skew-mitigated joins and aggregations (salting).

AQE's runtime skew-join splitting (enabled in the session factory)
handles most skew transparently; salting is the explicit, planner-
independent fallback for the pathological case — a handful of hot keys
holding a large share of a 100 TB fact table, where one reducer would
otherwise process a whole key alone.

Mechanics: the skewed (large) side gets a deterministic salt in
[0, n_salts) appended to its key; the other side is replicated n_salts
ways (explode of a literal range — no shuffle to build). The join key
becomes (key, salt), splitting each hot key's rows across n_salts
reducers. Aggregations salt the same way: partial agg on (key, salt),
final agg on key — two shuffles, each skew-free.

The salt is a hash of the whole row plus a per-row ordinal (xxhash64 +
monotonically_increasing_id), not a random draw, so results are
reproducible under retries for a deterministic input partitioning
(SURVEY §7: seeded streams, never per-executor RNG) and identical rows
under one hot key still spread across all salts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def _with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Append a deterministic salt in [0, n_salts): hash of the full row
    PLUS a per-row ordinal, so identical rows (the degenerate hot-key
    case — constant payload under one key) still spread across all
    salts. monotonically_increasing_id is stable under task retry for a
    deterministic input partitioning, keeping results reproducible."""
    return df.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns], F.monotonically_increasing_id()),
            F.lit(n_salts),
        ).cast("int"),
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skew-prone ``large`` side against ``small`` with the
    hot keys split ``n_salts`` ways. ``small`` is replicated n_salts
    times — size it accordingly (this is for moderate dimension tables
    too big to broadcast but far smaller than the fact side).

    Only ``inner`` and ``left`` (large-side-preserving) joins are
    supported: an outer join on the replicated small side would emit
    each unmatched small row once PER SALT."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r} — the "
            "replicated small side would duplicate unmatched rows"
        )
    keys = [on] if isinstance(on, str) else list(on)
    lsalted = _with_salt(large, n_salts)
    ssalted = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lsalted.join(ssalted, on=[*keys, _SALT], how=how).drop(_SALT)


_COMBINERS = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: str | list[str],
    aggs: dict[str, tuple[Column, str]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial aggregate on
    (keys, salt), then final combine on keys — two shuffles, each
    skew-free. ``aggs`` maps output column -> (partial aggregate
    expression, combiner) where combiner is "sum" | "min" | "max"
    (counts combine with "sum"). Only decomposable aggregates apply.

    Note: Spark's hash aggregate already does map-side partial
    aggregation, which usually suffices; salting the FINAL shuffle only
    matters when a single group's partials still overwhelm one reducer
    (e.g. high-cardinality-input distinct-style pipelines)."""
    kl = [keys] if isinstance(keys, str) else list(keys)
    partial = (
        _with_salt(df, n_salts)
        .groupBy(*kl, _SALT)
        .agg(*[c.alias(f"_p_{name}") for name, (c, _) in aggs.items()])
    )
    return partial.groupBy(*kl).agg(
        *[
            _COMBINERS[comb](F.col(f"_p_{name}")).alias(name)
            for name, (_, comb) in aggs.items()
        ]
    )


def skew_report(
    df: DataFrame,
    key_cols: str | list[str],
    n_buckets: int = 32,
    top_k: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """Pre-flight skew diagnostic for a planned shuffle key: returns
    ``(buckets, hot_keys)``.

    ``buckets`` simulates the shuffle Spark would run — rows hashed
    into ``n_buckets`` reducer buckets by the key, with Murmur3
    (``F.hash``), the exact function HashPartitioning applies — and
    reports one row per non-empty bucket with its row count plus, on
    every row, the distribution-level ratios the decision needs:
    ``max_over_avg`` (straggler factor vs the IDEAL uniform share
    total/n_buckets — empty buckets count as zeros) and ``cv``
    (coefficient of variation, same population including empties).
    ``max_over_avg`` near 1 = safe;
    >> 1 = salt the key or raise AQE skew thresholds before running
    the real job at 100 TB.

    ``hot_keys`` is the exact top-``top_k`` keys by row count with
    their share of the table — the keys you'd salt.

    Cost: two map-side-combined aggregations over one scan; the bucket
    relation is <= n_buckets rows and the ratios attach via a
    single-row broadcast, so the diagnostic is safe to run at full
    data scale.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    kcols = [F.col(c) for c in keys]

    # F.hash IS Murmur3 — the same function HashPartitioning applies —
    # so the histogram reproduces the real shuffle's bucket assignment
    # (xxhash64 would predict different collisions than the exchange).
    bucket = F.pmod(F.hash(*kcols), F.lit(n_buckets)).cast("int")
    counts = df.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("rows")
    )
    # ratios are against the IDEAL uniform share total/n_buckets with
    # empty buckets counted as zeros — averaging only non-empty buckets
    # would report max_over_avg = 1 for the worst case of all rows
    # hashing into one bucket
    stats = counts.agg(
        F.max("rows").alias("_mx"),
        (F.sum("rows") / n_buckets).alias("_avg"),
        F.sum(F.col("rows") * F.col("rows")).alias("_s2"),
    )
    buckets = (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "bucket",
            "rows",
            F.round(F.col("_mx") / F.col("_avg"), 6).alias("max_over_avg"),
            F.round(
                F.sqrt(F.col("_s2") / n_buckets - F.col("_avg") * F.col("_avg"))
                / F.col("_avg"),
                6,
            ).alias("cv"),
        )
    )

    total = df.agg(F.count(F.lit(1)).alias("_total"))
    hot = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("rows"))
        .crossJoin(F.broadcast(total))
        .select(
            *keys,
            "rows",
            F.round(F.col("rows") / F.col("_total"), 6).alias("share"),
        )
        .orderBy(F.desc("rows"), *[F.asc(c) for c in keys])
        .limit(top_k)
    )
    return buckets, hot


def join_explosion_report(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    top_k: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """Pre-flight join-cardinality diagnostic: EXACT output size of
    ``left.join(right, on)`` without running the join — output rows =
    Σ_k cnt_left(k) · cnt_right(k), computed from the two per-key count
    relations (two map-side-combined aggregates + one join on distinct
    keys, tiny next to the real join's shuffle of full rows).

    Returns ``(summary, hot_keys)``: a 1-row summary
    (left_rows, right_rows, matching_keys, output_rows, amplification
    = output/max(input)) and the ``top_k`` keys by output contribution
    — the many-to-many keys that would explode. Amplification >> 1
    means duplicate keys on both sides (often an unintended grain
    mismatch); catch it here instead of 40 minutes into a 100 TB job.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("_nl"))
    rc = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("_nr"))
    per_key = lc.join(rc, keys).select(
        *keys, (F.col("_nl") * F.col("_nr")).alias("out_rows"), "_nl", "_nr"
    )
    totals = per_key.agg(
        F.count(F.lit(1)).alias("matching_keys"),
        F.sum("out_rows").alias("output_rows"),
    )
    lt = left.agg(F.count(F.lit(1)).alias("left_rows"))
    rt = right.agg(F.count(F.lit(1)).alias("right_rows"))
    summary = (
        lt.crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(totals))
        .select(
            "left_rows",
            "right_rows",
            "matching_keys",
            F.coalesce("output_rows", F.lit(0)).cast("long").alias("output_rows"),
            F.round(
                F.coalesce("output_rows", F.lit(0))
                / F.greatest("left_rows", "right_rows", F.lit(1)),
                6,
            ).alias("amplification"),
        )
    )
    hot = (
        per_key.orderBy(F.desc("out_rows"), *[F.asc(c) for c in keys])
        .limit(top_k)
        .select(
            *keys,
            F.col("_nl").alias("left_cnt"),
            F.col("_nr").alias("right_cnt"),
            F.col("out_rows").cast("long").alias("out_rows"),
        )
    )
    return summary, hot
