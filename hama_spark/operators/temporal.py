"""Temporal joins Spark lacks natively: as-of join and banded range join.

Beyond the reference surface (SURVEY north star — a training-data
pipeline constantly aligns timestamped features/labels). Both operators
are compositions of built-in DataFrame ops chosen for their shuffle
shape, not correctness alone:

- :func:`asof_join` — ONE shuffle (window partition on the key), O(n)
  running state per partition via ``last(ignorenulls)`` carry-forward.
  This is the plan a native SortMergeAsofJoin would produce: co-sort
  both sides on (key, ts), scan once. No range explosion, no per-row
  subquery.
- :func:`band_join` — the classic bucketed band join: each right row is
  replicated to its own epoch bucket ±1 (bucket width == band), the
  join is a pure EQUI-join on the bucket (plus optional keys), and the
  exact |Δts| <= band predicate filters after the match. Candidate cost
  is Σ|bucket|·|neighbor buckets| instead of |L|·|R|; each qualifying
  pair is produced exactly once (a left row has one bucket, a right row
  appears once per distinct bucket), so no dedup shuffle afterwards.

At 100 TB: both shuffle on (key | bucket); a pathologically hot key is
the caller's salting problem (AQE skew-join splits the sort-merge side;
window partitions it cannot). Document-scale keys (user_id, 5-minute
buckets) are naturally fine-grained.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    strict: bool = False,
    tolerance_secs: int | None = None,
    suffix: str = "_r",
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` at-or-before (``strict=False``) / strictly-before
    (``strict=True``) ``left_ts`` within the same key group (left join:
    unmatched left rows keep NULL right columns).

    Implementation: union both sides tagged with a sort-side flag, then
    one window per key ordered by (ts, side[, tiebreak]) carrying the
    last non-null right payload forward. ``strict`` is purely a sort
    order choice: at equal ts, the right row sorts before the left row
    (inclusive) or after it (strict).

    ``tolerance_secs`` drops matches older than the given horizon
    (post-filter on the carried payload — no plan change).
    ``tiebreak`` names a right column whose greatest value wins among
    right rows sharing an identical (key, ts).
    """
    keys = [on] if isinstance(on, str) else list(on)
    # right payload keeps every non-key column (incl. its ts, needed for
    # the tolerance check), exported under `suffix`
    rpay = [c for c in right.columns if c not in keys]
    left_side, right_side = (0, 1) if strict else (1, 0)

    r2 = right.select(
        *keys,
        F.col(right_ts).alias("_t"),
        F.lit(right_side).alias("_side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tb"),
        F.struct(*rpay).alias("_r"),
    )
    l2 = left.select(
        *keys,
        F.col(left_ts).alias("_t"),
        F.lit(left_side).alias("_side"),
        F.lit(None).cast(r2.schema["_tb"].dataType).alias("_tb"),
        F.struct(*left.columns).alias("_l"),
    ).withColumn("_r", F.lit(None).cast(r2.schema["_r"].dataType))
    l2 = l2.select(*keys, "_t", "_side", "_tb", "_l", "_r")
    r2 = r2.withColumn("_l", F.lit(None).cast(l2.schema["_l"].dataType)).select(
        *keys, "_t", "_side", "_tb", "_l", "_r"
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l2.unionByName(r2).withColumn("_m", F.last("_r", ignorenulls=True).over(w))

    matched: Column = F.col("_m")
    if tolerance_secs is not None:
        horizon = F.col("_t") - F.expr(f"INTERVAL {int(tolerance_secs)} SECONDS")
        matched = F.when(F.col("_m")[right_ts] >= horizon, F.col("_m"))

    out = u.filter(F.col("_side") == left_side)
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[matched[c].alias(f"{c}{suffix}") for c in rpay],
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    band_secs: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    on: str | list[str] | None = None,
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """Pair each left row with every right row whose timestamp lies in
    ``[left_ts - band_secs, left_ts + band_secs]`` (optionally also
    matching key columns ``on``). ``how`` may be ``inner`` or ``left``
    (left keeps rowless lefts with NULL right columns).

    Bucketed: equi-join on epoch//band (right exploded to bucket ±1),
    never a theta-join — Catalyst would otherwise fall back to
    BroadcastNestedLoopJoin, the |L|x|R| scale-killer.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"band_join supports inner/left, got {how!r}")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    b = int(band_secs)

    lb = left.withColumn("_bkt", (F.unix_timestamp(F.col(left_ts)) / b).cast("long"))
    rpay = [c for c in right.columns if c not in keys]
    rb = right.select(
        *keys,
        F.explode(
            F.array(
                (F.unix_timestamp(F.col(right_ts)) / b).cast("long") - 1,
                (F.unix_timestamp(F.col(right_ts)) / b).cast("long"),
                (F.unix_timestamp(F.col(right_ts)) / b).cast("long") + 1,
            )
        ).alias("_bkt"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rpay],
    )
    cond = (
        (F.abs(F.unix_micros(F.col(f"{right_ts}{suffix}")) - F.unix_micros(F.col(left_ts)))
         <= F.lit(b * 1_000_000))
    )
    joined = lb.join(rb, on=["_bkt", *keys] if keys else ["_bkt"], how="inner").filter(cond)
    if how == "inner":
        return joined.drop("_bkt")
    # left variant: re-attach rowless lefts via a broadcast-free
    # anti-join on the left's natural columns is wasteful; instead tag
    # and group — callers doing per-left aggregation should just count
    # over the inner result and left-join the summary back.
    matched_keys = joined.select(*left.columns).distinct()
    missing = left.join(matched_keys, on=left.columns, how="left_anti")
    for c in rpay:
        missing = missing.withColumn(
            f"{c}{suffix}", F.lit(None).cast(dict(rb.dtypes)[f"{c}{suffix}"])
        )
    return joined.drop("_bkt").unionByName(missing)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    on: str | list[str] | None = None,
    bucket_secs: int = 3600,
    suffix: str = "_r",
) -> DataFrame:
    """Point-in-interval containment join: pair each ``points`` row with
    every ``intervals`` row satisfying ``start <= ts <= end`` (endpoints
    inclusive), optionally also matching key columns ``on``. The classic
    lookup shape — event → active promotion window, timestamp → validity
    interval, measurement → maintenance window — that naive SQL writes
    as ``ON ts BETWEEN start AND end`` and Spark then executes as a
    BroadcastNestedLoopJoin (|P|·|I| comparisons, the scale-killer this
    module exists to avoid; ``band_join`` can't express it because the
    band there is centered on a point, not an arbitrary [start, end]).

    Implementation: each interval is exploded to the epoch buckets of
    width ``bucket_secs`` it overlaps (``sequence(floor(start/g),
    floor(end/g))``), points bucket once, the join is a pure EQUI-join
    on (bucket[, keys]) and the exact containment predicate filters
    after the match. Each qualifying pair appears exactly once (a point
    has one bucket; an interval covers that bucket at most once).

    Scale shape: candidate cost is Σ over buckets of |points_b|·|ivls_b|
    and interval replication is ceil(len/g)+1 rows — pick ``bucket_secs``
    near the MEDIAN interval length (replication ~2× while buckets stay
    selective). A single pathological interval spanning the whole
    timeline replicates timeline/g times; cap such outliers upstream or
    route them through a broadcast side. Intervals with end < start are
    dropped (``sequence`` would raise on a negative step).

    Columns may be timestamps OR plain numerics (an IP → ASN-range or
    row-offset → shard lookup is the same join; ``bucket_secs`` is then
    just the bucket width in the column's own units).
    """
    from pyspark.sql.types import NumericType

    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    g = int(bucket_secs)
    if g < 1:
        raise ValueError(f"bucket_secs must be >= 1, got {bucket_secs}")

    numeric = isinstance(points.schema[point_ts].dataType, NumericType)
    for bound in (start_col, end_col):
        if numeric != isinstance(intervals.schema[bound].dataType, NumericType):
            raise ValueError(
                f"point column {point_ts!r} and interval bound {bound!r} must "
                "both be timestamps or both numeric"
            )
    _epoch = (lambda c: c) if numeric else F.unix_timestamp

    pb = points.withColumn(
        "_bkt", F.floor(_epoch(F.col(point_ts)) / g).cast("long")
    )
    ipay = [c for c in intervals.columns if c not in keys]
    ib = (
        intervals.filter(F.col(end_col) >= F.col(start_col))
        .select(
            *keys,
            F.explode(
                F.sequence(
                    F.floor(_epoch(F.col(start_col)) / g).cast("long"),
                    F.floor(_epoch(F.col(end_col)) / g).cast("long"),
                )
            ).alias("_bkt"),
            *[F.col(c).alias(f"{c}{suffix}") for c in ipay],
        )
    )
    cond = (F.col(point_ts) >= F.col(f"{start_col}{suffix}")) & (
        F.col(point_ts) <= F.col(f"{end_col}{suffix}")
    )
    return (
        pb.join(ib, on=["_bkt", *keys] if keys else ["_bkt"], how="inner")
        .filter(cond)
        .drop("_bkt")
    )
