"""Event-stream operators (Structured Streaming shape).

The reference is batch-only (SURVEY §2.5: "no streaming — supersteps
are iterations, not event-time windows"), so this module is north-star
surface: the same transforms work on a batch DataFrame AND on a
``readStream`` source — pass a streaming df and add
``withWatermark`` upstream for late-data handling.

Windows are epoch-aligned tumbling windows (F.window), which DuckDB's
time_bucket replicates exactly — that's what makes these
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window per-event-type stats:
    (window_start string, event_type, n_events, sum_value).

    On a streaming df set ``watermark`` (e.g. "2 hours") to bound state;
    batch mode ignores it. sum_value rounded for cross-engine hashing.
    """
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_gap_s: int = 3600,
) -> DataFrame:
    """User-journey transition matrix (funnel analytics): for each pair
    of CONSECUTIVE events by the same user within ``max_gap_s`` seconds,
    count the
    (from_type -> to_type) transition and report the mean gap.
    Output: (from_type, to_type, n_transitions, avg_gap_s).

    One shuffle: the lead() window partitions by user (skew bounded by
    per-user event count), then a partial-aggregated groupBy on the tiny
    (from, to) key space. Ordering ties break on the event id, and the
    mean is computed as exact-integer-sum / count — one double division
    — so the result is engine-deterministic and oracle-checkable.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    nxt_type = F.lead(type_col).over(w)
    nxt_ts = F.lead(ts_col).over(w)
    gap_us = F.unix_micros(nxt_ts) - F.unix_micros(F.col(ts_col))
    pairs = (
        events.select(user_col, type_col, ts_col, id_col)
        .select(
            F.col(type_col).alias("from_type"),
            nxt_type.alias("to_type"),
            gap_us.alias("gap_us"),
        )
        .filter(
            F.col("to_type").isNotNull()
            & (F.col("gap_us") <= F.lit(max_gap_s * 1_000_000))
        )
    )
    return pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.round(F.sum("gap_us").cast("double") / F.count(F.lit(1)) / 1e6, 3).alias(
            "avg_gap_s"
        ),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: cohort = the day of a user's FIRST
    activity; for each (cohort_day, day-offset) cell, the number of
    distinct cohort users active that day. Output:
    (cohort_day string, day_offset, n_active).

    Scale shape: per-user min (partial-aggregated, keyed by user), a
    distinct over (user, day) — both shuffles share the user key, so
    the join between them is co-partitioned — then a final
    partial-aggregated count into the tiny (cohort, offset) key space.
    """
    day = F.date_trunc("day", F.col(ts_col))
    first = events.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    active = events.select(user_col, day.alias("day")).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time interval join (the stream-stream twin of
    ``operators.temporal.band_join``): pair each left row with same-key
    right rows whose timestamp lies in ``[left_ts - max_gap, left_ts]``.
    Output: key, left_ts, right_ts, then the remaining columns prefixed
    ``l_`` / ``r_``.

    On streaming inputs BOTH sides carry watermarks and the predicate
    bounds event time on both sides — exactly the two conditions
    Structured Streaming needs to evict join state, so buffered state is
    O(watermark + gap worth of events), never unbounded. Works
    identically on batch DataFrames (watermarks skipped).
    """
    lrest = [c for c in left.columns if c not in (key, ts_col)]
    rrest = [c for c in right.columns if c not in (key, ts_col)]
    l = left.select(
        F.col(key).alias("_lk"),
        F.col(ts_col).alias("left_ts"),
        *[F.col(c).alias(f"l_{c}") for c in lrest],
    )
    r = right.select(
        F.col(key).alias("_rk"),
        F.col(ts_col).alias("right_ts"),
        *[F.col(c).alias(f"r_{c}") for c in rrest],
    )
    if l.isStreaming:
        l = l.withWatermark("left_ts", watermark)
    if r.isStreaming:
        r = r.withWatermark("right_ts", watermark)
    cond = (
        (F.col("_lk") == F.col("_rk"))
        & (F.col("right_ts") >= F.col("left_ts") - F.expr(f"INTERVAL {max_gap}"))
        & (F.col("right_ts") <= F.col("left_ts"))
    )
    return l.join(r, cond, "inner").select(
        F.col("_lk").alias(key),
        "left_ts",
        "right_ts",
        *[f"l_{c}" for c in lrest],
        *[f"r_{c}" for c in rrest],
    )


def rollup_event_counts(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Hierarchical (day, event_type) rollup in ONE pass: per-day-per-type,
    per-day, and grand-total rows distinguished by ``gid`` (Spark
    grouping_id bitmask == ANSI GROUPING_ID, so the DuckDB twin is
    GROUP BY ROLLUP). The hypertable-continuous-aggregate shape: one
    shuffle produces every resolution instead of one scan per level;
    Spark expands the grouping sets map-side so partial aggregation
    still applies at 100 TB.
    """
    day = F.date_format(F.date_trunc("day", F.col(ts_col)), "yyyy-MM-dd")
    return (
        events.select(day.alias("day"), "event_type", "value")
        .rollup("day", "event_type")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.coalesce("day", F.lit("ALL")).alias("day"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "gid",
            "n_events",
            "sum_value",
        )
    )


def sliding_event_stats(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """SLIDING-window per-type stats: each event contributes to
    window/slide overlapping windows (F.window with slideDuration).
    Epoch-aligned like the tumbling variant, so the DuckDB twin is
    time_bucket shifted by each slide offset. Works on streaming DFs
    with a watermark upstream."""
    return (
        events.groupBy(
            F.window(ts_col, window, slide).alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def enrich_events(
    events: DataFrame, dim: DataFrame, on: str | list[str], broadcast: bool = True
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to an
    event stream. Stream-static joins are STATELESS in Structured
    Streaming (each micro-batch joins against the current dim snapshot),
    so this is the scale-correct way to decorate a 100 TB/day stream
    with slowly-changing reference data — broadcast the dim, never
    shuffle the stream. Works identically on batch DataFrames."""
    d = F.broadcast(dim) if broadcast else dim
    return events.join(d, on=on, how="left")


def parse_props(
    events: DataFrame,
    fields: dict[str, str] | None = None,
    props_col: str = "props",
) -> DataFrame:
    """Extract typed columns from a JSON string column (the events
    table's ``props``): ``fields`` maps JSON key -> Spark cast type.
    ``get_json_object`` is a JVM-side expression — semi-structured
    extraction without a UDF, fully pushed through codegen."""
    fields = fields or {"k": "int"}
    return events.select(
        "*",
        *[
            F.get_json_object(F.col(props_col), f"$.{k}").cast(t).alias(k)
            for k, t in fields.items()
        ],
    )


def dedup_events_within(
    events: DataFrame,
    window: str = "1 hour",
    keys: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch twin of per-window event dedup/throttling: keep the
    EARLIEST event (by event time, id tie-break — deterministic, hence
    oracle-checkable) per (keys, tumbling window). Returns
    (keys..., window_start string, id_col, n_in_window). One shuffle,
    map-side combined."""
    w = F.window(ts_col, window).alias("w")
    first = F.min(
        F.struct(F.col(ts_col).alias("ts"), F.col(id_col).alias("id"))
    ).alias("first")
    return (
        events.groupBy(*keys, w)
        .agg(first, F.count(F.lit(1)).alias("n_in_window"))
        .select(
            *keys,
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.col("first.id").alias(id_col),
            "n_in_window",
        )
    )


def stream_dedup_within(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming path of per-window dedup: watermark + dropDuplicates on
    (keys, window) keeps the FIRST-ARRIVED event per key per window and
    lets the state store evict keys older than the watermark. Arrival
    order is not event-time order, so the kept row can differ from the
    batch twin's earliest-event choice — at-most-once-per-window is the
    contract here, determinism is the batch twin's."""
    if not events.isStreaming:
        raise ValueError("stream_dedup_within is the streaming path; "
                         "use dedup_events_within on batch DataFrames")
    return (
        events.withWatermark(ts_col, watermark)
        .withColumn("w", F.window(ts_col, window))
        # the window struct inherits the event-time marker; Spark allows
        # only one event-time column through a stateful operator
        .drop(ts_col)
        .dropDuplicates([*keys, "w"])
        .withColumn(
            "window_start",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss"),
        )
        .drop("w")
    )


def running_user_totals(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``
    (the path SURVEY §2.5 reserves for operators Spark's built-in
    windowed aggs can't express): per-user running event count + value
    sum maintained in GroupState across micro-batches, one updated row
    emitted per user per batch.

    Streaming-only (raises on a batch DataFrame — use a plain groupBy
    there). State is O(1) per user; at 100 TB/day the state store holds
    |users| tiny rows, bounded further by adding a timeout eviction.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if not events.isStreaming:
        raise ValueError("running_user_totals is the streaming path; "
                         "use groupBy().agg() on batch DataFrames")

    def fn(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [total]}
        )

    return events.select(user_col, "value").groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming twin of ``sessionize``: gap-based sessions maintained
    in GroupState via ``applyInPandasWithState``. Emits, per user per
    micro-batch, one row per session touched in that batch
    (user_id, session_start string, n_events) in update mode — the last
    emission per (user, session_start) carries the final count.

    State is the OPEN session only: (start_epoch, last_epoch, n) — O(1)
    per user. Batches are sorted per user before folding; cross-batch
    out-of-order data older than the open session is counted into it
    (use an event-time timeout + watermark upstream to bound that at
    scale)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if not events.isStreaming:
        raise ValueError("sessionize_stateful is the streaming path; "
                         "use sessionize() on batch DataFrames")
    gap = gap_minutes * 60

    def fn(key, pdfs, state: GroupState):
        start, last, n = state.get if state.exists else (None, None, 0)
        touched: dict[int, int] = {}
        rows = pd.concat(list(pdfs))
        ts = rows["_ts_epoch"].sort_values()
        for t in ts:
            t = int(t)
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap:
                touched[start] = n  # close previous session
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1
        touched[start] = n
        state.update((start, last, n))
        out = pd.DataFrame(
            {
                "user_id": [key[0]] * len(touched),
                "session_start_epoch": list(touched.keys()),
                "n_events": list(touched.values()),
            }
        )
        yield out

    prepped = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("long").alias("_ts_epoch"),
    )
    out = prepped.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, session_start_epoch long, n_events long",
        stateStructType="start long, last long, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.select(
        "user_id",
        F.date_format(F.timestamp_seconds("session_start_epoch"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        "n_events",
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization: (user_id, session_id, session_start
    string, n_events). Batch formulation via window functions (lag +
    cumulative sum of gap breaks) — the streaming twin would use
    ``applyInPandasWithState``; the batch plan shuffles once on user_id.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    marked = events.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    with_sid = marked.withColumn("session_id", F.sum("_new_session").over(w))
    return (
        with_sid.groupBy(user_col, "session_id")
        .agg(
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def rolling_user_stats(
    events: DataFrame,
    n_events: int = 20,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event rolling statistics over each user's trailing
    ``n_events`` events (current included): rolling mean/stddev of
    ``value`` plus the z-score of the current event against that
    trailing window — the standard online anomaly-scoring shape.

    Returns (event_id, user_id, roll_mean, roll_std, z), floats rounded
    to 6 dp. Order within a user is (ts, event_id) — a total order, so
    the result is deterministic and SQL-replayable.

    One shuffle on user_id; the window is ROWS-bounded so state per
    task is O(n_events), independent of history length — the batch twin
    of a bounded-state streaming aggregation.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-(n_events - 1), Window.currentRow)
    )
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    z = F.when(std > 0, (F.col(value_col) - mean) / std)
    return events.select(
        id_col,
        user_col,
        F.round(mean, 6).alias("roll_mean"),
        F.round(std, 6).alias("roll_std"),
        F.round(z, 6).alias("z"),
    )


def topk_per_window(
    events: DataFrame,
    k: int = 3,
    window: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
    watermark: str | None = None,
) -> DataFrame:
    """Windowed heavy hitters: the ``k`` most frequent event types per
    tumbling window (count desc, type asc as the deterministic
    tie-break). Returns (window_start string, event_type, n_events, rk).

    Batch: one groupBy + a window over the (tiny) per-window count
    table. Streaming: the same groupBy under a watermark, with the
    top-k rank applied per finalized window downstream (rank over an
    unbounded stream is not incrementally computable, so the streaming
    path emits counts and ranks on sink/append).
    """
    from pyspark.sql import Window

    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    counts = df.groupBy(F.window(ts_col, window).alias("w"), type_col).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    rk = F.row_number().over(
        Window.partitionBy("w").orderBy(F.desc("n_events"), F.col(type_col).asc())
    )
    return (
        counts.withColumn("rk", rk)
        .filter(F.col("rk") <= k)
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            type_col,
            "n_events",
            "rk",
        )
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Sequential funnel analysis: per step, how many users performed
    the whole ORDERED prefix — the user's earliest step-1 event, then
    the earliest step-2 event AT OR AFTER that, and so on (classic
    product-analytics semantics; ties on equal timestamps count as
    progression). Returns one row per step:
    (step_index, step, n_users, conversion) with conversion = share of
    step-1 users surviving to this step.

    Scale shape: one filtered aggregate per step (k is small and
    fixed), each joined to the previous step's (user, ts) relation on
    the user key — k hash joins over per-user 1-row relations, never a
    window over the raw event stream; the event scan is pruned to one
    step's type per aggregate. Counts are O(1)-row aggregates unioned
    JVM-side.
    """
    if not steps:
        raise ValueError("funnel_steps requires >= 1 step")
    u, ty, ts = F.col(user_col), F.col(type_col), F.col(ts_col)

    reached = (
        events.filter(ty == steps[0])
        .groupBy(u.alias("user"))
        .agg(F.min(ts).alias("t"))
    )
    stage_users = [reached]
    for step in steps[1:]:
        nxt = (
            events.filter(ty == step)
            .select(u.alias("user"), ts.alias("_ts"))
            .join(stage_users[-1], "user")
            .filter(F.col("_ts") >= F.col("t"))
            .groupBy("user")
            .agg(F.min("_ts").alias("t"))
        )
        stage_users.append(nxt)

    counts = None
    for i, (step, rel) in enumerate(zip(steps, stage_users), start=1):
        c = rel.agg(
            F.lit(i).alias("step_index"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )
        counts = c if counts is None else counts.unionByName(c)
    base = stage_users[0].agg(F.count(F.lit(1)).alias("_base"))
    return (
        counts.crossJoin(F.broadcast(base))
        .select(
            "step_index",
            "step",
            "n_users",
            F.round(
                F.when(F.col("_base") > 0, F.col("n_users") / F.col("_base"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("conversion"),
        )
    )


def resample_gapfill(
    events: DataFrame,
    step: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    agg: str = "avg",
) -> DataFrame:
    """Resample an irregular event stream onto a regular per-user time
    grid with forward fill — the time-series normalization step before
    windowed features or model input: one row per (user, grid slot)
    from the user's first to last event, ``agg`` of the slot's events
    where any exist, previous slot's value carried forward through
    gaps. Returns (user_col, slot, value, gap_filled).

    Scale shape: slot assignment is a map-side ``window(ts, step)``;
    the grid materializes per user via one ``sequence`` explode bounded
    by that user's own span (never a global calendar join); the carry-
    forward is ``last(value, ignorenulls)`` over a PER-USER window —
    partitioned, never global. One shuffle on the user key end-to-end.
    """
    from pyspark.sql import Window

    aggs = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}
    if agg not in aggs:
        raise ValueError(f"agg must be one of {sorted(aggs)}, got {agg!r}")
    u, ts = F.col(user_col), F.col(ts_col)

    slotted = events.select(
        u.alias("user"),
        F.window(ts, step).getField("start").alias("slot"),
        F.col(value_col).alias("v"),
    )
    per_slot = slotted.groupBy("user", "slot").agg(aggs[agg]("v").alias("v"))

    spans = per_slot.groupBy("user").agg(
        F.min("slot").alias("_lo"), F.max("slot").alias("_hi")
    )
    grid = spans.select(
        "user",
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step}"))
        ).alias("slot"),
    )

    w = (
        Window.partitionBy("user")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(per_slot, ["user", "slot"], "left")
    return joined.select(
        F.col("user").alias(user_col),
        "slot",
        F.last("v", ignorenulls=True).over(w).alias("value"),
        F.col("v").isNull().alias("gap_filled"),
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user gap sessions via Spark's NATIVE ``session_window``
    stateful operator: (user_id, session_start, session_end, n_events,
    total_value). The built-in complement to the two hand-rolled
    formulations (``sessionize``'s lag+cumsum batch plan and
    ``sessionize_stateful``'s GroupState loop): the engine merges
    overlapping gap windows in state, emitting a session only once its
    gap expires past the watermark — set ``watermark`` on streams to
    bound that state.

    Works identically on batch frames (state machinery skipped). Same
    session definition as ``sessionize``: events within ``gap`` of each
    other share a session.
    """
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap).alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col)).alias("total_value"),
        )
        .select(
            user_col,
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
            F.round("total_value", 6).alias("total_value"),
        )
    )
