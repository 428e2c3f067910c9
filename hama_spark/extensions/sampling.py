"""Seeded sampling / ordering / packing for training-data pipelines
(north star): the operations a 100 TB corpus pipeline runs after
cleaning+dedup to assemble an actual training mix.

- seeded_sample: deterministic Bernoulli sample — keep rows whose
  md5(seed:id) bucket falls under the fraction. Partitioning- and
  engine-independent (no rand()), so runs are reproducible and the
  DuckDB oracle replays them exactly.
- stratified_sample: per-stratum fractions (e.g. downsample by language
  or quality band) with a default for unlisted strata. Pure filter —
  no shuffle at all; predicate pushes to the scan.
- global_shuffle: deterministic global permutation (training-order
  shuffle). Scale design: a naive row_number() over a global ORDER BY
  is a single-partition window — instead the hash is bucketed and
  positions are computed two-phase (per-bucket window in parallel +
  tiny bucket-offset broadcast), the distributed zipWithIndex pattern.
- pack_sequences: concat-and-chunk packing — documents are laid out in
  shuffle order and each doc's pack is the ``max_tokens`` chunk where
  its first token lands (floor(exclusive-prefix-sum / max_tokens)).
  Same two-phase prefix sum; no global window anywhere.

Reference note: the reference engine (apache/hama) has no sampling or
packing surface — these extend the engine per SURVEY §7's north-star
plan, alongside dedup/similarity/text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 12 hex chars = 48 bits: fits bigint in both engines, overflow-free.
_HASH_HEX = 12
_HASH_MOD = 1_000_000


def _hash_key(seed: int, col: Column) -> Column:
    """Deterministic 48-bit key from md5(seed:value) — the cross-engine
    hash pattern used throughout (generators, minhash): DuckDB twin is
    ('0x' || substr(md5(seed || ':' || v), 1, 12))::BIGINT."""
    s = F.concat_ws(":", F.lit(str(seed)), col.cast("string"))
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, _HASH_HEX), 16, 10).cast("long")


def seeded_sample(
    df: DataFrame, fraction: float, seed: int = 42, id_col: str = "doc_id"
) -> DataFrame:
    """Keep each row iff md5(seed:id) % 1e6 < fraction*1e6 — a
    deterministic Bernoulli sample that is stable across partitionings,
    engines, and reruns (unlike df.sample, whose output depends on the
    partitioning). Plain filter: no shuffle."""
    return df.filter(_hash_key(seed, F.col(id_col)) % _HASH_MOD < int(fraction * _HASH_MOD))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling: rows in stratum s survive
    with fractions[s] (default_fraction for unlisted strata). The
    training-mix primitive: downsample low-quality / overrepresented
    strata, keep rare ones whole."""
    # thresholds become driver-side INTEGER literals (int(f*1e6)) — a
    # float-expression threshold would truncate differently across
    # engines (Spark cast truncates, DuckDB rounds)
    threshold = F.lit(int(default_fraction * _HASH_MOD))
    for value, f in fractions.items():
        threshold = F.when(F.col(strata_col) == value, F.lit(int(f * _HASH_MOD))).otherwise(
            threshold
        )
    return df.filter(_hash_key(seed, F.col(id_col)) % _HASH_MOD < threshold)


def sample_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fixed-SIZE sample: exactly min(n, |group|) rows per
    group, chosen by md5(seed:id) rank — the balanced-per-class
    counterpart to ``stratified_sample``'s per-stratum FRACTIONS
    (class-balanced eval sets, per-language caps, per-source quotas).

    One keyed window (shuffle on group_col); the hash gives a uniform,
    rerun-stable order, with id as tie-break so the sample is a pure
    function of (seed, data). For a group hot enough to bottleneck its
    single window task, pre-prune per partition first — per-partition
    hash-rank top-n can never evict a global top-n row, so exactness
    is preserved.
    """
    from pyspark.sql import Window

    key = _hash_key(seed, F.col(id_col))
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def _two_phase_positions(
    df: DataFrame,
    seed: int,
    id_col: str,
    weight: Column | None,
    num_buckets: int,
) -> DataFrame:
    """Shared two-phase global ordering: every row gets its 1-based
    ``pos`` (and, when ``weight`` is given, the exclusive prefix sum
    ``cum_before``) in the deterministic order (bucket, h, id) where
    h = md5(seed:id) and bucket = h % num_buckets.

    Phase 1 runs an ordinary window PER BUCKET (parallel, bounded
    partitions); phase 2 computes each bucket's global offset from a
    ``num_buckets``-row aggregate and broadcasts it back. Equivalent to
    a global window, without the single-partition sort."""
    h = _hash_key(seed, F.col(id_col))
    base = df.withColumn("_h", h).withColumn("_bkt", F.pmod(F.col("_h"), F.lit(num_buckets)))
    w = Window.partitionBy("_bkt").orderBy("_h", id_col)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = base.withColumn("_pos_in", F.row_number().over(w))
    aggs = [F.count(F.lit(1)).alias("_n")]
    if weight is not None:
        base = base.withColumn("_w", weight)
        base = base.withColumn("_cum_in", F.sum("_w").over(wsum))
        aggs.append(F.sum("_w").alias("_wsum"))
    totals = base.groupBy("_bkt").agg(*aggs)
    # the offsets window runs over num_buckets rows TOTAL (not data) —
    # the degenerate partition key (non-foldable, so Catalyst keeps it)
    # makes that explicit and avoids Spark's single-partition-window
    # warning for what is a ~64-row frame
    woff = (
        Window.partitionBy(F.pmod(F.col("_bkt"), F.lit(1)))
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_bkt",
        F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off_n"),
        *(
            [F.coalesce(F.sum("_wsum").over(woff), F.lit(0)).alias("_off_w")]
            if weight is not None
            else []
        ),
    )
    out = base.join(F.broadcast(offsets), "_bkt")
    out = out.withColumn("pos", (F.col("_off_n") + F.col("_pos_in")).cast("long"))
    if weight is not None:
        out = out.withColumn(
            "cum_before",
            (F.col("_off_w") + F.col("_cum_in") - F.col("_w")).cast("long"),
        )
    return out.drop("_h", "_bkt", "_w", "_pos_in", "_cum_in", "_off_n", "_off_w")


def ranked_by(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based rank by ``order_cols`` WITHOUT a single-partition
    window: range-repartition on the key (so each partition holds a
    contiguous key range), rank within partitions in parallel, then add
    each partition's global offset from a partition-count broadcast.
    Any boundary choice Spark's range sampler makes yields the same
    ranks as long as ``order_cols`` is a total order — pass tie-break
    columns to guarantee that."""
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.col(c) for c in order_cols]
    arranged = df.repartitionByRange(n_part, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    local = arranged.withColumn("_lrank", F.row_number().over(w))
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    woff = (
        Window.partitionBy(F.pmod(F.col("_pid"), F.lit(1)))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select("_pid", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off"))
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lrank")).cast("long"))
        .drop("_pid", "_lrank", "_off")
    )


def interleave_datasets(
    sources: dict[str, tuple[DataFrame, float]],
    id_col: str = "doc_id",
    seed: int = 42,
    num_buckets: int = 64,
) -> DataFrame:
    """Deterministic weighted interleave of corpora — the training-mix
    merge: source s's i-th row (in its seeded shuffle order) gets merge
    key (i - 0.5) / weight_s, and the output is the union ranked by
    (key, source, id). A weight-2 source appears twice as often as a
    weight-1 source at every prefix of the stream, which is what
    "epochs-per-dataset" mixing means. Returns
    (source, id_col, pos) with pos the 1-based merged order.

    Each source df must expose ``id_col``; all positions are computed
    with the engine's two-phase rank — no global windows."""
    parts = []
    for name, (df, weight) in sorted(sources.items()):
        shuffled = _two_phase_positions(df, seed, id_col, None, num_buckets)
        parts.append(
            shuffled.select(
                F.lit(name).alias("source"),
                F.col(id_col),
                ((F.col("pos") - F.lit(0.5)) / F.lit(float(weight))).alias("_mkey"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return ranked_by(u, ["_mkey", "source", id_col], out_col="pos").drop("_mkey")


def global_shuffle(
    df: DataFrame, seed: int = 42, id_col: str = "doc_id", num_buckets: int = 64
) -> DataFrame:
    """Deterministic global training-order shuffle: adds ``pos`` (1-based
    position in md5(seed:id) order). Reproducible across runs/engines;
    two-phase positions — no single-partition global sort."""
    return _two_phase_positions(df, seed, id_col, None, num_buckets)


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    seed: int = 42,
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents laid end-to-end in
    the seeded shuffle order, ``pack_id`` = which ``max_tokens`` chunk
    the document STARTS in (floor(exclusive-prefix-tokens/max_tokens)).
    Adds (pos, cum_before, pack_id). Deterministic and engine-replayable;
    downstream writers group by pack_id to emit training sequences."""
    out = _two_phase_positions(df, seed, id_col, F.col(token_col).cast("long"), num_buckets)
    return out.withColumn(
        "pack_id", F.floor(F.col("cum_before") / F.lit(int(max_tokens))).cast("long")
    )


def select_under_budget(
    df: DataFrame,
    budget: int,
    weight_col: str = "n_tokens",
    order_cols: list[str] | None = None,
    descending: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy prefix selection under a global weight budget: walk the
    rows in priority order (``order_cols``, default first column,
    ``descending`` — quality-score-desc is the usual call) and keep each
    row while the running total of ``weight_col`` stays ≤ ``budget``.
    The training-data sizing op: "the best documents up to N tokens".

    Selection STOPS at the first row that would overflow — it is a
    strict prefix, not a knapsack — so the result is deterministic and
    replayable in plain SQL (cumsum ≤ budget over the same order).
    Order ties MUST be broken by the caller's order_cols (append an id
    column) or the prefix is not well-defined.

    Scale shape: range-repartition on the priority key, per-partition
    running sums in parallel windows, one partition-count aggregate
    broadcast back for global offsets — the same two-phase prefix-sum
    pattern as pack_sequences, never a single-partition window. Adds
    ``cum_weight`` (inclusive prefix sum)."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    order_cols = order_cols or df.columns[:1]
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    keys = [
        (F.col(c).desc() if descending else F.col(c).asc()) for c in order_cols
    ]
    arranged = df.repartitionByRange(n_part, *keys).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NULL weights would ride along free (window sums skip NULLs) and
    # negative ones break the strict-prefix guarantee — reject in-plan,
    # no extra pass
    wcol = F.col(weight_col).cast("long")
    guarded = F.when(wcol >= 0, wcol).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"select_under_budget: NULL or negative {weight_col}: "),
                F.coalesce(F.col(weight_col).cast("string"), F.lit("NULL")),
            )
        )
    )
    local = arranged.withColumn("_w", guarded).withColumn(
        "_cum_in", F.sum("_w").over(w)
    )
    totals = local.groupBy("_pid").agg(F.sum("_w").alias("_wsum"))
    woff = (
        Window.partitionBy(F.pmod(F.col("_pid"), F.lit(1)))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_wsum").over(woff), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("cum_weight", (F.col("_off") + F.col("_cum_in")).cast("long"))
        .where(F.col("cum_weight") <= budget)
        .drop("_pid", "_w", "_cum_in", "_off")
    )


def mix_weights(
    df: DataFrame,
    group_col: str = "source",
    size_col: str | None = None,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based domain mixing weights (the multilingual /
    multi-domain resampling recipe: target share q_g ∝ p_g^alpha, with
    p_g each group's natural share of the corpus). alpha=1 keeps the
    natural mix, alpha=0 is uniform over groups, alpha≈0.3-0.7 boosts
    the tail without drowning the head.

    Returns one row per group: (group_col, n, p, q, rate) where ``rate``
    = q/p is the per-document sampling multiplier that realizes the
    target mix (feed it to stratified/seeded sampling or
    interleave_datasets weights).

    Scale shape: one partial-aggregated groupBy (|groups| rows out,
    checkpointed so the corpus is scanned exactly once), one single-row
    broadcast carrying both normalizers — nothing per-document ever
    shuffles. q is computed as sz^alpha / Σ sz^alpha (the tot^alpha
    factors cancel), so no intermediate share division feeds the pow.
    """
    size = F.lit(1) if size_col is None else F.col(size_col).cast("double")
    g = (
        df.groupBy(group_col)
        .agg(F.sum(size).cast("double").alias("_sz"))
        .localCheckpoint(eager=True)
    )
    norm = g.agg(
        F.sum("_sz").alias("_tot"),
        F.sum(F.pow(F.col("_sz"), F.lit(alpha))).alias("_za"),
    )
    q = F.pow(F.col("_sz"), F.lit(alpha)) / F.col("_za")
    p = F.col("_sz") / F.col("_tot")
    return g.crossJoin(F.broadcast(norm)).select(
        group_col,
        F.col("_sz").cast("long").alias("n"),
        p.alias("p"),
        q.alias("q"),
        (q / p).alias("rate"),
    )


def split_dataset(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: md5(seed:id) % 1e6
    lands in cumulative weight bands, so every row gets exactly one
    split label that is stable across engines, partitionings, reruns,
    and INCREMENTAL growth (new rows hash into splits at the same
    proportions without reshuffling old ones — the property random
    splits lack). Adds a ``split`` column; no shuffle, no sort.

    ``weights`` values must sum to 1.0 (default 90/5/5); band order is
    dict order.

    Leakage-safe GROUP splits fall out of the same mechanism: pass the
    group key (domain, author, url-host) as ``id_col`` and every row of
    a group hashes to the same band — near-duplicate documents from one
    source can never straddle train and test. Pinned by
    ``tests/test_sampling.py::test_split_dataset_group_coherence``.
    """
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    key = _hash_key(seed, F.col(id_col)) % _HASH_MOD
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = key < int(cum * _HASH_MOD)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def bucket_by_length(
    df: DataFrame,
    batch_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 42,
    num_buckets: int = 64,
) -> DataFrame:
    """Length-bucketed dynamic batching: group documents of similar
    length and cut fixed-capacity batches inside each group, so a
    training loader pads every sequence in a batch to the group's
    power-of-two bound instead of the global maximum — the standard
    padding-waste fix. Adds (length_bucket, pad_len, pos_in_bucket,
    batch_id):

    - ``length_bucket`` = ceil(log2(len)) (len 0/1 -> bucket 0), so
      bucket b holds lengths (2^(b-1), 2^b] and ``pad_len`` = 2^b;
    - batches hold ``capacity = max(1, batch_tokens // pad_len)`` docs,
      so capacity · pad_len <= batch_tokens for every full batch;
    - order within a bucket is the seeded md5 shuffle (deterministic,
      engine-replayable); ``batch_id`` = 'b<bucket>_<chunk>'.

    Scale shape: the per-bucket ordering runs the same TWO-PHASE trick
    as ``pack_sequences`` with the length bucket as an extra key —
    a window per (length_bucket, hash-bucket) slice (bounded, parallel)
    plus an offsets window over the |buckets|·num_buckets count rows —
    never a single-partition sort, even when one length bucket holds
    the whole corpus.
    """
    # NULL token counts raise (matching pack_best_fit) instead of the
    # silent length-1 coercion greatest(NULL, 1) would apply — the same
    # bad input must fail the same way across the packing family.
    tcol = F.col(token_col).cast("long")
    checked = F.when(tcol.isNotNull(), tcol).otherwise(
        F.raise_error(
            F.lit(
                f"bucket_by_length: NULL {token_col} — clean or drop "
                "rows with a NULL token count before bucketing"
            )
        )
    )
    ln = F.greatest(checked, F.lit(1))
    lb = F.ceil(F.log2(ln)).cast("int")
    h = _hash_key(seed, F.col(id_col))
    base = (
        df.withColumn("_lb", lb)
        .withColumn("_h", h)
        .withColumn("_bkt", F.pmod(F.col("_h"), F.lit(num_buckets)))
    )
    w = Window.partitionBy("_lb", "_bkt").orderBy("_h", id_col)
    base = base.withColumn("_pos_in", F.row_number().over(w))
    totals = base.groupBy("_lb", "_bkt").agg(F.count(F.lit(1)).alias("_n"))
    # offsets frame: |length buckets| x num_buckets rows total
    woff = (
        Window.partitionBy("_lb")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_lb", "_bkt", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")
    )
    pad = F.expr("shiftleft(1, _lb)").cast("long")
    cap = F.greatest(F.floor(F.lit(int(batch_tokens)) / pad), F.lit(1)).cast("long")
    out = (
        base.join(F.broadcast(offsets), ["_lb", "_bkt"])
        .withColumn("pos_in_bucket", (F.col("_off") + F.col("_pos_in")).cast("long"))
        .select(
            *df.columns,
            F.col("_lb").alias("length_bucket"),
            pad.alias("pad_len"),
            "pos_in_bucket",
            F.concat(
                F.lit("b"), F.col("_lb"), F.lit("_"),
                F.floor((F.col("_off") + F.col("_pos_in") - 1) / cap).cast("long"),
            ).alias("batch_id"),
        )
    )
    return out


def pack_best_fit(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 42,
    num_groups: int = 256,
) -> DataFrame:
    """Document-INTACT sequence packing by first-fit-decreasing:
    ``pack_sequences`` concatenates and splits documents across
    boundaries (zero padding waste, broken documents); this operator
    keeps every document whole and bins them, paying bounded padding
    instead. The training-data trade every packer chooses from.

    Documents are hashed into ``num_groups`` independent packing groups
    (any doc may share a bin with any other, so grouping is free), and
    each group runs classic FFD in an Arrow-batched ``applyInPandas``:
    sort by tokens desc (md5 tie-break), drop each doc into the first
    bin with room. Bins are (group, bin_id); a document LONGER than
    ``max_tokens`` gets a bin of its own, flagged ``oversize``.

    Returns df + (group, bin_id, oversize).

    Scale shape: one shuffle on the group key; per-task state is one
    group's (token, id) pairs — size corpus/num_groups, so pick
    num_groups to bound executor memory. FFD inside a group is
    O(d log d + d·b) driver-free pandas. Deterministic: group and order
    depend only on (seed, id), never on partitioning.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be > 0, got {max_tokens}")
    import pandas as pd

    def _ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["_tok", "_ord"], ascending=[False, True], kind="mergesort"
        )
        ends: list[int] = []  # remaining capacity per bin
        bins: list[int] = []
        oversize: list[bool] = []
        for tok in pdf["_tok"]:
            if pd.isna(tok):
                raise ValueError(
                    "pack_best_fit: NULL token count — clean or drop "
                    "rows with a NULL weight before packing"
                )
            t = int(tok)
            if t > max_tokens:
                ends.append(0)
                bins.append(len(ends) - 1)
                oversize.append(True)
                continue
            for b, rem in enumerate(ends):
                if rem >= t:
                    ends[b] = rem - t
                    bins.append(b)
                    break
            else:
                ends.append(max_tokens - t)
                bins.append(len(ends) - 1)
            oversize.append(False)
        pdf = pdf.assign(bin_id=bins, oversize=oversize)
        return pdf.drop(columns=["_tok", "_ord"])

    keyed = df.withColumn("_ord", _hash_key(seed, F.col(id_col))).withColumn(
        "group", F.pmod(F.col("_ord"), F.lit(num_groups)).cast("int")
    ).withColumn("_tok", F.col(token_col).cast("long"))

    out_cols = [f.name for f in df.schema.fields] + ["group", "bin_id", "oversize"]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema += ", group int, bin_id int, oversize boolean"
    return keyed.groupBy("group").applyInPandas(
        lambda pdf: _ffd(pdf).reindex(columns=out_cols),
        schema=schema,
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    n_stages: int = 4,
    seed: int = 42,
    id_col: str = "doc_id",
    easy_first: bool = True,
    num_buckets: int = 64,
) -> DataFrame:
    """Curriculum training order (Bengio et al.): split the corpus into
    ``n_stages`` difficulty bands by ``score_col`` quantiles and give
    every row a global ``pos`` that walks the stages in order —
    easy band shuffled first, then the next, … Within a stage the order
    is the deterministic md5 shuffle, so the schedule is a pure
    function of (seed, data) like every sampler here.

    Adds (stage 0-based, pos 1-based global). Scale shape: stage
    boundaries are ``n_stages - 1`` exact-quantile literals from ONE
    approx_percentile aggregate (accuracy pinned high enough to be
    deterministic for the driver's data sizes); positions reuse the
    two-phase prefix-sum machinery keyed by (stage, hash) — per-stage
    windows run in parallel, never a single-partition sort."""
    if n_stages < 1:
        raise ValueError(f"n_stages must be >= 1, got {n_stages}")
    qs = [i / n_stages for i in range(1, n_stages)]
    if qs:
        # `or []`: empty df / all-NULL scores yield NULL bounds — a
        # single stage 0 (the order degenerates to the global shuffle)
        bounds = (
            df.agg(F.percentile_approx(score_col, qs, 1_000_000).alias("b"))
            .first()["b"]
            or []
        )
    else:
        bounds = []
    stage = F.lit(0)
    for b in bounds:
        stage = stage + F.when(F.col(score_col) > F.lit(b), 1).otherwise(0)
    if not easy_first:
        stage = F.lit(max(len(bounds), 0)) - stage
    staged = df.withColumn("stage", stage.cast("int"))

    # global position: exclusive prefix of earlier stages' sizes +
    # two-phase md5-order position within the stage
    h = _hash_key(seed, F.col(id_col))
    base = staged.withColumn("_h", h).withColumn(
        "_bkt",
        F.col("stage") * num_buckets + F.pmod(F.col("_h"), F.lit(num_buckets)),
    )
    w = Window.partitionBy("_bkt").orderBy("_h", id_col)
    base = base.withColumn("_pos_in", F.row_number().over(w))
    totals = base.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_n"))
    woff = (
        Window.partitionBy(F.pmod(F.col("_bkt"), F.lit(1)))
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_bkt", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")
    )
    return (
        base.join(F.broadcast(offsets), "_bkt")
        .withColumn("pos", (F.col("_off") + F.col("_pos_in")).cast("long"))
        .drop("_h", "_bkt", "_pos_in", "_off")
    )
