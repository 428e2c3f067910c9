"""Mergeable per-key aggregation state for incremental pipelines: build
once per ingestion batch, merge states instead of rescanning history.

The pattern every incremental ETL needs (and the algebra behind Spark's
own partial aggregation): a state row per key holding the mergeable
components (count, sum, min, max) from which the reported metrics
(mean included) derive. Merging two states is a groupBy over their
union — associative and commutative, so daily/shard states combine in
any order and any grouping, and a 100 TB history is never rescanned:
each new batch contributes its own state and one bounded-size merge.

Retraction: ``retract_state`` handles deletions for the invertible
components (count, sum). min/max are NOT invertible — retracting the
current extreme requires the base data — so retraction nulls them for
affected keys and callers either recompute those keys from the base
table (join against :func:`hama_spark.extensions.corpus.snapshot_diff`
output to find them) or use merge-only workflows. That fence is
explicit by design; silently wrong extremes would be worse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STATE_COLS = ("cnt", "vsum", "vmin", "vmax")


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-key mergeable state: (keys..., cnt, vsum, vmin, vmax)."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(v).alias("cnt"),
        F.sum(v.cast("double")).alias("vsum"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
    )


def merge_agg_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Combine two states (associative + commutative): sum the sums and
    counts, extreme the extremes. Keys present in only one side pass
    through unchanged — union semantics, not a join.

    A retraction-poisoned extreme (NULL vmin/vmax with cnt > 0, see
    :func:`retract_state`) stays NULL through the merge: SQL min/max
    skip NULLs, so without the guard a poisoned "unknown" would merge
    with a fresh batch into a confidently WRONG extreme (the old
    pre-retraction minimum may still be smaller than anything the new
    batch saw). cnt = 0 NULLs (a state over all-NULL values) are not
    poison — they merge away normally."""

    def _merged_extreme(agg, col: str):
        poisoned = F.max(
            (F.col(col).isNull() & (F.col("cnt") > 0)).cast("int")
        ) == 1
        return F.when(poisoned, F.lit(None)).otherwise(agg(col)).alias(col)

    return (
        a.select(*keys, *STATE_COLS)
        .unionByName(b.select(*keys, *STATE_COLS))
        .groupBy(*keys)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("vsum").alias("vsum"),
            _merged_extreme(F.min, "vmin"),
            _merged_extreme(F.max, "vmax"),
        )
    )


def retract_state(
    state: DataFrame, removed: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Retract deleted rows from a state: count and sum subtract
    exactly; min/max become NULL for every key the retraction touched
    (non-invertible — recompute those keys from base data downstream).
    Keys whose count reaches zero drop out entirely."""
    neg = agg_state(removed, keys, value_col).select(
        *keys,
        (-F.col("cnt")).alias("cnt"),
        (-F.col("vsum")).alias("vsum"),
        F.lit(None).cast(state.schema["vmin"].dataType).alias("vmin"),
        F.lit(None).cast(state.schema["vmax"].dataType).alias("vmax"),
        F.lit(True).alias("_touched"),
    )
    pos = state.select(
        *keys, *STATE_COLS, F.lit(False).alias("_touched")
    )
    return (
        pos.unionByName(neg)
        .groupBy(*keys)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("vsum").alias("vsum"),
            # any touched key loses its extremes (max of bools = touched)
            F.when(F.max("_touched"), F.lit(None))
            .otherwise(F.min("vmin"))
            .alias("vmin"),
            F.when(F.max("_touched"), F.lit(None))
            .otherwise(F.max("vmax"))
            .alias("vmax"),
        )
        .filter(F.col("cnt") > 0)
    )


def state_metrics(state: DataFrame, keys: list[str]) -> DataFrame:
    """Reported metrics from a state: count, sum, mean, min, max.
    Sums are left unrounded — summation order varies with partitioning,
    so callers comparing across engines apply their own tolerance."""
    return state.select(
        *keys,
        F.col("cnt").alias("count"),
        F.col("vsum").alias("sum"),
        (F.col("vsum") / F.col("cnt")).alias("mean"),
        F.col("vmin").alias("min"),
        F.col("vmax").alias("max"),
    )


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply a CDC changelog to a base snapshot: for every key, the
    HIGHEST-``seq_col`` change wins — ``I``/``U`` rows replace the base
    row, ``D`` deletes it; keys with no change pass through. This is
    the merge a lakehouse MERGE INTO runs, expressed as one window over
    the (small) changelog plus one full outer join against the base —
    the base never shuffles more than once and is never rescanned per
    change.

    ``changes`` carries the full row payload (same columns as ``base``)
    plus ``op_col`` in {'I','U','D'} and a monotonically increasing
    ``seq_col`` (commit timestamp / LSN). Ties on ``seq_col`` break
    toward delete, then by op descending — deterministic but a
    well-formed log should not produce them.
    """
    payload = [c for c in base.columns if c not in keys]
    w = Window.partitionBy(*keys).orderBy(
        F.desc(seq_col), F.desc(F.col(op_col) == "D"), F.desc(op_col)
    )
    last = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *keys,
            *[F.col(c).alias(f"_chg_{c}") for c in payload],
            F.col(op_col).alias("_op"),
        )
    )
    merged = base.join(last, keys, "full_outer")
    kept = merged.filter(F.col("_op").isNull() | (F.col("_op") != "D"))
    return kept.select(
        *keys,
        *[
            F.when(F.col("_op").isNotNull(), F.col(f"_chg_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload
        ],
    )


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a CDC
    changelog: one row per (key, version) with ``valid_from`` /
    ``valid_to`` sequence bounds and an ``is_current`` flag — the
    classic warehouse shape for as-of dimension joins, and the
    lineage-preserving complement to ``apply_changelog`` (which keeps
    only the latest state).

    ``changes`` carries the full row payload plus ``op_col`` in
    {'I','U','D'} and a monotonically increasing ``seq_col`` (commit
    timestamp / LSN). Each I/U row opens a version at its ``seq``;
    a version closes at the NEXT change's ``seq`` (half-open
    [valid_from, valid_to) intervals, the standard convention); a 'D'
    row closes the prior version without opening one, so deleted keys
    simply have no current row. ``is_current`` marks versions with
    ``valid_to`` NULL. Ties on ``seq_col`` break like
    ``apply_changelog`` (delete first, then op descending) so the two
    operators agree on the final state.

    Scale shape: ONE shuffle of the changelog on the key columns; both
    window passes (ordering + lead) share that single partitioning, and
    the payload is never joined or rescanned. An incremental refresh at
    lake scale runs this over base ∪ new-batch per affected key — keys
    without new changes need not be touched.
    """
    payload = [c for c in changes.columns if c not in keys + [op_col, seq_col]]
    order = [
        F.asc(seq_col), F.asc(F.col(op_col) == "D"), F.asc(op_col)
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    versioned = (
        changes.withColumn("_next_seq", F.lead(seq_col).over(w))
        .filter(F.col(op_col) != "D")
        .select(
            *keys,
            *payload,
            F.col(seq_col).alias("valid_from"),
            F.col("_next_seq").alias("valid_to"),
            F.col("_next_seq").isNull().alias("is_current"),
        )
    )
    return versioned


def scd2_asof_join(
    facts: DataFrame,
    history: DataFrame,
    keys: list[str],
    ts_col: str,
    how: str = "left",
) -> DataFrame:
    """Join facts to the dimension version that was valid AT the fact's
    time: each fact row picks the ``scd2_history`` row with
    ``valid_from <= ts < valid_to`` (current versions have NULL
    valid_to, i.e. an open upper bound) — the standard point-in-time
    dimension lookup. Facts before a key's first version (or inside a
    deleted gap) keep NULL dimension columns under ``how='left'``.

    Scale shape: ONE equi-join on the key columns with the interval
    predicate as a join-time filter — valid because versions of one key
    never overlap (they chain end-to-start by construction), so at most
    one history row survives per fact and the join never amplifies.
    Keys hold few versions each; a pathological hot key is a skew
    problem for the equi-join exactly like any other join (salt via
    operators/skew.py if needed).

    History columns whose names collide with fact columns come back
    suffixed ``_dim`` (the golden-record convention ``fuzzy_join`` also
    uses), so the output never holds duplicate column names.
    """
    taken = set(facts.columns)
    hist = history.select(
        *[F.col(k).alias(f"_h_{k}") for k in keys],
        *[
            F.col(c).alias(f"{c}_dim" if c in taken else c)
            for c in history.columns
            if c not in keys
        ],
    )
    vf = "valid_from_dim" if "valid_from" in taken else "valid_from"
    vt = "valid_to_dim" if "valid_to" in taken else "valid_to"
    cond = F.lit(True)
    for k in keys:
        cond = cond & (facts[k] == hist[f"_h_{k}"])
    cond = (
        cond
        & (hist[vf] <= facts[ts_col])
        & (hist[vt].isNull() | (facts[ts_col] < hist[vt]))
    )
    out = facts.join(hist, cond, how)
    return out.drop(*[f"_h_{k}" for k in keys])
