"""Data-quality expectations (a Deequ-lite): declare constraints on a
table, verify them all in ONE aggregation pass, get back one row per
constraint with the measured metric and a pass flag.

The pipeline guardrail for 100 TB ingestion: every metric is an
aggregate expression (count/min/max/sum of predicates), so the whole
rule set costs a single scan with map-side partial aggregation —
no per-rule jobs, no driver-side row data. ``unique`` uses exact
count-distinct here (oracle-checkable); swap ``approx_count_distinct``
at full scale for one-pass HLL behavior, same plan shape.

Rule forms (tuples):
    ("not_null", col)              - fraction of non-null values == 1
    ("unique", col)                - distinct count == row count
    ("min", col, bound)            - min(col) >= bound
    ("max", col, bound)            - max(col) <= bound
    ("in_set", col, [v1, v2, ...]) - fraction of values in set == 1
    ("nonempty",)                  - row count > 0
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _round6(v: float) -> float:
    """Half-away-from-zero at 6 dp — what SQL round()/F.round do.
    Python's built-in round() is banker's rounding and would disagree
    with the DuckDB oracle on exact .5 boundaries."""
    return float(Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def check_expectations(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Evaluate ``rules`` against ``df`` in one aggregation. Returns
    (rule, column, metric, passed) — one row per rule, metric rounded
    to 6 dp, ordered by rule then column for determinism."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    specs = []  # (rule_name, column, metric_alias, pass_fn(row))
    for i, rule in enumerate(rules):
        kind = rule[0]
        alias = f"_m{i}"
        if kind == "not_null":
            col = rule[1]
            aggs.append(
                (F.count(col) / F.count(F.lit(1))).alias(alias)
            )
            specs.append((kind, col, alias, lambda m, n: m == 1.0))
        elif kind == "unique":
            col = rule[1]
            aggs.append(F.countDistinct(col).cast("double").alias(alias))
            specs.append((kind, col, alias, lambda m, n: m == float(n)))
        elif kind == "min":
            col, bound = rule[1], rule[2]
            aggs.append(F.min(col).cast("double").alias(alias))
            specs.append((kind, col, alias, lambda m, n, b=bound: m is not None and m >= b))
        elif kind == "max":
            col, bound = rule[1], rule[2]
            aggs.append(F.max(col).cast("double").alias(alias))
            specs.append((kind, col, alias, lambda m, n, b=bound: m is not None and m <= b))
        elif kind == "in_set":
            col, values = rule[1], rule[2]
            aggs.append(
                (
                    F.sum(F.when(F.col(col).isin(*values), 1).otherwise(0))
                    / F.count(F.lit(1))
                ).alias(alias)
            )
            specs.append((kind, col, alias, lambda m, n: m == 1.0))
        elif kind == "nonempty":
            aggs.append(F.count(F.lit(1)).cast("double").alias(alias))
            specs.append((kind, "*", alias, lambda m, n: m > 0))
        else:
            raise ValueError(f"unknown rule kind {kind!r}")

    row = df.agg(*aggs).collect()[0]
    n = row["_n"]
    out = [
        (
            kind,
            col,
            _round6(float(row[alias])) if row[alias] is not None else None,
            bool(ok(row[alias], n)),
        )
        for kind, col, alias, ok in specs
    ]
    out.sort(key=lambda r: (r[0], r[1]))
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "rule string, column string, metric double, passed boolean"
    )


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass per-column profile — the look-before-you-leap report a
    pipeline runs on a new source before writing rules for it:
    (column, n_rows, n_nulls, null_frac, approx_distinct, min, max,
    mean, stddev). mean/stddev are NULL for non-numeric columns;
    min/max are stringified so one schema fits every column type.

    Scale shape: ONE aggregation over one scan (8 map-side-combined
    aggregates per profiled column), then a JVM-side ``stack`` unpivot
    of the single result row — no driver collect, no per-column jobs,
    distinct counts via HLL++ (approx_count_distinct), so the profile
    is safe to run on the full table at any size.
    """
    from pyspark.sql.types import NumericType

    cols = cols or df.columns
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    aggs, null_d = [], F.lit(None).cast("double")
    for c in cols:
        v = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(v.isNull().cast("long")).alias(f"{c}__nulls"),
            F.approx_count_distinct(c).alias(f"{c}__dist"),
            F.min(v).cast("string").alias(f"{c}__min"),
            F.max(v).cast("string").alias(f"{c}__max"),
            (F.avg(v) if c in numeric else null_d).alias(f"{c}__mean"),
            (F.stddev_pop(v) if c in numeric else null_d).alias(f"{c}__std"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__rows`, `{c}__nulls`, `{c}__dist`, "
        f"`{c}__min`, `{c}__max`, `{c}__mean`, `{c}__std`"
        for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_rows, n_nulls, approx_distinct, min, max, mean, stddev)"
        )
    ).select(
        "column",
        "n_rows",
        "n_nulls",
        F.round(F.col("n_nulls") / F.col("n_rows"), 6).alias("null_frac"),
        "approx_distinct",
        "min",
        "max",
        F.round("mean", 6).alias("mean"),
        F.round("stddev", 6).alias("stddev"),
    )


def distribution_drift(
    old: DataFrame,
    new: DataFrame,
    col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Population-stability report for a numeric column between two
    corpus versions (snapshots, ingestion runs, before/after a filter):
    equi-width buckets spanning the COMBINED min/max, each with both
    sides' share and its PSI term; total PSI rides every row. The
    standard reading: PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25
    population shift.

    Returns (bucket, lo, hi, old_frac, new_frac, psi_term, psi_total)
    — ``bucket`` 0 holds NULLs (their share shift is drift too), 1..n
    the value range. Shares are Laplace-smoothed by half a count per
    bucket so an empty bucket on one side yields a finite term.

    Scale shape: one O(1) min/max aggregate over each side (collected
    as plan literals), then ONE map-side-combined bucket count per side
    and a ``2·(n_buckets+1)``-row join — nothing wider than the bucket
    table ever shuffles, and neither corpus is scanned more than twice
    (once for bounds, once for counts); at petabyte scale feed
    pre-computed bounds by passing already-filtered frames.
    """
    c = F.col(col).cast("double")
    bounds = (
        old.select(c.alias("v"))
        .unionByName(new.select(c.alias("v")))
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()[0]
    )
    lo = float(bounds["lo"]) if bounds["lo"] is not None else 0.0
    hi = float(bounds["hi"]) if bounds["hi"] is not None else 0.0
    width = (hi - lo) / n_buckets if hi > lo else 1.0

    def bucketed(df: DataFrame, side: str) -> DataFrame:
        b = F.when(c.isNull(), F.lit(0)).otherwise(
            F.least(
                F.floor((c - F.lit(lo)) / F.lit(width)).cast("int") + 1,
                F.lit(n_buckets),
            )
        )
        return df.select(b.alias("bucket")).groupBy("bucket").agg(
            F.count(F.lit(1)).alias(f"n_{side}")
        )

    grid = old.sparkSession.range(0, n_buckets + 1).select(
        F.col("id").cast("int").alias("bucket")
    )
    counts = (
        grid.join(bucketed(old, "old"), "bucket", "left")
        .join(bucketed(new, "new"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )
    tot = counts.agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    ).collect()[0]
    t_old, t_new = max(int(tot["t_old"]), 1), max(int(tot["t_new"]), 1)
    k = n_buckets + 1
    old_frac = (F.col("n_old") + F.lit(0.5)) / F.lit(float(t_old + 0.5 * k))
    new_frac = (F.col("n_new") + F.lit(0.5)) / F.lit(float(t_new + 0.5 * k))
    terms = counts.select(
        "bucket",
        F.round(
            F.when(F.col("bucket") == 0, F.lit(None).cast("double")).otherwise(
                F.lit(lo) + (F.col("bucket") - 1) * F.lit(width)
            ),
            9,
        ).alias("lo"),
        F.round(
            F.when(F.col("bucket") == 0, F.lit(None).cast("double")).otherwise(
                F.lit(lo) + F.col("bucket") * F.lit(width)
            ),
            9,
        ).alias("hi"),
        F.round(old_frac, 9).alias("old_frac"),
        F.round(new_frac, 9).alias("new_frac"),
        F.round((new_frac - old_frac) * F.log(new_frac / old_frac), 9).alias(
            "psi_term"
        ),
    ).localCheckpoint(eager=True)
    total = terms.agg(F.round(F.sum("psi_term"), 9).alias("t")).collect()[0]["t"]
    return terms.withColumn("psi_total", F.lit(float(total)))


def corr_matrix(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns, long form:
    (col_x, col_y, corr, n) with col_x < col_y lexicographically — the
    feature-redundancy / leakage screen a pipeline runs before training
    (two features correlating at 0.999 are one feature; a feature
    correlating with the label suspiciously well is a leak).

    Scale shape: ONE aggregation over one scan — k(k-1)/2 ``corr``
    aggregates plus one count, all map-side combined (each corr keeps
    constant running state: n, Σx, Σy, Σxy, Σx², Σy²), then a JVM-side
    ``stack`` unpivot of the single result row. No driver collect, no
    per-pair jobs. Width guard: k columns is k(k-1)/2 aggregate
    expressions — fine for profiling widths (k ≤ ~60, 1770 aggregates);
    refuse beyond that rather than build a megabyte codegen stage.

    ``corr`` is NULL when either column is constant over the pair's
    co-non-null rows (zero variance) — surfaced, not dropped. NULLs use
    pairwise deletion (rows where either side is NULL are ignored for
    that pair), matching ANSI ``corr``. Built from component aggregates
    (covar_pop + pairwise-masked stddev_pop, Welford-stable in the JVM)
    with the division at projection time: Spark's own ``corr`` raises
    DIVIDE_BY_ZERO on a constant column under ANSI mode instead of
    returning NULL.
    """
    from pyspark.sql.types import NumericType

    if cols is None:
        cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
        ]
    if len(cols) < 2:
        raise ValueError(f"corr_matrix needs >= 2 numeric columns, got {cols}")
    if len(cols) > 60:
        raise ValueError(
            f"corr_matrix: {len(cols)} columns -> {len(cols)*(len(cols)-1)//2} "
            "pairs; pass an explicit cols subset (<= 60)"
        )
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    aggs = []
    for i, (a, b) in enumerate(pairs):
        x, y = F.col(a).cast("double"), F.col(b).cast("double")
        both = x.isNotNull() & y.isNotNull()
        aggs += [
            F.covar_pop(x, y).alias(f"__c{i}"),
            F.stddev_pop(F.when(both, x)).alias(f"__sx{i}"),
            F.stddev_pop(F.when(both, y)).alias(f"__sy{i}"),
            F.count(F.when(both, F.lit(1))).alias(f"__n{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', CASE WHEN __sx{i} > 0 AND __sy{i} > 0 "
        f"THEN round(__c{i} / (__sx{i} * __sy{i}), 9) END, __n{i}"
        for i, (a, b) in enumerate(pairs)
    )
    return one.select(
        F.expr(f"stack({len(pairs)}, {stack_args}) AS (col_x, col_y, corr, n)")
    ).select(
        F.least("col_x", "col_y").alias("col_x"),
        F.greatest("col_x", "col_y").alias("col_y"),
        "corr",
        "n",
    )


def schema_diff(df: DataFrame, expected_ddl: str) -> list[dict]:
    """Schema contract check: compare ``df`` against an expected DDL
    string ("a INT, b STRING, …"). Returns a list of drift records
    {column, status, expected_type, actual_type} with status one of
    'missing' (in contract, not in df), 'added' (in df, not in
    contract), 'type_changed'. Empty list = conforming. Pure driver
    metadata — no job runs; pair with ``check_expectations`` for
    value-level rules and ``distribution_drift`` for distribution
    shift."""
    from pyspark.sql.types import StructType

    expected = StructType.fromDDL(expected_ddl)
    exp = {f.name: f.dataType.simpleString() for f in expected.fields}
    act = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out: list[dict] = []
    for name, t in exp.items():
        if name not in act:
            out.append(
                {"column": name, "status": "missing", "expected_type": t, "actual_type": None}
            )
        elif act[name] != t:
            out.append(
                {
                    "column": name,
                    "status": "type_changed",
                    "expected_type": t,
                    "actual_type": act[name],
                }
            )
    for name, t in act.items():
        if name not in exp:
            out.append(
                {"column": name, "status": "added", "expected_type": None, "actual_type": t}
            )
    return out


def assert_schema(df: DataFrame, expected_ddl: str, allow_added: bool = False) -> None:
    """Raise ValueError (listing every drift) unless ``df`` conforms to
    the DDL contract. ``allow_added`` tolerates extra columns —
    forward-compatible readers."""
    drift = schema_diff(df, expected_ddl)
    if allow_added:
        drift = [d for d in drift if d["status"] != "added"]
    if drift:
        lines = "; ".join(
            f"{d['column']}: {d['status']}"
            + (
                f" (expected {d['expected_type']}, got {d['actual_type']})"
                if d["status"] == "type_changed"
                else ""
            )
            for d in drift
        )
        raise ValueError(f"schema drift: {lines}")
