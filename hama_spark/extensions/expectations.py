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
