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

The salt is a hash of the whole row (xxhash64), not a random draw, so
results are reproducible under retries and partition changes (SURVEY §7:
seeded streams, never per-executor RNG).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


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
    too big to broadcast but far smaller than the fact side)."""
    keys = [on] if isinstance(on, str) else list(on)
    lsalted = large.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salts)).cast("int"),
    )
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
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast("int")
    partial = (
        df.withColumn(_SALT, salt)
        .groupBy(*kl, _SALT)
        .agg(*[c.alias(f"_p_{name}") for name, (c, _) in aggs.items()])
    )
    return partial.groupBy(*kl).agg(
        *[
            _COMBINERS[comb](F.col(f"_p_{name}")).alias(name)
            for name, (_, comb) in aggs.items()
        ]
    )
