"""Composite joins (J1-J4) — Hama's map-side merge-join framework
re-expressed as Catalyst plans.

Reference: bsp/join/CompositeInputFormat.java:42-101 (expression
language ``inner(tbl(...), tbl(...))``), InnerJoinRecordReader.java:40-48
(n-ary inner), OuterJoinRecordReader.java:40-44 (n-ary full outer),
OverrideRecordReader.java:44-90 (per-key rightmost-source preference).

The reference needs sorted equal-partitioned inputs and a PriorityQueue
merge (bsp/join/CompositeRecordReader.java, ~1.6k LoC); Spark's
sort-merge/broadcast-hash join machinery subsumes all of it — Catalyst
picks SMJ vs BHJ per side size, AQE fixes skew at runtime. What we keep
is the n-ary semantics and the override COALESCE.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def composite_join(
    dfs: list[DataFrame],
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """N-ary equi-join of ``dfs`` on key column(s) ``on``.

    how='inner'  -> emit a tuple iff ALL sources have the key (J2).
    how='full_outer' -> emit every key with missing slots NULL (J3).
    Non-key columns keep their source order (leftmost first), matching
    TupleWritable's positional layout.
    """
    if how not in ("inner", "full_outer"):
        raise ValueError(f"composite_join supports inner/full_outer, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    return reduce(lambda a, b: a.join(b, on=keys, how=how), dfs)


def override_join(
    dfs: list[DataFrame],
    on: str | list[str],
) -> DataFrame:
    """Override join (J4): per key, prefer values from the RIGHTMOST
    source that has the key; no cross product
    (OverrideRecordReader.java:44-90).

    Implementation: full outer n-ary join + per-column COALESCE in
    right-to-left priority. This requires each source to contribute at
    most one row per key (the reference's reader also emits one value
    per key per source). For multi-row sources deduplicate first.

    Scale note: identical shuffle cost to a plain n-ary join — the
    coalesce is projection-only, no extra exchange.
    """
    keys = [on] if isinstance(on, str) else list(on)
    renamed = []
    value_cols: list[str] = []
    for i, df in enumerate(dfs):
        cols = [c for c in df.columns if c not in keys]
        renamed.append(
            df.select(*keys, *[F.col(c).alias(f"__s{i}__{c}") for c in cols])
        )
        for c in cols:
            if c not in value_cols:
                value_cols.append(c)
    joined = reduce(lambda a, b: a.join(b, on=keys, how="full_outer"), renamed)
    out_cols = list(keys)
    for c in value_cols:
        # rightmost source wins
        slots = [
            F.col(f"__s{i}__{c}")
            for i in range(len(dfs) - 1, -1, -1)
            if f"__s{i}__{c}" in joined.columns
        ]
        out_cols.append(F.coalesce(*slots).alias(c) if len(slots) > 1 else slots[0].alias(c))
    return joined.select(*out_cols)
