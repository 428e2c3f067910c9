"""Z-order (Morton-curve) file clustering for multi-column scan
locality — the lakehouse layout technique (Delta/Iceberg ``OPTIMIZE
ZORDER BY``) re-expressed as plain Spark expressions over a parquet
sink. Beyond the reference surface (north-star extension).

Why it matters at 100 TB: a table range-partitioned and sorted on
``(a, b)`` prunes beautifully on ``a`` but not at all on ``b`` — a
predicate on ``b`` alone touches EVERY file. Interleaving the bits of
per-column bucket ranks puts rows close in ALL clustered dimensions
into the same files, so parquet min/max row-group stats (and file
pruning) work for every clustered column at once.

Mechanics, all JVM-side expressions — no UDF, no driver collect:

1. one aggregation pass computes each column's (min, max), attached
   via a single-row broadcast;
2. each value maps to a ``2^bits``-way rank with ``width_bucket``;
3. ranks interleave bit-by-bit into the Morton key (shift/or chains —
   ``bits * n_cols`` terms of whole-stage-codegen-friendly integer
   ops);
4. the sink range-partitions and sorts by the key, so each output
   file covers one compact Morton range.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ZKEY = "_zkey"


def _bucket(col: Column, lo: Column, hi: Column, n: int) -> Column:
    """Rank ``col`` into [0, n) between its (lo, hi) stats; degenerate
    constant columns land in bucket 0."""
    return F.when(
        hi > lo,
        F.least(
            F.lit(n - 1),
            F.greatest(
                F.lit(0),
                F.width_bucket(
                    col.cast("double"), lo.cast("double"), hi.cast("double"), F.lit(n)
                )
                - 1,
            ),
        ),
    ).otherwise(F.lit(0)).cast("long")


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8, key_col: str = _ZKEY
) -> DataFrame:
    """Append the Morton key column interleaving ``bits`` bucket-rank
    bits per clustered column (supports 2+ columns; ``bits * len(cols)``
    must fit in 63 bits)."""
    from pyspark.sql.types import DateType, NumericType, TimestampType

    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns (sort handles 1)")
    if bits * len(cols) > 63:
        raise ValueError("bits * n_cols must fit in a long")

    # width_bucket needs a numeric axis; dates/timestamps rank on their
    # epoch value. Anything else would throw CAST_INVALID_INPUT at
    # RUNTIME under ANSI mode — fail fast with the column name instead
    # (rank a string column through a numeric surrogate, e.g. a
    # leading-prefix integer, before z-ordering on it).
    types = {f.name: f.dataType for f in df.schema.fields}
    axes = []
    for c in cols:
        dt = types.get(c)
        if isinstance(dt, NumericType):
            axes.append(F.col(c))
        elif isinstance(dt, TimestampType):
            axes.append(F.unix_micros(F.col(c)))
        elif isinstance(dt, DateType):
            axes.append(F.datediff(F.col(c), F.lit("1970-01-01")))
        else:
            raise ValueError(
                f"z-order column {c!r} has non-orderable-numeric type "
                f"{dt}; provide a numeric surrogate column"
            )

    stats = df.agg(
        *[F.min(a).alias(f"_lo_{i}") for i, a in enumerate(axes)],
        *[F.max(a).alias(f"_hi_{i}") for i, a in enumerate(axes)],
    )
    out = df.crossJoin(F.broadcast(stats))
    ranks = [
        _bucket(a, F.col(f"_lo_{i}"), F.col(f"_hi_{i}"), 1 << bits)
        for i, a in enumerate(axes)
    ]
    terms = [
        F.shiftleft(
            F.shiftright(rank, b).bitwiseAND(F.lit(1)), b * len(cols) + i
        )
        for i, rank in enumerate(ranks)
        for b in range(bits)
    ]
    zkey = reduce(lambda a, t: a.bitwiseOR(t), terms, F.lit(0).cast("long"))
    drop = [f"_lo_{i}" for i in range(len(cols))] + [
        f"_hi_{i}" for i in range(len(cols))
    ]
    return out.withColumn(key_col, zkey).drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Morton curve of ``cols``: range-
    partition into ``n_files`` compact key spans, sort within each, and
    drop the key before writing. Parquet min/max stats on every
    clustered column then prune files for predicates on ANY of them —
    not just the leading sort column."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, F.col(_ZKEY))
        .sortWithinPartitions(_ZKEY)
        .drop(_ZKEY)
        .write.mode(mode)
        .parquet(path)
    )
