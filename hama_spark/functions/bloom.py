"""Distributed (optionally sharded) Bloom filter over a DataFrame column.

The reference has no sketch layer (its decontamination analogue is the
exact composite join, ``bsp/join/InnerJoinRecordReader.java:40``); this
module exists for the 100 TB regime the engine targets: membership
pruning against a key set that is too large to broadcast as an exact
hash set (cross-corpus decontamination, seen-sets from earlier crawl
snapshots, URL visited-lists). A Bloom filter compresses *n* keys into
a fixed ``m``-bit array with no false negatives and a tunable false
positive rate, so the big side can be pruned map-side and only the
surviving sliver pays an exact confirm join.

Design (all JVM expressions, no Python in the hot path):

- **Build** is one shuffle: each key routes to a shard
  (``xxhash64 % n_shards``) and explodes into its ``k`` bit positions
  (Kirsch-Mitzenmacher double hashing over ``xxhash64``, so 2 hashes
  per key regardless of ``k``), positions group by (shard, 64-bit word
  index) with a ``bit_or`` partial aggregate (map-side combined), and
  the sparse words assemble into one dense ``array<long>`` row PER
  SHARD — a complete shard skeleton, so even empty shards have a row.
  No bitmap ever exists per-executor during the build; only
  (shard, word_idx, word) pairs shuffle, ≤ n_shards·m/64 rows total.
- **Probe** is map-side only: the n_shards-row filter broadcast
  HASH-joins onto the probe side on the shard key and membership is an
  unrolled AND chain of the ``k`` bit tests against a literal mask
  table — no variable-shift dependence, no UDF, whole-stage-codegen
  friendly (see :func:`bloom_maybe_contains` for why it is unrolled
  rather than a ``forall``).
- **Merge** is ``zip_with(bit_or)`` per shard — filters built with the
  same (num_bits, num_hashes, seed, n_shards) quadruple over disjoint
  inputs combine into exactly the filter of the union, so
  per-partition / per-day filters can be built independently and OR-ed.

Sharding is the capacity dial: each shard is an independent
``num_bits``-bit filter over its slice of the key space, so total
capacity scales as n_shards·num_bits with no single row or broadcast
block ever exceeding ``num_bits/8`` bytes. The default ``n_shards=1``
is a plain Bloom filter.

All arithmetic is ANSI-overflow-safe: hashes reduce mod ``num_bits``
before the double-hash combination, so intermediate products stay far
below 2^63 (num_bits is capped at 2^31 per shard, k at 64).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "optimal_bloom_params",
    "bloom_build",
    "bloom_maybe_contains",
    "bloom_probe",
    "bloom_merge",
]

# Each shard's bitmap is a single dense array<long> row, so the honest
# per-shard ceiling is what one row/broadcast block comfortably holds:
# 2^31 bits = 256 MiB bitmap = 33.5M array elements. At fpp=0.01 that is
# ~223M distinct keys PER SHARD — raise n_shards for bigger key sets.
_MAX_BITS = 1 << 31
_MAX_HASHES = 64
_MAX_SHARDS = 1 << 20


def _masks() -> Column:
    """Literal mask table: MASKS[b] has only bit b set (bit 63 is the
    sign bit, hence the negative literal). Bit tests index this table
    instead of shifting by a column (PySpark's shiftleft/shiftright
    take only Python-int shift amounts). Built lazily — Column
    construction needs an active session, so no module-level
    literal."""
    return F.array(
        *[F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long") for b in range(64)]
    )


def optimal_bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Standard sizing: m = -n·ln(p)/ln(2)^2 bits (rounded up to a
    64-bit word), k = (m/n)·ln(2) hashes. Returns (num_bits,
    num_hashes). ``expected_items`` is per shard when sharding."""
    if expected_items <= 0:
        return 64, 1
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = int(math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    m = min(max(64, (m + 63) // 64 * 64), _MAX_BITS)
    k = max(1, min(_MAX_HASHES, round(m / expected_items * math.log(2))))
    return m, int(k)


def _shard(col: Column, seed: int, n_shards: int) -> Column:
    """Key → shard id in [0, n_shards). Uses a hash stream disjoint
    from the two position streams (seed+2)."""
    return F.pmod(F.xxhash64(col, F.lit(int(seed) + 2)), F.lit(int(n_shards))).cast(
        "int"
    )


def _positions(col: Column, num_bits: int, num_hashes: int, seed: int) -> list[Column]:
    """The key's ``num_hashes`` bit positions in [0, num_bits), as a
    plain expression list. Kirsch-Mitzenmacher: pos_i = (h1 + i·h2')
    mod m with h1, h2 independent xxhash64 streams; h2' is forced odd
    so a zero step cannot collapse all k positions onto one bit. Both
    operands reduce mod m FIRST: i·h2' then stays ≤ 64·(2m+1) « 2^63,
    so the expression is safe under ANSI overflow checking."""
    m = F.lit(int(num_bits))
    h1 = F.pmod(F.xxhash64(col, F.lit(int(seed))), m)
    h2 = F.pmod(F.xxhash64(col, F.lit(int(seed) + 1)), m) * F.lit(2) + F.lit(1)
    return [
        F.pmod(h1 + F.lit(i).cast("long") * h2, m) for i in range(int(num_hashes))
    ]


def bloom_build(
    df: DataFrame,
    col: str | Column,
    num_bits: int | None = None,
    num_hashes: int | None = None,
    expected_items: int | None = None,
    fpp: float = 0.01,
    seed: int = 42,
    n_shards: int | None = None,
) -> DataFrame:
    """Build a Bloom filter over (the distinct values of) ``col``.

    Returns an ``n_shards``-ROW DataFrame ``(shard int, num_bits long,
    num_hashes int, seed int, n_shards int, bitmap array<long>)`` —
    self-describing (:func:`bloom_probe` needs no out-of-band
    parameters), complete (every shard has a row, all-zero bitmap when
    no key routed to it), and ``n_shards · num_bits/8`` bytes total.

    Sizing: pass ``num_bits``/``num_hashes`` directly, or
    ``expected_items`` + ``fpp`` to derive them (``expected_items`` is
    the TOTAL key count; the per-shard filter is sized for its
    1/n_shards slice), or neither — then the build runs one extra
    ``count_distinct`` job over ``col`` to size itself (fine for a
    benchmark/seen-set side; pass explicit sizes on a side you don't
    want scanned twice). When ``n_shards`` is left None, auto-sizing
    also raises the shard count whenever the key set needs more than
    one shard's 2^31-bit ceiling — any ``expected_items``/``fpp``
    combination builds without manual capacity math.

    Scale shape: explode keys → k position rows (k small, map-side),
    hash-shuffle on (shard, word index) with bit_or partially
    aggregated map-side, ≤ n_shards·m/64 result rows, one dense row per
    shard. Duplicate input values cost shuffle volume but do not change
    the result — ``.distinct()`` the input first if it is
    duplicate-heavy.

    NULL keys: ``xxhash64`` skips null arguments, so every NULL
    collapses onto one seed-derived synthetic key — a NULL in the build
    side makes every NULL probe a member. Filter NULLs out first if
    that is not the intended semantics.
    """
    c = F.col(col) if isinstance(col, str) else col
    auto_shards = n_shards is None
    n_shards = 1 if n_shards is None else int(n_shards)
    if not (1 <= n_shards <= _MAX_SHARDS):
        raise ValueError(f"n_shards must be in [1, 2^20], got {n_shards}")
    if num_bits is None or num_hashes is None:
        if expected_items is None:
            expected_items = df.select(
                F.count_distinct(c).alias("n")
            ).collect()[0]["n"]
        expected_items = int(expected_items)
        if auto_shards and expected_items > 0 and 0.0 < fpp < 1.0:
            # unclamped total size; shard until each slice fits the
            # per-shard ceiling
            m_total = -expected_items * math.log(fpp) / (math.log(2) ** 2)
            n_shards = min(_MAX_SHARDS, max(1, math.ceil(m_total / _MAX_BITS)))
        per_shard = (expected_items + n_shards - 1) // n_shards
        if num_bits is None:
            num_bits, _ = optimal_bloom_params(per_shard, fpp)
        if num_hashes is None:
            # derive k from the num_bits ACTUALLY in use (the caller's,
            # when given) — k = (m/n)·ln 2. Tuning k against an
            # auto-sized m the filter doesn't use silently degrades fpp.
            if per_shard > 0:
                num_hashes = max(
                    1,
                    min(_MAX_HASHES, round(int(num_bits) / per_shard * math.log(2))),
                )
            else:
                num_hashes = 1
    num_bits = int(num_bits)
    num_hashes = int(num_hashes)
    if not (64 <= num_bits <= _MAX_BITS) or num_bits % 64:
        raise ValueError(
            f"num_bits must be a multiple of 64 in [64, 2^31], got {num_bits}"
            " — raise n_shards instead of the per-shard size"
        )
    if not (1 <= num_hashes <= _MAX_HASHES):
        raise ValueError(f"num_hashes must be in [1, {_MAX_HASHES}], got {num_hashes}")
    n_words = num_bits // 64

    pos_arr = F.array(*_positions(c, num_bits, num_hashes, seed))
    pos = df.select(
        _shard(c, seed, n_shards).alias("shard"), F.explode(pos_arr).alias("p")
    )
    sparse = (
        pos.select(
            "shard",
            F.floor(F.col("p") / F.lit(64)).cast("long").alias("widx"),
            F.element_at(
                _masks(), F.pmod(F.col("p"), F.lit(64)).cast("int") + F.lit(1)
            ).alias("wbit"),
        )
        .groupBy("shard", "widx")
        .agg(F.bit_or("wbit").alias("word"))
    )
    # Dense assembly: join the sparse words onto a complete
    # (shard, word-index) skeleton (empty slots → 0, so empty shards
    # still get a full zeroed row), then per shard sort the words by
    # index and strip the index. O(n_words log n_words) per shard —
    # NOT a map built per shard and probed per word: Spark map lookup
    # is a linear scan, which made the first version of this assembly
    # O(n_words · populated_words) — measured ~60 s for a 6M-bit
    # filter where this shape takes ~2 s.
    spark = df.sparkSession
    word_skeleton = spark.range(n_shards * n_words).select(
        (F.col("id") / F.lit(n_words)).cast("int").alias("shard"),
        F.pmod(F.col("id"), F.lit(n_words)).cast("long").alias("widx"),
    )
    dense_words = word_skeleton.join(sparse, ["shard", "widx"], "left").select(
        "shard", "widx", F.coalesce(F.col("word"), F.lit(0).cast("long")).alias("word")
    )
    dense = dense_words.groupBy("shard").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("widx", "word"))),
            lambda s: s["word"],
        ).alias("bitmap")
    ).select(
        "shard",
        F.lit(num_bits).cast("long").alias("num_bits"),
        F.lit(num_hashes).cast("int").alias("num_hashes"),
        F.lit(seed).cast("int").alias("seed"),
        F.lit(n_shards).cast("int").alias("n_shards"),
        "bitmap",
    )
    return dense


def bloom_maybe_contains(
    col: Column,
    bitmap: Column,
    num_bits: int,
    num_hashes: int,
    seed: int = 42,
) -> Column:
    """Boolean membership test against a bitmap column already on the
    row — the bitmap must be the key's OWN shard (see
    :func:`bloom_probe`, which routes it). True = maybe present
    (false-positive rate per the filter's sizing); False = DEFINITELY
    absent. A NULL bitmap reads as all-zero (absent).

    The ``num_hashes`` bit tests are UNROLLED into a plain AND chain of
    scalar expressions rather than a ``forall`` over a positions array:
    a higher-order-function membership predicate under a filter above
    the filter-row join trips a Catalyst constraint-propagation bug
    (the HOF condition gets pushed below the join as an unresolvable
    ``!Filter`` referencing the probe column — observed on Spark 4.1),
    and the unrolled form is also friendlier to whole-stage codegen.
    k is small (≤ 64, typically ≤ 20), so the expression stays
    compact."""
    masks = _masks()
    test = F.lit(True)
    for p in _positions(col, int(num_bits), int(num_hashes), int(seed)):
        word = F.coalesce(
            F.try_element_at(bitmap, (F.floor(p / F.lit(64)) + F.lit(1)).cast("int")),
            F.lit(0).cast("long"),
        )
        bit = F.element_at(masks, F.pmod(p, F.lit(64)).cast("int") + F.lit(1))
        test = test & (word.bitwiseAND(bit) != F.lit(0).cast("long"))
    return test


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    col: str | Column,
    result_col: str = "maybe_member",
) -> DataFrame:
    """Add ``result_col`` (boolean) to ``df``: True iff ``col`` is
    possibly in the filter. The n_shards-row filter is broadcast and
    HASH-joined on the key's shard id; membership is then a map-side
    expression — the big side never shuffles.

    The filter is (lazily) localCheckpointed and its scalar parameters
    collected up front: the checkpoint cuts lineage (build and probe
    sides routinely derive from the SAME upstream frame, and a
    shared-lineage join trips Catalyst's self-join dedup), guarantees
    the build runs ONCE however many probes reuse it, and the
    Python-int parameters let the membership test unroll into plain
    scalar expressions (see :func:`bloom_maybe_contains` for why). The
    bitmaps themselves never leave the JVM — only (num_bits,
    num_hashes, seed, n_shards) cross the driver."""
    c = F.col(col) if isinstance(col, str) else col
    b = bloom.select(
        F.col("shard").alias("_bf_shard"),
        F.col("bitmap").alias("_bf_bitmap"),
        F.col("num_bits").alias("_bf_bits"),
        F.col("num_hashes").alias("_bf_hashes"),
        F.col("seed").alias("_bf_seed"),
        F.col("n_shards").alias("_bf_nshards"),
    ).localCheckpoint(eager=False)
    params = (
        b.select("_bf_bits", "_bf_hashes", "_bf_seed", "_bf_nshards")
        .distinct()
        .collect()
    )
    if len(params) != 1:
        raise ValueError(
            f"bloom_probe: filter rows disagree on parameters: {params}"
        )
    bits, hashes, seed, n_shards = (int(v) for v in params[0])
    joined = df.withColumn("_bf_key_shard", _shard(c, seed, n_shards)).join(
        F.broadcast(b.select("_bf_shard", "_bf_bitmap")),
        F.col("_bf_key_shard") == F.col("_bf_shard"),
        "left",
    )
    out = joined.withColumn(
        result_col,
        bloom_maybe_contains(
            c, F.col("_bf_bitmap"), num_bits=bits, num_hashes=hashes, seed=seed
        ),
    )
    return out.drop("_bf_key_shard", "_bf_shard", "_bf_bitmap")


def _merge_side_params(df: DataFrame, label: str) -> tuple[int, int, int, int]:
    """Collect and validate one merge input: exactly one parameter
    tuple, a complete shard skeleton (n_shards rows, all distinct).
    Returns (num_bits, num_hashes, seed, n_shards)."""
    row = df.agg(
        F.count("*").alias("rows"),
        F.count_distinct("shard").alias("shards"),
        F.min("shard").alias("shard_min"),
        F.max("shard").alias("shard_max"),
        F.count_distinct("num_bits", "num_hashes", "seed", "n_shards").alias("tuples"),
        F.min("num_bits").alias("bits"),
        F.min("num_hashes").alias("hashes"),
        F.min("seed").alias("seed"),
        F.min("n_shards").alias("n_shards"),
    ).collect()[0]
    if row["rows"] == 0:
        raise ValueError(f"bloom_merge: {label} input has no rows")
    if row["tuples"] != 1:
        raise ValueError(
            f"bloom_merge: {label} input rows disagree on "
            "(num_bits, num_hashes, seed, n_shards)"
        )
    n_shards = int(row["n_shards"])
    # n distinct integer ids with min 0 and max n-1 is exactly
    # {0..n_shards-1} (pigeonhole) — cardinality alone would accept a
    # RE-KEYED skeleton (e.g. shards {4..7} with n_shards=4), whose
    # inner join against a {0..3} side silently drops every shard
    if (
        row["rows"] != n_shards
        or row["shards"] != n_shards
        or int(row["shard_min"]) != 0
        or int(row["shard_max"]) != n_shards - 1
    ):
        raise ValueError(
            f"bloom_merge: {label} input declares n_shards={n_shards} but has "
            f"{row['rows']} rows ({row['shards']} distinct shards in "
            f"[{row['shard_min']}, {row['shard_max']}]) — an incomplete or "
            "re-keyed shard skeleton would merge into silent false "
            "negatives; merge only complete bloom_build/bloom_merge outputs"
        )
    return (int(row["bits"]), int(row["hashes"]), int(row["seed"]), n_shards)


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two filters built with identical (num_bits, num_hashes, seed,
    n_shards) into the filter of the union of their key sets.

    Validation is EAGER and driver-side (one one-row agg job per input,
    like :func:`bloom_probe`'s parameter collect): parameter mismatch
    and incomplete shard skeletons raise here in Python, not via a
    ``raise_error`` expression a downstream projection could prune
    away — a mismatched or shard-dropping OR is silently wrong (false
    negatives), never just lossy, so it must be impossible to execute.
    Both inputs are lazily localCheckpointed first, so the validation
    job materializes each build once and the merge reuses the blocks."""
    a = a.localCheckpoint(eager=False)
    b = b.localCheckpoint(eager=False)
    pa = _merge_side_params(a, "left")
    pb = _merge_side_params(b, "right")
    if pa != pb:
        raise ValueError(
            "bloom_merge: parameter mismatch (num_bits, num_hashes, seed, "
            f"n_shards): {pa} vs {pb}"
        )
    # inner join is now safe: both sides proved a complete, identical
    # (0..n_shards-1) shard skeleton above
    right = b.select("shard", F.col("bitmap").alias("_rm"))
    return a.join(F.broadcast(right), "shard").select(
        "shard",
        "num_bits",
        "num_hashes",
        "seed",
        "n_shards",
        F.zip_with("bitmap", "_rm", lambda x, y: x.bitwiseOR(y)).alias("bitmap"),
    )
