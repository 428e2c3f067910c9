"""Online CF (M3) — matrix-factorization recommender.

Reference: ml/src/main/java/org/apache/hama/ml/recommendation/cf/
OnlineTrainBSP.java:50-250, OnlineCF.java:172-421 (train /
estimatePreference / getMostPreferredItems), update rule
function/MeanAbsError.java (HAMA-612):

    R    = α_a · β_b
    α_a += 2τ (r − R) β_b
    β_b += 2τ (r − R) α_a

The reference applies the rule per-preference sequentially within each
peer. The distributed batch reformulation accumulates the same gradient
over ALL preferences per iteration (full-batch instead of online —
identical fixpoint family, deterministic, shuffle-parallel). Factors
are arrays in DataFrames; the per-dimension gradient is an explode →
groupBy(id, dim) sum → regroup, so a user/item with millions of ratings
never needs its ratings collected into one row (no skew blowup).

Deterministic init: factor j of id x is a hash-derived uniform in
[-0.05, 0.05) — reproducible across runs/partitionings (SURVEY §7:
seeded streams keyed by row, never per-executor RNG).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash_factors(id_col, rank: int, seed: int, scale: float):
    """array<double> of `rank` deterministic pseudo-random values in
    [-scale, scale), keyed by (seed, id, dim). md5-derived so the DuckDB
    oracle replays the identical stream:
    (('0x'||substr(md5(seed||':'||id||':'||j),1,8))::BIGINT % 100000)."""

    def h(j: int):
        s = F.concat_ws(":", F.lit(str(seed)), id_col.cast("string"), F.lit(str(j)))
        return F.conv(F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10).cast("long")

    return F.array(
        *[
            (h(j) % 100_000) / F.lit(100_000.0 / (2 * scale)) - F.lit(scale)
            for j in range(rank)
        ]
    )


@dataclass
class CFModel:
    user_factors: DataFrame  # (user, uf array<double>)
    item_factors: DataFrame  # (item, vf array<double>)
    rank: int
    rmse_history: list[float] = field(default_factory=list)

    def estimate_preference(self, prefs: DataFrame) -> DataFrame:
        """prefs(user, item) -> (user, item, score) via factor dot."""
        return (
            prefs.join(self.user_factors, "user")
            .join(self.item_factors, "item")
            .select(
                "user",
                "item",
                F.aggregate(
                    F.zip_with("uf", "vf", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("score"),
            )
        )

    @staticmethod
    def _rank_topk(scored: DataFrame, count: int) -> DataFrame:
        """(user, item, score) -> top `count` per user, score-desc with
        item-asc tie-break — shared by the exact and ANN paths so their
        ranking semantics can never diverge."""
        from pyspark.sql import Window

        w = Window.partitionBy("user").orderBy(F.desc("score"), F.asc("item"))
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= count)
            .select("user", "item", "score", "rnk")
        )

    def most_preferred_items(self, users: DataFrame, count: int = 10) -> DataFrame:
        """users(user) -> top `count` items per user by estimated score.

        Exact scorer: scores EVERY catalog item per user — quadratic by
        spec. Shaped like cosine_topk: the (small) users side is joined
        to its factors and broadcast, so the item catalog is scanned
        once map-side and never shuffles. Fine whenever users-per-batch
        is bounded; for web-scale catalogs with many users use
        :meth:`most_preferred_items_ann`, which probes an IVF index
        instead of scanning the catalog per user."""
        u = users.join(self.user_factors, "user").select("user", "uf")
        scored = self.item_factors.crossJoin(F.broadcast(u)).select(
            "user",
            "item",
            F.aggregate(
                F.zip_with("uf", "vf", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("score"),
        )
        return self._rank_topk(scored, count)

    def most_preferred_items_ann(
        self,
        users: DataFrame,
        count: int = 10,
        n_cells: int = 16,
        nprobe: int = 4,
    ) -> DataFrame:
        """Scale path for top-k recommendation: route the maximum-inner-
        product search through the IVF ANN layer instead of a users x
        catalog cross join.

        Uses the standard MIPS->cosine reduction: items are augmented
        with an extra component sqrt(M² − ‖v‖²) (M = max item-factor
        norm) and users with 0 — the cosine ORDER of the augmented
        vectors equals the dot-product order of the originals, so IVF
        cell probing applies directly. Candidates are then re-scored
        with the exact factor dot product, so returned scores match the
        exact path; only the candidate set is approximate (recall grows
        with nprobe; nprobe == n_cells degenerates to an exhaustive but
        still bucketed, never cartesian, scan)."""
        from hama_spark.extensions.similarity import ivf_topk

        norm2 = F.aggregate(F.col("vf"), F.lit(0.0), lambda a, x: a + x * x)
        m2 = self.item_factors.agg(F.max(norm2).alias("m")).first()["m"] or 0.0
        items_aug = self.item_factors.select(
            F.col("item").alias("vec_id"),
            F.concat(
                F.col("vf"), F.array(F.sqrt(F.greatest(F.lit(m2) - norm2, F.lit(0.0))))
            ).alias("embedding"),
        )
        users_aug = users.join(self.user_factors, "user").select(
            F.col("user").alias("vec_id"),
            F.concat(F.col("uf"), F.array(F.lit(0.0))).alias("embedding"),
        )
        cand = ivf_topk(
            items_aug,
            users_aug,
            k=count,
            n_cells=n_cells,
            nprobe=nprobe,
        ).select(F.col("query_id").alias("user"), F.col("vec_id").alias("item"))
        return self._rank_topk(self.estimate_preference(cand), count)


def _grad_update(
    factors: DataFrame,
    joined: DataFrame,
    own_col: str,
    other_vec: str,
    vec_col: str,
    rank: int,
    lr: float,
) -> DataFrame:
    """factors[own] += 2*lr * Σ_prefs err * other_vec, per dimension."""
    g = (
        joined.select(own_col, "err", F.posexplode(other_vec).alias("j", "v"))
        .groupBy(own_col, "j")
        .agg(F.sum(F.col("err") * F.col("v")).alias("g"))
        .groupBy(own_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "g"))), lambda s: s["g"]
            ).alias("_g")
        )
    )
    return (
        factors.join(g, own_col, "left")
        .select(
            own_col,
            F.when(
                F.col("_g").isNull(), F.col(vec_col)
            )
            .otherwise(
                F.zip_with(vec_col, "_g", lambda f, gg: f + F.lit(2.0 * lr) * gg)
            )
            .alias(vec_col),
        )
    )


def online_cf_train(
    ratings: DataFrame,
    rank: int = 8,
    iterations: int = 10,
    learning_rate: float = 0.01,
    init_scale: float = 0.3,
    seed: int = 42,
    user_col: str = "user",
    item_col: str = "item",
    rating_col: str = "rating",
    track_rmse: bool = True,
) -> CFModel:
    """ratings(user, item, rating) -> CFModel. ``learning_rate`` is the
    reference's τ (MeanAbsError.TETTA = 0.01); full-batch, so scale it
    down ~1/avg-ratings-per-id for large dense matrices."""
    spark = ratings.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # Checkpoint policy: `joined` is materialized EAGERLY every iteration
    # because both factor updates read it — left lazy, the two gradient
    # stages race to recompute it (measured 2x). The uf/vf re-anchors are
    # linear chains consumed by the next `joined`, so they stay lazy and
    # ride that job: one or two Spark jobs per iteration instead of four.
    r = ratings.select(
        F.col(user_col).alias("user"),
        F.col(item_col).alias("item"),
        F.col(rating_col).cast("double").alias("rating"),
    ).repartition(n_part, "user")
    r = r.localCheckpoint(eager=True)

    uf = r.select("user").distinct().select(
        "user", _hash_factors(F.col("user"), rank, seed, init_scale).alias("uf")
    ).localCheckpoint(eager=False)
    vf = r.select("item").distinct().select(
        "item", _hash_factors(F.col("item"), rank, seed + 1, init_scale).alias("vf")
    ).localCheckpoint(eager=False)

    history: list[float] = []
    for _ in range(iterations):
        joined = (
            r.join(uf, "user")
            .join(vf, "item")
            .withColumn(
                "err",
                F.col("rating")
                - F.aggregate(
                    F.zip_with("uf", "vf", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )
            .localCheckpoint(eager=True)
        )
        if track_rmse:
            history.append(
                joined.agg(F.sqrt(F.avg(F.col("err") * F.col("err")))).collect()[0][0]
            )
        uf = _grad_update(uf, joined, "user", "vf", "uf", rank, learning_rate)
        vf = _grad_update(vf, joined, "item", "uf", "vf", rank, learning_rate)
        # the two updates share `joined` (cached at first materialization);
        # re-anchor factor lineage
        uf = uf.select("user", "uf").localCheckpoint(eager=False)
        vf = vf.select("item", "vf").localCheckpoint(eager=False)

    return CFModel(user_factors=uf, item_factors=vf, rank=rank, rmse_history=history)
