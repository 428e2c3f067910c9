"""Instruction-tuning data preparation: conversation validation, SFT
example building, and DPO-style preference pairs — the post-pretraining
half of a training-data pipeline (the corpus operators in
``extensions/corpus.py``/``sampling.py`` cover the pretraining half).
Beyond the reference surface (north-star extension).

Input convention: a TURNS relation (conv_id, turn_idx, role, text) with
``role`` in {'user', 'assistant', 'system'} — the normalized form of
every chat-format interchange (ShareGPT/OpenAI-style JSON flattens to
it with one explode).

Scale shape: everything is one groupBy(conv_id) into sorted arrays
followed by pure array expressions (slice/transform/array_join) and,
for examples, one explode — conversations are short (bounded arrays),
so per-row memory is bounded and nothing quadratic or driver-side
exists. Preference pairs are one window over (prompt, score) — the
per-prompt response count is small by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def _sorted_turns(turns: DataFrame) -> DataFrame:
    return turns.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", "role", "text"))
        ).alias("t")
    )


def validate_conversations(turns: DataFrame) -> DataFrame:
    """Per-conversation hygiene report: (conv_id, n_turns,
    starts_with_user, alternates, has_empty_text, roles_ok) — the gate
    an SFT pipeline runs before building examples. ``alternates``
    ignores a leading system turn (the usual template shape)."""
    conv = _sorted_turns(turns).select(
        "conv_id",
        "t",
        F.when(
            F.col("t")[0]["role"] == "system", F.slice(F.col("t"), 2, 1_000_000)
        )
        .otherwise(F.col("t"))
        .alias("b"),
    )
    b = F.col("b")
    # consecutive-pair alternation: zip b[0:n-1] with b[1:n]
    consecutive = F.zip_with(
        F.slice(b, 1, F.greatest(F.size(b) - 1, F.lit(0))),
        F.slice(b, 2, F.greatest(F.size(b) - 1, F.lit(0))),
        lambda a, nxt: a["role"] != nxt["role"],
    )
    return conv.select(
        "conv_id",
        F.size("t").cast("long").alias("n_turns"),
        (b[0]["role"] == "user").alias("starts_with_user"),
        F.aggregate(
            consecutive, F.lit(True), lambda acc, v: acc & v
        ).alias("alternates"),
        F.exists(
            F.col("t"), lambda s: F.coalesce(F.trim(s["text"]), F.lit("")) == ""
        ).alias("has_empty_text"),
        F.forall(
            F.col("t"),
            lambda s: s["role"].isin("user", "assistant", "system"),
        ).alias("roles_ok"),
    )


def build_sft_examples(
    turns: DataFrame,
    user_tag: str = "<|user|>",
    assistant_tag: str = "<|assistant|>",
    system_tag: str = "<|system|>",
) -> DataFrame:
    """One training example per ASSISTANT turn: (conv_id, turn_idx,
    context, target) where ``context`` is every prior turn rendered as
    ``<tag> text`` lines and ``target`` is the assistant text — the
    standard context-masked SFT unrolling (a k-turn conversation yields
    k examples sharing prefixes; storage-dedup that downstream with the
    corpus operators if needed).

    Pure array expressions + one explode; deterministic, so it is
    SQL-replayable for oracle checks."""
    tag = {
        "user": user_tag,
        "assistant": assistant_tag,
        "system": system_tag,
    }
    conv = _sorted_turns(turns)
    rendered = F.transform(
        F.col("t"),
        lambda s: F.concat_ws(
            " ",
            F.when(s["role"] == "user", F.lit(tag["user"]))
            .when(s["role"] == "assistant", F.lit(tag["assistant"]))
            .otherwise(F.lit(tag["system"])),
            F.coalesce(s["text"], F.lit("")),
        ),
    )
    with_pos = conv.select(
        "conv_id",
        F.col("t"),
        rendered.alias("r"),
        F.explode(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.size("t")),
                    lambda i: F.struct(
                        i.alias("pos"),
                        (F.col("t")[i - 1]["role"] == "assistant").alias("is_a"),
                    ),
                ),
                lambda s: s["is_a"],
            )
        ).alias("e"),
    )
    pos = F.col("e")["pos"]
    return with_pos.select(
        "conv_id",
        F.col("t")[pos - 1]["turn_idx"].alias("turn_idx"),
        F.array_join(F.slice("r", 1, pos - 1), "\n").alias("context"),
        F.col("t")[pos - 1]["text"].alias("target"),
    )


def preference_pairs(
    responses: DataFrame,
    prompt_col: str = "prompt_id",
    response_col: str = "response",
    score_col: str = "score",
    min_margin: float = 0.0,
) -> DataFrame:
    """DPO/RLHF preference pairs: per prompt, the highest-scored
    response becomes ``chosen`` and the lowest ``rejected`` (ties break
    on the response text for determinism); prompts whose best-worst
    ``margin`` is <= ``min_margin`` are dropped — equal-quality pairs
    teach nothing. Returns (prompt_col, chosen, rejected, margin).

    One shuffle on the prompt key; both extreme picks ride the same
    window partitioning."""
    ranked = responses.select(
        _c(prompt_col).alias(prompt_col),
        _c(response_col).alias("_resp"),
        _c(score_col).cast("double").alias("_score"),
    ).withColumn("_rb", F.row_number().over(
        Window.partitionBy(prompt_col).orderBy(F.desc("_score"), F.asc("_resp"))
    )).withColumn("_rw", F.row_number().over(
        Window.partitionBy(prompt_col).orderBy(F.asc("_score"), F.desc("_resp"))
    ))
    best = ranked.filter(F.col("_rb") == 1).select(
        prompt_col, F.col("_resp").alias("chosen"), F.col("_score").alias("_sb")
    )
    worst = ranked.filter(F.col("_rw") == 1).select(
        prompt_col, F.col("_resp").alias("rejected"), F.col("_score").alias("_sw")
    )
    return (
        best.join(worst, prompt_col)
        .filter(F.col("chosen") != F.col("rejected"))
        .select(
            prompt_col,
            "chosen",
            "rejected",
            F.round(F.col("_sb") - F.col("_sw"), 9).alias("margin"),
        )
        .filter(F.col("margin") > min_margin)
    )
