"""SFT/preference data prep (extensions/sft.py): conversation
validation flags, per-assistant-turn example unrolling, and DPO pair
construction with a DuckDB twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string"
    )


def test_validate_conversations_flags(spark):
    from hama_spark.extensions.sft import validate_conversations

    rows = [
        # conv 1: clean system-led alternating
        (1, 0, "system", "be nice"), (1, 1, "user", "hi"),
        (1, 2, "assistant", "hello"), (1, 3, "user", "bye"),
        (1, 4, "assistant", "ciao"),
        # conv 2: double user turn + empty text
        (2, 0, "user", "a"), (2, 1, "user", ""), (2, 2, "assistant", "b"),
        # conv 3: assistant-led, bad role
        (3, 0, "assistant", "x"), (3, 1, "tool", "y"),
    ]
    got = {
        r.conv_id: (
            r.n_turns, r.starts_with_user, r.alternates,
            r.has_empty_text, r.roles_ok,
        )
        for r in validate_conversations(_turns(spark, rows)).collect()
    }
    assert got[1] == (5, True, True, False, True)
    assert got[2] == (3, True, False, True, True)
    assert got[3] == (2, False, True, False, False)


def test_build_sft_examples_unrolls_assistant_turns(spark):
    from hama_spark.extensions.sft import build_sft_examples

    rows = [
        (1, 0, "system", "be nice"), (1, 1, "user", "hi"),
        (1, 2, "assistant", "hello"), (1, 3, "user", "more"),
        (1, 4, "assistant", "sure"),
        (2, 0, "user", "solo"),   # no assistant turn -> no examples
    ]
    got = {
        (r.conv_id, r.turn_idx): (r.context, r.target)
        for r in build_sft_examples(_turns(spark, rows)).collect()
    }
    assert set(got) == {(1, 2), (1, 4)}
    assert got[(1, 2)] == (
        "<|system|> be nice\n<|user|> hi", "hello"
    )
    assert got[(1, 4)] == (
        "<|system|> be nice\n<|user|> hi\n<|assistant|> hello\n<|user|> more",
        "sure",
    )


def test_preference_pairs_and_duckdb_twin(spark, duck):
    from hama_spark.extensions.sft import preference_pairs

    rows = [
        (1, "good", 0.9), (1, "bad", 0.1), (1, "mid", 0.5),
        (2, "only", 0.7),                       # single response: dropped
        (3, "tie-a", 0.5), (3, "tie-b", 0.5),   # zero margin: dropped
        (4, "win", 0.8), (4, "lose", 0.2),
    ]
    df = spark.createDataFrame(rows, "prompt_id long, response string, score double")
    got = {
        r.prompt_id: (r.chosen, r.rejected, r.margin)
        for r in preference_pairs(df).collect()
    }
    assert got == {
        1: ("good", "bad", pytest.approx(0.8)),
        4: ("win", "lose", pytest.approx(0.6)),
    }
    vals = ", ".join(
        f"({p}, '{r}', CAST({s!r} AS DOUBLE))" for p, r, s in rows
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(f"""
            WITH resp AS (SELECT * FROM (VALUES {vals}) t(prompt_id, response, score)),
            rk AS (
              SELECT *,
                row_number() OVER (PARTITION BY prompt_id ORDER BY score DESC, response ASC) AS rb,
                row_number() OVER (PARTITION BY prompt_id ORDER BY score ASC, response DESC) AS rw
              FROM resp)
            SELECT b.prompt_id, b.response AS chosen, w.response AS rejected,
                   round(b.score - w.score, 9) AS margin
            FROM rk b JOIN rk w USING (prompt_id)
            WHERE b.rb = 1 AND w.rw = 1 AND b.response <> w.response
              AND b.score - w.score > 0
        """).fetchall()
    }
    assert {k: (c, j) for k, (c, j, _) in got.items()} == {
        k: (c, j) for k, (c, j, _) in want.items()
    }
