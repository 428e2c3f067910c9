"""Zipf / Heaps scaling-law analytics vs DuckDB replays of the same
math, plus property checks on the fits."""

import math

import pytest

from hama_spark.extensions.scaling import (
    heaps_curve,
    heaps_fit,
    term_ranks,
    zipf_fit,
)
from tests.conftest import assert_df_equals_oracle

# DuckDB twin of _terms: lowercase whitespace tokens, '' dropped
TERMS_CTE = """
terms AS (
  SELECT doc_id, t.term
  FROM documents,
       LATERAL unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(term)
  WHERE t.term <> ''
)
"""


def test_term_ranks_oracle(spark, tables, duck):
    got = term_ranks(tables["documents"]).where("rank <= 30")
    assert_df_equals_oracle(
        got,
        duck,
        f"""
        WITH {TERMS_CTE},
        freqs AS (SELECT term, count(*) AS freq FROM terms GROUP BY term)
        SELECT term, freq,
               row_number() OVER (ORDER BY freq DESC, term) AS rank
        FROM freqs QUALIFY rank <= 30
        """,
    )


def test_zipf_fit_oracle(spark, tables, duck):
    got = zipf_fit(tables["documents"], top_n=100, skip_top=5)
    assert_df_equals_oracle(
        got,
        duck,
        f"""
        WITH {TERMS_CTE},
        freqs AS (SELECT term, count(*) AS freq FROM terms GROUP BY term),
        ranked AS (
          SELECT ln(row_number() OVER (ORDER BY freq DESC, term)::DOUBLE) AS x,
                 ln(freq::DOUBLE) AS y,
                 row_number() OVER (ORDER BY freq DESC, term) AS rank
          FROM freqs QUALIFY rank > 5 AND rank <= 105)
        SELECT count(*)::BIGINT AS n_terms,
               round(-covar_pop(x, y) / var_pop(x), 9) AS slope,
               round(avg(y) + (-covar_pop(x, y) / var_pop(x)) * avg(x), 9)
                 AS intercept,
               round(covar_pop(x, y)^2 / (var_pop(x) * var_pop(y)), 9) AS r2
        FROM ranked
        """,
        tol=1e-6,
    )


def test_zipf_fit_recovers_known_slope(spark):
    """Estimator validation on a CONSTRUCTED Zipfian corpus (freq_i =
    round(3000/i), 40 terms): the fitted slope must come back ~1 with a
    near-perfect r2. (The driver fixture corpus is deliberately
    uniform — useless for this property, hence synthetic data here.)"""
    rows = [(i, (" ".join([f"w{i:02d}"] * round(3000 / i)))) for i in range(1, 41)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    row = zipf_fit(docs, top_n=40).first()
    assert row["n_terms"] == 40
    assert abs(row["slope"] - 1.0) < 0.05, f"slope {row['slope']} != ~1"
    assert row["r2"] > 0.999, f"r2 {row['r2']} not ~1"


def test_heaps_curve_oracle(spark, tables, duck):
    got = heaps_curve(tables["documents"], points=5)
    n_docs = tables["documents"].count()
    cuts = sorted({math.ceil(n_docs * (i + 1) / 5) for i in range(5)})
    union = " UNION ALL ".join(f"SELECT {c} AS cut" for c in cuts)
    assert_df_equals_oracle(
        got,
        duck,
        f"""
        WITH pos AS (
          SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS p
          FROM documents),
        toks AS (
          SELECT pos.p, t.term
          FROM documents JOIN pos USING (doc_id),
               LATERAL unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(term)
          WHERE t.term <> ''),
        first_seen AS (SELECT term, min(p) AS fp FROM toks GROUP BY term),
        cuts AS ({union})
        SELECT cut::BIGINT AS n_docs,
               (SELECT count(*) FROM toks WHERE p <= cut)::BIGINT AS n_tokens,
               (SELECT count(*) FROM first_seen WHERE fp <= cut)::BIGINT AS vocab
        FROM cuts ORDER BY cut
        """,
    )


def test_heaps_fit_properties(spark, tables):
    curve = heaps_curve(tables["documents"], points=10)
    rows = curve.collect()
    # monotone growth, vocab <= tokens
    for a, b in zip(rows, rows[1:]):
        assert a["n_tokens"] <= b["n_tokens"] and a["vocab"] <= b["vocab"]
    assert all(r["vocab"] <= r["n_tokens"] for r in rows)
    fit = heaps_fit(curve)
    # fixture vocab saturates at the first cut -> beta 0 is correct here
    assert 0.0 <= fit["beta"] < 1.05, f"implausible Heaps beta {fit['beta']}"
    assert fit["k"] > 0

    with pytest.raises(ValueError):
        heaps_fit(curve.limit(1))


def test_heaps_fit_recovers_sublinear_growth(spark):
    """Beta recovery on constructed data: doc i holds terms t1..t_isqrt(i),
    so vocab ~ sqrt(n_docs) while tokens ~ n_docs^1.5 — V ∝ tokens^(1/3).
    The fit must land near 1/3 with a tight r2."""
    rows = [
        (i, " ".join(f"t{j}" for j in range(1, math.isqrt(i) + 1)))
        for i in range(1, 401)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    fit = heaps_fit(heaps_curve(docs, points=10))
    assert 0.25 < fit["beta"] < 0.45, f"beta {fit['beta']} not ~1/3"
    assert fit["r2"] > 0.95, f"r2 {fit['r2']} too loose"


def test_heaps_curve_empty_raises(spark, tables):
    with pytest.raises(ValueError):
        heaps_curve(tables["documents"].where("doc_id < 0"))
