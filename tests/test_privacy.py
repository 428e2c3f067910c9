"""k-anonymity / l-diversity audits vs DuckDB replays and hand-built
violation fixtures."""

import pytest

from hama_spark.extensions.privacy import (
    k_anonymity_report,
    k_anonymity_summary,
    l_diversity_report,
)
from tests.conftest import assert_df_equals_oracle


def test_k_anonymity_report_oracle(spark, tables, duck):
    got = k_anonymity_report(
        tables["customer"], ["c_nationkey", "c_mktsegment"], k=5
    )
    assert_df_equals_oracle(
        got,
        duck,
        """
        SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n_rows
        FROM customer GROUP BY 1, 2 HAVING count(*) < 5
        """,
    )


def test_k_anonymity_summary_oracle(spark, tables, duck):
    got = k_anonymity_summary(
        tables["customer"], ["c_nationkey", "c_mktsegment"], k=5
    )
    assert_df_equals_oracle(
        got,
        duck,
        """
        WITH g AS (
          SELECT count(*)::BIGINT AS n FROM customer GROUP BY c_nationkey, c_mktsegment)
        SELECT 5 AS k, count(*)::BIGINT AS n_groups,
               sum(CASE WHEN n < 5 THEN 1 ELSE 0 END)::BIGINT AS n_violating_groups,
               sum(n)::BIGINT AS n_rows,
               sum(CASE WHEN n < 5 THEN n ELSE 0 END)::BIGINT AS n_violating_rows,
               min(n)::BIGINT AS min_group_size
        FROM g
        """,
    )


def test_l_diversity_flags_homogeneous_groups(spark):
    rows = [
        # group (90210, 40s): 3 rows, ONE diagnosis -> violates l=2
        ("90210", "40s", "flu"),
        ("90210", "40s", "flu"),
        ("90210", "40s", "flu"),
        # group (10001, 30s): 2 rows, two diagnoses -> ok
        ("10001", "30s", "flu"),
        ("10001", "30s", "cold"),
        # group (10002, 30s): NULL + ONE real value -> homogeneous
        # (NULLs are no diversity) -> violates by default
        ("10002", "30s", None),
        ("10002", "30s", "flu"),
        # group (10003, 50s): all NULL -> 0 real values -> violates
        ("10003", "50s", None),
        ("10003", "50s", None),
    ]
    df = spark.createDataFrame(rows, "zip string, age string, dx string")
    viol = {
        (r["zip"], r["age"]): (r["n_rows"], r["n_sensitive"])
        for r in l_diversity_report(df, ["zip", "age"], "dx", l=2).collect()
    }
    assert viol == {
        ("90210", "40s"): (3, 1),
        ("10002", "30s"): (2, 1),
        ("10003", "50s"): (2, 0),
    }
    # legacy mode: NULL counts as its own value, masking both leaks
    legacy = {
        (r["zip"], r["age"]): (r["n_rows"], r["n_sensitive"])
        for r in l_diversity_report(
            df, ["zip", "age"], "dx", l=2, count_nulls_as_value=True
        ).collect()
    }
    assert legacy == {("90210", "40s"): (3, 1), ("10003", "50s"): (2, 1)}


def test_anonymous_dataset_passes(spark):
    rows = [(i % 3, "x", i) for i in range(30)]
    df = spark.createDataFrame(rows, "bucket int, seg string, id int")
    s = k_anonymity_summary(df, ["bucket", "seg"], k=5).first()
    assert s["n_violating_groups"] == 0 and s["min_group_size"] == 10
    assert k_anonymity_report(df, ["bucket", "seg"], k=5).count() == 0


def test_privacy_validates(spark, tables):
    with pytest.raises(ValueError):
        k_anonymity_report(tables["customer"], [], k=5)
    with pytest.raises(ValueError):
        k_anonymity_summary(tables["customer"], ["c_nationkey"], k=1)
    with pytest.raises(ValueError):
        l_diversity_report(tables["customer"], ["c_nationkey"], "c_mktsegment", l=1)
