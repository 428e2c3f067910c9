"""Multinomial naive Bayes (ml/naive_bayes.py): separable-vocabulary
sanity, smoothing behavior on unseen tokens, and the SQL replay on the
documents fixture."""

from __future__ import annotations


def _toy_docs(spark):
    return spark.createDataFrame(
        [
            (1, "en", "the cat sat on the mat"),
            (2, "en", "the dog ate the bone"),
            (3, "fr", "le chat et le chien"),
            (4, "fr", "le pain et le vin"),
        ],
        "doc_id long, lang string, text string",
    )


def test_nb_separable_vocab_perfect_resubstitution(spark):
    from hama_spark.ml import nb_confusion

    got = {
        (r.actual, r.predicted): r.n
        for r in nb_confusion(_toy_docs(spark), label_col="lang").collect()
    }
    assert got == {("en", "en"): 2, ("fr", "fr"): 2}


def test_nb_predict_unseen_tokens_use_smoothed_likelihood(spark):
    """A doc of only out-of-vocabulary tokens scores ln(prior) +
    k*ln(a/(tot_c + a*V)) per class: with equal priors the class with
    the smaller training-token total wins (fr: 10 tokens vs en: 11),
    and no class errors out on zero counts — the Laplace-smoothing
    contract."""
    from hama_spark.ml import nb_predict, nb_train

    train = _toy_docs(spark)
    tc, classes, vocab = nb_train(train, "lang", "text")
    unseen = spark.createDataFrame(
        [(99, "zzz qqq xxx")], "doc_id long, text string"
    )
    rows = nb_predict(unseen, tc, classes, vocab).collect()
    assert len(rows) == 1 and rows[0].predicted == "fr"


def test_nb_empty_and_null_text_dropped_consistently(spark):
    from hama_spark.ml import nb_confusion

    docs = _toy_docs(spark).union(
        spark.createDataFrame(
            [(5, "en", ""), (6, "fr", None), (7, None, "le chat")],
            "doc_id long, lang string, text string",
        )
    )
    got = {
        (r.actual, r.predicted): r.n
        for r in nb_confusion(docs, label_col="lang").collect()
    }
    # tokenless and unlabeled docs contribute nothing
    assert got == {("en", "en"): 2, ("fr", "fr"): 2}


def test_nb_confusion_matches_sql_on_documents_fixture(spark, tables, duck):
    from tests.conftest import assert_df_equals_oracle

    from __spark_entry__ import _nb_confusion_sql
    from hama_spark.ml import nb_confusion

    assert_df_equals_oracle(
        nb_confusion(tables["documents"], label_col="lang"),
        duck,
        _nb_confusion_sql("lang"),
    )
