"""Label propagation communities and the corpus bigram-LM scorer."""

from __future__ import annotations

import math

from hama_spark.extensions import bigram_perplexity
from hama_spark.graph import label_propagation


def test_label_propagation_clique_converges_to_one_label(spark):
    edges = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("a1", "a3")], ["src", "dst"]
    )
    out = {r["id"]: r["label"] for r in label_propagation(edges, iters=4).collect()}
    # neighbor-majority with min-label ties floods the clique to 'a1'
    assert out == {"a1": "a1", "a2": "a1", "a3": "a1"}


def test_label_propagation_deterministic_rerun(spark):
    edges = spark.createDataFrame(
        [(f"v{i}", f"v{(i * 3 + 1) % 10}") for i in range(10)], ["src", "dst"]
    )
    a = sorted(map(tuple, label_propagation(edges, iters=3).collect()))
    b = sorted(map(tuple, label_propagation(edges, iters=3).collect()))
    assert a == b


def test_bigram_perplexity_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in bigram_perplexity(docs, k=0.5).collect()}
    # C(a,b)=2, C(a,c)=1, C(a)=3, V=3 -> P(b|a)=2.5/4.5, P(c|a)=1.5/4.5
    assert out[1]["n_bigrams"] == 1
    assert out[1]["avg_logp"] == round(math.log(2.5 / 4.5), 6)
    assert out[1]["ppl"] == round(4.5 / 2.5, 6)
    assert out[3]["ppl"] == round(4.5 / 1.5, 6)
    # the twice-seen bigram is less surprising than the once-seen one
    assert out[1]["ppl"] < out[3]["ppl"]


def test_bigram_perplexity_skips_single_token_docs(spark):
    docs = spark.createDataFrame([(1, "only"), (2, "two words")], ["doc_id", "text"])
    ids = {r["doc_id"] for r in bigram_perplexity(docs).collect()}
    assert ids == {2}
