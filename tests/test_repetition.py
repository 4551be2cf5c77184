"""Hand-computed cases for the repetition quality signals
(functions/text.py: dup_ngram_frac, top_token_frac, word_ngrams)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transitdata_monitor_data_collector_spark.functions import text as TX


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(
        col(F.col("text")).alias("v")
    ).first()["v"]


@pytest.mark.parametrize(
    "text,expected",
    [
        ("a b c d", 0.0),  # all distinct
        ("a a a a", 0.75),  # 4 words, 1 distinct
        ("a b a b", 0.5),  # 4 words, 2 distinct
        ("Spam SPAM spam", 2.0 / 3.0),  # case-folded before counting
    ],
)
def test_dup_word_frac(spark, text, expected):
    assert _one(spark, text, lambda c: TX.dup_ngram_frac(c, 1)) == pytest.approx(
        expected
    )


@pytest.mark.parametrize(
    "text,expected",
    [
        ("a b c d", 0.25),  # every token unique -> 1/4
        ("a a a b", 0.75),
        ("x", 1.0),
        ("b a b a b", 0.6),  # run-length must survive interleaving
    ],
)
def test_top_token_frac(spark, text, expected):
    assert _one(spark, text, TX.top_token_frac) == pytest.approx(expected)


def test_dup_2gram_frac(spark):
    # "a b a b a" -> 2-grams: [a b, b a, a b, b a] -> 4 total, 2 distinct
    assert _one(
        spark, "a b a b a", lambda c: TX.dup_ngram_frac(c, 2)
    ) == pytest.approx(0.5)
    # shorter than n -> no n-grams -> 0.0
    assert _one(spark, "a", lambda c: TX.dup_ngram_frac(c, 2)) == 0.0


def test_word_ngrams_preserves_duplicates(spark):
    got = _one(spark, "a b a b", lambda c: TX.word_ngrams(c, 2))
    assert got == ["a b", "b a", "a b"]


# ---------------------------------------------------------------------------
# Model equivalence: Spark expressions vs a trivial Python model over random
# word-soup documents (batched into ONE Spark job per example set).
# ---------------------------------------------------------------------------


def _model_dup_frac(words, n):
    grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    if not grams:
        return 0.0
    return 1.0 - len(set(grams)) / len(grams)


def _model_top_frac(words):
    if not words:
        return 0.0
    from collections import Counter

    return Counter(words).most_common(1)[0][1] / len(words)


def test_repetition_matches_python_model_on_random_docs(spark):
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "cc", "ddd", "word", "spam"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))))
        for i in range(200)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            TX.dup_ngram_frac(F.col("text"), 1).alias("d1"),
            TX.dup_ngram_frac(F.col("text"), 2).alias("d2"),
            TX.top_token_frac(F.col("text")).alias("tf"),
        ).collect()
    }
    for i, text in docs:
        words = text.split()
        assert got[i]["d1"] == pytest.approx(_model_dup_frac(words, 1)), text
        assert got[i]["d2"] == pytest.approx(_model_dup_frac(words, 2)), text
        assert got[i]["tf"] == pytest.approx(_model_top_frac(words)), text
