"""Text-analysis operators: token counting, quality, lang-id, fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventanalysis_spark.operators.textstats import (
    add_fingerprint,
    bpe_ish_token_count,
    detect_language,
    quality_features,
    token_count,
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )


def test_token_count(spark):
    df = _df(spark, ["one two three", "", "   ", "single", "a  b"])
    got = [r.n for r in df.select(token_count(F.col("text")).alias("n")).collect()]
    assert got == [3, 0, 0, 1, 2]


def test_bpe_ish_token_count(spark):
    df = _df(spark, ["hello world42!", ""])
    got = [r.n for r in df.select(bpe_ish_token_count(F.col("text")).alias("n")).collect()]
    # hello, world, 42, ! → 4
    assert got[0] == 4 and got[1] == 0


def test_quality_features(spark):
    df = _df(spark, [
        "the cat and the dog sat with a hat for fun in the sun was good",
        "ALL CAPS!!! ... ;;; :::",
        "",
    ])
    rows = quality_features(df).orderBy("id").collect()
    assert rows[0].q_score > rows[1].q_score  # stopwordy prose beats punct noise
    assert rows[2].q_tokens == 0 and rows[2].q_score is not None
    assert 0.0 <= rows[0].q_score <= 1.0


def test_detect_language(spark):
    df = _df(spark, [
        "the cat is in the house and that was good for all of them",
        "der hund ist nicht mit der katze und das ist von zu hause",
        "le chat est dans la maison et les chiens pour que une personne",
        "xyzzy plugh",
        "",
    ])
    got = [r.lang_detected for r in detect_language(df).orderBy("id").collect()]
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "und"
    assert got[4] == "und"


def test_fingerprint_properties(spark):
    df = _df(spark, ["a b c", "a b c", "c b a", ""])
    got = [r.doc_fingerprint for r in add_fingerprint(df).orderBy("id").collect()]
    assert got[0] == got[1]        # deterministic
    assert got[0] != got[2]        # order-sensitive
    assert got[3] is not None      # empty text gets the seed value
    # stable across partitionings
    got2 = [
        r.doc_fingerprint
        for r in add_fingerprint(df.repartition(5)).orderBy("id").collect()
    ]
    assert got == got2
