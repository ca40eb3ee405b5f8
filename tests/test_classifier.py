"""Classifier-based corpus filtering: distillation accuracy, filter
composition, and featurization edge cases."""

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import classifier as clf
from subgraph_extractor_spark.sources import load_table


@pytest.fixture(scope="module")
def labeled(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.when(F.trim(F.col("text")) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), "\\s+"))
    )
    return docs.withColumn(
        "ok", (n_tokens >= 40).cast("double")
    ).cache()


def test_distills_length_gate(spark, labeled):
    train = labeled.filter(F.col("doc_id") % 2 == 0)
    test = labeled.filter(F.col("doc_id") % 2 == 1)
    m = clf.train_text_classifier(train, "text", "ok")
    scored = clf.score_documents(m, test, "text")
    acc = (
        scored.filter(F.col("prediction") == F.col("ok")).count()
        / test.count()
    )
    assert acc >= 0.9, acc
    # scoring preserves original columns and adds prediction only
    assert set(scored.columns) == set(test.columns) | {"prediction"}


def test_classifier_filter_keeps_predicted_class(spark, labeled):
    m = clf.train_text_classifier(labeled, "text", "ok")
    kept = clf.classifier_filter(m, labeled, "text", keep_class=1.0)
    assert 0 < kept.count() < labeled.count()
    assert "prediction" not in kept.columns
    # on train data the filter approximates the gate
    agree = kept.filter(F.col("ok") == 1.0).count() / kept.count()
    assert agree >= 0.9, agree


def test_null_and_empty_text_score_without_failing(spark):
    df = spark.createDataFrame(
        [(1, "some words here to learn from", 1.0),
         (2, "", 0.0),
         (3, None, 0.0),
         (4, "more words in this one too yes", 1.0)],
        ["doc_id", "text", "ok"],
    )
    m = clf.train_text_classifier(df, "text", "ok", num_features=64)
    out = clf.score_documents(m, df, "text")
    assert out.count() == 4  # null/empty featurize to the zero vector
