"""Classifier-based corpus filtering (the GPT-3/LLaMA-pipeline stage:
score documents with a lightweight linear model trained on a labeled
reference set, keep the high-scoring ones).

Spark-first: hashed bag-of-words features (``HashingTF`` — the
fixed-width, vocabulary-free featurizer that needs no driver-side state)
into ``LogisticRegression`` (distributed L-BFGS; each iteration is one
tree-aggregated gradient pass).  Training state is the model's
coefficient vector — a driver artifact like KMeans centroids; scoring is
a map-only pass.

Cross-engine note: L-BFGS gradient sums are tree-aggregated floats, so
coefficients are deterministic per (data, partitioning) but NOT
bit-portable — the driver contract therefore checks exact row-count
anchors plus a held-out accuracy bound, not coefficients (the a10/HLL
error-bound-contract pattern).

Reference parity: no ML surface exists in the reference engine; this is
the LLM-pipeline extension surface (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from subgraph_extractor_spark.operators.dedup import tokens_or_empty


def _featurize(df: DataFrame, text_col: str, num_features: int):
    from pyspark.ml.feature import HashingTF

    toks = df.withColumn("_toks", tokens_or_empty(F.col(text_col)))
    tf = HashingTF(
        inputCol="_toks", outputCol="_features", numFeatures=num_features
    )
    return tf.transform(toks)


def train_text_classifier(
    train: DataFrame,
    text_col: str,
    label_col: str,
    num_features: int = 1 << 15,
    max_iter: int = 50,
    reg_param: float = 1e-3,
):
    """Fit a logistic-regression text classifier on hashed bag-of-words
    features.  ``label_col`` must be a 0/1 double (binary) or 0..k-1
    (multinomial — Spark picks the family automatically).  Returns the
    fitted LogisticRegressionModel (coefficients live on the driver,
    broadcast to executors at scoring time)."""
    from pyspark.ml.classification import LogisticRegression

    feats = _featurize(train, text_col, num_features).select(
        F.col(label_col).cast("double").alias("label"), "_features"
    )
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,
    )
    return lr.fit(feats)


def score_documents(
    model,
    df: DataFrame,
    text_col: str,
    num_features: int | None = None,
) -> DataFrame:
    """Map-only scoring pass: original columns plus ``prediction``
    (argmax class, double).  Feature width is read from the model
    (``model.numFeatures``) so it can never drift from training;
    ``num_features`` remains only as an explicit override."""
    nf = num_features or int(model.numFeatures)
    feats = _featurize(df, text_col, nf)
    return model.transform(feats).drop("_toks", "_features", "rawPrediction",
                                       "probability")


def classifier_filter(
    model,
    df: DataFrame,
    text_col: str,
    keep_class: float = 1.0,
    num_features: int | None = None,
) -> DataFrame:
    """Keep documents the classifier assigns to ``keep_class`` — the
    quality-filter composition (train on curated-vs-crawl labels, keep
    rows predicted curated)."""
    scored = score_documents(model, df, text_col, num_features)
    return scored.filter(F.col("prediction") == keep_class).drop("prediction")
