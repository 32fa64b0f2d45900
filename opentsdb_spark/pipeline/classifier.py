"""Fasttext-style document quality classifier on hashed n-gram features.

The standard web-corpus curation step (LLaMA: pages "referenced by
Wikipedia" classifier; RefinedWeb / Gopher appendix: a cheap linear model
over bag-of-n-grams decides keep/drop at corpus scale): featurize each
document as a hashed bag of uni+bigrams (same gram shapes as the DSIR
featurizer, pipeline/sampling.py:_hashed_ngram_feats, packed JVM-side by
Spark ML's HashingTF) and fit logistic regression with Spark ML, then
score the whole corpus with the broadcast weight vector.

Scale shape: featurization is a narrow explode -> pmod bucket map (8-byte
keys, no vocabulary dictionary); training runs Spark ML's distributed
L-BFGS where each iteration is one tree-aggregated gradient pass (the
weight vector — n_features doubles — is the only driver-side state);
scoring broadcasts those weights inside a codegen-able ML transform, a
narrow map over the corpus. Nothing about the pipeline materializes a
vocabulary or collects per-doc state.

Not in the oracle catalog: L-BFGS is iterative and not SQL-expressible —
tests/test_pipeline.py pins behavior (separates quality-labeled fixtures,
deterministic under a fixed seed, probabilities in [0,1]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _feature_vectors(docs: DataFrame, content_col: str, id_col: str,
                     n_features: int) -> DataFrame:
    """(id, features sparse-vector) — hashed uni+bigram occurrence counts.

    The gram array (words ++ bigrams, same shapes as DSIR's featurizer)
    is pure codegen column expressions; the bucketing + sparse-vector
    packing is Spark ML's HashingTF — JVM-side murmur3 per gram, no Python
    UDF anywhere in the corpus path. The sparse vector is bounded by the
    doc's distinct gram count, never n_features."""
    from pyspark.ml.feature import HashingTF

    from opentsdb_spark.pipeline.sampling import uni_bigram_array

    grams = docs.select(id_col, uni_bigram_array(content_col).alias("__g"))
    tf = HashingTF(inputCol="__g", outputCol="features", numFeatures=n_features)
    return tf.transform(grams).select(id_col, "features")


def train_quality_classifier(
    labeled_docs: DataFrame,
    label_col: str = "label",
    content_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 4096,
    max_iter: int = 50,
    reg_param: float = 1e-4,
):
    """Fit the linear quality model on a labeled slice (label 1 = keep).

    Labels typically come from a trusted proxy: a curated source column, a
    Gopher-gate pass (pipeline.text.gopher_filter), or CCNet head-vs-tail
    bands — the classifier then generalizes that judgment to the whole
    corpus. Returns the fitted Spark ML model (weights live in the model;
    broadcast automatically at scoring time)."""
    from pyspark.ml.classification import LogisticRegression

    train = _feature_vectors(labeled_docs, content_col, id_col, n_features).join(
        labeled_docs.select(id_col, F.col(label_col).cast("double").alias("label")),
        on=id_col,
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, featuresCol="features",
        labelCol="label", standardization=False,
    )
    return lr.fit(train)


def score_quality(
    docs: DataFrame,
    model,
    content_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 4096,
) -> DataFrame:
    """(id, quality_prob, keep) for every document — P(label=1) under the
    trained model and its argmax decision. Featurize + model.transform is a
    narrow pipeline over the corpus scan; extractors must hash into the
    SAME n_features the model was trained with."""
    from pyspark.ml.functions import vector_to_array

    vecs = _feature_vectors(docs, content_col, id_col, n_features)
    out = model.transform(vecs)
    return out.select(
        id_col,
        vector_to_array("probability")[1].alias("quality_prob"),
        (F.col("prediction") > 0.5).alias("keep"),
    )
