"""Trained quality classifier — the FineWeb-Edu / RefinedWeb pattern
(Penedo et al. 2024): run an EXPENSIVE labeler (LLM judgment, curated
seed sets, or a slow rule cascade) on a small sample, train a cheap
linear classifier on hashed n-gram features, then score the whole
corpus with it.

Spark-first shape: features are the SAME lowercase unigram+bigram
strings the DSIR operator uses (operators/dsir.hashed_grams_expr),
hashed JVM-side by ``pyspark.ml.feature.HashingTF`` (no Python in the
feature path), model = ``pyspark.ml.classification.LogisticRegression``
(distributed L-BFGS — each iteration is one treeAggregate over the
corpus, the canonical Spark pattern).  Scoring is ``model.transform``:
a narrow map with the coefficient vector broadcast inside the JVM —
at 100 TB the score pass is scan-bound, exactly like the quality-rule
stage it replaces.

Training determinism: L-BFGS aggregates float gradients whose add
order follows partitioning, so coefficients are reproducible only
run-to-run on a fixed layout — the tests therefore pin QUALITY
(accuracy/AUC on held-out separable data) and artifact round-trips,
not coefficient bits; the oracle gate does not apply to iterative ML
training (SURVEY §2.11 documented divergence, same class as BPE/KMeans).

Reference parity: the reference's quality filter is a static rule list
(``/root/reference/src/core/log_filter.py`` analog, SURVEY §2 F6);
this operator is the learned generalization a training-data pipeline
distills those rules (or an LLM labeler) into.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sherlog_parser_spark.operators.dsir import hashed_grams_expr


class QualityClassifier(NamedTuple):
    """``model``: fitted LogisticRegressionModel; ``n_features``: the
    HashingTF width (needed to rebuild the featurizer at score time)."""

    model: object
    n_features: int


def _featurize(docs: DataFrame, text_col: str, n_features: int) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    grams = docs.withColumn("_grams", hashed_grams_expr(text_col))
    tf = HashingTF(inputCol="_grams", outputCol="_features", numFeatures=int(n_features))
    return tf.transform(grams).drop("_grams")


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_features: int = 1 << 15,
    reg_param: float = 1e-4,
    max_iter: int = 50,
) -> QualityClassifier:
    """Fit the linear classifier on (text, 0/1-label) rows — the
    labeled frame is the SAMPLE the expensive labeler produced, not
    the corpus, so its size is a cost knob, not a scale concern."""
    from pyspark.ml.classification import LogisticRegression

    feat = _featurize(labeled, text_col, n_features)
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        regParam=float(reg_param),
        maxIter=int(max_iter),
        standardization=False,
    )
    return QualityClassifier(model=lr.fit(feat), n_features=int(n_features))


def classifier_scores(
    docs: DataFrame,
    clf: QualityClassifier,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, quality_prob, quality_pred) for every document — one
    narrow map over the corpus (coefficients broadcast in the JVM)."""
    from pyspark.ml.functions import vector_to_array

    feat = _featurize(docs.select(id_col, text_col), text_col, clf.n_features)
    out = clf.model.transform(feat)
    return out.select(
        F.col(id_col),
        F.round(vector_to_array("probability")[1], 6).alias("quality_prob"),
        F.col("prediction").cast("int").alias("quality_pred"),
    )


def save_classifier(clf: QualityClassifier, path: str) -> None:
    """Persist model + featurizer config; any Hadoop-visible path."""
    clf.model.write().overwrite().save(f"{path}/model")
    # n_features rides a sidecar like similarity.write_ivf_index's
    # centroids (underscore name = invisible to parquet readers)
    import json

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path, "_classifier.json")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    out.write(bytearray(json.dumps({"n_features": clf.n_features}).encode()))
    out.close()


def load_classifier(spark, path: str) -> QualityClassifier:
    import json

    from pyspark.ml.classification import LogisticRegressionModel

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path, "_classifier.json")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(p)
    reader = jvm.java.io.BufferedReader(jvm.java.io.InputStreamReader(stream, "UTF-8"))
    lines = []
    while True:
        line = reader.readLine()
        if line is None:
            break
        lines.append(line)
    reader.close()
    meta = json.loads("\n".join(lines))
    model = LogisticRegressionModel.load(f"{path}/model")
    return QualityClassifier(model=model, n_features=int(meta["n_features"]))
