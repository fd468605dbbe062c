"""Model-based quality scoring: a distributed text classifier over the
engine's own feature plumbing — the FineWeb-Edu/DCLM-style stage where
heuristic rules (Gopher, E58) stop and a learned scorer takes over.

Shape, end to end distributed:

* features — normalized whitespace tokens → ``HashingTF`` (fixed-width
  feature space, no vocabulary state to ship) → ``IDF`` (one
  combinable doc-frequency pass);
* training — MLlib ``LogisticRegression`` (L-BFGS over partition-local
  gradient aggregates; driver holds only the coefficient vector);
* scoring — a pure map-side ``PipelineModel.transform`` (broadcast
  coefficients), i.e. the same cost class as the heuristic rules.

Labels come from wherever the pipeline gets them — human ratings, an
LLM judge, or the built-in weak-label bootstrap
(:func:`weak_labels_from_gopher`) that distills the Gopher rule set
into a smooth score (useful because the learned scorer RANKS docs the
binary rules can only pass/fail).

Determinism: HashingTF is a fixed hash, IDF and LR are deterministic
given the data (LR init is zeros); training twice on the same corpus
yields the same model. No SQL oracle exists for a trained model —
correctness is pytest-gated (separation on planted docs, determinism,
agreement with the teacher rules on clear cases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _feature_stages(text_col: str, num_features: int):
    from pyspark.ml.feature import HashingTF, IDF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__words", pattern=r"\s+",
        toLowercase=True, minTokenLength=1,
    )
    tf = HashingTF(
        inputCol="__words", outputCol="__tf", numFeatures=num_features
    )
    idf = IDF(inputCol="__tf", outputCol="__features")
    return [tok, tf, idf]


def weak_labels_from_gopher(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
) -> DataFrame:
    """Bootstrap training labels from the Gopher rule set: 1.0 for docs
    passing every rule, 0.0 otherwise (the standard weak-supervision
    distillation when no human labels exist). Returns ``df`` +
    ``label_col``; rule columns are dropped."""
    from mysql_syncer_spark.operators.text import with_gopher_rules

    flagged = with_gopher_rules(df, text_col)
    rule_cols = [c for c in flagged.columns if c.startswith("rule_")]
    return flagged.withColumn(
        label_col, F.col("gopher_keep").cast("double")
    ).drop("gopher_keep", *rule_cols)


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 16,
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Fit the tokenize→TF→IDF→LogisticRegression pipeline; returns the
    ``PipelineModel`` (save/load with its own ``.save(path)`` /
    ``PipelineModel.load`` — the persisted form is the deployable
    scorer). NULL text is treated as empty (scores low)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    lr = LogisticRegression(
        featuresCol="__features", labelCol=label_col,
        regParam=reg_param, maxIter=max_iter,
    )
    data = labeled.withColumn(
        text_col, F.coalesce(F.col(text_col), F.lit(""))
    )
    return Pipeline(
        stages=[*_feature_stages(text_col, num_features), lr]
    ).fit(data)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    score_col: str = "quality_score",
) -> DataFrame:
    """Add ``score_col`` = P(label=1 | text) in [0, 1], rounded to 6 dp
    — map-side transform, broadcast coefficients, no shuffle. Input
    columns pass through; feature temporaries are dropped."""
    from pyspark.ml.functions import vector_to_array

    data = df.withColumn(
        text_col, F.coalesce(F.col(text_col), F.lit(""))
    )
    scored = model.transform(data)
    return scored.withColumn(
        score_col,
        F.round(vector_to_array("probability").getItem(1), 6),
    ).drop("__words", "__tf", "__features", "rawPrediction",
           "probability", "prediction")
