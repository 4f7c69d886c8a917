"""Trade scoring & ML layer — Spark re-expression of
``backtesting/join_fundamentals_to_trades.py`` (J6 point-in-time
enrichment), ``backtesting/trade_success_predictor.py`` (U7
training, F7/F12 feature prep), and
``trading_bot/daily_signal_scorer.py`` (U6 scoring funnel).

Model divergence (documented): the reference trains XGBoost
(200 trees, depth 6); xgboost isn't available here, so the trainer
is MLlib ``GBTClassifier`` with the equivalent capacity knobs behind
the same prepare→train→score API. Training sets are thousands of
rows (driver-side in the reference too), so either engine is
interchangeable at this stage of the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.asof import asof_join

PUBLICATION_LAG_DAYS = 45   # join_fundamentals_to_trades.py:174-182
VALIDITY_DAYS = 90


def join_fundamentals_to_trades(trades: DataFrame, scores: DataFrame) -> DataFrame:
    """Point-in-time enrichment: latest fundamental whose
    publication window covers the trade entry (J6). Trades without
    a valid fundamental are preserved with NULL scores
    (`:232-247`); the `publication_date <= entry_date` invariant is
    structural (`:264-267`)."""
    s = scores.select(
        F.col("symbol_id").alias("f_symbol_id"),
        F.col("fiscal_date_ending").alias("f_fiscal_date_ending"),
        F.date_add(F.col("fiscal_date_ending"), PUBLICATION_LAG_DAYS).alias("publication_date"),
        F.date_add(
            F.col("fiscal_date_ending"), PUBLICATION_LAG_DAYS + VALIDITY_DAYS
        ).alias("valid_until_date"),
        *[c for c in scores.columns if c.endswith("_quality_score")],
    )
    validity = F.col("entry_date") <= F.col("valid_until_date")
    return asof_join(
        trades,
        s,
        on=[],
        left_time="entry_date",
        right_time="publication_date",
        left_key="trade_id",
        validity=validity & (trades["symbol_id"] == s["f_symbol_id"]),
        tiebreak=[F.col("f_fiscal_date_ending").desc()],
        how="left",
    ).drop("f_symbol_id")


def prepare_features(
    df: DataFrame,
    numeric_cols: list[str],
    sector_col: str = "sector",
    sectors: list[str] | None = None,
) -> DataFrame:
    """F7 median fill + F12 one-hot with stable column order
    (trade_success_predictor.py:170-190). Medians are exact
    (percentile 0.5) computed over the batch — one broadcast scalar
    row; sectors one-hot as explicit columns so the feature layout
    is deterministic for model parity.

    Pass ``sectors`` (the TRAINING-time vocabulary) when preparing a
    scoring batch: deriving it from the current batch would emit a
    different column set whenever a sector is absent that day, and
    ``model.transform`` would fail on the missing feature column.
    NaN is normalized to NULL before the fill — parquet/pandas
    round-trips deliver NaN, and ``coalesce`` alone would pass it
    straight into the feature vector (NaN is non-null in Spark).

    With a pinned vocabulary, a sector UNSEEN at training time folds
    into ``sector_UNKNOWN`` rather than encoding as all-zeros: a
    NULL-only UNKNOWN would leave novel sectors in a silent third
    state (all dummies 0) the model never observed."""
    med = df.agg(
        *[F.expr(f"percentile({c}, 0.5)").alias(f"__med_{c}") for c in numeric_cols]
    )
    out = df.crossJoin(F.broadcast(med))
    for c in numeric_cols:
        out = out.withColumn(
            c,
            F.coalesce(
                F.nanvl(F.col(c), F.lit(None).cast("double")),
                F.col(f"__med_{c}"),
                F.lit(0.0),
            ),
        )
    out = out.drop(*[f"__med_{c}" for c in numeric_cols])
    if sectors is None:
        sectors = sorted(
            r[0] for r in df.select(sector_col).distinct().collect() if r[0] is not None
        )
    sec = F.when(F.col(sector_col).isin(list(sectors)), F.col(sector_col)).otherwise(
        F.lit("UNKNOWN")
    )
    for s_name in [*sectors, "UNKNOWN"]:
        out = out.withColumn(
            f"sector_{s_name}", (sec == s_name).cast("int")
        )
    return out


def make_classifier(label_col: str = "label"):
    """Capability-probed trainer seam (U7): when ``xgboost.spark``
    is importable the estimator is SparkXGBClassifier with the
    REFERENCE's exact knobs (200 trees, depth 6, eta 0.1, subsample
    0.8 — trade_success_predictor.py:203-219), closing the
    documented GBT divergence automatically in richer environments;
    otherwise MLlib GBTClassifier with the equivalent capacity.
    Returns (estimator, kind) where kind ∈ {'xgboost', 'gbt'} —
    both expose the MLlib estimator API and emit a ``probability``
    vector column, so the rest of the funnel is branch-agnostic."""
    try:
        from xgboost.spark import SparkXGBClassifier  # type: ignore
    except ImportError:
        pass
    else:
        return (
            SparkXGBClassifier(
                features_col="features",
                label_col=label_col,
                n_estimators=200,
                max_depth=6,
                learning_rate=0.1,
                subsample=0.8,
                random_state=42,
            ),
            "xgboost",
        )
    from pyspark.ml.classification import GBTClassifier

    return (
        GBTClassifier(
            labelCol=label_col,
            featuresCol="features",
            maxIter=40,       # capacity analog of the reference's 200 shallow trees
            maxDepth=6,
            stepSize=0.1,
            subsamplingRate=0.8,
            seed=42,
        ),
        "gbt",
    )


def train_success_model(train: DataFrame, feature_cols: list[str], label_col: str = "label"):
    """U7: gradient-boosted trees on the prepared feature frame —
    XGBoost when installable (see make_classifier), MLlib GBT
    otherwise. Returns a fitted PipelineModel exposing probability
    scoring."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features", handleInvalid="keep")
    clf, _ = make_classifier(label_col)
    return Pipeline(stages=[assembler, clf]).fit(train)


def score_candidates(model, candidates: DataFrame) -> DataFrame:
    """U6: probability scoring via the fitted pipeline."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(candidates)
    return scored.withColumn(
        "success_probability", vector_to_array(F.col("probability"))[1]
    ).drop("features", "rawPrediction", "probability", "prediction")


def composite_rank(
    scored: DataFrame,
    prob_threshold: float = 0.85,
    quality_threshold: float = 50.0,
    top_k: int = 25,
) -> DataFrame:
    """The scoring funnel (trading_bot/daily_signal_scorer.py:
    237-274): quality ≥ 50 → probability ≥ 0.85 → composite =
    0.6·prob + 0.2·strength/100 + 0.2·quality/100 → top-k."""
    composite = (
        F.lit(0.6) * F.col("success_probability")
        + F.lit(0.2) * F.col("signal_strength") / 100.0
        + F.lit(0.2) * F.col("overall_quality_score") / 100.0
    )
    return (
        scored.filter(F.col("overall_quality_score") >= quality_threshold)
        .filter(F.col("success_probability") >= prob_threshold)
        .withColumn("composite_score", composite)
        .orderBy(F.desc("composite_score"), "symbol_id")
        .limit(top_k)
    )
