"""pyspark.ml integration: Pipeline / CrossValidator / evaluator interop
for the Sgdnet estimators (sgdnet_spark/ml.py).

The wrapper must (a) produce the SAME fits as calling sgdnet() directly,
(b) emit MLlib-shaped output columns that stock evaluators consume, and
(c) survive a CrossValidator grid (param copying, fold fits)."""

import numpy as np
import pytest
from pyspark.ml import Pipeline
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
    RegressionEvaluator,
)
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

from sgdnet_spark.glm import sgdnet
from sgdnet_spark.ml import (
    SgdnetClassificationModel,
    SgdnetClassifier,
    SgdnetRegressionModel,
    SgdnetRegressor,
)


@pytest.fixture(scope="module")
def reg_df(spark):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(400, 3))
    y = 1.0 + x @ np.array([1.0, -0.5, 0.0]) + 0.2 * rng.normal(size=400)
    rows = [(*map(float, xi), float(yi)) for xi, yi in zip(x, y)]
    return spark.createDataFrame(rows, "x0 double, x1 double, x2 double, label double")


@pytest.fixture(scope="module")
def cls_df(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(500, 3))
    eta = x @ np.array([1.5, -1.0, 0.0])
    y = (rng.random(500) < 1.0 / (1.0 + np.exp(-eta))).astype(float)
    rows = [(*map(float, xi), float(yi)) for xi, yi in zip(x, y)]
    return spark.createDataFrame(rows, "x0 double, x1 double, x2 double, label double")


def test_regressor_matches_direct_sgdnet(spark, reg_df):
    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=["x0", "x1", "x2"], outputCol="features"),
        SgdnetRegressor(nlambda=5, lambdaMinRatio=1e-2),
    ])
    model = pipe.fit(reg_df)
    sgd_model = model.stages[-1]
    direct = sgdnet(reg_df, ["x0", "x1", "x2"], "label", family="gaussian",
                    nlambda=5, lambda_min_ratio=1e-2)
    assert np.allclose(sgd_model.fit.beta, direct.beta, atol=1e-10)
    assert np.allclose(sgd_model.fit.lambdas, direct.lambdas)
    out = model.transform(reg_df)
    assert "prediction" in out.columns
    rmse = RegressionEvaluator(metricName="rmse").evaluate(out)
    assert rmse < 0.35  # noise sd 0.2 + lasso bias at lambda_min


def test_regressor_array_features_and_s_interpolation(spark, reg_df):
    import pyspark.sql.functions as F

    arr_df = reg_df.withColumn("features", F.array("x0", "x1", "x2"))
    est = SgdnetRegressor(nlambda=5, lambdaMinRatio=1e-2)
    model = est.fit(arr_df)
    # off-path s: midway between two path points interpolates (not errors)
    mid = float((model.fit.lambdas[1] + model.fit.lambdas[2]) / 2)
    preds = model.copy({model.s: mid}).transform(arr_df)
    assert preds.count() == arr_df.count()


def test_classifier_binomial_evaluators(spark, cls_df):
    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=["x0", "x1", "x2"], outputCol="features"),
        SgdnetClassifier(nlambda=5, lambdaMinRatio=1e-2),
    ])
    model = pipe.fit(cls_df)
    clf = model.stages[-1]
    assert clf.fit.family == "binomial"  # auto-detected from 2 labels
    out = model.transform(cls_df)
    for c in ("prediction", "probability", "rawPrediction"):
        assert c in out.columns
    auc = BinaryClassificationEvaluator().evaluate(out)
    assert auc > 0.8
    acc = MulticlassClassificationEvaluator(metricName="accuracy").evaluate(out)
    assert acc > 0.75
    # prediction agrees with the engine's own class predictions
    eng = clf.fit.predict(
        model.stages[0].transform(cls_df).withColumn(
            "__sgdnet_features",
            __import__("pyspark.ml.functions", fromlist=["vector_to_array"]).vector_to_array("features"),
        ),
        s=float(clf.fit.lambdas[-1]), type="class", prefix="cls")
    got = [r["prediction"] for r in out.select("prediction").collect()]
    want = [float(clf.classes.index(r["cls"])) for r in eng.select("cls").collect()]
    assert got == want


def test_classifier_multinomial(spark):
    rng = np.random.default_rng(13)
    x = rng.normal(size=(450, 3))
    eta = np.stack([x @ np.array([1.0, 0.0, 0.0]),
                    x @ np.array([-0.5, 1.0, 0.0]),
                    np.zeros(len(x))], axis=1)
    yi = eta.argmax(axis=1)
    rows = [(*map(float, xi), f"c{int(c)}") for xi, c in zip(x, yi)]
    df = spark.createDataFrame(rows, "x0 double, x1 double, x2 double, label string")
    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=["x0", "x1", "x2"], outputCol="features"),
        SgdnetClassifier(nlambda=5, lambdaMinRatio=1e-2, typeMultinomial="grouped"),
    ])
    model = pipe.fit(df)
    clf = model.stages[-1]
    assert clf.fit.family == "multinomial" and clf.fit.grouped is True
    out = model.transform(df)
    assert set(r["prediction"] for r in out.select("prediction").distinct().collect()) <= {0.0, 1.0, 2.0}
    # probability vector sums to 1
    row = out.select("probability").first()
    assert abs(sum(row["probability"].toArray()) - 1.0) < 1e-9


def test_cross_validator_grid(spark, cls_df):
    va = VectorAssembler(inputCols=["x0", "x1", "x2"], outputCol="features")
    clf = SgdnetClassifier(nlambda=4, lambdaMinRatio=1e-2)
    pipe = Pipeline(stages=[va, clf])
    grid = (ParamGridBuilder()
            .addGrid(clf.alpha, [0.0, 1.0])
            .build())
    cv = CrossValidator(estimator=pipe, estimatorParamMaps=grid,
                        evaluator=BinaryClassificationEvaluator(),
                        numFolds=2, seed=42)
    cvm = cv.fit(cls_df)
    assert len(cvm.avgMetrics) == 2
    assert max(cvm.avgMetrics) > 0.8


def test_model_persistence_roundtrip(spark, reg_df, tmp_path):
    est = SgdnetRegressor(nlambda=5, lambdaMinRatio=1e-2, featuresCol="features")
    va = VectorAssembler(inputCols=["x0", "x1", "x2"], outputCol="features")
    model = est.fit(va.transform(reg_df))
    path = str(tmp_path / "mlmodel")
    model.save(path)
    back = SgdnetRegressionModel.load(path)
    a = [r["prediction"] for r in model.transform(va.transform(reg_df)).select("prediction").collect()]
    b = [r["prediction"] for r in back.transform(va.transform(reg_df)).select("prediction").collect()]
    assert np.allclose(a, b)


def test_weight_col_threads_through(spark, reg_df):
    import pyspark.sql.functions as F

    wdf = reg_df.withColumn("w", F.lit(1.0) + F.abs(F.col("x0")))
    va = VectorAssembler(inputCols=["x0", "x1", "x2"], outputCol="features")
    est = SgdnetRegressor(nlambda=5, lambdaMinRatio=1e-2, weightCol="w")
    model = est.fit(va.transform(wdf))
    direct = sgdnet(wdf, ["x0", "x1", "x2"], "label", family="gaussian",
                    nlambda=5, lambda_min_ratio=1e-2, weights_col="w")
    assert np.allclose(model.fit.beta, direct.beta, atol=1e-10)


def test_penalty_options_thread_through(spark, reg_df):
    est = SgdnetRegressor(nlambda=5, lambdaMinRatio=1e-2,
                          featuresCol="features",
                          excludeIndices=[2], lowerLimit=0.0)
    dv = VectorAssembler(inputCols=["x0", "x1", "x2"], outputCol="features").transform(reg_df)
    model = est.fit(dv)
    assert np.all(model.fit.beta[2, :] == 0.0)   # excluded
    assert np.all(model.fit.beta >= 0.0)         # nonneg bound
    assert np.all(model.fit.beta[1, :] == 0.0)   # true coef -0.5 -> pinned
    est2 = SgdnetRegressor(nlambda=5, lambdaMinRatio=1e-2,
                           featuresCol="features",
                           penaltyFactor=[0.0, 1.0, 1.0])
    m2 = est2.fit(dv)
    assert abs(m2.fit.beta[0, 0]) > 0.1          # unpenalized at lambda_max


def test_classifier_double_labels_with_dots(spark):
    """MLlib-style double labels (0.0/1.0/2.0) produce per-class
    column names containing dots; transform() must reference them as
    literal names (backticks), not struct-field paths."""
    import numpy as np
    from pyspark.ml.feature import VectorAssembler

    from sgdnet_spark.ml import SgdnetClassifier

    rng = np.random.default_rng(4)
    n = 240
    x = rng.normal(size=(n, 3))
    lab = np.digitize(x @ np.array([1.0, -1.0, 0.5]), [-0.5, 0.5]).astype(float)
    rows = [(float(a), float(b), float(c), float(l)) for (a, b, c), l in zip(x, lab)]
    df = spark.createDataFrame(rows, "x0 double, x1 double, x2 double, label double")
    va = VectorAssembler(inputCols=["x0", "x1", "x2"], outputCol="features")
    model = SgdnetClassifier(featuresCol="features", labelCol="label",
                             family="multinomial", nlambda=4).fit(va.transform(df))
    out = model.transform(va.transform(df)).select("prediction", "probability").collect()
    assert len(out) == n
    assert {r["prediction"] for r in out} <= {0.0, 1.0, 2.0}


def test_fit_multiple_shares_path_over_s_grid(spark):
    """A grid over s alone fits ONE path (the documented glmnet trick):
    fitMultiple yields per-s models that all share the same fit object,
    and their predictions equal individually-fitted models'."""
    import numpy as np

    from sgdnet_spark.ml import SgdnetRegressor

    rng = np.random.default_rng(6)
    n = 200
    x = rng.normal(size=(n, 3))
    y = 1.0 + x @ np.array([2.0, -1.0, 0.0]) + rng.normal(scale=0.3, size=n)
    rows = [([float(a) for a in xi], float(yi)) for xi, yi in zip(x, y)]
    df = spark.createDataFrame(rows, "features array<double>, label double")
    est = SgdnetRegressor(featuresCol="features", labelCol="label", nlambda=8)
    grid = [{est.s: 0.1}, {est.s: 0.01}, {est.s: 0.001}]
    models = dict(est.fitMultiple(df, grid))
    assert len(models) == 3
    # shared path: every model holds the SAME fit object
    assert models[0].fit is models[1].fit is models[2].fit
    # each model predicts at its own s, equal to a fresh single fit
    for i, s in enumerate([0.1, 0.01, 0.001]):
        single = est.copy({est.s: s}).fit(df)
        a = models[i].transform(df).select("prediction").toPandas()
        b = single.transform(df).select("prediction").toPandas()
        assert np.allclose(a["prediction"], b["prediction"])
    # heterogeneous grid falls back to per-map fits (different alphas)
    grid2 = [{est.alpha: 1.0}, {est.alpha: 0.0}]
    models2 = dict(est.fitMultiple(df, grid2))
    assert models2[0].fit is not models2[1].fit
