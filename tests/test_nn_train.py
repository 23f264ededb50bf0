"""Distributed NN trainer (ml/nn.py) — activation parity + convergence.

Mirrors the reference's unit-golden style (SURVEY §5): activation formulas
are checked point-wise against the Java definitions
(ActivationPTANH.java:52-81, ActivationSwish.java:51-74,
ActivationLeakyReLU.java:61-110), gradients against numerical
differentiation, and training end-to-end on a non-linearly-separable
fixture that LR cannot fit.
"""

import math

import numpy as np
import pytest

from shifu_spark.ml.nn import (
    ACTIVATIONS,
    _backprop,
    _shapes,
    _unflatten,
    nn_score_udf,
    train_nn,
)


def test_activation_formulas_match_reference():
    z = np.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    cases = {
        "PTANH": [0.25 * math.tanh(v) if v <= 0 else math.tanh(v) for v in z],
        "SWISH": [v / (1 + math.exp(-v)) for v in z],
        "LEAKY_RELU": [0.01 * v if v <= 0 else v for v in z],
        "RELU": [max(v, 0.0) for v in z],
        "SIGMOID": [1 / (1 + math.exp(-v)) for v in z],
        "TANH": [math.tanh(v) for v in z],
        "LINEAR": list(z),
    }
    for name, expected in cases.items():
        fwd, _ = ACTIVATIONS[name]
        np.testing.assert_allclose(fwd(z), expected, rtol=1e-12, err_msg=name)


@pytest.mark.parametrize("act", ["SIGMOID", "TANH", "RELU", "LEAKY_RELU", "PTANH", "SWISH"])
def test_activation_derivative_numeric(act):
    fwd, bwd = ACTIVATIONS[act]
    # avoid the kink points of the piecewise activations
    z = np.array([-2.1, -0.7, 0.3, 1.7])
    h = 1e-7
    num = (fwd(z + h) - fwd(z - h)) / (2 * h)
    np.testing.assert_allclose(bwd(z, fwd(z)), num, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("act", ["SIGMOID", "TANH", "PTANH", "SWISH", "LEAKY_RELU"])
def test_backprop_gradient_numeric(act):
    """Numerical gradient check of the full backprop, per activation."""
    rng = np.random.default_rng(7)
    layers = [3, 4, 1]
    acts = [act, "SIGMOID"]
    n_w = sum(r * c for r, c in _shapes(layers))
    w = rng.normal(0, 0.5, n_w)
    x = rng.normal(0, 1, (12, 3))
    y = (rng.random(12) > 0.5).astype(float)

    grads, _ = _backprop(x, y, _unflatten(w, layers), acts)
    flat = np.concatenate([g.ravel() for g in grads])

    h = 1e-6
    for k in range(0, n_w, 5):  # spot-check every 5th weight
        wp, wm = w.copy(), w.copy()
        wp[k] += h
        wm[k] -= h
        _, lp = _backprop(x, y, _unflatten(wp, layers), acts)
        _, lm = _backprop(x, y, _unflatten(wm, layers), acts)
        num = (lp - lm) / (2 * h)
        assert abs(flat[k] - num) < 1e-4 * max(1.0, abs(num)), (act, k)


def _xor_df(spark, n=400):
    """Non-linearly-separable fixture: label = xor(x1>0, x2>0)."""
    rng = np.random.default_rng(11)
    x1, x2 = rng.normal(0, 1, n), rng.normal(0, 1, n)
    y = ((x1 > 0) ^ (x2 > 0)).astype(float)
    return spark.createDataFrame(
        [(float(a), float(b), float(t)) for a, b, t in zip(x1, x2, y)],
        "x1 double, x2 double, label double",
    )


def test_train_nn_learns_xor(spark):
    df = _xor_df(spark)
    res = train_nn(
        df,
        ["x1", "x2"],
        hidden_layers=[8],
        hidden_activation="TANH",
        optimizer="ADAM",
        learning_rate=0.1,
        max_epochs=40,
        seed=3,
    )
    assert res.epochs_run == 40
    assert res.train_losses[-1] < 0.45  # LR plateaus at ~0.693 on xor
    assert res.train_losses[-1] < res.train_losses[0]

    scored = df.withColumn("p", nn_score_udf(["x1", "x2"], res))
    from pyspark.sql import functions as F

    acc = scored.select(
        F.avg(((F.col("p") > 0.5).cast("double") == F.col("label")).cast("double")).alias("acc")
    ).first()["acc"]
    assert acc > 0.8


def test_train_nn_dropout_and_fixed_layers(spark):
    df = _xor_df(spark, n=200)
    res = train_nn(
        df,
        ["x1", "x2"],
        hidden_layers=[6],
        hidden_activation="SWISH",
        dropout_rate=0.2,
        max_epochs=5,
        seed=5,
    )
    assert res.epochs_run == 5 and all(np.isfinite(res.train_losses))

    # frozen first layer: its weights must not move
    res2 = train_nn(
        df,
        ["x1", "x2"],
        hidden_layers=[6],
        hidden_activation="RELU",
        fixed_layers=[0],
        max_epochs=3,
        seed=5,
    )
    w = np.asarray(res2.weights)
    rng = np.random.default_rng(5)
    init = np.concatenate(
        [(rng.random(r * c) * 2.0 - 1.0) / np.sqrt(r) for r, c in _shapes(res2.layers)]
    )
    first = 3 * 6  # (2+1) x 6 layer-0 block
    np.testing.assert_allclose(w[:first], init[:first])
    assert not np.allclose(w[first:], init[first:])


def test_train_nn_early_stop(spark):
    from shifu_spark.ml.sgd import ConvergeEarlyStop

    df = _xor_df(spark, n=100)
    res = train_nn(
        df,
        ["x1", "x2"],
        hidden_layers=[4],
        max_epochs=50,
        learning_rate=1e-6,  # loss barely moves -> converge-stop fires
        early_stop=ConvergeEarlyStop(threshold=1e-4),
        seed=1,
    )
    assert res.stopped_early and res.epochs_run < 50


def test_bagged_nn_ensemble(spark):
    from shifu_spark.ml.nn import score_nn_ensemble, train_nn_bagged

    df = _xor_df(spark, n=150)
    results = train_nn_bagged(
        df, ["x1", "x2"], bags=3, bag_fraction=0.7,
        hidden_layers=[4], hidden_activation="TANH", max_epochs=3, seed=2,
    )
    assert len(results) == 3
    # bags see different resamples -> different weights
    assert results[0].weights != results[1].weights

    scored = score_nn_ensemble(df, ["x1", "x2"], results, keep_cols=["label"])
    assert scored.columns == ["label", "mean", "max", "min", "median", "model0", "model1", "model2"]
    row = scored.first()
    assert row["min"] <= row["median"] <= row["max"]
    assert abs(row["mean"] - (row["model0"] + row["model1"] + row["model2"]) / 3) < 1e-12


def test_train_nn_epoch_sample_rate(spark):
    df = _xor_df(spark, n=300)
    res = train_nn(
        df, ["x1", "x2"], hidden_layers=[6], hidden_activation="TANH",
        learning_rate=0.1, max_epochs=15, epoch_sample_rate=0.5, seed=8,
    )
    assert res.epochs_run == 15 and all(np.isfinite(res.train_losses))
    assert res.train_losses[-1] < res.train_losses[0]  # still learns


def test_empty_epoch_skips_step_and_early_stop(spark):
    """ADVICE r8: a Spark-side epoch subsample can legitimately draw ZERO
    rows from a small frame. The fold must surface the true n=0 (not a
    sentinel mean loss of 0.0) and the trainer must skip the optimizer
    step / loss append / early-stop watch — under the old sentinel, a
    0.0 loss read as perfect convergence and ConvergeEarlyStop tripped
    on the second empty epoch."""
    from shifu_spark.ml.sgd import ConvergeEarlyStop

    df = _xor_df(spark, n=30)
    res = train_nn(
        df, ["x1", "x2"], hidden_layers=[4], max_epochs=6,
        epoch_sample_rate=1e-9,  # every epoch draws zero rows (p ≈ 3e-8)
        early_stop=ConvergeEarlyStop(threshold=1e-6), seed=3,
    )
    assert res.epochs_run == 6  # ran to completion — no false convergence
    assert res.stopped_early is False
    assert res.train_losses == []  # no sentinel 0.0 losses recorded
    assert all(np.isfinite(res.weights))
