"""Wide & Deep (ml/wdl.py) — forward semantics, gradients, training.

Mirrors the reference's unit-golden style (SURVEY §5): the forward combine
is checked against a hand-computed closed form of WideAndDeep.java:163-202
(p = sigmoid(wide_logit + deep_logit)), the full flat gradient against
numerical differentiation (including the embedding scatter-add rows), and
training end-to-end on a fixture where the signal lives PARTLY in the
sparse field — a model that ignored the wide/embedding half could not fit
it.
"""

import numpy as np
import pytest

from shifu_spark.ml.wdl import (
    WDLModel,
    _n_weights,
    _unflatten_wdl,
    _wdl_backprop,
    _wdl_forward,
    score_wdl_ensemble,
    train_wdl,
    train_wdl_bagged,
    wdl_score_udf,
)


def _tiny():
    """(w, n_dense, cards, embed_dim, deep_layers, deep_acts) fixture."""
    n_dense, cards, embed_dim = 2, [3], 2
    deep_layers = [2 + 2, 2, 1]
    deep_acts = ["SIGMOID", "LINEAR"]
    w = np.array(
        [
            0.3, -0.2, 0.1,        # wide field weights
            0.5, -0.4,             # wide dense
            0.05,                  # wide bias
            0.2, -0.1,             # embed row 0
            -0.3, 0.4,             # embed row 1
            0.1, 0.25,             # embed row 2
            0.6, -0.5, 0.8, 0.3,   # deep L1: x1,x2 rows
            -0.7, 0.9, 0.4, -0.6,  # deep L1: e1,e2 rows
            0.1, -0.1,             # deep L1 bias
            1.2, -0.9, 0.15,       # deep L2 + bias
        ]
    )
    assert len(w) == _n_weights(n_dense, cards, embed_dim, deep_layers)
    return w, n_dense, cards, embed_dim, deep_layers, deep_acts


def _sig(z):
    return 1.0 / (1.0 + np.exp(-z))


def test_forward_matches_hand_closed_form():
    w, n_dense, cards, embed_dim, deep_layers, deep_acts = _tiny()
    xd = np.array([[0.4, 0.7], [0.9, 0.1]])
    xs = np.array([[1], [2]])
    p, _ = _wdl_forward(xd, xs, w, n_dense, cards, embed_dim, deep_layers, deep_acts)
    wf = {0: 0.3, 1: -0.2, 2: 0.1}
    emb = {0: (0.2, -0.1), 1: (-0.3, 0.4), 2: (0.1, 0.25)}
    for i, (x1, x2, c) in enumerate([(0.4, 0.7, 1), (0.9, 0.1, 2)]):
        e1, e2 = emb[c]
        wide = 0.5 * x1 - 0.4 * x2 + 0.05 + wf[c]
        h1 = _sig(0.6 * x1 + 0.8 * x2 - 0.7 * e1 + 0.4 * e2 + 0.1)
        h2 = _sig(-0.5 * x1 + 0.3 * x2 + 0.9 * e1 - 0.6 * e2 - 0.1)
        deep = 1.2 * h1 - 0.9 * h2 + 0.15
        np.testing.assert_allclose(p[i], _sig(wide + deep), rtol=1e-12)


def test_gradient_matches_numerical():
    rng = np.random.default_rng(7)
    n_dense, cards, embed_dim = 2, [3, 4], 2
    deep_layers = [2 + 4, 3, 1]
    deep_acts = ["RELU", "LINEAR"]
    w = rng.normal(0, 0.5, _n_weights(n_dense, cards, embed_dim, deep_layers))
    n = 9
    xd = rng.normal(0, 1, (n, n_dense))
    xs = np.column_stack([rng.integers(0, c, n) for c in cards])
    y = rng.integers(0, 2, n).astype(float)
    g, _ = _wdl_backprop(xd, xs, y, w, n_dense, cards, embed_dim, deep_layers, deep_acts)

    def loss_at(wv):
        p, _ = _wdl_forward(xd, xs, wv, n_dense, cards, embed_dim, deep_layers, deep_acts)
        eps = 1e-12
        return float(-(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum())

    h = 1e-6
    num = np.empty_like(w)
    for i in range(len(w)):
        wp, wm = w.copy(), w.copy()
        wp[i] += h
        wm[i] -= h
        num[i] = (loss_at(wp) - loss_at(wm)) / (2 * h)
    np.testing.assert_allclose(g, num, rtol=1e-5, atol=1e-7)


def test_embedding_gradient_accumulates_per_category():
    """Two rows sharing a category must ADD their deltas into the same
    embedding row (np.add.at, not fancy-index assignment which silently
    keeps only the last write)."""
    w, n_dense, cards, embed_dim, deep_layers, deep_acts = _tiny()
    xd = np.array([[0.4, 0.7], [0.4, 0.7]])
    xs = np.array([[1], [1]])  # same category twice
    y = np.array([1.0, 1.0])
    g2, _ = _wdl_backprop(xd, xs, y, w, n_dense, cards, embed_dim, deep_layers, deep_acts)
    g1, _ = _wdl_backprop(
        xd[:1], xs[:1], y[:1], w, n_dense, cards, embed_dim, deep_layers, deep_acts
    )
    np.testing.assert_allclose(g2, 2.0 * g1, rtol=1e-12)


def test_out_of_range_category_raises():
    w, n_dense, cards, embed_dim, deep_layers, deep_acts = _tiny()
    xd = np.zeros((1, 2))
    for bad in (-1, 3):
        with pytest.raises(ValueError, match="outside"):
            _wdl_forward(
                xd, np.array([[bad]]), w, n_dense, cards, embed_dim,
                deep_layers, deep_acts,
            )


def test_unflatten_roundtrip_layout():
    w, n_dense, cards, embed_dim, deep_layers, _ = _tiny()
    wide_fields, wide_dense, wide_bias, embeds, mats = _unflatten_wdl(
        np.asarray(w), n_dense, cards, embed_dim, deep_layers
    )
    np.testing.assert_array_equal(wide_fields[0], [0.3, -0.2, 0.1])
    np.testing.assert_array_equal(wide_dense, [0.5, -0.4])
    assert wide_bias == 0.05
    np.testing.assert_array_equal(embeds[0][1], [-0.3, 0.4])
    assert mats[0].shape == (5, 2) and mats[1].shape == (3, 1)
    flat_again = np.concatenate(
        [a.ravel() for a in wide_fields]
        + [wide_dense, np.asarray([wide_bias])]
        + [e.ravel() for e in embeds]
        + [m.ravel() for m in mats]
    )
    np.testing.assert_array_equal(flat_again, w)


@pytest.fixture(scope="module")
def wdl_fixture_df(spark):
    """Signal partly in the SPARSE field: label = 1 when (cat is 0 or 2)
    XOR-ish with x1 — dense-only or wide-only models plateau, the full
    wide+embedding model separates it."""
    rows = []
    rng = np.random.default_rng(3)
    for i in range(600):
        x1 = float(rng.random())
        cat = int(rng.integers(0, 3))
        label = 1.0 if (cat == 1) == (x1 > 0.5) else 0.0
        rows.append((x1, float(rng.random()), cat, label))
    return spark.createDataFrame(rows, "x1 double, x2 double, cat int, label double")


def test_train_wdl_learns_sparse_dense_interaction(spark, wdl_fixture_df):
    model = train_wdl(
        wdl_fixture_df, ["x1", "x2"], ["cat"], [3], embed_dim=2,
        hidden_layers=[6], hidden_activation="RELU", optimizer="ADAM",
        learning_rate=0.2, max_epochs=25, seed=11,
    )
    assert model.epochs_run == 25
    assert model.train_losses[-1] < model.train_losses[0]
    scored = wdl_fixture_df.withColumn("p", wdl_score_udf(model))
    rows = scored.select("p", "label").collect()
    acc = np.mean([(r["p"] > 0.5) == (r["label"] == 1.0) for r in rows])
    # the planted rule needs the category x dense interaction; 0.9 is far
    # above the ~0.56 a dense-only linear model reaches on this fixture
    assert acc > 0.9, acc


def test_train_wdl_minibatch_learns(spark, wdl_fixture_df):
    """epoch_sample_rate < 1 = the reference's mini-batch regime
    (WDLWorker per-superstep subsamples): stochastic epochs must still
    learn the planted sparse x dense interaction, and the subsampling
    must actually bite (per-epoch n < full row count is implied by the
    lower per-epoch loss magnitudes; we check accuracy end-to-end)."""
    model = train_wdl(
        wdl_fixture_df, ["x1", "x2"], ["cat"], [3], embed_dim=2,
        hidden_layers=[6], hidden_activation="RELU", optimizer="ADAM",
        learning_rate=0.2, max_epochs=25, epoch_sample_rate=0.5, seed=11,
    )
    assert model.epochs_run == 25
    assert model.train_losses[-1] < model.train_losses[0]
    scored = wdl_fixture_df.withColumn("p", wdl_score_udf(model))
    rows = scored.select("p", "label").collect()
    acc = np.mean([(r["p"] > 0.5) == (r["label"] == 1.0) for r in rows])
    assert acc > 0.85, acc


def test_wdl_ensemble_composes_with_bagging(spark, wdl_fixture_df):
    """W&D inside the combo/eval family: train_wdl_bagged fits one model
    per seeded resample and score_wdl_ensemble routes the per-model
    scores through the SAME with_ensemble_stats aggregation NN/LR/RF
    use (core/Scorer.java treats all families uniformly) — so
    mean/max/min/median must equal the hand-computed stats of the
    per-model columns, row for row."""
    models = train_wdl_bagged(
        wdl_fixture_df, ["x1", "x2"], ["cat"], [3], bags=3, bag_fraction=0.7,
        embed_dim=2, hidden_layers=[4], hidden_activation="RELU",
        optimizer="ADAM", learning_rate=0.2, max_epochs=6, seed=7,
    )
    assert len(models) == 3 and all(m.epochs_run == 6 for m in models)
    out = score_wdl_ensemble(
        wdl_fixture_df.limit(50), models, keep_cols=["x1", "label"]
    ).collect()
    assert len(out) == 50
    for r in out:
        scores = sorted([r["model0"], r["model1"], r["model2"]])
        assert r["mean"] == pytest.approx(sum(scores) / 3)
        assert r["max"] == pytest.approx(scores[-1])
        assert r["min"] == pytest.approx(scores[0])
        assert r["median"] == pytest.approx(scores[1])
        assert 0.0 <= r["min"] <= r["median"] <= r["max"] <= 1.0


def test_score_udf_matches_local_forward(spark, wdl_fixture_df):
    w, n_dense, cards, embed_dim, deep_layers, deep_acts = _tiny()
    model = WDLModel(
        dense_cols=["x1", "x2"], sparse_cols=["cat"], cardinalities=cards,
        embed_dim=embed_dim, hidden_layers=[2], hidden_activation="SIGMOID",
        weights=list(w),
    )
    pdf = wdl_fixture_df.limit(50).withColumn("p", wdl_score_udf(model)).toPandas()
    p_local, _ = _wdl_forward(
        pdf[["x1", "x2"]].to_numpy(dtype=np.float64),
        pdf[["cat"]].to_numpy(dtype=np.int64),
        w, n_dense, cards, embed_dim, deep_layers, deep_acts,
    )
    np.testing.assert_allclose(pdf["p"].to_numpy(), p_local, rtol=1e-12)


# ---------------------------------------------------------------------------
# Property: the analytic gradient matches numerical differentiation for
# ARBITRARY architectures (depths, widths, cardinalities, activations),
# not just the fixed fixtures above — the same differential-fuzz posture
# as the JEXL/NSColumn property tests.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _wdl_shapes(draw):
    n_dense = draw(st.integers(1, 3))
    cards = draw(st.lists(st.integers(2, 5), min_size=1, max_size=3))
    embed_dim = draw(st.integers(1, 3))
    hidden = draw(st.lists(st.integers(1, 4), min_size=1, max_size=2))
    act = draw(st.sampled_from(["SIGMOID", "TANH", "RELU", "SWISH"]))
    seed = draw(st.integers(0, 2**31 - 1))
    return n_dense, cards, embed_dim, hidden, act, seed


@given(_wdl_shapes())
@settings(max_examples=40, deadline=None)
def test_gradient_matches_numerical_any_architecture(shape):
    n_dense, cards, embed_dim, hidden, act, seed = shape
    rng = np.random.default_rng(seed)
    deep_layers = [n_dense + len(cards) * embed_dim, *hidden, 1]
    deep_acts = [act] * len(hidden) + ["LINEAR"]
    w = rng.normal(0, 0.4, _n_weights(n_dense, cards, embed_dim, deep_layers))
    n = 6
    xd = rng.normal(0, 1, (n, n_dense))
    xs = np.column_stack([rng.integers(0, c, n) for c in cards])
    y = rng.integers(0, 2, n).astype(float)
    g, _ = _wdl_backprop(xd, xs, y, w, n_dense, cards, embed_dim, deep_layers, deep_acts)
    # spot-check a deterministic slice of coordinates (full sweep x 40
    # examples would be slow); always cover the first wide weight, the
    # bias, one embedding cell and one deep cell
    idx = sorted({0, sum(cards) + n_dense, len(w) - 1,
                  sum(cards) + n_dense + 1 + (len(w) // 3),
                  (2 * len(w)) // 3})
    h = 1e-6

    def loss_at(wv):
        p, _ = _wdl_forward(xd, xs, wv, n_dense, cards, embed_dim, deep_layers, deep_acts)
        eps = 1e-12
        return float(-(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum())

    for i in idx:
        wp, wm = w.copy(), w.copy()
        wp[i] += h
        wm[i] -= h
        num = (loss_at(wp) - loss_at(wm)) / (2 * h)
        # RELU kinks can put a coordinate exactly on the non-differentiable
        # boundary for SOME example; tolerate by absolute-and-relative band
        assert abs(num - g[i]) < 1e-4 + 1e-4 * abs(num), (i, num, g[i])


@given(_wdl_shapes())
@settings(max_examples=40, deadline=None)
def test_forward_matches_per_row_loop_any_architecture(shape):
    """Differential fuzz of the FORWARD pass: the vectorized
    _unflatten_wdl/_wdl_forward must equal an independent per-row pure
    loop that walks the flat weight layout by hand — a layout offset
    bug that the fixed _tiny() fixture happens to satisfy cannot
    survive arbitrary (n_dense, cards, embed_dim, hidden) draws."""
    n_dense, cards, embed_dim, hidden, act, seed = shape
    rng = np.random.default_rng(seed)
    deep_layers = [n_dense + len(cards) * embed_dim, *hidden, 1]
    deep_acts = [act] * len(hidden) + ["LINEAR"]
    w = rng.normal(0, 0.4, _n_weights(n_dense, cards, embed_dim, deep_layers))
    n = 5
    xd = rng.normal(0, 1, (n, n_dense))
    xs = np.column_stack([rng.integers(0, c, n) for c in cards])
    p, _ = _wdl_forward(xd, xs, w, n_dense, cards, embed_dim, deep_layers, deep_acts)

    from shifu_spark.ml.nn import ACTIVATIONS

    for r in range(n):
        off = 0
        wide = 0.0
        for f, c in enumerate(cards):  # wide field lookups
            wide += w[off + int(xs[r, f])]
            off += c
        for j in range(n_dense):  # wide dense
            wide += w[off + j] * xd[r, j]
        off += n_dense
        wide += w[off]  # wide bias
        off += 1
        deep_in = list(xd[r])
        for f, c in enumerate(cards):  # embedding rows, concat order
            row0 = off + int(xs[r, f]) * embed_dim
            deep_in.extend(w[row0:row0 + embed_dim])
            off += c * embed_dim
        a = np.asarray(deep_in)
        for li in range(len(deep_layers) - 1):  # deep MLP, (fan_in+1, out)
            fan_in, fan_out = deep_layers[li], deep_layers[li + 1]
            mat = w[off:off + (fan_in + 1) * fan_out].reshape(fan_in + 1, fan_out)
            z = a @ mat[:-1] + mat[-1]
            a = ACTIVATIONS[deep_acts[li]][0](z)
            off += (fan_in + 1) * fan_out
        assert off == len(w)
        want = 1.0 / (1.0 + np.exp(-(wide + a[0])))
        np.testing.assert_allclose(p[r], want, rtol=1e-10, atol=1e-12)


def test_sparse_only_model_trains_and_scores(spark):
    """A wide+embeddings-only model (no dense columns) is legitimate —
    the wide half alone is sparse LR.  Scoring previously crashed on
    np.column_stack([]) for the empty dense side."""
    rows = [(int(i % 3), 1.0 if i % 3 == 1 else 0.0) for i in range(300)]
    df = spark.createDataFrame(rows, "cat int, label double")
    model = train_wdl(
        df, [], ["cat"], [3], embed_dim=2, hidden_layers=[2],
        hidden_activation="SIGMOID", optimizer="ADAM", learning_rate=0.3,
        max_epochs=15, seed=5,
    )
    scored = df.withColumn("p", wdl_score_udf(model)).collect()
    acc = np.mean([(r["p"] > 0.5) == (r["label"] == 1.0) for r in scored])
    assert acc > 0.95, acc


def test_no_feature_model_rejected(spark):
    df = spark.createDataFrame([(1.0,)], "label double")
    with pytest.raises(ValueError, match="no feature"):
        train_wdl(df, [], [], [], label_col="label")
    with pytest.raises(ValueError, match="align"):
        train_wdl(df, [], ["cat"], [3, 4], label_col="label")


def test_wdl_registry_roundtrip(spark, tmp_path, wdl_fixture_df):
    """A fitted WDLModel persists through the JSON manifest
    (BinaryWDLSerializer.java's role) and the reloaded model scores
    BIT-IDENTICALLY."""
    from shifu_spark.ml.registry import load_model_set, save_model_set

    model = train_wdl(
        wdl_fixture_df, ["x1", "x2"], ["cat"], [3], embed_dim=2,
        hidden_layers=[3], hidden_activation="SIGMOID", max_epochs=3, seed=9,
    )
    path = str(tmp_path / "wdl_set")
    save_model_set(path, [], feature_cols=["x1", "x2", "cat"], wdl_models=[model])
    loaded = load_model_set(spark, path)["wdl_models"][0]
    assert loaded.weights == model.weights
    assert loaded.cardinalities == [3] and loaded.embed_dim == 2
    a = wdl_fixture_df.limit(40).withColumn("p", wdl_score_udf(model)).collect()
    b = wdl_fixture_df.limit(40).withColumn("p", wdl_score_udf(loaded)).collect()
    assert [r["p"] for r in a] == [r["p"] for r in b]


def test_train_wdl_early_stop_and_validation(spark, wdl_fixture_df):
    """W&D has the same validation-watched early stopping as LR/NN
    (WDLMaster feeds validation error to the shared earlystop set): a
    ConvergeEarlyStop with a huge threshold must fire on the second
    epoch, and valid_losses must be populated per epoch run."""
    from shifu_spark.ml.sgd import ConvergeEarlyStop

    train, valid = wdl_fixture_df.randomSplit([0.8, 0.2], seed=5)
    model = train_wdl(
        train, ["x1", "x2"], ["cat"], [3], embed_dim=2, hidden_layers=[4],
        learning_rate=0.05, max_epochs=20,
        valid_df=valid, early_stop=ConvergeEarlyStop(threshold=1e9), seed=5,
    )
    assert model.stopped_early
    assert model.epochs_run == 2  # threshold so large the 2nd delta fires
    assert len(model.valid_losses) == model.epochs_run
    assert all(v > 0 for v in model.valid_losses)


def test_mixed_family_ensemble_composes(spark, wdl_fixture_df):
    """Heterogeneous ensemble — one NN, one W&D, one LR score column
    through the SAME with_ensemble_stats aggregation (core/Scorer.java
    holds a uniform List<BasicML> regardless of family; the combine
    never dispatches on model type). Scores come from each family's
    real scorer; the stats must equal hand-computed per-row stats."""
    from shifu_spark.ml.nn import train_nn, nn_score_udf
    from shifu_spark.ml.sgd import lr_score_expr, train_lr_sgd
    from shifu_spark.ml.train import with_ensemble_stats

    feats = ["x1", "x2"]
    nn = train_nn(wdl_fixture_df, feats, hidden_layers=[3], max_epochs=3, seed=1)
    lr = train_lr_sgd(wdl_fixture_df, feats, max_epochs=3, seed=1)
    wdl = train_wdl(
        wdl_fixture_df, feats, ["cat"], [3], embed_dim=2, hidden_layers=[3],
        max_epochs=3, seed=1,
    )
    out = (
        wdl_fixture_df.limit(40)
        .withColumn("model0", nn_score_udf(feats, nn))
        .withColumn("model1", wdl_score_udf(wdl))
        .withColumn("model2", lr_score_expr(feats, lr.weights))
    )
    rows = with_ensemble_stats(out, ["model0", "model1", "model2"], ["label"]).collect()
    assert len(rows) == 40
    for r in rows:
        scores = sorted([r["model0"], r["model1"], r["model2"]])
        assert r["mean"] == pytest.approx(sum(scores) / 3)
        assert r["median"] == pytest.approx(scores[1])
        assert r["max"] == pytest.approx(scores[-1]) and r["min"] == pytest.approx(scores[0])


def test_wdl_empty_epoch_skips_step_and_early_stop(spark, wdl_fixture_df):
    """ADVICE r8 (shared with train_nn): an epoch whose Bernoulli
    subsample draws zero rows must not record a sentinel 0.0 loss —
    ConvergeEarlyStop would read two of those as perfect convergence
    and stop the fit on untouched weights."""
    from shifu_spark.ml.sgd import ConvergeEarlyStop

    model = train_wdl(
        wdl_fixture_df.limit(30), ["x1", "x2"], ["cat"], [3], embed_dim=2,
        hidden_layers=[4], max_epochs=5,
        epoch_sample_rate=1e-9,  # every epoch draws zero rows
        early_stop=ConvergeEarlyStop(threshold=1e-6), seed=11,
    )
    assert model.epochs_run == 5
    assert model.stopped_early is False
    assert model.train_losses == []
